"""Mesh extraction (marching tetrahedra over the occupancy field) —
EXCEEDS the reference, which stops at the occupancy grid
(gs_renderer.py:491-573)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dreamscene_tpu.models.mesh import export_mesh, marching_tetrahedra


def sphere_grid(r=48, radius=0.6):
    ax = np.linspace(-1, 1, r)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return radius - np.sqrt(x * x + y * y + z * z)  # >0 inside


class TestMarchingTetrahedra:
    def test_sphere_is_watertight_and_on_surface(self):
        grid = sphere_grid()
        verts, faces = marching_tetrahedra(grid, 0.0)
        assert len(verts) > 500 and len(faces) > 500
        # every vertex on the iso-surface
        rad = np.linalg.norm(verts, axis=1)
        np.testing.assert_allclose(rad, 0.6, atol=0.05)
        # watertight: every undirected edge shared by exactly 2 faces
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
        e = np.sort(e, axis=1)
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert (counts == 2).all(), np.unique(counts)
        # consistent outward orientation: face normals point away from 0
        c = verts[faces].mean(1)
        n = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                     verts[faces[:, 2]] - verts[faces[:, 0]])
        agree = ((n * c).sum(1) > 0).mean()
        assert agree > 0.99, agree
        # enclosed volume ~ sphere volume (signed tet sum)
        vol = np.abs((verts[faces[:, 0]] *
                      np.cross(verts[faces[:, 1]], verts[faces[:, 2]])
                      ).sum() / 6.0)
        assert abs(vol - 4 / 3 * np.pi * 0.6 ** 3) < 0.06 * vol

    def test_export_from_state(self, tmp_path):
        from dreamscene_tpu.models.gaussians import create_from_points

        rng = np.random.RandomState(0)
        pts = rng.randn(200, 3).astype(np.float32) * 0.15
        st = create_from_points(pts, rng.rand(200, 3).astype(np.float32),
                                sh_degree=1, capacity=200)
        st = st.replace(params=st.params.replace(
            scaling=jnp.full_like(st.params.scaling, np.log(0.08)),
            opacity=jnp.full_like(st.params.opacity, 3.0)))
        out = export_mesh(st, str(tmp_path / "obj.ply"), resolution=48,
                          thresh=0.5, num_blocks=8)
        assert out["n_verts"] > 100 and out["n_faces"] > 100
        assert (tmp_path / "obj.ply").stat().st_size > 1000
        out2 = export_mesh(st, str(tmp_path / "obj.obj"), resolution=32,
                           thresh=0.5, num_blocks=8)
        assert (tmp_path / "obj.obj").exists() and out2["n_faces"] > 0
