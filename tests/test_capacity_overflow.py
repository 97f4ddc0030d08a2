"""Capacity-overflow correctness (BASELINE.md graceful-degradation row):
when the entry table overflows, binning must drop exactly the FARTHEST
depth ranks — the rendered image equals a golden render of the surviving
(nearest) splats, and `n_dropped` reports the loss. Also checks overflow
under tile-band sharding, where each band owns its own capacity budget."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dreamscene_tpu.ops.binning import bin_splats
from dreamscene_tpu.ops.projection import project_gaussians
from dreamscene_tpu.ops.rasterizer import render
from dreamscene_tpu.ops.reference import render_reference
from tests.test_rasterizer_parity import make_camera, make_scene, camera_kwargs


def _entry_layout(scene, kw, width, height):
    """Host-side view of the binning expansion: depth perm + per-rank
    entry offsets at unlimited capacity."""
    splats = project_gaussians(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"],
        kw["viewmatrix"], kw["projmatrix"], kw["campos"],
        kw["tanfovx"], kw["tanfovy"], width, height, sh_degree=2,
    )
    # conics/opacities: match render()'s binning exactly (AABB-tightened
    # rects change the entry layout, so the expected drop boundary must
    # be computed on the SAME layout)
    binned = bin_splats(
        splats.means2d, splats.depths, splats.radii, splats.visible,
        width, height, capacity=64 * 1024, chunk=128,
        conics=splats.conics, opacities=splats.opacities, interpret=True,
    )
    offsets = np.asarray(binned.seg_starts)
    counts = np.asarray(binned.surv_counts)
    perm = np.asarray(binned.perm)
    total = int(offsets[-1] + counts[-1])
    return offsets, counts, perm, total


class TestCapacityOverflow:
    def test_drop_matches_nearest_subset_golden(self):
        """Cut capacity exactly at a depth-rank boundary: the overflowed
        render must equal the golden render of the nearest-j splats."""
        scene = make_scene(300, seed=5)
        cam = make_camera(64, 64)
        kw = camera_kwargs(cam)
        offsets, counts, perm, total = _entry_layout(scene, kw, 64, 64)

        # choose the boundary at ~55% of entries
        j = int(np.searchsorted(offsets + counts, 0.55 * total))
        capacity = int(offsets[j] + counts[j])
        assert 0 < capacity < total

        bg = jnp.zeros((3,), jnp.float32)
        out = render(**scene, **kw, bg=bg, sh_degree=2,
                     capacity=capacity, chunk=128, interpret=True)
        assert int(out["n_dropped"]) == total - capacity

        keep = np.zeros((300,), bool)
        keep[perm[: j + 1]] = True
        golden = render_reference(
            **scene, **kw, bg=bg, sh_degree=2,
            valid_mask=jnp.asarray(keep),
        )
        np.testing.assert_allclose(
            np.asarray(out["image"]), np.asarray(golden["image"]),
            atol=1e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["alpha"]), np.asarray(golden["alpha"]),
            atol=1e-4, rtol=1e-3,
        )

    def test_gradients_flow_only_to_survivors(self):
        """Dropped (farthest) splats must get ZERO gradient from the
        overflowed render; surviving splats match the golden gradient."""
        scene = make_scene(120, seed=7)
        cam = make_camera(48, 48)
        kw = camera_kwargs(cam)
        offsets, counts, perm, total = _entry_layout(scene, kw, 48, 48)
        j = int(np.searchsorted(offsets + counts, 0.5 * total))
        capacity = int(offsets[j] + counts[j])
        assert 0 < capacity < total
        keep = np.zeros((120,), bool)
        keep[perm[: j + 1]] = True
        bg = jnp.zeros((3,), jnp.float32)

        def loss_pallas(means3d):
            out = render(**{**scene, "means3d": means3d}, **kw, bg=bg,
                         sh_degree=2, capacity=capacity, chunk=128,
                         interpret=True)
            return jnp.sum(out["image"] ** 2)

        def loss_golden(means3d):
            out = render_reference(
                **{**scene, "means3d": means3d}, **kw, bg=bg, sh_degree=2,
                valid_mask=jnp.asarray(keep))
            return jnp.sum(out["image"] ** 2)

        g_p = np.asarray(jax.grad(loss_pallas)(scene["means3d"]))
        g_g = np.asarray(jax.grad(loss_golden)(scene["means3d"]))
        assert np.abs(g_p[~keep]).max() == 0.0
        np.testing.assert_allclose(g_p[keep], g_g[keep], atol=2e-3, rtol=2e-2)

    @pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
    def test_banded_overflow_matches_per_band_renders(self):
        """Sharded tile-band render under overflow == stacking the
        single-chip band renders at the same per-band capacity (each band
        drops independently)."""
        from dreamscene_tpu.parallel.sharded_render import (
            make_mesh, make_sharded_render)

        scene = make_scene(250, seed=9)
        cam = make_camera(64, 64)
        kw = camera_kwargs(cam)
        capacity = 180  # small enough to force drops in the busy bands
        mesh = make_mesh(1, 4)
        render_fn = make_sharded_render(
            mesh, width=64, height=64, sh_degree=2,
            capacity=capacity, chunk=128, interpret=True,
        )
        cams = {
            "view": kw["viewmatrix"][None],
            "proj": kw["projmatrix"][None],
            "campos": kw["campos"][None],
            "tanfovx": jnp.asarray([kw["tanfovx"]], jnp.float32),
            "tanfovy": jnp.asarray([kw["tanfovy"]], jnp.float32),
        }
        inputs = dict(scene)
        images, _ = jax.jit(render_fn)(inputs, cams,
                                       jnp.zeros((1, 3), jnp.float32))

        bands = []
        dropped = 0
        kw_band = {k: v for k, v in kw.items() if k != "height"}
        for b in range(4):
            out = render(**scene, **kw_band, bg=jnp.zeros((3,), jnp.float32),
                         sh_degree=2, capacity=capacity, chunk=128,
                         height=16, pixel_offset_y=16 * b, full_height=64,
                         interpret=True)
            bands.append(np.asarray(out["image"]))
            dropped += int(out["n_dropped"])
        assert dropped > 0, "test scene must actually overflow"
        np.testing.assert_allclose(
            np.asarray(images[0]), np.concatenate(bands, axis=1),
            atol=1e-5, rtol=1e-4,
        )
