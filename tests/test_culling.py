"""Ellipse-vs-tile entry culling (ops/binning._cull_entries).

The cull predicate must be EXACTLY conservative: an entry may only be
re-keyed to the trash tile if the composite kernel would have masked it
to zero at every pixel of its tile (raw alpha < 1/255 or power > 0 —
comp-diff-gaussian-rasterization's per-pair skip). Verified here by
brute force over all 256 pixels of every culled entry, plus a
render-level check that culling leaves the image within rounding noise
of the golden renderer while actually removing work.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dreamscene_tpu.ops.binning as B
from dreamscene_tpu.ops.projection import project_gaussians
from dreamscene_tpu.ops.rasterizer import render
from dreamscene_tpu.ops.reference import render_reference
from tests.test_rasterizer_parity import make_camera

ALPHA_MIN = 1.0 / 255.0


def _scene(n=300, seed=0, aniso=0.9):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return dict(
        means3d=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.5),
        scales=jnp.asarray(
            np.exp(rng.randn(n, 3) * aniso - 2.2).astype(np.float32)
        ),
        quats=jnp.asarray(q),
        opacities=jnp.asarray(
            (1 / (1 + np.exp(-rng.randn(n)))).astype(np.float32)
        ),
        shs=jnp.asarray((rng.randn(n, 9, 3) * 0.2).astype(np.float32)),
    )


def _project(scene, cam, wh=48):
    return project_gaussians(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"],
        jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform),
        jnp.asarray(cam.camera_center),
        cam.tanfovx, cam.tanfovy, wh, wh, sh_degree=2,
    )


def test_cull_predicate_exactly_conservative():
    scene = _scene()
    cam = make_camera(48, 48)
    sp = _project(scene, cam)
    cap = 8 * 300

    spied = {}
    orig = B._cull_entries

    def spy(key, gid, means2d, conics, opacities, **kw):
        new = orig(key, gid, means2d, conics, opacities, **kw)
        spied.update(key=np.asarray(key), new=np.asarray(new),
                     gid=np.asarray(gid), **kw)
        return new

    B._cull_entries = spy
    try:
        B.bin_splats(sp.means2d, sp.depths, sp.radii, sp.visible, 48, 48,
                     capacity=cap, chunk=128, conics=sp.conics,
                     opacities=sp.opacities, interpret=True)
    finally:
        B._cull_entries = orig

    culled = np.nonzero(spied["key"] != spied["new"])[0]
    assert len(culled) > 20, "scene should exercise culling"
    mx, my = np.asarray(sp.means2d).T
    ca, cb, cc = np.asarray(sp.conics).T
    opa = np.asarray(sp.opacities)
    shift, tiles_x = spied["shift"], spied["tiles_x"]
    for e in culled:
        t = int(spied["key"][e].astype(np.uint32) >> shift)
        g = spied["gid"][e]
        x0, y0 = (t % tiles_x) * 16, (t // tiles_x) * 16
        px, py = np.meshgrid(
            np.arange(x0, x0 + 16, dtype=np.float32),
            np.arange(y0, y0 + 16, dtype=np.float32),
        )
        dx, dy = mx[g] - px, my[g] - py
        power = -0.5 * (ca[g] * dx * dx + cc[g] * dy * dy) - cb[g] * dx * dy
        raw = opa[g] * np.exp(np.minimum(power, 0.0))
        assert not ((power <= 0) & (raw >= ALPHA_MIN)).any(), (
            f"culled entry {e} (splat {g}, tile {t}) contributes "
            f"raw={raw.max()}"
        )


def test_culled_render_matches_golden():
    scene = _scene(seed=1)
    cam = make_camera(48, 48)
    common = dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, width=48, height=48,
        bg=jnp.zeros(3), sh_degree=2,
    )
    out = render(**scene, **common, capacity=8 * 300, chunk=128,
                 interpret=True)
    ref = render_reference(**scene, **common)
    assert float(jnp.abs(out["image"] - ref["image"]).max()) < 1e-3
    assert float(jnp.abs(out["alpha"] - ref["alpha"]).max()) < 1e-3
