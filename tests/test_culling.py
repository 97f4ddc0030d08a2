"""Ellipse-vs-tile entry culling (binning._capsule_params + the
in-kernel test in ops/expand.py).

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


def _tile_entry_sets(b, n_tiles):
    """tile -> set of splat ids with a LIVE entry in that tile, from the
    chunk metadata + sorted gid table."""
    out = {}
    tiles = np.asarray(b.chunk_tile)
    s0 = np.asarray(b.chunk_s0)
    lo = np.asarray(b.chunk_lo)
    hi = np.asarray(b.chunk_hi)
    gid = np.asarray(b.gid_sorted)
    for u in range(int(b.n_chunks_used)):
        t = int(tiles[u])
        if t >= n_tiles:
            continue
        sl = gid[s0[u] + lo[u]: s0[u] + hi[u]]
        out.setdefault(t, set()).update(int(g) for g in sl)
    return out


@pytest.mark.parametrize("aniso,seed,tw,th", [
    (0.9, 0, 16, 16), (1.6, 3, 16, 16), (0.2, 7, 16, 16),
    (0.9, 0, 32, 16), (1.6, 3, 32, 16), (1.6, 5, 16, 32),
])
def test_cull_predicate_exactly_conservative(aniso, seed, tw, th):
    """Every (splat, tile) entry removed by the in-kernel ellipse cull
    must be provably zero: brute-force the kernel's alpha over all
    pixels of the (tile_w x tile_h) tile. Needle scenes (aniso=1.6)
    stress the rotation-aware threshold; anisotropic tiles stress the
    per-axis half-extents. Also: culling must only REMOVE entries."""
    scene = _scene(seed=seed, aniso=aniso)
    wh = 96 if max(tw, th) > 16 else 48   # keep >= 3 tiles per axis
    cam = make_camera(wh, wh)
    sp = _project(scene, cam, wh=wh)
    cap = 16 * 300
    kw = dict(capacity=cap, chunk=128, interpret=True,
              tile_w=tw, tile_h=th)
    b_nc = B.bin_splats(sp.means2d, sp.depths, sp.radii, sp.visible,
                        wh, wh, **kw)
    b_c = B.bin_splats(sp.means2d, sp.depths, sp.radii, sp.visible,
                       wh, wh, conics=sp.conics, opacities=sp.opacities,
                       **kw)
    tiles_x = -(-wh // tw)
    n_tiles = tiles_x * (-(-wh // th))
    nc = _tile_entry_sets(b_nc, n_tiles)
    c = _tile_entry_sets(b_c, n_tiles)
    culled = []
    for t, gids in nc.items():
        kept = c.get(t, set())
        assert kept <= gids, f"cull ADDED entries to tile {t}"
        culled += [(g, t) for g in gids - kept]
    assert len(culled) > 5, "scene should exercise culling"

    mx, my = np.asarray(sp.means2d).T
    ca, cb, cc = np.asarray(sp.conics).T
    opa = np.asarray(sp.opacities)
    for g, t in culled:
        x0, y0 = (t % tiles_x) * tw, (t // tiles_x) * th
        px, py = np.meshgrid(
            np.arange(x0, x0 + tw, dtype=np.float32),
            np.arange(y0, y0 + th, dtype=np.float32),
        )
        dx, dy = mx[g] - px, my[g] - py
        power = -0.5 * (ca[g] * dx * dx + cc[g] * dy * dy) - cb[g] * dx * dy
        raw = opa[g] * np.exp(np.minimum(power, 0.0))
        assert not ((power <= 0) & (raw >= ALPHA_MIN)).any(), (
            f"culled entry (splat {g}, tile {t}) contributes "
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


def test_coarse_rank_key_order_invariant():
    """When tile+rank bits exceed 32 the sort key drops low rank bits
    (binning step 3); the STABLE sort + rank-major expansion order must
    keep results bit-identical to the full-key path."""
    import dreamscene_tpu.ops.binning as B2
    scene = _scene(seed=2, aniso=0.5)
    cam = make_camera(48, 48)
    sp = _project(scene, cam)
    kw = dict(capacity=8 * 300, chunk=128, conics=sp.conics,
              opacities=sp.opacities, interpret=True)
    b_full = B2.bin_splats(sp.means2d, sp.depths, sp.radii, sp.visible,
                           48, 48, **kw)
    b_coarse = B2.bin_splats(sp.means2d, sp.depths, sp.radii, sp.visible,
                             48, 48, rank_drop_override=5, **kw)
    for field in ["gid_sorted", "chunk_tile", "chunk_s0", "chunk_lo",
                  "chunk_hi", "chunk_first", "pos_of_entry", "n_entries",
                  "n_chunks_used"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(b_full, field)),
            np.asarray(getattr(b_coarse, field)), err_msg=field)
