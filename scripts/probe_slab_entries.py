"""Measure the entry-count headroom of per-(splat, tile-row) slab
expansion vs the current per-splat rect expansion, on the bench scene.

Three numbers at the default tile shape:
  rect   — entries the current binning expands (ellipse-AABB rects;
           what capacity must fit today);
  slab   — entries if each tile ROW of a splat only spanned the
           ellipse's x-extent within that row's y-band (the candidate);
  live   — entries surviving the exact ellipse-vs-tile test (the floor:
           what the composite kernels actually composite).

Runs on CPU (pure XLA math, no Pallas). See ROADMAP round-4 leads.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from bench import build_scene, N_GAUSSIANS, WIDTH, HEIGHT
from __graft_entry__ import _camera


def main():
    import jax.numpy as jnp
    from dreamscene_tpu.ops.binning import resolve_tile, cdiv
    from dreamscene_tpu.ops.projection import project_gaussians

    scene = build_scene(N_GAUSSIANS)
    cam = _camera(WIDTH, HEIGHT)
    tile_w, tile_h = resolve_tile(None, None)
    tiles_x = cdiv(WIDTH, tile_w)
    tiles_y = cdiv(HEIGHT, tile_h)

    proj = project_gaussians(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"],
        jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform),
        jnp.asarray(cam.camera_center),
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        width=WIDTH, height=HEIGHT, sh_degree=2,
    )
    mx = np.asarray(proj.means2d[:, 0], np.float64)
    my = np.asarray(proj.means2d[:, 1], np.float64)
    ca = np.asarray(proj.conics[:, 0], np.float64)
    cb = np.asarray(proj.conics[:, 1], np.float64)
    cc = np.asarray(proj.conics[:, 2], np.float64)
    r = np.asarray(proj.radii, np.float64)
    vis = np.asarray(proj.visible)
    opa = np.asarray(scene["opacities"], np.float64)

    tq = 2.0 * np.log(np.maximum(255.0 * opa, 1e-30))
    det = np.maximum(ca * cc - cb * cb, 1e-24)
    tq_pos = np.maximum(tq, 0.0)
    hx = np.sqrt(tq_pos * np.maximum(cc, 0.0) / det) + 0.6
    hy = np.sqrt(tq_pos * np.maximum(ca, 0.0) / det) + 0.6
    vis = vis & (tq > 0)

    # current binning rect (binning.py step 1)
    x0 = np.clip(np.floor((mx - r) / tile_w), 0, tiles_x).astype(np.int64)
    y0 = np.clip(np.floor((my - r) / tile_h), 0, tiles_y).astype(np.int64)
    x1 = np.clip(np.floor((mx + r + tile_w - 1) / tile_w), 0,
                 tiles_x).astype(np.int64)
    y1 = np.clip(np.floor((my + r + tile_h - 1) / tile_h), 0,
                 tiles_y).astype(np.int64)
    x0 = np.maximum(x0, np.clip(np.floor((mx - hx) / tile_w), 0, tiles_x))
    y0 = np.maximum(y0, np.clip(np.floor((my - hy) / tile_h), 0, tiles_y))
    x1 = np.minimum(x1, np.clip(np.floor((mx + hx) / tile_w) + 1, 0, tiles_x))
    y1 = np.minimum(y1, np.clip(np.floor((my + hy) / tile_h) + 1, 0, tiles_y))
    nx = np.where(vis, x1 - x0, 0)
    ny = np.where(vis, y1 - y0, 0)
    rect = int((nx * ny).sum())

    # slab: per tile-row x-extent of the ellipse within the row's y-band.
    # For fixed dy, Q(dx, dy) = tq at dx = (-cb*dy +- s)/ca with
    # s = sqrt(ca*tq - det*dy^2); the upper root's max over a dy interval
    # is at dy* = -cb*sqrt(tq*det/cc)/det (where it equals hx), clamped
    # to the band. Lower root symmetric (dy* negated).
    keep = vis & (ny > 0)
    idx = np.nonzero(keep)[0]
    slab = 0
    live = 0
    dystar = np.where(det > 0, -cb * np.sqrt(np.maximum(tq_pos, 0.0)
                                             * det / np.maximum(cc, 1e-24))
                      / det, 0.0)

    def upper_root(i, dy):
        s2 = ca[i] * tq_pos[i] - det[i] * dy * dy
        s = np.sqrt(np.maximum(s2, 0.0))
        return (-cb[i] * dy + s) / ca[i]

    for i in idx:
        rows = np.arange(y0[i], y1[i])
        # y-band of tile row j in pixels, relative to the splat mean
        band_lo = rows * tile_h - 0.5 - my[i]
        band_hi = (rows + 1) * tile_h - 0.5 - my[i]
        dy_hi = np.clip(dystar[i], band_lo, band_hi)      # argmax upper
        dy_lo = np.clip(-dystar[i], band_lo, band_hi)     # argmin lower
        xr = mx[i] + upper_root(i, dy_hi) + 0.6
        xl = mx[i] - upper_root(i, -dy_lo) - 0.6
        sx0 = np.clip(np.floor(xl / tile_w), x0[i], x1[i])
        sx1 = np.clip(np.floor(xr / tile_w) + 1, x0[i], x1[i])
        slab += int(np.maximum(sx1 - sx0, 0).sum())

        # exact ellipse-vs-tile live count (brute force the rect tiles)
        txs = np.arange(x0[i], x1[i])
        cx_t = txs[None, :] * tile_w + (tile_w / 2.0 - 0.5)
        cy_t = rows[:, None] * tile_h + (tile_h / 2.0 - 0.5)
        dx = np.clip(mx[i] - cx_t, -(tile_w / 2.0 - 0.5 + 0.3),
                     tile_w / 2.0 - 0.5 + 0.3) + cx_t - mx[i]
        dy = np.clip(my[i] - cy_t, -(tile_h / 2.0 - 0.5 + 0.3),
                     tile_h / 2.0 - 0.5 + 0.3) + cy_t - my[i]
        # nearest point of the padded tile box to the mean (coordinate-
        # wise clamp is exact for the box); Q there <= tq => tile live.
        q = ca[i] * dx * dx + 2 * cb[i] * dx * dy + cc[i] * dy * dy
        live += int((q <= tq_pos[i] * 1.05 + 1e-6).sum())

    print(f"tile {tile_w}x{tile_h}: rect={rect} slab={slab} "
          f"({slab/rect:.3f}x) live~={live} ({live/rect:.3f}x)")


if __name__ == "__main__":
    main()
