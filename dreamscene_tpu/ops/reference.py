"""Slow, exact, autodiffable reference renderer (golden oracle).

Composites every projected Gaussian against every pixel with a depth-ordered
`lax.scan`, reproducing the CUDA rasterizer's per-pixel semantics exactly:
  * front-to-back ordering by view depth,
  * alpha = min(0.99, opacity * exp(-0.5 d^T conic d)), skip if power > 0
    or alpha < 1/255,
  * termination: a splat whose application would drop transmittance below
    1e-4 is NOT composited and terminates the pixel,
  * background blended as C + T_final * bg.

Used to generate goldens for the Pallas kernels (SURVEY.md §4b) and, being
pure jnp, to obtain golden *gradients* by autodiff. O(N * H * W) — tests
and tiny scenes only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dreamscene_tpu.ops.projection import ProjectedSplats, project_gaussians

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4


def composite_reference(
    splats: ProjectedSplats,
    width: int,
    height: int,
    bg: jnp.ndarray,
    tile_w: int | None = None,
    tile_h: int | None = None,
) -> dict:
    """Depth-ordered full-frame compositing via lax.scan.

    Returns dict with image [3,H,W], depth [H,W], alpha [H,W],
    important_score [N] (per-splat accumulated blend contribution).
    """
    from dreamscene_tpu.ops.binning import resolve_tile

    tile_w, tile_h = resolve_tile(tile_w, tile_h)
    n = splats.means2d.shape[0]
    order = jnp.argsort(jnp.where(splats.visible, splats.depths, jnp.inf))

    mean_s = splats.means2d[order]
    conic_s = splats.conics[order]
    color_s = splats.colors[order]
    opac_s = jnp.where(splats.visible, splats.opacities, 0.0)[order]
    depth_s = splats.depths[order]
    radii_s = splats.radii[order].astype(jnp.float32)

    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]
    # tile id of each pixel (CUDA composites a splat only inside its
    # radius tile-rect — the >3-sigma tails are cut at tile granularity)
    tx_pix = jnp.floor(px / tile_w)
    ty_pix = jnp.floor(py / tile_h)

    def step(carry, inp):
        rgb, depth_acc, t, score_acc_unused = carry
        mean, conic, color, opac, depth, radius = inp
        dx = mean[0] - px
        dy = mean[1] - py
        # CUDA getRect tile bounds (binning.bin_splats uses the same)
        x0 = jnp.floor((mean[0] - radius) / tile_w)
        y0 = jnp.floor((mean[1] - radius) / tile_h)
        x1 = jnp.floor((mean[0] + radius + tile_w - 1) / tile_w)
        y1 = jnp.floor((mean[1] + radius + tile_h - 1) / tile_h)
        in_rect = (
            (tx_pix >= x0) & (tx_pix < x1) & (ty_pix >= y0) & (ty_pix < y1)
        )
        power = -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) - conic[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, opac * jnp.exp(power))
        alpha = jnp.where(power > 0.0, 0.0, alpha)
        alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
        alpha = jnp.where(in_rect, alpha, 0.0)
        # termination: skip the splat that would push T below eps
        t_test = t * (1.0 - alpha)
        alpha = jnp.where(t_test < TRANSMITTANCE_EPS, 0.0, alpha)
        w = t * alpha
        rgb = rgb + w[None] * color[:, None, None]
        depth_acc = depth_acc + w * depth
        t = t * (1.0 - alpha)
        score = jnp.sum(w)
        return (rgb, depth_acc, t, score), score

    init = (
        jnp.zeros((3, height, width), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
        jnp.ones((height, width), jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    (rgb, depth_acc, t_final, _), scores = jax.lax.scan(
        step, init, (mean_s, conic_s, color_s, opac_s, depth_s, radii_s)
    )
    image = rgb + t_final[None] * bg[:, None, None]
    # un-sort importance back to input order
    important_score = jnp.zeros((n,), jnp.float32).at[order].set(scores)
    return {
        "image": image,
        "depth": depth_acc,
        "alpha": 1.0 - t_final,
        "t_final": t_final,
        "important_score": important_score,
    }


def render_reference(
    means3d,
    scales,
    quats,
    opacities,
    shs,
    viewmatrix,
    projmatrix,
    campos,
    tanfovx,
    tanfovy,
    width,
    height,
    bg,
    sh_degree=3,
    scale_modifier=1.0,
    valid_mask=None,
    colors_precomp=None,
    tile_w=None,
    tile_h=None,
):
    """Full golden render path: projection + reference composite."""
    splats = project_gaussians(
        means3d,
        scales,
        quats,
        opacities,
        shs,
        viewmatrix,
        projmatrix,
        campos,
        tanfovx,
        tanfovy,
        width,
        height,
        sh_degree=sh_degree,
        scale_modifier=scale_modifier,
        valid_mask=valid_mask,
        colors_precomp=colors_precomp,
    )
    out = composite_reference(splats, width, height, bg,
                              tile_w=tile_w, tile_h=tile_h)
    out["radii"] = splats.radii
    return out
