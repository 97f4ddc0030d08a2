"""Per-Gaussian screen-space projection (EWA splatting), pure jnp.

The "preprocess" stage of the differentiable rasterizer: for every splat,
compute its 2D screen mean, 2D conic (inverse covariance), view depth,
pixel radius, and view-dependent RGB from SH. Fully differentiable — JAX
autodiff carries gradients from the composite kernel's record cotangents
back to means/scales/quaternions/opacities/SH here; only the tile
compositing itself has a hand-derived VJP (ops/composite.py).

Reproduces the math of the CUDA `comp-diff-gaussian-rasterization`
preprocess (reference contract: SURVEY.md §2.9.1; call sites
scene_gaussian.py:861-870): EWA projection with the 0.3-px low-pass
dilation, 1.3*tanfov frustum clamp, near-plane cull at z<=0.2, 3-sigma
pixel radius, and clamped SH->RGB.

All arrays are [N, ...]; N is static (fixed capacity + validity masking).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dreamscene_tpu.ops.covariance import build_covariance_3d
from dreamscene_tpu.ops.sh import eval_sh

NEAR_CULL_Z = 0.2          # CUDA preprocess near-plane cull
LOWPASS = 0.3              # EWA screen-space dilation added to cov2d diag
RADIUS_SIGMA = 3.0         # splat extent in standard deviations


class ProjectedSplats(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...])."""

    means2d: jnp.ndarray      # [N, 2] pixel coords
    depths: jnp.ndarray       # [N] view-space z
    conics: jnp.ndarray       # [N, 3] upper-tri inverse 2D covariance (a, b, c)
    colors: jnp.ndarray       # [N, 3] view-dependent RGB (>= 0)
    opacities: jnp.ndarray    # [N] in [0, 1]
    radii: jnp.ndarray        # [N] int32 pixel radius, 0 => culled
    visible: jnp.ndarray      # [N] bool, radii > 0


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """NDC [-1,1] -> pixel coordinate, CUDA convention ((v+1)*S-1)/2."""
    return ((v + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray | None,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    tanfovx: float,
    tanfovy: float,
    width: int,
    height: int,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    valid_mask: jnp.ndarray | None = None,
) -> ProjectedSplats:
    """Project N Gaussians into screen space.

    Args:
      means3d: [N, 3]; scales: [N, 3] (post-activation, positive);
      quats: [N, 4] wxyz (need not be pre-normalized);
      opacities: [N] in [0,1]; shs: [N, K, 3] SH coeffs (channel-last) or
      None if colors_precomp given.
      viewmatrix/projmatrix: [4,4] column-vector convention world->view and
      world->clip (Camera.world_view_transform / full_proj_transform).
      valid_mask: [N] bool — inactive capacity slots are culled.
    """
    n = means3d.shape[0]
    dtype = means3d.dtype
    fx = width / (2.0 * tanfovx)
    fy = height / (2.0 * tanfovy)

    # --- view/clip transforms -------------------------------------------
    hom = jnp.concatenate([means3d, jnp.ones((n, 1), dtype)], axis=-1)
    p_view = hom @ viewmatrix.T      # [N, 4]
    tz = p_view[:, 2]
    p_clip = hom @ projmatrix.T
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    ndc = p_clip[:, :3] * p_w[:, None]
    mean_x = ndc2pix(ndc[:, 0], width)
    mean_y = ndc2pix(ndc[:, 1], height)
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    # --- 3D covariance ---------------------------------------------------
    if cov3d_precomp is not None:
        from dreamscene_tpu.ops.covariance import unstrip_symmetric

        cov3d = unstrip_symmetric(cov3d_precomp)
    else:
        cov3d = build_covariance_3d(scales, quats, scale_modifier)

    # --- EWA: project covariance to screen -------------------------------
    # Clamp view-space x/y to limit perspective distortion (CUDA: 1.3*tan).
    lim_x, lim_y = 1.3 * tanfovx, 1.3 * tanfovy
    tzc = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    tx = jnp.clip(p_view[:, 0] / tzc, -lim_x, lim_x) * tzc
    ty = jnp.clip(p_view[:, 1] / tzc, -lim_y, lim_y) * tzc
    inv_z = 1.0 / tzc
    inv_z2 = inv_z * inv_z

    # J rows (2x3), W = view rotation; T = J @ W (2x3)
    w_rot = viewmatrix[:3, :3]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    t_row0 = j00[:, None] * w_rot[0][None, :] + j02[:, None] * w_rot[2][None, :]
    t_row1 = j11[:, None] * w_rot[1][None, :] + j12[:, None] * w_rot[2][None, :]
    t_mat = jnp.stack([t_row0, t_row1], axis=-2)          # [N, 2, 3]
    cov2d = t_mat @ cov3d @ jnp.swapaxes(t_mat, -1, -2)   # [N, 2, 2]
    cxx = cov2d[:, 0, 0] + LOWPASS
    cxy = cov2d[:, 0, 1]
    cyy = cov2d[:, 1, 1] + LOWPASS

    det = cxx * cyy - cxy * cxy
    det_ok = det > 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)

    # --- radius & culling -------------------------------------------------
    mid = 0.5 * (cxx + cyy)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(RADIUS_SIGMA * jnp.sqrt(lam1))
    in_front = tz > NEAR_CULL_Z
    visible = in_front & det_ok
    if valid_mask is not None:
        visible = visible & valid_mask
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    visible = radii > 0

    # --- view-dependent color --------------------------------------------
    if colors_precomp is not None:
        colors = colors_precomp
    else:
        assert shs is not None
        dirs = means3d - campos[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8
        )
        # eval_sh takes [..., C, K]; shs is [N, K, C]
        rgb = eval_sh(sh_degree, jnp.swapaxes(shs, -1, -2), dirs) + 0.5
        colors = jnp.maximum(rgb, 0.0)  # CUDA clamps (grad zeroed when clamped)

    return ProjectedSplats(
        means2d=means2d,
        depths=tz,
        conics=conic,
        colors=colors,
        opacities=opacities,
        radii=radii,
        visible=visible,
    )
