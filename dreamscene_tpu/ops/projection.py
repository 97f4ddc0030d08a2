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

import jax
import jax.numpy as jnp

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
    # HIGHEST precision: TPU's default bf16 MXU passes round screen
    # positions by ~0.4% (catastrophic near w=0 and at radius/ceil
    # boundaries — measured means2d diffs up to 1e5 vs fp32, flipped
    # visibility); the CUDA preprocess is fp32 (4-wide dots, cost ~0)
    hom = jnp.concatenate([means3d, jnp.ones((n, 1), dtype)], axis=-1)
    p_view = jnp.matmul(hom, viewmatrix.T,
                        precision=jax.lax.Precision.HIGHEST)    # [N, 4]
    tz = p_view[:, 2]
    p_clip = jnp.matmul(hom, projmatrix.T,
                        precision=jax.lax.Precision.HIGHEST)
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    ndc = p_clip[:, :3] * p_w[:, None]
    mean_x = ndc2pix(ndc[:, 0], width)
    mean_y = ndc2pix(ndc[:, 1], height)
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    # --- 3D covariance (closed form; batched 3x3 matmuls are slow on TPU)
    if cov3d_precomp is not None:
        c_xx, c_xy, c_xz = (cov3d_precomp[:, 0], cov3d_precomp[:, 1],
                            cov3d_precomp[:, 2])
        c_yy, c_yz, c_zz = (cov3d_precomp[:, 3], cov3d_precomp[:, 4],
                            cov3d_precomp[:, 5])
    else:
        qn = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
        w, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
        s0, s1, s2 = (scales[:, 0] * scale_modifier,
                      scales[:, 1] * scale_modifier,
                      scales[:, 2] * scale_modifier)
        r00 = 1 - 2 * (y * y + z * z)
        r01 = 2 * (x * y - z * w)
        r02 = 2 * (x * z + y * w)
        r10 = 2 * (x * y + z * w)
        r11 = 1 - 2 * (x * x + z * z)
        r12 = 2 * (y * z - x * w)
        r20 = 2 * (x * z - y * w)
        r21 = 2 * (y * z + x * w)
        r22 = 1 - 2 * (x * x + y * y)
        # L = R diag(s); Sigma = L L^T
        a0, a1, a2 = r00 * s0, r01 * s1, r02 * s2
        b0, b1, b2 = r10 * s0, r11 * s1, r12 * s2
        g0, g1, g2 = r20 * s0, r21 * s1, r22 * s2
        c_xx = a0 * a0 + a1 * a1 + a2 * a2
        c_xy = a0 * b0 + a1 * b1 + a2 * b2
        c_xz = a0 * g0 + a1 * g1 + a2 * g2
        c_yy = b0 * b0 + b1 * b1 + b2 * b2
        c_yz = b0 * g0 + b1 * g1 + b2 * g2
        c_zz = g0 * g0 + g1 * g1 + g2 * g2

    # --- EWA: project covariance to screen (closed form) -----------------
    # Clamp view-space x/y to limit perspective distortion (CUDA: 1.3*tan).
    lim_x, lim_y = 1.3 * tanfovx, 1.3 * tanfovy
    tzc = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    tx = jnp.clip(p_view[:, 0] / tzc, -lim_x, lim_x) * tzc
    ty = jnp.clip(p_view[:, 1] / tzc, -lim_y, lim_y) * tzc
    inv_z = 1.0 / tzc
    inv_z2 = inv_z * inv_z

    # T = J @ W with J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    w_rot = viewmatrix[:3, :3]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    t00 = j00 * w_rot[0, 0] + j02 * w_rot[2, 0]
    t01 = j00 * w_rot[0, 1] + j02 * w_rot[2, 1]
    t02 = j00 * w_rot[0, 2] + j02 * w_rot[2, 2]
    t10 = j11 * w_rot[1, 0] + j12 * w_rot[2, 0]
    t11 = j11 * w_rot[1, 1] + j12 * w_rot[2, 1]
    t12 = j11 * w_rot[1, 2] + j12 * w_rot[2, 2]
    # u = Sigma @ t_row; cov2d entries = t_row . u
    u0 = c_xx * t00 + c_xy * t01 + c_xz * t02
    u1 = c_xy * t00 + c_yy * t01 + c_yz * t02
    u2 = c_xz * t00 + c_yz * t01 + c_zz * t02
    v0 = c_xx * t10 + c_xy * t11 + c_xz * t12
    v1 = c_xy * t10 + c_yy * t11 + c_yz * t12
    v2 = c_xz * t10 + c_yz * t11 + c_zz * t12
    cxx = t00 * u0 + t01 * u1 + t02 * u2 + LOWPASS
    cxy = t10 * u0 + t11 * u1 + t12 * u2
    cyy = t10 * v0 + t11 * v1 + t12 * v2 + LOWPASS

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
