"""Real spherical-harmonics evaluation (degrees 0..4).

TPU-native re-implementation of the SH math used by the reference
(reference: utils/sh_utils.py:56-127). Hardcoded real SH polynomials in the
standard graphics ordering/convention (PlenOctree / 3DGS): band l occupies
coefficients l**2 .. (l+1)**2 - 1 with m = -l..l.

All functions are pure jnp, shape-polymorphic, and jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(deg: int) -> int:
    return (deg + 1) ** 2


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis functions at unit directions.

    Args:
      deg: max SH degree, 0..4 (static).
      dirs: [..., 3] unit directions.
    Returns:
      [..., (deg+1)**2] basis values b such that
      eval_sh(deg, sh, dirs) == sum_k b[..., k] * sh[..., k].
    """
    assert 0 <= deg <= 4
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [C0 * one]
    if deg > 0:
        out += [-C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if deg > 2:
        out += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    if deg > 3:
        out += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3 * xx - yy),
            C4[2] * xy * (7 * zz - 1),
            C4[3] * yz * (7 * zz - 3),
            C4[4] * (zz * (35 * zz - 30) + 3),
            C4[5] * xz * (7 * zz - 3),
            C4[6] * (xx - yy) * (7 * zz - 1),
            C4[7] * xz * (xx - 3 * yy),
            C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH-encoded function at unit directions.

    Args:
      deg: SH degree 0..4 (static).
      sh: [..., C, K] coefficients with K >= (deg+1)**2.
      dirs: [..., 3] unit directions (broadcastable against sh's batch dims).
    Returns:
      [..., C] values.
    """
    coeffs = num_sh_coeffs(deg)
    assert sh.shape[-1] >= coeffs
    basis = sh_basis(deg, dirs)  # [..., K']
    # HIGHEST: TPU's default bf16 einsum rounds colors ~0.4% (CUDA
    # evaluates SH in fp32); K<=25 dots, cost negligible
    return jnp.einsum("...ck,...k->...c", sh[..., :coeffs], basis,
                      precision=jax.lax.Precision.HIGHEST)


def RGB2SH(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def SH2RGB(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5
