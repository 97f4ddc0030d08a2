"""Rigid transforms + spherical-harmonic rotation, pure jnp.

Replaces pytorch3d's euler_angles_to_matrix and e3nn's wigner_D as used by
the reference for object placement (reference: scene_gaussian.py:303-316,
355-375). Instead of reproducing e3nn's Euler-angle Wigner-D machinery, we
build the real-SH band rotation matrices *exactly* by projection: band l of
the real SH basis spans an irreducible (2l+1)-dim representation of SO(3),
so the matrix D_l with

    sh_basis_l(R @ d) == D_l @ sh_basis_l(d)   for all unit d

is obtained by evaluating the band basis at 2l+1 generic directions and
solving a linear system once per rotation. This yields the property the
Wigner-D call exists for (appearance-preserving SH rotation under object
placement) to machine precision, in any SH sign/ordering convention.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from dreamscene_tpu.ops.sh import sh_basis


def _axis_rotation(angle: jnp.ndarray, axis: str) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == "X":
        rows = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        rows = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        rows = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(axis)
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(angles: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Euler angles [..., 3] -> rotation matrix [..., 3, 3].

    Matches pytorch3d.transforms.euler_angles_to_matrix semantics: the
    matrix is R = R_c0(a0) @ R_c1(a1) @ R_c2(a2) for convention "c0c1c2"
    (reference call site: scene_gaussian.py:489 with "XYZ").
    """
    assert len(convention) == 3
    ms = [
        _axis_rotation(angles[..., i], convention[i]) for i in range(3)
    ]
    return ms[0] @ ms[1] @ ms[2]


@functools.lru_cache(maxsize=None)
def _band_sample_dirs(l: int) -> np.ndarray:
    """2l+1 fixed generic unit directions making the band Gram matrix
    well conditioned (deterministic; chosen once per band)."""
    rng = np.random.RandomState(1234 + l)
    # Rejection-free: random normals, normalized; generic w.p. 1.
    d = rng.randn(2 * l + 1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d.astype(np.float64)


def _band_slice(l: int) -> slice:
    return slice(l * l, (l + 1) * (l + 1))


@functools.lru_cache(maxsize=None)
def _band_basis_inv(l: int) -> np.ndarray:
    """Inverse of the [2l+1, 2l+1] matrix of band-l basis values at the
    fixed sample directions (precomputed in float64 on host)."""
    d = _band_sample_dirs(l)
    b = np.asarray(sh_basis(l, jnp.asarray(d)))[:, _band_slice(l)]
    return np.linalg.inv(b.astype(np.float64)).astype(np.float32)


def sh_band_rotation_matrix(l: int, rot: jnp.ndarray) -> jnp.ndarray:
    """Real-SH band-l rotation matrix D_l [..., 2l+1, 2l+1] for rotation
    matrices rot [..., 3, 3], satisfying
    sh_basis_l(rot @ d) = D_l @ sh_basis_l(d)."""
    if l == 0:
        return jnp.ones(rot.shape[:-2] + (1, 1), dtype=rot.dtype)
    dirs = jnp.asarray(_band_sample_dirs(l), dtype=rot.dtype)  # [M, 3]
    # Rows of A: basis at rot @ d_i.
    rdirs = jnp.einsum("...ij,mj->...mi", rot, dirs)
    a = sh_basis(l, rdirs)[..., _band_slice(l)]  # [..., M, M]
    b_inv = jnp.asarray(_band_basis_inv(l), dtype=rot.dtype)  # [M, M]
    # Solve D @ B^T = A^T  =>  D = A^T @ (B^T)^-1 = (B_inv @ A)^T.
    return jnp.swapaxes(b_inv @ a, -1, -2)


def rotate_sh(sh: jnp.ndarray, rot: jnp.ndarray, deg: int) -> jnp.ndarray:
    """Rotate SH coefficients so appearance follows a rigid rotation.

    If a splat's view-dependent color is f(d) = sum_k sh[k] * basis_k(d),
    the rotated splat must satisfy f'(rot @ d) == f(d), i.e. coefficients
    transform by D_l^{-T} = D_l (orthogonal per band).

    Args:
      sh: [..., K, C] coefficients (K = (deg+1)**2, channel-last like the
        reference's features [N, K, 3]).
      rot: [3, 3] (or broadcastable batch) rotation matrix.
      deg: SH degree (static).
    Returns:
      rotated coefficients, same shape.
    """
    out = [sh[..., _band_slice(0), :]]
    for l in range(1, deg + 1):
        d_l = sh_band_rotation_matrix(l, rot)  # [..., M, M]
        # coeff' = D_l^{-T} @ coeff; D orthogonal => D^{-T} = D.
        out.append(jnp.einsum("...ij,...jc->...ic", d_l, sh[..., _band_slice(l), :]))
    return jnp.concatenate(out, axis=-2)
