"""Quaternion algebra (real-first wxyz convention), pure jnp.

Replaces the reference's utils/quaternion_utils.py:10-77 and the
pytorch3d.transforms quaternion<->matrix conversions it imports
(reference: scene_gaussian.py:15-16). Everything broadcasts over leading
batch dims and is jit/vmap safe (no data-dependent branching).
"""

from __future__ import annotations

import jax.numpy as jnp


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real part is non-negative."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b of quaternions [..., 4], real part first."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    ow = aw * bw - ax * bx - ay * by - az * bz
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack((ow, ox, oy, oz), axis=-1)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (conjugate)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (wxyz) -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (wxyz).

    Branch-free Shepperd-style construction: compute all four candidate
    quaternions from the diagonal and pick the numerically best one with
    jnp.where (jit-safe, works for every rotation).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Squared magnitudes of (w, x, y, z), each >= 0 up to rounding.
    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs2, 0.0))

    # Candidate quaternion per pivot (unnormalized, scaled by 2*q_abs[i]).
    quat_w = jnp.stack([q_abs2[..., 0], m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_x = jnp.stack([m21 - m12, q_abs2[..., 1], m10 + m01, m02 + m20], axis=-1)
    quat_y = jnp.stack([m02 - m20, m10 + m01, q_abs2[..., 2], m12 + m21], axis=-1)
    quat_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs2[..., 3]], axis=-1)
    cands = jnp.stack([quat_w, quat_x, quat_y, quat_z], axis=-2)  # [..., 4, 4]
    denom = 2.0 * jnp.maximum(q_abs, 1e-8)[..., None]
    cands = cands / denom

    best = jnp.argmax(q_abs2, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return standardize_quaternion(q)
