"""3D covariance construction for Gaussian splats, pure jnp.

Replaces the reference's build_rotation / build_scaling_rotation /
strip_symmetric helpers (reference: gs_renderer.py:60-164 region) used to
form per-splat covariance Sigma = R S S^T R^T from a unit quaternion and a
per-axis scale vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dreamscene_tpu.ops.quaternion import quaternion_to_matrix


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion [..., 4] (wxyz) and convert to [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)


def build_scaling_rotation(scales: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(scales): [..., 3, 3]."""
    r = build_rotation(q)
    return r * scales[..., None, :]


def build_covariance_3d(
    scales: jnp.ndarray, q: jnp.ndarray, scale_modifier: float | jnp.ndarray = 1.0
) -> jnp.ndarray:
    """Sigma = L @ L^T with L = R @ diag(scale_modifier * scales)."""
    l = build_scaling_rotation(scales * scale_modifier, q)
    return jnp.matmul(l, jnp.swapaxes(l, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack symmetric [..., 3, 3] into 6 unique values [..., 6]
    (order: xx, xy, xz, yy, yz, zz — matches the CUDA rasterizer's
    cov3D_precomp layout)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of strip_symmetric: [..., 6] -> [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
