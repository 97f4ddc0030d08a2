"""Image-space losses, pure jnp (reference: utils/system_utils.py:39-127).

Conventions match the reference: images are NCHW float arrays.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def tv_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Total-variation loss on NCHW images (reference: system_utils.py:39-48)."""
    b, c, h, w = x.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = jnp.sum(jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :]))
    w_tv = jnp.sum(jnp.square(x[:, :, :, 1:] - x[:, :, :, :-1]))
    return 2.0 * (h_tv / count_h + w_tv / count_w) / b


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - gt))


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps))


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    g /= g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM on NCHW images with an 11x11 gaussian window, sigma=1.5
    (reference: system_utils.py:86-126). Depthwise conv via
    lax.conv_general_dilated with feature_group_count."""
    channel = img1.shape[-3]
    w = jnp.asarray(_gaussian_window(window_size, 1.5), dtype=img1.dtype)
    kernel = jnp.tile(w[None, None], (channel, 1, 1, 1))  # [C,1,k,k]
    pad = window_size // 2

    def conv(x):
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=channel,
        )

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
