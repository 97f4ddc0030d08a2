"""CI-runnable evidence for the SD guidance surfaces the container
cannot validate against real weights (VERDICT r2 item 6):

  1-2. the Pallas flash-attention kernel (sd_flax._flash_attention, used
     for UNet self-attn at seq >= 1024 and the VAE bottleneck) matches
     naive softmax attention — forward at the REAL SD shape (seq 4096 =
     the 64x64 latent level, head_dim 64) and gradients (the VAE-encoder
     path differentiates through it) — run via Pallas forced-interpret
     on CPU, the same kernel code path the TPU compiles;
  3. a bf16-compute UNet (the shipped SD dtype, UNetConfig.dtype) stays
     within a bounded delta of the f32 reference on the full CSD ladder
     -> pseudo-GT pipeline, so bf16 cannot silently corrupt guidance.

With these, the unproven-against-real-weights surface shrinks to
"CLIP/VAE/UNet weights load correctly" (covered structurally by
tests/test_sd_loader.py name-mapping round-trips).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamscene_tpu.guidance import mtsd
from dreamscene_tpu.guidance.sd_flax import _flash_attention
from dreamscene_tpu.utils.config import GuidanceParams


def _naive(q, k, v, scale):
    a = jax.nn.softmax((q * scale) @ k.transpose(0, 1, 3, 2), axis=-1)
    return a @ v


def _interpret_ctx():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


class TestFlashAttention:
    def test_forward_parity_sd_shape(self):
        """seq 4096 x head_dim 64 — exactly SD2.1's 64x64-latent
        self-attention operand shape (reduced to 1 head / batch 1; the
        kernel is batch/head-parallel so extra ones add nothing)."""
        n, d = 4096, 64
        ks = jax.random.split(jax.random.key(0), 3)
        q, k, v = (jax.random.normal(kk, (1, 1, n, d), jnp.float32)
                   for kk in ks)
        with _interpret_ctx():
            out = _flash_attention(q, k, v, d**-0.5)
        ref = _naive(q, k, v, d**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6)

    def test_gradient_parity(self):
        """The VAE encoder differentiates through the kernel (custom
        VJP); grads w.r.t. q/k/v must match naive attention."""
        n, d = 1024, 64
        ks = jax.random.split(jax.random.key(1), 3)
        q, k, v = (jax.random.normal(kk, (1, 2, n, d), jnp.float32)
                   for kk in ks)

        def loss(fn):
            return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

        with _interpret_ctx():
            gf = jax.grad(loss(lambda *a: _flash_attention(*a, d**-0.5)),
                          argnums=(0, 1, 2))(q, k, v)
        gn = jax.grad(loss(lambda *a: _naive(*a, d**-0.5)),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gn, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-6, err_msg=name)


class TestBF16Guidance:
    def test_bf16_unet_ladder_delta_bounded(self):
        """Same seed => identical f32 params (dtype is COMPUTE dtype
        only); the CSD ladder -> pseudo-GT pipeline in bf16 must track
        the f32 run. Bound: pseudo-GT pixels live in [0,1]; bf16's 2^-8
        relative rounding through the tiny UNet + CFG assembly lands the
        delta at the few-percent scale — a dtype-plumbing bug (e.g. a
        f32 cast dropped mid-ladder) produces O(1) differences."""
        import dataclasses

        from dreamscene_tpu.guidance.sd_flax import tiny_unet_config

        opt = GuidanceParams()
        g32 = mtsd.make_tiny_guidance(opt, seed=7)
        g16 = mtsd.make_tiny_guidance(
            opt, seed=7,
            unet_config=dataclasses.replace(
                tiny_unet_config(), dtype=jnp.bfloat16),
        )
        b = 1
        lat = jnp.asarray(
            np.random.RandomState(0).randn(b, 8, 8, 4), jnp.float32)
        noise = mtsd.make_ladder_noise(jax.random.key(2), lat.shape)
        ts = jnp.asarray([300], jnp.int32)
        text = g32.get_text_embeds(["a", "neg", "inv"])

        outs = []
        for g in (g32, g16):
            scores = mtsd.ladder_scores(g.mods, lat, noise, ts, text,
                                        n_rungs=1)
            gt = mtsd.pseudo_gt_images(g.mods, scores, 7.5)
            csd = mtsd.csd_grad(g.mods, scores, guidance_scale=7.5)
            outs.append((np.asarray(gt), np.asarray(csd)))
        (gt32, csd32), (gt16, csd16) = outs
        assert np.isfinite(gt16).all() and np.isfinite(csd16).all()
        assert np.abs(gt16 - gt32).max() < 0.08, np.abs(gt16 - gt32).max()
        # CSD grads are compared at their own magnitude scale
        scale = max(np.abs(csd32).max(), 1e-12)
        assert np.abs(csd16 - csd32).max() / scale < 0.15
