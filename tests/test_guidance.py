"""Guidance tests: DDIM math invariants, the FPS ladder on a tiny SD stack,
SpecifyGradient semantics, pseudo-GT shapes (reference behavior from
guidance/sd_step.py and guidance/multitime_sd_utils.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from dreamscene_tpu.ops.ddim import (
    add_noise,
    ddim_step,
    make_schedule,
    pred_original,
)
from dreamscene_tpu.guidance import mtsd
from dreamscene_tpu.utils.config import GuidanceParams


class TestDDIM:
    def setup_method(self, _):
        self.sched = make_schedule()

    def test_add_noise_limits(self):
        x = jnp.ones((2, 4, 4, 4))
        eps = jnp.full((2, 4, 4, 4), 2.0)
        near = add_noise(self.sched, x, eps, jnp.array([0, 0]))
        far = add_noise(self.sched, x, eps, jnp.array([999, 999]))
        # t=0: almost the clean sample; t=999: almost pure noise
        assert abs(float(near.mean()) - 1.0) < 0.1
        assert abs(float(far.mean()) - 2.0) < 0.3

    def test_pred_original_recovers_x0(self):
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(2, 4, 4, 4).astype(np.float32))
        eps = jnp.asarray(rng.randn(2, 4, 4, 4).astype(np.float32))
        t = jnp.array([500, 500])
        xt = add_noise(self.sched, x0, eps, t)
        rec = pred_original(self.sched, eps, t, xt)
        np.testing.assert_allclose(rec, x0, atol=1e-4)

    def test_ddim_step_with_true_eps_denoises(self):
        rng = np.random.RandomState(1)
        x0 = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
        eps = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
        t = jnp.array([600])
        xt = add_noise(self.sched, x0, eps, t)
        # stepping down with the exact eps lands on add_noise at t-delta
        prev, x0_hat = ddim_step(self.sched, eps, t, xt, 200)
        expect = add_noise(self.sched, x0, eps, jnp.array([400]))
        np.testing.assert_allclose(prev, expect, atol=1e-4)
        np.testing.assert_allclose(x0_hat, x0, atol=1e-4)

    def test_inversion_roundtrip(self):
        """DDIM with eta=0 is reversible when the model output is
        consistent: step up (negative delta) then down returns the input
        (the property FPS's addnoise_with_cfg relies on; reference
        docstring multitime_sd_utils.py:498)."""
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
        eps = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
        t = jnp.array([300])
        up, _ = ddim_step(self.sched, eps, t, x, -200)          # 300 -> 500
        down, _ = ddim_step(self.sched, eps, jnp.array([500]), up, 200)
        np.testing.assert_allclose(down, x, atol=1e-3)


class TestLadder:
    def setup_method(self, _):
        self.opt = GuidanceParams()
        self.g = mtsd.make_tiny_guidance(self.opt)

    def test_build_rand_ladder_monotone_capped(self):
        rng = np.random.default_rng(0)
        for rate in [0.0, 0.5, 1.0]:
            ladder = mtsd.build_rand_ladder(rng, (175, 225), (400, 850), rate)
            assert 1 <= len(ladder) <= 4
            assert all(b > a for a, b in zip(ladder, ladder[1:]))
            max_step = 850 - int(450 * rate)
            assert all(t < max_step or i == 0 for i, t in enumerate(ladder))

    def test_encode_decode_shapes(self):
        imgs = jnp.ones((2, 3, 32, 32)) * 0.5
        lat = mtsd.encode_images(self.g.mods, imgs, jax.random.key(0))
        assert lat.shape == (2, 16, 16, 4)
        out = mtsd.decode_latents(self.g.mods, lat)
        assert out.shape == (2, 3, 32, 32)
        assert float(out.min()) >= 0 and float(out.max()) <= 1

    def test_ladder_and_csd_grad(self):
        b = 2
        lat = jnp.asarray(np.random.RandomState(0).randn(b, 8, 8, 4), jnp.float32)
        noise = mtsd.make_ladder_noise(jax.random.key(1), lat.shape)
        ts = jnp.asarray([300, 500], jnp.int32)
        text = self.g.get_text_embeds(["a", "b", "neg", "neg", "inv", "inv"])
        scores = mtsd.ladder_scores(self.g.mods, lat, noise, ts, text, n_rungs=2)
        assert len(scores) == 3  # t=0 + 2 rungs
        g = mtsd.csd_grad(self.g.mods, scores, guidance_scale=7.5)
        assert g.shape == lat.shape
        assert np.isfinite(np.asarray(g)).all()

    def test_specify_gradient(self):
        lat = jnp.ones((2, 4, 4, 4))
        g = jnp.full_like(lat, 0.3)
        grad = jax.grad(lambda l: mtsd.specify_gradient_loss(l, g))(lat)
        np.testing.assert_allclose(grad, 0.3)

    def test_pseudo_gt(self):
        b = 1
        lat = jnp.zeros((b, 8, 8, 4))
        noise = mtsd.make_ladder_noise(jax.random.key(2), lat.shape)
        ts = jnp.asarray([200], jnp.int32)
        text = self.g.get_text_embeds(["a", "neg", "inv"])
        scores = mtsd.ladder_scores(self.g.mods, lat, noise, ts, text, n_rungs=1)
        gt = mtsd.pseudo_gt_images(self.g.mods, scores, 7.5)
        # tiny VAE has one upsample level: 8x8 latents -> 16x16 images
        assert gt.shape == (b, 3, 16, 16)
        assert float(gt.min()) >= 0 and float(gt.max()) <= 1

    def test_flip_augmentation(self):
        x = jnp.arange(8.0).reshape(1, 1, 2, 4)
        (flipped,) = mtsd.horizontal_flip(jnp.asarray(True), x)
        np.testing.assert_allclose(flipped[0, 0, 0], [3, 2, 1, 0])
        (same,) = mtsd.horizontal_flip(jnp.asarray(False), x)
        np.testing.assert_allclose(same, x)

    def test_fixed_noise_is_stable(self):
        opt = GuidanceParams(fix_noise=True)
        g = mtsd.make_tiny_guidance(opt)
        n1 = g.next_noise((1, 8, 8, 4))
        n2 = g.next_noise((1, 8, 8, 4))
        np.testing.assert_allclose(n1, n2)


class TestDenoiseLadder:
    def test_full_cfg_denoise_walk(self):
        """denoise_ladder steps DOWN the ladder with CFG (reference
        denoise_with_cfg, multitime_sd_utils.py:560-628)."""
        import jax

        opt = GuidanceParams()
        g = mtsd.make_tiny_guidance(opt)
        lat = jnp.zeros((1, 8, 8, 4))
        noise = mtsd.make_ladder_noise(jax.random.key(3), lat.shape)
        ts = jnp.asarray([600, 400, 200], jnp.int32)
        text = g.get_text_embeds(["a", "neg", "inv"])
        scores = mtsd.denoise_ladder(
            g.mods, lat, noise, ts, text, n_rungs=3, cfg=7.5
        )
        assert len(scores) == 3
        final_lat = scores[-1][2]
        assert final_lat.shape == lat.shape
        assert np.isfinite(np.asarray(final_lat)).all()
        # the walk started from the t=600 noised latent, not the clean one
        assert not np.allclose(np.asarray(final_lat), np.asarray(lat))


class TestControlNet:
    def test_zero_init_controlnet_is_noop_and_loader_path_runs(self):
        """Fresh (zero-conv) ControlNet residuals must leave the UNet
        output bit-identical — and the conditioned call path must run."""
        import jax
        import jax.numpy as jnp

        from dreamscene_tpu.guidance import mtsd
        from dreamscene_tpu.utils.config import GuidanceParams

        g = mtsd.make_tiny_guidance(GuidanceParams(), with_controlnet=True)
        mods = g.mods
        lat = jnp.ones((2, 8, 8, 4)) * 0.3
        t = jnp.asarray([7, 7], jnp.int32)
        ctx = jnp.ones((2, 4, 32)) * 0.1
        cond = jnp.ones((2, 16, 16, 3)) * 0.5

        eps_plain = mods.unet_apply(mods.unet_params, lat, t, ctx)
        res = mods.controlnet_apply(mods.controlnet_params, lat, t, ctx, cond)
        eps_ctrl = mods.unet_apply(mods.unet_params, lat, t, ctx,
                                   control_res=res)
        np.testing.assert_array_equal(np.asarray(eps_plain),
                                      np.asarray(eps_ctrl))

        # non-zero residuals DO change the output (the hook is live)
        down, mid = res
        down = tuple(d + 0.1 for d in down)
        eps2 = mods.unet_apply(mods.unet_params, lat, t, ctx,
                               control_res=(down, mid + 0.1))
        assert not np.allclose(np.asarray(eps_plain), np.asarray(eps2))

    def test_ladder_scores_with_cond_image(self):
        import jax
        import jax.numpy as jnp

        from dreamscene_tpu.guidance import mtsd
        from dreamscene_tpu.utils.config import GuidanceParams

        g = mtsd.make_tiny_guidance(GuidanceParams(), with_controlnet=True)
        lat = jnp.zeros((1, 8, 8, 4))
        noise = mtsd.make_ladder_noise(jax.random.key(0), lat.shape)
        text = g.get_text_embeds(["a", "n", "i"])
        ts = jnp.asarray([300], jnp.int32)
        cond = jnp.ones((1, 16, 16, 3)) * 0.5
        scores = mtsd.ladder_scores(g.mods, lat, noise, ts, text, n_rungs=1,
                                    cond_image=cond)
        assert len(scores) == 2
        for _, (c, u, b), _lat in scores:
            assert np.isfinite(np.asarray(c)).all()

    def test_use_controlnet_gate(self):
        from dreamscene_tpu.guidance import mtsd
        from dreamscene_tpu.utils.config import (
            GuidanceParams, OptimizationParams)

        gp = GuidanceParams()
        gp.controlnet_ratio = 1.0
        op = OptimizationParams()
        op.use_control_net_iter = 10
        g = mtsd.make_tiny_guidance(gp, with_controlnet=True)
        assert not g.use_controlnet(5, op)      # before the iter gate
        assert g.use_controlnet(11, op)         # ratio=1.0 -> always on
        g2 = mtsd.make_tiny_guidance(gp)        # no controlnet loaded
        assert not g2.use_controlnet(11, op)


class TestValidationHarness:
    def test_tiny_smoke_writes_artifacts(self, tmp_path):
        from dreamscene_tpu.guidance import mtsd
        from dreamscene_tpu.guidance.validate import run_validation
        from dreamscene_tpu.utils.config import GuidanceParams

        g = mtsd.make_tiny_guidance(GuidanceParams(), downscale=8)
        report = run_validation(g, str(tmp_path), size=64, check_bf16=True)
        assert (tmp_path / "decode_probe.jpg").exists()
        assert (tmp_path / "roundtrip.jpg").exists()
        assert (tmp_path / "ladder_grid.jpg").exists()
        assert (tmp_path / "report.json").exists()
        assert report["decode_finite"]
        assert report["csd_grad_nan"] == 0
        assert np.isfinite(report["roundtrip_psnr_db"])
