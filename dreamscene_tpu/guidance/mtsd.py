"""Formation Pattern Sampling (FPS / MTSD) guidance — TPU-native.

Re-implements the reference's multi-timestep score-distillation guidance
(reference: guidance/multitime_sd_utils.py:44-647) as pure-functional jnp:

  * `ladder_scores` — DDIM-*inversion* ladder: from t=0 walk the noise
    level UP through a random timestep ladder, running the UNet on the
    3-way (cond | uncond | null "inverse") batch at every rung and stepping
    with the **null** prediction (reference addnoise_with_cfg,
    multitime_sd_utils.py:486-558, pred_with_uncond=False).
  * `csd_grad` — the CSD-style gradient
    w(alpha_t) * (uncond + s*(cond - uncond) - blank), averaged over rungs
    (multitime_sd_utils.py:266-289).
  * `specify_gradient_loss` — the SpecifyGradient custom-grad trick
    (multitime_sd_utils.py:23-36) expressed as sum(latents * stop_grad(g)).
  * `pseudo_gt_images` — decoded x0-hat of the first rung, the pseudo-GT
    for reconstructive refinement (train_step_gt,
    multitime_sd_utils.py:340-484).

The ladder *length* (1..4 rungs) is host-random and static per jit
(<=4 compiled variants); the timestep *values* are traced, so fresh random
ladders do not recompile. The whole render->encode->ladder->grad chain
traces into one XLA program — there is no renderer/guidance device split
(the reference needed a second GPU for this, scene_trainer.py:27-34).
"""

from __future__ import annotations

import dataclasses
import zlib
from typing import Any, Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from dreamscene_tpu.ops.ddim import (
    DiffusionSchedule,
    add_noise,
    ddim_step,
    make_schedule,
    pred_original,
)

# latent -> approximate RGB preview (multitime_sd_utils.py:135-144)
RGB_LATENT_FACTORS = np.array(
    [
        [0.298, 0.207, 0.208],
        [0.187, 0.286, 0.173],
        [-0.158, 0.189, 0.264],
        [-0.184, -0.271, -0.473],
    ],
    np.float32,
)


class GuidanceModules(NamedTuple):
    """Pluggable SD backbone: apply-functions + params."""

    unet_apply: Callable  # (params, latents_nhwc, t[B], ctx[B,L,D]) -> eps
    unet_params: Any
    vae_encode: Callable  # (params, images_nhwc in [-1,1]) -> moments [..,2C]
    vae_encode_params: Any
    vae_decode: Callable  # (params, latents_nhwc) -> images_nhwc in [-1,1]
    vae_decode_params: Any
    scaling_factor: float
    schedule: DiffusionSchedule
    downscale: int = 8    # image->latent spatial factor (8 for SD)
    # optional depth ControlNet: (params, latents, t, ctx, cond_nhwc) ->
    # (down_residuals, mid_residual). NOTE the reference only ever LOADS
    # its controlnet_depth (multitime_sd_utils.py:88-91) and never invokes
    # it; here the use_control_net_iter hook actually conditions the UNet.
    controlnet_apply: Any = None
    controlnet_params: Any = None


def mods_params(mods: GuidanceModules):
    """The weight pytrees of a GuidanceModules, for passing into jitted
    step functions as ARGUMENTS. Closing over `mods` inside a jit bakes
    the full SD stack (3.4 GB at SD2.1 scale) into the lowered module as
    captured constants — every re-jit (capacity/ladder change) then
    re-serializes the weights, which the remote-compile tunnel turns
    into multi-minute compiles."""
    return dict(unet=mods.unet_params, vae_enc=mods.vae_encode_params,
                vae_dec=mods.vae_decode_params, cn=mods.controlnet_params)


def with_params(mods: GuidanceModules, p) -> GuidanceModules:
    """Rebind the weight pytrees (inverse of `mods_params`) — used at the
    top of a jitted step to reconstruct the callable+param bundle from
    traced arguments."""
    return mods._replace(
        unet_params=p["unet"], vae_encode_params=p["vae_enc"],
        vae_decode_params=p["vae_dec"], controlnet_params=p["cn"],
    )


def encode_images(mods: GuidanceModules, images_nchw, key):
    """VAE-encode [B,3,H,W] images in [0,1] -> latents [B,h,w,4]
    (reference encode_imgs, multitime_sd_utils.py:639-647; posterior
    sampled)."""
    x = jnp.transpose(images_nchw, (0, 2, 3, 1)) * 2.0 - 1.0
    moments = mods.vae_encode(mods.vae_encode_params, x)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    latents = mean + jnp.exp(0.5 * logvar) * eps
    return latents * mods.scaling_factor


def decode_latents(mods: GuidanceModules, latents):
    """latents [B,h,w,4] -> images [B,3,H,W] in [0,1] (reference
    decode_latents, multitime_sd_utils.py:630-637)."""
    x = mods.vae_decode(mods.vae_decode_params, latents / mods.scaling_factor)
    x = jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)
    return jnp.transpose(x, (0, 3, 1, 2))


def make_ladder_noise(key, shape):
    """noise = randn(latents) + 0.1 * randn per-channel offset shared
    across the batch (multitime_sd_utils.py:205-231)."""
    k1, k2 = jax.random.split(key)
    base = jax.random.normal(k1, shape)
    offset = jax.random.normal(k2, (1, 1, 1, shape[-1]))
    return base + 0.1 * offset


def build_rand_ladder(rng: np.random.Generator, jump_range, stage_range,
                      stage_step_rate: float, max_rungs: int = 4) -> list[int]:
    """Host-side random timestep ladder (multitime_sd_utils.py:239-265):
    cumulative random jumps in jump_range, capped by max_step which anneals
    down with training progress."""
    jump_min, jump_max = int(jump_range[0]), int(jump_range[1])
    stage_step = stage_range[1] - stage_range[0]
    max_step = stage_range[1] - int(stage_step * stage_step_rate)
    rand_list: list[int] = []
    for _ in range(max_rungs):
        jump = int(rng.integers(jump_min, jump_max))
        if not rand_list:
            rand_list.append(jump)
        elif rand_list[-1] + jump < max_step:
            rand_list.append(rand_list[-1] + jump)
        else:
            break
    return rand_list


def ladder_scores(
    mods: GuidanceModules,
    latents,            # [B, h, w, 4]
    noise,              # [B, h, w, 4]
    ts,                 # [R] int32 traced rung timesteps (t=0 prepended here)
    text_emb,           # [3B, L, D]  (cond | uncond | inverse)
    n_rungs: int,       # static = len(ts)
    eta: float = 0.0,
    cond_image=None,    # [B, H, W, C] NHWC depth hint -> ControlNet
):
    """DDIM-inversion ladder; returns list of (t, (cond, uncond, blank),
    noisy_latent) for t in [0, ts...]. No gradients flow (wrap in
    stop_gradient upstream)."""
    b = latents.shape[0]
    lat = add_noise(mods.schedule, latents, noise, jnp.zeros((b,), jnp.int32))
    cond3 = _cond3(mods, cond_image)
    outs = []
    t_prev = jnp.zeros((), jnp.int32)
    for i in range(n_rungs + 1):
        t_i = t_prev if i == 0 else ts[i - 1]
        inp = jnp.concatenate([lat, lat, lat], axis=0)
        t_b = jnp.full((3 * b,), t_i, jnp.int32)
        eps = _apply_unet(mods, inp, t_b, text_emb, cond3)
        cond, uncond, blank = jnp.split(eps, 3, axis=0)
        outs.append((t_i, (cond, uncond, blank), lat))
        if i < n_rungs:
            t_next = ts[i]
            delta = -(t_next - t_i)
            lat, _ = ddim_step(
                mods.schedule, blank, jnp.full((b,), t_i), lat, delta, eta
            )
            t_prev = t_next
    return outs


def _cond3(mods: GuidanceModules, cond_image):
    """Tile the ControlNet hint across the (cond|uncond|inverse) triple;
    None (or no controlnet loaded) disables conditioning."""
    if cond_image is None or mods.controlnet_apply is None:
        return None
    return jnp.concatenate([cond_image] * 3, axis=0)


def _apply_unet(mods: GuidanceModules, inp, t_b, text_emb, cond3):
    """UNet call with optional ControlNet residual injection (the
    diffusers down/mid additional-residuals contract; reference loads the
    depth ControlNet at multitime_sd_utils.py:88-91)."""
    if cond3 is None:
        return mods.unet_apply(mods.unet_params, inp, t_b, text_emb)
    res = mods.controlnet_apply(
        mods.controlnet_params, inp, t_b, text_emb, cond3
    )
    return mods.unet_apply(
        mods.unet_params, inp, t_b, text_emb, control_res=res
    )


def csd_grad(mods: GuidanceModules, scores, guidance_scale: float,
             grad_scale: float = 1.0):
    """CSD gradient accumulated over the non-zero rungs
    (multitime_sd_utils.py:266-289)."""
    rungs = scores[1:]  # skip t=0 entry
    ratio = 1.0 / max(len(rungs), 1)
    ac = mods.schedule.alphas_cumprod
    total = 0.0
    for t_i, (cond, uncond, blank), _ in rungs:
        a = ac[t_i]
        w = jnp.sqrt((1.0 - a) / a)
        pred_noise = uncond + guidance_scale * (cond - uncond)
        g = w * (pred_noise - blank)
        total = total + ratio * jnp.nan_to_num(grad_scale * g)
    return total


def specify_gradient_loss(latents, grad):
    """loss whose d/d latents == grad (SpecifyGradient,
    multitime_sd_utils.py:23-36)."""
    return jnp.sum(latents * jax.lax.stop_gradient(grad))


def pseudo_gt_images(mods: GuidanceModules, scores, guidance_scale: float):
    """Decoded x0-hat of the first non-zero rung under CFG — the pseudo
    ground truth for reconstructive refinement (train_step_gt,
    multitime_sd_utils.py:446-458)."""
    t_i, (cond, uncond, _), lat = scores[1]
    b = lat.shape[0]
    pred_noise = uncond + guidance_scale * (cond - uncond)
    x0 = pred_original(mods.schedule, pred_noise, jnp.full((b,), t_i), lat)
    return decode_latents(mods, x0)


def denoise_ladder(
    mods: GuidanceModules,
    latents,
    noise,
    ts,                  # [R] descending-start ladder (ts[0] = start t)
    text_emb,
    n_rungs: int,
    cfg: float = 1.0,
    eta: float = 0.0,
    is_noisy_latent: bool = False,
    cond_image=None,
):
    """Full CFG *denoising* walk (reference denoise_with_cfg,
    multitime_sd_utils.py:560-628): noise to ts[0], then step through the
    ladder using the CFG-combined prediction. Returns the score list like
    ladder_scores; the final latent is scores[-1][2]."""
    b = latents.shape[0]
    if is_noisy_latent:
        lat = latents
    else:
        lat = add_noise(mods.schedule, latents, noise, jnp.full((b,), ts[0]))
    cond3 = _cond3(mods, cond_image)
    outs = []
    t_i = ts[0]
    for i in range(n_rungs):
        inp = jnp.concatenate([lat, lat, lat], axis=0)
        t_b = jnp.full((3 * b,), t_i, jnp.int32)
        eps = _apply_unet(mods, inp, t_b, text_emb, cond3)
        cond, uncond, blank = jnp.split(eps, 3, axis=0)
        outs.append((t_i, (cond, uncond, blank), lat))
        pred_noise = uncond + cfg * (cond - uncond)
        if i + 1 < n_rungs:
            t_next = ts[i + 1]
            lat, _ = ddim_step(
                mods.schedule, pred_noise, jnp.full((b,), t_i), lat,
                t_i - t_next, eta,
            )
            t_i = t_next
    return outs


def guidance_viz_grid(mods: GuidanceModules, images, depth, alpha, latents,
                      grad, scores, guidance_scale: float):
    """Debug grid like the reference's per-interval dumps
    (multitime_sd_utils.py:291-337): rendered rgb / depth / alpha /
    saturation / latent-RGB preview / |grad| heatmap / decoded x0-hat per
    rung. images [B,3,H,W]; depth/alpha [H,W]; latents/grad [B,h,w,4].
    Returns a list of [3,H,W] arrays for utils.media.save_image_grid."""
    import jax.image

    h, w = images.shape[-2:]
    rows = [images[0],
            jnp.repeat(depth[None], 3, 0),
            jnp.repeat(alpha[None], 3, 0),
            jnp.repeat(rgb2sat(images[:1])[0], 3, 0)]
    lat_rgb = jnp.transpose(lat2rgb(latents[0]), (2, 0, 1))
    rows.append(jax.image.resize(lat_rgb, (3, h, w), "nearest"))
    g = jnp.abs(grad[0]).mean(-1)                 # [h, w]
    g = g / jnp.maximum(g.max(), 1e-8)
    rows.append(jnp.repeat(jax.image.resize(g, (h, w), "bilinear")[None], 3, 0))
    for t_i, (cond, uncond, _), lat in scores[1:]:
        pred = uncond + guidance_scale * (cond - uncond)
        x0 = pred_original(
            mods.schedule, pred, jnp.full((lat.shape[0],), t_i), lat
        )
        dec = decode_latents(mods, x0[:1])[0]
        rows.append(jax.image.resize(dec, (3, h, w), "bilinear"))
    return [np.asarray(r) for r in rows]


def lat2rgb(latents):
    """Latent -> approximate RGB (viz; reference utils/viz_utils.py:6-12).
    latents NHWC."""
    return jnp.clip(latents @ jnp.asarray(RGB_LATENT_FACTORS), 0.0, 1.0)


def rgb2sat(img_nchw, t=None):
    """Saturation map (reference utils/viz_utils.py:15-21)."""
    mx = jnp.max(img_nchw, axis=1, keepdims=True) + 1e-5
    mn = jnp.min(img_nchw, axis=1, keepdims=True)
    sat = (mx - mn) / mx
    if t is not None:
        sat = (1 - t) * sat
    return sat


def horizontal_flip(flip: jnp.ndarray, *tensors_nchw):
    """Batch-shared random horizontal flip (reference augmentation,
    multitime_sd_utils.py:146-162). flip: traced bool scalar."""
    return tuple(
        jnp.where(flip, x[..., ::-1], x) for x in tensors_nchw
    )


# --------------------------------------------------------------------------
# stateful wrapper used by the trainers
# --------------------------------------------------------------------------

@dataclasses.dataclass
class MTSD:
    """Host-side orchestration mirroring the reference StableDiffusion
    class surface (curriculum state + seeded noise + text embeds)."""

    mods: GuidanceModules
    text_encode: Callable  # (list[str]) -> jnp [B, L, D]
    guidance_opt: Any
    # curriculum state (reference: multitime_sd_utils.py:123-127)
    stage_range: tuple = (400, 850)
    jump_range: tuple = (175, 225)

    def __post_init__(self):
        self.num_train_timesteps = self.mods.schedule.num_train_timesteps
        self.min_step = int(self.num_train_timesteps * self.guidance_opt.t_range[0])
        self.max_step = int(self.num_train_timesteps * self.guidance_opt.t_range[1])
        self.stage_refine_t = self.guidance_opt.stage_refine_t
        self._rng = np.random.default_rng(self.guidance_opt.noise_seed)
        self._noise_key = jax.random.key(self.guidance_opt.noise_seed)
        self._noise_temp = None

    def get_text_embeds(self, prompts) -> jnp.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        return self.text_encode(prompts)

    def sample_ladder(self, stage_step_rate: float) -> np.ndarray:
        return np.asarray(
            build_rand_ladder(
                self._rng, self.jump_range, self.stage_range, stage_step_rate
            ),
            np.int32,
        )

    def latent_shape(self, batch: int, height: int, width: int):
        f = self.mods.downscale
        return (batch, height // f, width // f, 4)

    def next_noise(self, latent_shape) -> jnp.ndarray:
        """Seeded ladder noise; honors fix_noise (multitime_sd_utils.py:
        205-231)."""
        if self.guidance_opt.fix_noise:
            if self._noise_temp is None or self._noise_temp.shape != latent_shape:
                self._noise_key, sub = jax.random.split(self._noise_key)
                self._noise_temp = make_ladder_noise(sub, latent_shape)
            return self._noise_temp
        self._noise_key, sub = jax.random.split(self._noise_key)
        return make_ladder_noise(sub, latent_shape)

    def next_vae_key(self):
        self._noise_key, sub = jax.random.split(self._noise_key)
        return sub

    def should_flip(self) -> bool:
        return bool(self._rng.random() < 0.5)

    def use_controlnet(self, step: int, optim_params) -> bool:
        """Host-side depth-ControlNet gate (reference
        training/object_trainer.py:343-348 / scene_trainer.py:835-840:
        step > use_control_net_iter and a controlnet_ratio coin-flip).
        False whenever no ControlNet is loaded."""
        if self.mods.controlnet_apply is None:
            return False
        if step <= getattr(optim_params, "use_control_net_iter", 1 << 30):
            return False
        ratio = getattr(self.guidance_opt, "controlnet_ratio", 0.5)
        return bool(self._rng.random() < ratio)


def make_tiny_guidance(guidance_opt, latent_channels: int = 4,
                       context_dim: int = 32, seed: int = 0,
                       with_controlnet: bool = False,
                       downscale: int | None = None,
                       unet_config=None, vae_config=None,
                       token_len: int = 4):
    """Randomly-initialized SD stack for tests/dry-runs/benchmarks.

    Defaults to the miniature configs; pass `unet_config`/`vae_config`
    (e.g. sd21_unet_config() + VAEConfig()) for a FULL-SIZE random-init
    stack whose compute cost is identical to real SD weights
    (scripts/bench_fps_step.py uses this for the 50K-object FPS-loop
    measurement, BASELINE.json measurement config #2).

    downscale: override the image->latent factor (default 2 from the
    2-block tiny VAE; pass 8 for SD-realistic latent shapes — used by the
    full-resolution multichip dryrun, where 512^2 images must reach the
    UNet as 64^2 latents like real SD)."""
    import dataclasses as _dc

    import flax.linen as nn

    from dreamscene_tpu.guidance.sd_flax import (
        FlaxControlNet,
        FlaxUNet2DCondition,
        FlaxVAEDecoder,
        FlaxVAEEncoder,
        tiny_unet_config,
        tiny_vae_config,
    )

    ucfg = unet_config or tiny_unet_config()
    vcfg = vae_config or tiny_vae_config()
    if downscale is not None and vae_config is None:
        n_blocks = max(int(np.log2(downscale)), 0) + 1
        vcfg = _dc.replace(
            vcfg, block_out_channels=(32,) * n_blocks, layers_per_block=1
        )
    unet = FlaxUNet2DCondition(ucfg)
    enc = FlaxVAEEncoder(vcfg)
    dec = FlaxVAEDecoder(vcfg)
    key = jax.random.key(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    up = unet.init(k1, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, token_len, ucfg.cross_attention_dim)))
    ep = enc.init(k2, jnp.zeros((1, 32, 32, 3)))
    dp = dec.init(k3, jnp.zeros((1, 8, 8, 4)))
    downscale = 2 ** (len(vcfg.block_out_channels) - 1)

    cn_apply = cn_params = None
    if with_controlnet:
        cn = FlaxControlNet(ucfg, downscale=downscale)
        cn_params = cn.init(
            k4, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, token_len, ucfg.cross_attention_dim)),
            jnp.zeros((1, 8 * downscale, 8 * downscale, 3)),
        )
        cn_apply = cn.apply

    mods = GuidanceModules(
        unet_apply=unet.apply,
        unet_params=up,
        vae_encode=enc.apply,
        vae_encode_params=ep,
        vae_decode=dec.apply,
        vae_decode_params=dp,
        scaling_factor=vcfg.scaling_factor,
        schedule=make_schedule(),
        downscale=downscale,
        controlnet_apply=cn_apply,
        controlnet_params=cn_params,
    )

    rng = np.random.default_rng(seed)
    emb_cache = {}

    def text_encode(prompts):
        rows = []
        for p in prompts:
            if p not in emb_cache:
                # stable across processes: Python's str hash() is salted
                # by PYTHONHASHSEED, which made tiny-guidance runs (and
                # the multichip dryrun's loss) non-reproducible
                h = zlib.crc32(p.encode("utf-8")) % (2**31)
                emb_cache[p] = np.random.default_rng(h).normal(
                    size=(token_len, ucfg.cross_attention_dim)
                ).astype(np.float32)
            rows.append(emb_cache[p])
        return jnp.asarray(np.stack(rows))

    return MTSD(mods=mods, text_encode=text_encode, guidance_opt=guidance_opt)
