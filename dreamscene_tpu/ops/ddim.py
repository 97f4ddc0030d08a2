"""DDIM diffusion schedule + step math, pure jnp (no diffusers).

TPU-native port of the reference's generalized DDIM update
(reference: guidance/sd_step.py:31-295): `ddim_step` supports an arbitrary
`delta_timestep`, *including negative deltas* which realize the DDIM
inversion used by Formation Pattern Sampling's `addnoise_with_cfg`
(guidance/multitime_sd_utils.py:486-558). Everything is jittable — the
whole guidance ladder traces into one XLA program.

Schedule defaults = Stable Diffusion's scaled-linear betas over 1000 train
timesteps (diffusers DDIMScheduler config for SD 1.x/2.x-base).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    alphas_cumprod: jnp.ndarray       # [T]
    final_alpha_cumprod: jnp.ndarray  # [] (= alphas_cumprod[0] here)
    num_train_timesteps: int
    prediction_type: str              # "epsilon" | "v_prediction" | "sample"


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    prediction_type: str = "epsilon",
    set_alpha_to_one: bool = False,
) -> DiffusionSchedule:
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps)
    else:
        raise ValueError(beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
    final = np.float32(1.0) if set_alpha_to_one else alphas_cumprod[0]
    return DiffusionSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod),
        final_alpha_cumprod=jnp.asarray(final),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )


def _expand(x, like):
    return x.reshape((-1,) + (1,) * (like.ndim - 1))


def _alpha_at(sched: DiffusionSchedule, t):
    """alphas_cumprod[t] with t < 0 mapping to final_alpha_cumprod."""
    t = jnp.asarray(t)
    a = sched.alphas_cumprod[jnp.clip(t, 0, sched.num_train_timesteps - 1)]
    return jnp.where(t >= 0, a, sched.final_alpha_cumprod)


def add_noise(sched: DiffusionSchedule, sample, noise, t):
    """x_t = sqrt(ac_t) x_0 + sqrt(1-ac_t) eps (reference:
    sd_step.py:31-56)."""
    ac = _expand(_alpha_at(sched, t), sample)
    return jnp.sqrt(ac) * sample + jnp.sqrt(1.0 - ac) * noise


def pred_original(sched: DiffusionSchedule, model_output, t, sample):
    """Recover x_0-hat from the model output (reference:
    sd_step.py:225-295, DDIM/DDPM branch; SD does not clip samples)."""
    ac = _expand(_alpha_at(sched, t), sample)
    bp = 1.0 - ac
    if sched.prediction_type == "epsilon":
        return (sample - jnp.sqrt(bp) * model_output) / jnp.sqrt(ac)
    if sched.prediction_type == "sample":
        return model_output
    if sched.prediction_type == "v_prediction":
        return jnp.sqrt(ac) * sample - jnp.sqrt(bp) * model_output
    raise ValueError(sched.prediction_type)


def _get_variance(sched: DiffusionSchedule, t, prev_t):
    """diffusers DDIMScheduler._get_variance."""
    ac_t = _alpha_at(sched, t)
    ac_p = _alpha_at(sched, prev_t)
    bp_t = 1.0 - ac_t
    bp_p = 1.0 - ac_p
    return (bp_p / bp_t) * (1.0 - ac_t / ac_p)


def ddim_step(
    sched: DiffusionSchedule,
    model_output,
    t,
    sample,
    delta_timestep,
    eta: float = 0.0,
    variance_noise=None,
):
    """Generalized DDIM update x_t -> x_{t - delta} (reference:
    sd_step.py:60-222). Negative delta_timestep runs the chain *upward*
    (DDIM inversion). Returns (prev_sample, pred_original_sample)."""
    t = jnp.asarray(t)
    prev_t = t - jnp.asarray(delta_timestep)

    ac_t = _expand(_alpha_at(sched, t), sample)
    ac_p = _expand(_alpha_at(sched, prev_t), sample)
    bp_t = 1.0 - ac_t

    if sched.prediction_type == "epsilon":
        x0 = (sample - jnp.sqrt(bp_t) * model_output) / jnp.sqrt(ac_t)
        eps = model_output
    elif sched.prediction_type == "sample":
        x0 = model_output
        eps = (sample - jnp.sqrt(ac_t) * x0) / jnp.sqrt(bp_t)
    elif sched.prediction_type == "v_prediction":
        x0 = jnp.sqrt(ac_t) * sample - jnp.sqrt(bp_t) * model_output
        eps = jnp.sqrt(ac_t) * model_output + jnp.sqrt(bp_t) * sample
    else:
        raise ValueError(sched.prediction_type)

    variance = jnp.abs(_get_variance(sched, t, prev_t))
    std_dev_t = eta * _expand(variance, sample)
    std_dev_t = jnp.sqrt(jnp.minimum((1.0 - ac_p) / 2.0, std_dev_t))

    direction = jnp.sqrt(jnp.maximum(1.0 - ac_p - std_dev_t**2, 0.0)) * eps
    prev_sample = jnp.sqrt(ac_p) * x0 + direction
    if eta > 0 and variance_noise is not None:
        prev_sample = prev_sample + std_dev_t * variance_noise
    prev_sample = jnp.nan_to_num(prev_sample)
    return prev_sample, x0
