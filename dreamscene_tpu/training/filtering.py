"""Importance-based splat filtering, shared by the object trainer's
periodic `gaussian_filtering` and scene assembly's `compress_objects`
(reference: scene_gaussian.py:1081-1103 `gaussian_filtering` +
:222-238 `compress_objects` — the latter is defined but never invoked in
the reference; here it actually runs before placement).

Importance of a splat = sum over 48 sphere-sampled views of its blend
weight (T*alpha summed over pixels), harvested as the color-probe VJP of
the Pallas backward kernel (ops/rasterizer.score_render) — no separate
scoring kernel. The prune keeps the top (1 - prune_decay*prune_percent)
quantile of volume^v_pow * importance.
"""

from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

from dreamscene_tpu.cameras import sampling as S
from dreamscene_tpu.models import densify as D
from dreamscene_tpu.models.gaussians import GaussianState, num_active

logger = logging.getLogger("dreamscene_tpu")


def importance_filter(
    state: GaussianState,
    rng: np.random.Generator,
    pose_args,
    bg_color=(0.0, 0.0, 0.0),
    prune_percent: float = 0.5,
    v_pow: float = 0.1,
    prune_decay: float = 0.8,
    n_views: int = 48,
    interpret: bool = False,
) -> GaussianState:
    """Score splats over sphere cameras and prune the least important
    fraction (reference scene_gaussian.py:1046-1103 semantics: v_list =
    (volume/quantile90)^v_pow * accumulated blend weight)."""
    from dreamscene_tpu.rendering import score_render

    cams = S.load_sphere_cam(rng, pose_args, size=n_views)
    imp = jnp.zeros((state.capacity,), jnp.float32)
    for cam in cams:
        out = score_render(state, cam, bg_color=bg_color, interpret=interpret)
        imp = imp + out["important_score"]
    volume = jnp.prod(state.get_scaling, axis=1) * state.aux.active
    n_act = num_active(state)
    sorted_volume = jnp.sort(volume)[::-1]
    kth = sorted_volume[jnp.minimum(int(0.9 * n_act), state.capacity - 1)]
    v_list = jnp.power(volume / jnp.maximum(kth, 1e-12), v_pow) * imp
    n0 = num_active(state)
    new_state = D.prune_by_importance(
        state, prune_decay * prune_percent, v_list
    )
    logger.debug("importance_filter: %d -> %d", n0, num_active(new_state))
    return new_state
