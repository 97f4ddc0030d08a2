"""Render entry points: object_render / scene_render / score_render.

TPU-native equivalents of the reference SceneGaussian render wrappers
(reference: scene_gaussian.py:895-1044 object_render, 673-893 scene_render,
546-671 score_render). Responsibilities:
  * activations -> rasterizer inputs (exp / sigmoid / normalize),
  * train-time augmentations: SH-degree drop, random/black background,
    SH noise, scale noise (scene_gaussian.py:723-732, 850-857),
  * multi-object concatenation with per-object gradient segments
    (replacing the reference's tail-slice densification bookkeeping,
    add_densification_stats_div, gs_renderer.py:1067-1080),
  * depth -> normalized disparity postprocess (scene_gaussian.py:871-881).

Augmentation randomness is host-side (numpy Generator) so each call traces
with static shapes; the jitted path sees only arrays and static flags.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from dreamscene_tpu.cameras.camera import Camera
from dreamscene_tpu.models.gaussians import GaussianState
from dreamscene_tpu.ops.rasterizer import render as raster_render


@dataclasses.dataclass(frozen=True)
class RenderAug:
    """Resolved per-call augmentation (host-sampled)."""

    sh_degree_drop: bool = False      # render at degree 0
    bg_color: tuple = (1.0, 1.0, 1.0)
    shs_noise: float = 0.0
    scale_noise: float = 0.0
    seed: int = 0


def sample_aug(rng: np.random.Generator, model_args, bg_color=(0.0, 0.0, 0.0),
               test: bool = False) -> RenderAug:
    """Sample the reference's train-time augmentations
    (scene_gaussian.py:723-732: SH drop with sh_deg_aug_ratio; bg aug with
    bg_aug_ratio then 50/50 random color vs black; 850-857: shs noise with
    shs_aug_ratio at std sqrt(0.2)*|shs|, scale noise with scale_aug_ratio
    at std sqrt(0.2)*scale/4)."""
    if test:
        return RenderAug(bg_color=tuple(bg_color))
    sh_drop = rng.random() < model_args.sh_deg_aug_ratio
    bg = tuple(bg_color)
    if rng.random() < model_args.bg_aug_ratio:
        if rng.random() < 0.5:
            bg = tuple(rng.random(3).tolist())
        else:
            bg = (0.0, 0.0, 0.0)
    shs_noise = 1.0 if rng.random() < model_args.shs_aug_ratio else 0.0
    scale_noise = 1.0 if rng.random() < model_args.scale_aug_ratio else 0.0
    return RenderAug(
        sh_degree_drop=sh_drop, bg_color=bg, shs_noise=shs_noise,
        scale_noise=scale_noise, seed=int(rng.integers(0, 2**31)),
    )


def _camera_arrays(camera: Camera):
    return dict(
        viewmatrix=jnp.asarray(camera.world_view_transform),
        projmatrix=jnp.asarray(camera.full_proj_transform),
        campos=jnp.asarray(camera.camera_center),
        tanfovx=camera.tanfovx,
        tanfovy=camera.tanfovy,
        width=camera.width,
        height=camera.height,
    )


def _postprocess(out, camera):
    """depth+alpha -> normalized disparity, returned as "depth" like the
    reference (scene_gaussian.py:871-881): disp = focal/(depth + 10*alpha
    + 1e-5), min taken over the empty (alpha<=0.1) region."""
    raw_depth, alpha = out["depth"], out["alpha"]
    focal = 1.0 / (2.0 * camera.tanfovx)
    disp = focal / (raw_depth + alpha * 10.0 + 1e-5)
    empty = alpha <= 0.1
    min_d = jnp.where(
        jnp.any(empty), jnp.min(jnp.where(empty, disp, jnp.inf)), jnp.min(disp)
    )
    # denominator guard: when every empty pixel is EXACTLY empty
    # (depth=0, alpha=0 — e.g. capacity overflow dropped a region's
    # entries), max(disp) == min_d to the last bit and the reference's
    # unguarded divide (scene_gaussian.py:658,881) is 0/0 = NaN; the
    # guard is exact whenever the denominator is healthy.
    disp = jnp.clip(
        (disp - min_d) / jnp.maximum(jnp.max(disp) - min_d, 1e-12),
        0.0, 1.0)
    out["raw_depth"] = raw_depth
    out["depth"] = disp
    return out


def prepare_inputs(state: GaussianState, aug: RenderAug | None = None):
    """Activations + augmentations -> rasterizer inputs
    (noise semantics: scene_gaussian.py:850-857)."""
    shs = state.get_features                    # [C, K, 3]
    scales = state.get_scaling
    if aug is not None and (aug.shs_noise > 0 or aug.scale_noise > 0):
        key = jax.random.key(aug.seed)
        k1, k2 = jax.random.split(key)
        if aug.shs_noise > 0:
            shs = shs + jax.random.normal(k1, shs.shape) * (0.2**0.5) * shs
        if aug.scale_noise > 0:
            scales = jnp.maximum(
                scales + jax.random.normal(k2, scales.shape) * (0.2**0.5) * scales / 4,
                0.0,
            )
    return dict(
        means3d=state.get_xyz,
        scales=scales,
        quats=state.get_rotation,
        opacities=state.get_opacity[:, 0],
        shs=shs,
        valid_mask=state.aux.active,
    )


def object_render(
    state: GaussianState,
    camera: Camera,
    bg_color=None,
    aug: RenderAug | None = None,
    test: bool = False,
    means2d_probe=None,
    capacity_mult: int = 4,
    interpret: bool = False,
):
    """Single-model render (reference object_render,
    scene_gaussian.py:895-1044)."""
    inputs = prepare_inputs(state, None if test else aug)
    sh_degree = 0 if (aug and aug.sh_degree_drop and not test) else state.active_sh_degree
    bg = jnp.asarray(
        bg_color if bg_color is not None else (aug.bg_color if aug else (0, 0, 0)),
        jnp.float32,
    )
    out = raster_render(
        **inputs,
        **_camera_arrays(camera),
        bg=bg,
        sh_degree=sh_degree,
        capacity=capacity_mult * state.capacity,
        means2d_probe=means2d_probe,
        interpret=interpret,
    )
    return _postprocess(out, camera)


def score_render(
    state: GaussianState,
    camera: Camera,
    bg_color=(0.0, 0.0, 0.0),
    capacity_mult: int = 4,
    interpret: bool = False,
):
    """Render + per-splat importance (reference score_render,
    scene_gaussian.py:546-671)."""
    from dreamscene_tpu.ops.rasterizer import score_render as _score

    inputs = prepare_inputs(state, None)
    out = _score(
        **inputs,
        **_camera_arrays(camera),
        bg=jnp.asarray(bg_color, jnp.float32),
        sh_degree=state.active_sh_degree,
        capacity=capacity_mult * state.capacity,
        interpret=interpret,
    )
    return _postprocess(out, camera)


def concat_states(states: Sequence[GaussianState]):
    """Concatenate models for a joint scene render; returns (inputs dict,
    segment offsets) — segment i covers state i's capacity rows, for
    slicing per-object probe gradients/radii back out."""
    parts = [prepare_inputs(s) for s in states]
    offsets = np.cumsum([0] + [s.capacity for s in states])
    cat = {
        k: jnp.concatenate([p[k] for p in parts], axis=0)
        for k in parts[0]
    }
    return cat, offsets


def scene_render(
    states: Sequence[GaussianState],
    camera: Camera,
    bg_color=None,
    aug: RenderAug | None = None,
    test: bool = False,
    means2d_probe=None,
    capacity: int | None = None,
    interpret: bool = False,
):
    """Joint multi-model render (reference scene_render,
    scene_gaussian.py:673-893): concat of visible objects' tensors, one
    rasterizer pass. sh degree = min over models' active degrees."""
    inputs, offsets = concat_states(states)
    if aug is not None and not test and (aug.shs_noise > 0 or aug.scale_noise > 0):
        key = jax.random.key(aug.seed)
        k1, k2 = jax.random.split(key)
        if aug.shs_noise > 0:
            shs = inputs["shs"]
            inputs["shs"] = shs + jax.random.normal(k1, shs.shape) * (0.2**0.5) * shs
        if aug.scale_noise > 0:
            sc = inputs["scales"]
            inputs["scales"] = jnp.maximum(
                sc + jax.random.normal(k2, sc.shape) * (0.2**0.5) * sc / 4, 0.0
            )
    sh_degree = min(s.active_sh_degree for s in states)
    if aug and aug.sh_degree_drop and not test:
        sh_degree = 0
    bg = jnp.asarray(
        bg_color if bg_color is not None else (aug.bg_color if aug else (0, 0, 0)),
        jnp.float32,
    )
    n_total = int(offsets[-1])
    if capacity is None:
        capacity = max(4 * n_total, 2048)
    out = raster_render(
        **inputs,
        **_camera_arrays(camera),
        bg=bg,
        sh_degree=sh_degree,
        capacity=capacity,
        means2d_probe=means2d_probe,
        interpret=interpret,
    )
    out = _postprocess(out, camera)
    out["segments"] = offsets
    return out


def split_by_segments(arr, offsets):
    """Slice a concatenated per-splat array back into per-object arrays."""
    return [
        arr[int(offsets[i]):int(offsets[i + 1])] for i in range(len(offsets) - 1)
    ]
