"""Scene composition: object placement, env/floor models, registry, combine.

TPU-native counterpart of the reference's SceneGaussian container
(reference: scene_gaussian.py:24-544). Each placed object instance, the
environment shell, and the floor are independent fixed-capacity
GaussianStates; scene renders concatenate them (rendering.scene_render)
and gradients flow back per-model (replacing the reference's tail-slice
grad bookkeeping).

Placement semantics match add_objects_to_scene (scene_gaussian.py:318-424):
  xyz        -> R @ S @ xyz, z-snapped to the floor, then + T
  log-scales -> + log(scale)   (per-axis)
  quats      -> quat(R) * quat  (Hamilton, real-first)
  SH coeffs  -> exact per-band rotation (ops/transforms.rotate_sh).
    NOTE the reference rotates band 1 by bmm on the *channel* axis of its
    [N, coeff, channel] features (scene_gaussian.py:303-316) — a layout
    slip inherited from splatter-image that mixes RGB channels. We apply
    the mathematically correct coefficient-axis rotation for all bands;
    bands 2-3 match the reference's Wigner-D path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from dreamscene_tpu.models.gaussians import GaussianAux, GaussianState, adam_init
from dreamscene_tpu.ops.quaternion import (
    matrix_to_quaternion,
    quaternion_raw_multiply,
    quaternion_to_matrix,
)
from dreamscene_tpu.ops.transforms import euler_angles_to_matrix, rotate_sh


@dataclasses.dataclass
class ObjectArgs:
    """Per-instance placement record (reference: scene_gaussian.py:24-31)."""

    object_id: str
    clas: int
    affine: dict           # {"T": [3], "R": rotation (deg euler or quat), "S": [3]}
    bbox: np.ndarray       # [6] world-space min/max after placement


@dataclasses.dataclass
class ObjectEntry:
    """Registry slot (reference ObjectGaussian, scene_gaussian.py:33-37)."""

    id: str
    state: GaussianState
    step: int = 0
    text: Optional[dict] = None


def rotation_matrix_from_param(rotation) -> jnp.ndarray:
    """Euler degrees [3] (XYZ) or quaternion [4] -> [3,3]
    (reference create_transform_matrix_RS, scene_gaussian.py:480-513)."""
    rotation = np.asarray(rotation, np.float32)
    if rotation.shape[-1] == 3:
        return euler_angles_to_matrix(jnp.deg2rad(jnp.asarray(rotation)), "XYZ")
    return quaternion_to_matrix(jnp.asarray(rotation))


def place_object(
    state: GaussianState,
    center,
    rotation,
    scale,
    snap_floor: bool = True,
) -> tuple[GaussianState, ObjectArgs, np.ndarray]:
    """Apply an affine placement to a (final, trained) object model,
    returning a fresh placed instance with re-initialized optimizer/aux
    (reference: scene_gaussian.py:330-424)."""
    scale = np.asarray(scale, np.float32)
    if scale.size == 1:
        scale = np.repeat(scale, 3)
    rot = rotation_matrix_from_param(rotation)
    s_mat = jnp.diag(jnp.asarray(scale))
    active = state.aux.active

    xyz = state.params.xyz
    transformed = (rot @ s_mat @ xyz.T).T        # [C, 3]
    # z-snap: drop the instance so its lowest point sits on z=0 + center_z
    masked_z = jnp.where(active, transformed[:, 2], jnp.inf)
    z_min = jnp.min(masked_z)
    t_center = jnp.asarray(center, jnp.float32)
    t_center = t_center.at[2].add(-z_min if snap_floor else 0.0)
    new_xyz = transformed + t_center[None, :]

    new_scaling = state.params.scaling + jnp.log(jnp.asarray(scale))[None, :]
    quat_r = matrix_to_quaternion(rot)
    new_rotation = quaternion_raw_multiply(
        jnp.broadcast_to(quat_r, state.params.rotation.shape),
        state.params.rotation,
    )
    # SH rotation: features = [dc | rest]; dc (band 0) is invariant.
    feats = jnp.concatenate(
        [state.params.features_dc, state.params.features_rest], axis=1
    )
    feats_rot = rotate_sh(feats, rot, state.sh_degree)
    new_dc = feats_rot[:, :1, :]
    new_restc = feats_rot[:, 1:, :]

    params = dataclasses.replace(
        state.params,
        xyz=new_xyz,
        scaling=new_scaling,
        rotation=new_rotation,
        features_dc=new_dc,
        features_rest=new_restc,
    )
    aux = GaussianAux(
        active=active,
        max_radii2d=jnp.zeros_like(state.aux.max_radii2d),
        xyz_gradient_accum=jnp.zeros_like(state.aux.xyz_gradient_accum),
        denom=jnp.zeros_like(state.aux.denom),
    )
    placed = dataclasses.replace(
        state, params=params, aux=aux, opt=adam_init(params),
    )

    xyz_np = np.asarray(new_xyz)
    act_np = np.asarray(active)
    pts = xyz_np[act_np]
    bbox = np.concatenate([pts.min(axis=0), pts.max(axis=0)])
    args = ObjectArgs(
        object_id="",
        clas=0,
        affine={"T": np.asarray(t_center), "R": np.asarray(rotation),
                "S": scale},
        bbox=bbox,
    )
    return placed, args, bbox


@dataclasses.dataclass
class SceneModel:
    """The scene: placed object instances + env + floor
    (reference SceneGaussian fields, scene_gaussian.py:39-51, 429-478)."""

    objects: dict = dataclasses.field(default_factory=dict)   # name -> ObjectEntry
    objects_args: list = dataclasses.field(default_factory=list)
    env: Optional[GaussianState] = None
    floor: Optional[GaussianState] = None
    scene_box: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(6, np.float32)
    )
    stage_n: int = 0

    def grow_box(self, bbox: np.ndarray):
        self.scene_box[:3] = np.minimum(self.scene_box[:3], bbox[:3])
        self.scene_box[3:] = np.maximum(self.scene_box[3:], bbox[3:])

    def visible_states(self, keys=None) -> list[GaussianState]:
        """States for a scene render, object order then env/floor tail —
        matching the reference's concat order (objects..., floor, env;
        scene_gaussian.py:753-846 appends floor and env after objects)."""
        states = []
        names = keys if keys is not None else list(self.objects)
        for name in names:
            states.append(self.objects[name].state)
        if self.floor is not None:
            states.append(self.floor)
        if self.env is not None:
            states.append(self.env)
        return states


def export_layout(scene_box: np.ndarray, objects_args: list, path: str,
                  seed: int = 0) -> None:
    """Top-down 2D layout image with one labeled box per placed object
    (reference export_layout, scene_gaussian.py:249-301)."""
    import cv2

    rng = np.random.RandomState(seed)
    w = float(scene_box[3] - scene_box[0])
    h = float(scene_box[4] - scene_box[1])
    if w <= 0 or h <= 0:
        return
    scale = 1024.0 / max(w, h)
    layout = np.zeros((int(scale * h), int(scale * w), 3), np.uint8)
    for oa in objects_args:
        lb = (int(scale * (oa.bbox[0] - scene_box[0])),
              int(scale * (scene_box[4] - oa.bbox[1])))
        rt = (int(scale * (oa.bbox[3] - scene_box[0])),
              int(scale * (scene_box[4] - oa.bbox[4])))
        color = tuple(int(c) for c in rng.randint(0, 255, 3))
        cv2.rectangle(layout, lb, rt, color=color, thickness=2)
        cv2.putText(layout, f"{oa.object_id}_{oa.clas}", lb,
                    cv2.FONT_HERSHEY_COMPLEX, 1, (255, 255, 255), 1)
    cv2.imwrite(path, layout)


def final_combine_all(states: list[GaussianState]) -> GaussianState:
    """Concatenate models into one (active splats only padded to summed
    capacity; reference final_combine_all, scene_gaussian.py:519-544)."""
    max_deg = max(s.sh_degree for s in states)
    k = (max_deg + 1) ** 2

    def pad_rest(s):
        rest = s.params.features_rest
        kk = rest.shape[1]
        if kk < k - 1:
            rest = jnp.pad(rest, ((0, 0), (0, k - 1 - kk), (0, 0)))
        return rest

    params0 = states[0].params
    cat = dataclasses.replace(
        params0,
        xyz=jnp.concatenate([s.params.xyz for s in states]),
        features_dc=jnp.concatenate([s.params.features_dc for s in states]),
        features_rest=jnp.concatenate([pad_rest(s) for s in states]),
        scaling=jnp.concatenate([s.params.scaling for s in states]),
        rotation=jnp.concatenate([s.params.rotation for s in states]),
        opacity=jnp.concatenate([s.params.opacity for s in states]),
        background=params0.background,
    )
    aux = GaussianAux(
        active=jnp.concatenate([s.aux.active for s in states]),
        max_radii2d=jnp.concatenate([s.aux.max_radii2d for s in states]),
        xyz_gradient_accum=jnp.concatenate(
            [s.aux.xyz_gradient_accum for s in states]
        ),
        denom=jnp.concatenate([s.aux.denom for s in states]),
    )
    return GaussianState(
        params=cat, aux=aux, opt=adam_init(cat),
        sh_degree=max_deg, active_sh_degree=max_deg,
        spatial_lr_scale=states[0].spatial_lr_scale,
    )
