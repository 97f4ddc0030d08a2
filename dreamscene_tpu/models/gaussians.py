"""Gaussian splat model state — fixed-capacity pytrees + masked Adam.

TPU-first re-design of the reference's GaussianModel (reference:
gs_renderer.py:166-711). torch dynamically resizes nn.Parameters on every
densify/prune; XLA needs static shapes, so here a model is a pytree with a
fixed capacity C and an `active` mask, and densification (models/densify.py)
is pure masked scatter arithmetic. Capacity growth is an explicit, rare
host-side event (resize + recompile).

The optimizer is a transparent hand-rolled Adam (eps=1e-15, matching the
reference's torch.optim.Adam(eps=1e-15), gs_renderer.py:654) whose moments
live in a params-shaped pytree — densification zeroes moment rows in place
exactly like the reference's optimizer-state surgery
(gs_renderer.py:905-939), with none of the del/cat dict juggling.

Per-group learning rates follow the reference's five schedules
(gs_renderer.py:655-679): they are computed on host per step
(`group_lrs`) and fed to the jitted `adam_update` as scalars.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.struct

from dreamscene_tpu.ops.sh import RGB2SH


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


@flax.struct.dataclass
class GaussianParams:
    """Raw (pre-activation) learnable parameters; all arrays lead with the
    static capacity C. Layouts match the reference's nn.Parameters
    (gs_renderer.py:599-607)."""

    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray        # [C, 3] log-scale
    rotation: jnp.ndarray       # [C, 4] unnormalized quaternion (wxyz)
    opacity: jnp.ndarray        # [C, 1] logit
    background: jnp.ndarray     # [3] logit RGB


@flax.struct.dataclass
class GaussianAux:
    """Non-learnable per-splat bookkeeping (reference:
    gs_renderer.py:190-196)."""

    active: jnp.ndarray             # [C] bool
    max_radii2d: jnp.ndarray        # [C] float32
    xyz_gradient_accum: jnp.ndarray  # [C] float32
    denom: jnp.ndarray              # [C] float32


class AdamState(NamedTuple):
    count: jnp.ndarray   # [] int32 — shared step (torch keeps per-tensor)
    mu: GaussianParams
    nu: GaussianParams


@flax.struct.dataclass
class GaussianState:
    params: GaussianParams
    aux: GaussianAux
    opt: AdamState
    # static metadata (python ints via pytree_node=False)
    sh_degree: int = flax.struct.field(pytree_node=False, default=3)
    active_sh_degree: int = flax.struct.field(pytree_node=False, default=0)
    spatial_lr_scale: float = flax.struct.field(pytree_node=False, default=1.0)

    # ---- activations (reference: gs_renderer.py:167-182) ----------------
    @property
    def get_scaling(self):
        return jnp.exp(self.params.scaling)

    @property
    def get_rotation(self):
        q = self.params.rotation
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    @property
    def get_xyz(self):
        return self.params.xyz

    @property
    def get_opacity(self):
        return jax.nn.sigmoid(self.params.opacity)

    @property
    def get_background(self):
        return jax.nn.sigmoid(self.params.background)

    @property
    def get_features(self):
        return jnp.concatenate(
            [self.params.features_dc, self.params.features_rest], axis=1
        )  # [C, K, 3]

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    def one_up_sh_degree(self) -> "GaussianState":
        if self.active_sh_degree < self.sh_degree:
            return dataclasses.replace(
                self, active_sh_degree=self.active_sh_degree + 1
            )
        return self


def num_active(state: GaussianState) -> int:
    return int(jnp.sum(state.aux.active))


# --------------------------------------------------------------------------
# construction
# --------------------------------------------------------------------------

def _zeros_like_params(capacity: int, sh_degree: int) -> GaussianParams:
    k = (sh_degree + 1) ** 2
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        scaling=jnp.zeros((capacity, 3), jnp.float32),
        rotation=jnp.zeros((capacity, 4), jnp.float32),
        opacity=jnp.zeros((capacity, 1), jnp.float32),
        background=jnp.zeros((3,), jnp.float32),
    )


_KNN_LIB = None


def _native_knn():
    """Load (building if needed) the native grid-hash KNN (native/knn.cpp),
    the C++ replacement for simple-knn's distCUDA2."""
    global _KNN_LIB
    if _KNN_LIB is not None:
        return _KNN_LIB
    import ctypes
    import os
    import subprocess

    root = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    so = os.path.join(root, "libdsknn.so")
    try:
        if not os.path.exists(so):
            subprocess.run(["sh", os.path.join(root, "build.sh")], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(so)
        lib.knn3_mean_sq_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _KNN_LIB = lib
    except Exception:
        _KNN_LIB = False
    return _KNN_LIB


def mean_sq_dist_to_3nn(points: np.ndarray) -> np.ndarray:
    """Host-side replacement for simple-knn's distCUDA2 (reference:
    gs_renderer.py:590-594): mean squared distance to the 3 nearest
    neighbours, used once to set initial log-scales. Native C++ grid-hash
    kernel (native/knn.cpp) with a scipy cKDTree fallback."""
    import ctypes

    lib = _native_knn()
    if lib:
        pts = np.ascontiguousarray(points, np.float32)
        out = np.empty(pts.shape[0], np.float32)
        lib.knn3_mean_sq_dist(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pts.shape[0],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out.astype(np.float64)
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=4, workers=-1)  # self + 3 NN
    return (d[:, 1:] ** 2).mean(axis=1)


def create_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    sh_degree: int = 3,
    capacity: int | None = None,
    spatial_lr_scale: float = 1.0,
    init_opacity: float = 0.1,
) -> GaussianState:
    """Build a model from a colored point cloud (reference
    create_from_pcd semantics, gs_renderer.py:582-607): DC features from
    RGB2SH, isotropic log-scales from sqrt(mean sq dist to 3NN), identity
    rotations, opacity logit of 0.1."""
    n = points.shape[0]
    if capacity is None:
        capacity = int(n * 1.5) + 1024
    capacity = max(capacity, n)
    k = (sh_degree + 1) ** 2

    dist2 = np.maximum(mean_sq_dist_to_3nn(points.astype(np.float64)), 1e-7)
    log_scales = np.log(np.sqrt(dist2)).astype(np.float32)

    params = _zeros_like_params(capacity, sh_degree)
    xyz = np.zeros((capacity, 3), np.float32)
    xyz[:n] = points
    fdc = np.zeros((capacity, 1, 3), np.float32)
    fdc[:n, 0] = np.asarray(RGB2SH(jnp.asarray(colors, jnp.float32)))
    scaling = np.zeros((capacity, 3), np.float32)
    scaling[:n] = log_scales[:, None]
    rotation = np.zeros((capacity, 4), np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full(
        (capacity, 1), float(np.log(init_opacity / (1 - init_opacity))), np.float32
    )

    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(fdc),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rotation),
        opacity=jnp.asarray(opacity),
        background=jnp.zeros((3,), jnp.float32),
    )
    active = jnp.arange(capacity) < n
    aux = GaussianAux(
        active=active,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )
    return GaussianState(
        params=params,
        aux=aux,
        opt=adam_init(params),
        sh_degree=sh_degree,
        active_sh_degree=0,
        spatial_lr_scale=spatial_lr_scale,
    )


def resize(state: GaussianState, new_capacity: int) -> GaussianState:
    """Grow (or shrink to >= active count) the capacity. Host-side, rare —
    triggers recompilation of everything shaped by C."""
    old_c = state.capacity

    def pad(x):
        if x.ndim == 0 or x.shape[0] != old_c:
            return x
        pad_width = [(0, new_capacity - old_c)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    if new_capacity < old_c:
        raise ValueError("shrinking not supported; prune instead")
    params = jax.tree.map(pad, state.params)
    aux = jax.tree.map(pad, state.aux)
    opt = AdamState(
        count=state.opt.count,
        mu=jax.tree.map(pad, state.opt.mu),
        nu=jax.tree.map(pad, state.opt.nu),
    )
    return dataclasses.replace(state, params=params, aux=aux, opt=opt)


# --------------------------------------------------------------------------
# masked Adam (reference: torch.optim.Adam(eps=1e-15), gs_renderer.py:654)
# --------------------------------------------------------------------------

GROUP_OF_FIELD = {
    "xyz": "xyz",
    "features_dc": "f_dc",
    "features_rest": "f_rest",
    "scaling": "scaling",
    "rotation": "rotation",
    "opacity": "opacity",
    "background": "background",
}


def adam_init(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=zeros)


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    opt: AdamState,
    active: jnp.ndarray,
    lrs: dict,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[GaussianParams, AdamState]:
    """One Adam step with per-group lrs; inactive rows are frozen.

    lrs: dict group-name -> scalar lr (host floats or jnp scalars).
    """
    count = opt.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    new_params = {}
    new_mu = {}
    new_nu = {}
    for field in GROUP_OF_FIELD:
        p = getattr(params, field)
        g = getattr(grads, field)
        m = getattr(opt.mu, field)
        v = getattr(opt.nu, field)
        lr = lrs[GROUP_OF_FIELD[field]]
        if field != "background":
            mask = active.reshape((-1,) + (1,) * (p.ndim - 1)).astype(p.dtype)
            g = g * mask
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        update = (m / c1) / (jnp.sqrt(v / c2) + eps)
        if field != "background":
            update = update * mask
        new_params[field] = p - lr * update
        new_mu[field] = m
        new_nu[field] = v

    return (
        GaussianParams(**new_params),
        AdamState(count=count, mu=GaussianParams(**new_mu), nu=GaussianParams(**new_nu)),
    )


def get_expon_lr_func(
    lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1000000
):
    """Exponential-decay lr schedule (reference: gs_renderer.py:56-77)."""

    def helper(step):
        if lr_init == lr_final:
            return lr_init
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = np.clip(step / max_steps, 0, 1)
        log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return float(delay_rate * log_lerp)

    return helper


def group_lrs(opt_args, spatial_lr_scale: float, step: int) -> dict:
    """Per-group lrs at `step`, mirroring training_setup + the four
    update_*_learning_rate schedulers (reference: gs_renderer.py:612-711).
    opt_args: an OptimizationParams-like object (utils/config.py)."""
    iters = opt_args.iterations
    xyz_sched = get_expon_lr_func(
        opt_args.position_lr_init * spatial_lr_scale,
        opt_args.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_args.position_lr_delay_mult,
        max_steps=iters,
    )
    feat_sched = get_expon_lr_func(
        opt_args.feature_lr,
        opt_args.feature_lr_final,
        lr_delay_mult=opt_args.position_lr_delay_mult,
        max_steps=iters,
    )
    rot_sched = get_expon_lr_func(
        opt_args.rotation_lr,
        opt_args.rotation_lr_final,
        lr_delay_mult=opt_args.position_lr_delay_mult,
        max_steps=iters,
    )
    scale_sched = get_expon_lr_func(
        opt_args.scaling_lr,
        opt_args.scaling_lr_final,
        lr_delay_mult=opt_args.position_lr_delay_mult,
        max_steps=iters,
    )
    return {
        "xyz": xyz_sched(step),
        "f_dc": feat_sched(step),
        "f_rest": opt_args.feature_lr / 20.0,
        "opacity": opt_args.opacity_lr,
        "scaling": scale_sched(step),
        "rotation": rot_sched(step),
        "background": opt_args.feature_lr,
    }
