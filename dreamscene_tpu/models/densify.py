"""Densification & pruning as masked, static-shape pytree ops.

Re-designs the reference's optimizer-surgery densification
(gs_renderer.py:854-1103) for XLA: no tensor resizing — selected splats are
cloned/split into *free capacity slots* via scatters, pruning just clears
the active mask, and Adam moments are zeroed row-wise. Semantics match the
reference:
  * clone: grad-norm >= threshold AND max scale <= percent_dense * extent
    (gs_renderer.py:1010-1032);
  * split (N=2): grad-norm >= threshold AND max scale > percent_dense *
    extent; children sampled from the parent gaussian, scales shrunk by
    1/(0.8*N), parent removed (gs_renderer.py:971-1008);
  * prune: opacity < min_opacity, screen radius > max_screen_size, world
    scale > 0.1 * extent (gs_renderer.py:1034-1059);
  * opacity reset to <= 0.01 with zeroed opacity moments
    (gs_renderer.py:746-749, 854-869);
  * importance prune of the bottom percentile (gs_renderer.py:1082-1087).

Capacity overflow: new splats that don't fit are silently dropped (the
reference instead stops densifying at max_point_number — the trainer layer
enforces that cap too, training/object_trainer.py:388-400).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from dreamscene_tpu.models.gaussians import (
    AdamState,
    GaussianAux,
    GaussianParams,
    GaussianState,
    inverse_sigmoid,
)
from dreamscene_tpu.ops.covariance import build_rotation


def _row_mask(mask, like):
    return mask.reshape((-1,) + (1,) * (like.ndim - 1))


def _scatter_rows(params: GaussianParams, src_rows: GaussianParams, dest, on):
    """Copy row i of src_rows to row dest[i] for rows where on[i]
    (dest == capacity drops)."""

    def scat(x, s):
        if x.ndim == 0 or x.shape[0] != dest.shape[0]:
            return x
        d = jnp.where(on, dest, x.shape[0])
        return x.at[d].set(s, mode="drop")

    return jax.tree.map(scat, params, src_rows)


def _zero_rows(tree, idx, on):
    def z(x):
        if x.ndim == 0 or x.shape[0] != idx.shape[0]:
            return x
        d = jnp.where(on, idx, x.shape[0])
        return x.at[d].set(jnp.zeros_like(x), mode="drop")

    return jax.tree.map(z, tree)


def _alloc_free_slots(active: jnp.ndarray, sel: jnp.ndarray, offset=0):
    """Destination free slot for each selected row (rank-th free slot),
    with `offset` reserving the first free slots for another allocation.
    Returns (dest [C] int32, ok [C] bool)."""
    c = active.shape[0]
    free_order = jnp.argsort(active)          # stable: free slots first
    rank = jnp.cumsum(sel) - 1 + offset
    n_free = jnp.sum(~active)
    ok = sel & (rank < n_free)
    dest = jnp.where(ok, free_order[jnp.clip(rank, 0, c - 1)], c)
    return dest.astype(jnp.int32), ok


def add_densification_stats(
    aux: GaussianAux, means2d_grad: jnp.ndarray, update_filter: jnp.ndarray
) -> GaussianAux:
    """Accumulate screen-space mean gradient norms (reference:
    gs_renderer.py:1061-1066)."""
    norm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    f = update_filter.astype(jnp.float32)
    return dataclasses.replace(
        aux,
        xyz_gradient_accum=aux.xyz_gradient_accum + norm * f,
        denom=aux.denom + f,
    )


def update_max_radii(aux: GaussianAux, radii, visible) -> GaussianAux:
    return dataclasses.replace(
        aux,
        max_radii2d=jnp.where(
            visible, jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
            aux.max_radii2d,
        ),
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_screen_size_is_set",),
)
def _densify_and_prune_impl(
    params: GaussianParams,
    aux: GaussianAux,
    opt: AdamState,
    key,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float,
    max_screen_size_is_set: bool,
):
    c = aux.active.shape[0]
    active = aux.active
    grads = aux.xyz_gradient_accum / jnp.maximum(aux.denom, 1.0)
    grads = jnp.where(aux.denom > 0, grads, 0.0)

    scales = jnp.exp(params.scaling)
    max_scale = jnp.max(scales, axis=-1)
    hot = (grads >= max_grad) & active
    sel_clone = hot & (max_scale <= percent_dense * extent)
    sel_split = hot & (max_scale > percent_dense * extent)

    # ---- clone: copy selected rows into free slots ----------------------
    dest_c, ok_c = _alloc_free_slots(active, sel_clone)
    params = _scatter_rows(params, params, dest_c, ok_c)
    opt = AdamState(
        count=opt.count,
        mu=_zero_rows(opt.mu, dest_c, ok_c),
        nu=_zero_rows(opt.nu, dest_c, ok_c),
    )
    active = active.at[jnp.where(ok_c, dest_c, c)].set(True, mode="drop")

    # ---- split: two children sampled inside the parent ------------------
    # child A overwrites the parent's slot; child B goes to a free slot
    # (allocated after the clones).
    n_clones = jnp.sum(ok_c)
    dest_s, ok_s = _alloc_free_slots(aux.active, sel_split, offset=n_clones)
    # sampling: eps ~ N(0, scale) rotated by parent rotation
    eps = jax.random.normal(key, (c, 2, 3), params.xyz.dtype) * scales[:, None, :]
    rot = build_rotation(params.rotation)                      # [C, 3, 3]
    offsets = jnp.einsum("cij,cnj->cni", rot, eps)             # [C, 2, 3]
    child_xyz = params.xyz[:, None, :] + offsets               # [C, 2, 3]
    child_scaling = jnp.log(scales / (0.8 * 2.0))

    def mk_child(i):
        return dataclasses.replace(
            params, xyz=child_xyz[:, i, :], scaling=child_scaling
        )

    child_a, child_b = mk_child(0), mk_child(1)
    idx = jnp.arange(c, dtype=jnp.int32)
    # overwrite parents with child A
    params = _scatter_rows(params, child_a, idx, sel_split)
    opt = AdamState(
        count=opt.count,
        mu=_zero_rows(opt.mu, idx, sel_split),
        nu=_zero_rows(opt.nu, idx, sel_split),
    )
    # child B into free slots
    params = _scatter_rows(params, child_b, dest_s, ok_s)
    opt = AdamState(
        count=opt.count,
        mu=_zero_rows(opt.mu, dest_s, ok_s),
        nu=_zero_rows(opt.nu, dest_s, ok_s),
    )
    active = active.at[jnp.where(ok_s, dest_s, c)].set(True, mode="drop")

    # ---- prune ----------------------------------------------------------
    # NOTE: the reference's densification_postfix zeroes max_radii2D before
    # this prune runs (gs_renderer.py:968-970), so the screen-size check is
    # inert inside densify_and_prune; it is live only in the standalone
    # prune() (prune_only below). Replicated exactly.
    opac = jax.nn.sigmoid(params.opacity[:, 0])
    prune = opac < min_opacity
    if max_screen_size_is_set:
        prune = prune | (jnp.max(jnp.exp(params.scaling), axis=-1) > 0.1 * extent)
    active = active & ~prune

    aux = GaussianAux(
        active=active,
        max_radii2d=jnp.zeros((c,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((c,), jnp.float32),
        denom=jnp.zeros((c,), jnp.float32),
    )
    return params, aux, opt


def densify_and_prune(
    state: GaussianState,
    key,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
    percent_dense: float,
) -> GaussianState:
    params, aux, opt = _densify_and_prune_impl(
        state.params,
        state.aux,
        state.opt,
        key,
        max_grad,
        min_opacity,
        extent,
        0.0 if max_screen_size is None else float(max_screen_size),
        percent_dense,
        max_screen_size_is_set=max_screen_size is not None,
    )
    return dataclasses.replace(state, params=params, aux=aux, opt=opt)


def prune_only(
    state: GaussianState,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
) -> GaussianState:
    """reference: gs_renderer.py:1051-1059."""
    opac = jax.nn.sigmoid(state.params.opacity[:, 0])
    prune = opac < min_opacity
    if max_screen_size is not None:
        prune = prune | (state.aux.max_radii2d > max_screen_size)
        prune = prune | (
            jnp.max(jnp.exp(state.params.scaling), axis=-1) > 0.1 * extent
        )
    aux = dataclasses.replace(state.aux, active=state.aux.active & ~prune)
    return dataclasses.replace(state, aux=aux)


def reset_opacity(state: GaussianState) -> GaussianState:
    """Clamp opacities to <= 0.01 and zero the opacity Adam moments
    (reference: gs_renderer.py:746-749 + replace_tensor_to_optimizer)."""
    opac = jax.nn.sigmoid(state.params.opacity)
    new_logit = inverse_sigmoid(jnp.minimum(opac, 0.01))
    params = dataclasses.replace(state.params, opacity=new_logit)
    opt = AdamState(
        count=state.opt.count,
        mu=dataclasses.replace(
            state.opt.mu, opacity=jnp.zeros_like(state.opt.mu.opacity)
        ),
        nu=dataclasses.replace(
            state.opt.nu, opacity=jnp.zeros_like(state.opt.nu.opacity)
        ),
    )
    return dataclasses.replace(state, params=params, opt=opt)


def prune_by_importance(
    state: GaussianState, percent: float, important_score: jnp.ndarray
) -> GaussianState:
    """Drop the bottom `percent` of active splats by importance
    (reference: gs_renderer.py:1082-1087, threshold at the percent-th
    percentile, prune score <= threshold)."""
    active = state.aux.active
    n_active = jnp.sum(active)
    scores = jnp.where(active, important_score, jnp.inf)
    sorted_scores = jnp.sort(scores)
    idx = (percent * (n_active.astype(jnp.float32) - 1.0)).astype(jnp.int32)
    threshold = sorted_scores[jnp.clip(idx, 0, scores.shape[0] - 1)]
    prune = active & (important_score <= threshold)
    aux = dataclasses.replace(state.aux, active=active & ~prune)
    return dataclasses.replace(state, aux=aux)
