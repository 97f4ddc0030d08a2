"""Pallas TPU kernels: front-to-back alpha compositing, forward + backward.

The heart of the rasterizer (CUDA counterpart: the per-tile render/backward
kernels of comp-diff-gaussian-rasterization, SURVEY.md §3.3). TPU-first
re-design — no atomics, no per-pixel sequential loops:

  * The grid is a flat sequence of record *chunks* (CHUNK depth-ordered
    entries each). Binning guarantees every chunk belongs to exactly one
    16x16 tile and consecutive chunks of a tile are adjacent, so the tile's
    output block stays resident in VMEM across its chunks while Pallas
    auto-pipelines record fetches from HBM.
  * Compositing is a linear recurrence in transmittance, so a chunk is
    composited *in parallel over its 256 pixels and CHUNK entries*: the
    exclusive product of (1-alpha) along the entry axis is exp(L @ log(1-a))
    with L a strictly-lower-triangular ones matrix — an MXU matmul — and
    color accumulation is a second [4,CHUNK]x[CHUNK,256] matmul.
  * Per-pixel early termination (CUDA: stop when T < 1e-4, the crossing
    splat not composited) becomes a monotonicity argument: within a chunk
    T*P_g is non-increasing, so "applied" = (T*P_incl >= eps) is exactly
    the prefix CUDA would have composited.

The backward kernel replays tiles front-to-back, using the closed form
  dC/da_i = T_i c_i - S_i/(1-a_i),   S_i = suffix color after i,
with the suffix obtained from the stored final accumulators minus a running
prefix — no back-to-front pass needed. Per-entry gradients are written to a
grad-record table; the XLA gather that built the records scatter-adds them
back to per-splat parameters under autodiff.

Pixel layout: each tile's 256 pixels are a row-major [16,16] flattened to
256 lanes; the caller converts the [n_tiles+1, 8, 256] accumulator layout
to [C, H, W] images (ops/rasterizer.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dreamscene_tpu.ops.binning import TILE, TILE_PIX

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4

# record field indices (see rasterizer.build_records)
F_MX, F_MY, F_CA, F_CB, F_CC, F_OPA, F_R, F_G, F_B, F_DEPTH = range(10)
REC_WIDTH = 16
# accumulator rows in the [8, 256] tile state
A_R, A_G, A_B, A_DEPTH, A_T = range(5)
ACC_ROWS = 8


def _pixel_coords(x0, y0):
    """Tile pixel coordinates as [1, 256] lane vectors (row-major 16x16)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    px = (x0 + lane % TILE).astype(jnp.float32)
    py = (y0 + lane // TILE).astype(jnp.float32)
    return px, py


def _chunk_alpha(rec, px, py, t_carry):
    """Shared forward math for one chunk.

    Args:
      rec: [CHUNK, 16] records; px/py: [1, 256]; t_carry: [1, 256].
    Returns dict of [CHUNK, 256] / [CHUNK, 1] intermediates.
    """
    chunk = rec.shape[0]
    mx = rec[:, F_MX][:, None]
    my = rec[:, F_MY][:, None]
    ca = rec[:, F_CA][:, None]
    cb = rec[:, F_CB][:, None]
    cc = rec[:, F_CC][:, None]
    opa = rec[:, F_OPA][:, None]

    dx = mx - px                                     # [CHUNK, 256]
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw = opa * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, raw)
    alpha = jnp.where((power > 0.0) | (raw < ALPHA_MIN), 0.0, alpha)

    q = 1.0 - alpha                                  # in [0.01, 1]
    logq = jnp.log(q)
    # strictly-lower-triangular ones: exclusive prefix via MXU
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    l_strict = (col < row).astype(jnp.float32)
    p_excl = jnp.exp(
        jax.lax.dot_general(
            l_strict, logq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                                # [CHUNK, 256]
    p_incl = p_excl * q
    t_excl = t_carry * p_excl                        # T before entry g
    t_incl = t_carry * p_incl                        # T after entry g
    applied = (t_incl >= TRANSMITTANCE_EPS).astype(jnp.float32)
    contrib = t_excl * alpha * applied               # blend weight w_g[p]
    # new per-pixel transmittance (min handles the no-applied case)
    t_new = jnp.minimum(
        t_carry, jnp.min(jnp.where(applied > 0, t_incl, t_carry), axis=0, keepdims=True)
    )
    return dict(
        dx=dx, dy=dy, power=power, raw=raw, alpha=alpha, q=q,
        t_excl=t_excl, applied=applied, contrib=contrib, t_new=t_new,
    )


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(
    # scalar prefetch
    tile_x0_ref, tile_y0_ref, first_ref, tile_of_chunk_ref,
    # inputs
    rec_ref,
    # outputs
    out_ref,
    # scratch
    acc_ref,
):
    c = pl.program_id(0)
    rec = rec_ref[:]                                  # [CHUNK, 16]
    chunk = rec.shape[0]

    @pl.when(first_ref[c] == 1)
    def _init():
        acc_ref[:] = jnp.zeros((ACC_ROWS, TILE_PIX), jnp.float32)
        acc_ref[A_T, :] = jnp.ones((TILE_PIX,), jnp.float32)

    # chunk-level early termination: if every pixel of the tile is already
    # saturated (T < eps), later chunks cannot contribute (T only decays) —
    # skip the whole chunk's math (the CUDA kernel's per-pixel `done` flag,
    # lifted to chunk granularity).
    live = jnp.max(acc_ref[A_T, :]) >= TRANSMITTANCE_EPS

    @pl.when(live)
    def _composite_chunk():
        px, py = _pixel_coords(tile_x0_ref[c], tile_y0_ref[c])
        t_carry = acc_ref[A_T, :][None, :]

        v = _chunk_alpha(rec, px, py, t_carry)
        contrib = v["contrib"]

        # rgb+depth accumulation: [4, CHUNK] @ [CHUNK, 256]
        cd = jnp.concatenate(
            [rec[:, F_R:F_B + 1], rec[:, F_DEPTH][:, None]], axis=1
        )                                                 # [CHUNK, 4]
        acc_new = jax.lax.dot_general(
            cd, contrib, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [4, 256]
        acc_ref[A_R:A_DEPTH + 1, :] += acc_new
        acc_ref[A_T, :] = v["t_new"][0]

    out_ref[0] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("n_tiles", "chunk", "interpret"))
def composite_forward(
    records: jnp.ndarray,       # [pad_cap, 16] float32
    tile_x0: jnp.ndarray,       # [n_chunks] int32
    tile_y0: jnp.ndarray,       # [n_chunks] int32
    first_chunk: jnp.ndarray,   # [n_chunks] int32
    tile_of_chunk: jnp.ndarray,  # [n_chunks] int32
    n_tiles: int,
    chunk: int = 128,
    interpret: bool = False,
):
    pad_cap = records.shape[0]
    n_chunks = pad_cap // chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, REC_WIDTH), lambda c, tx, ty, f, t: (c, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, ACC_ROWS, TILE_PIX), lambda c, tx, ty, f, t: (t[c], 0, 0)
            ),
        ],
        scratch_shapes=[pltpu.VMEM((ACC_ROWS, TILE_PIX), jnp.float32)],
    )
    (out,) = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles + 1, ACC_ROWS, TILE_PIX), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_x0, tile_y0, first_chunk, tile_of_chunk, records)
    return out


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _bwd_kernel(
    # scalar prefetch
    tile_x0_ref, tile_y0_ref, first_ref, tile_of_chunk_ref,
    # inputs
    rec_ref, final_ref, grad_ref,
    # outputs
    grec_ref,
    # scratch: [ACC_ROWS, 256] replayed accumulator (prefix color + T)
    acc_ref,
):
    c = pl.program_id(0)
    rec = rec_ref[:]
    chunk = rec.shape[0]

    @pl.when(first_ref[c] == 1)
    def _init():
        acc_ref[:] = jnp.zeros((ACC_ROWS, TILE_PIX), jnp.float32)
        acc_ref[A_T, :] = jnp.ones((TILE_PIX,), jnp.float32)

    # chunk-level early termination (see forward kernel): a saturated
    # tile contributes nothing and receives no gradients.
    live = jnp.max(acc_ref[A_T, :]) >= TRANSMITTANCE_EPS
    grec_ref[:] = jnp.zeros((chunk, REC_WIDTH), jnp.float32)

    @pl.when(live)
    def _backward_chunk():
        px, py = _pixel_coords(tile_x0_ref[c], tile_y0_ref[c])
        t_carry = acc_ref[A_T, :][None, :]

        v = _chunk_alpha(rec, px, py, t_carry)
        alpha, contrib, applied = v["alpha"], v["contrib"], v["applied"]
        q, t_excl = v["q"], v["t_excl"]

        cd = jnp.concatenate(
            [rec[:, F_R:F_B + 1], rec[:, F_DEPTH][:, None]], axis=1
        )                                                 # [CHUNK, 4] rgb+depth
        # per-channel weighted contributions and their within-chunk inclusive
        # prefix: prefix_incl[g] = acc_before_chunk + sum_{h<=g} w_h c_h
        row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        l_incl = (col <= row).astype(jnp.float32)

        g_rgbd = grad_ref[0, A_R:A_DEPTH + 1, :]          # [4, 256] cotangents
        g_t = grad_ref[0, A_T, :][None, :]                # [1, 256]
        c_final = final_ref[0, A_R:A_DEPTH + 1, :]        # [4, 256] final accums
        t_final = final_ref[0, A_T, :][None, :]

        # dL/dcolor_g (and depth): w_g . g_ch  -> [CHUNK, 4]
        gcd = jax.lax.dot_general(
            contrib, g_rgbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # suffix S_ch[g] = c_final_ch - acc_ch - (L_incl @ w c_ch)[g]; we need
        # sdotg = sum_ch S_ch * g_ch. The cotangents g_ch are per-PIXEL, so
        # they commute through the entry-axis prefix matmul:
        #   sum_ch (L @ (w*c_ch)) * g_ch  ==  L @ (w * sum_ch c_ch*g_ch)
        # which collapses the four per-channel prefixes into ONE matmul.
        cg_dot = jax.lax.dot_general(
            cd, g_rgbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [CHUNK, 256] c_g . g
        prefix_dot = jax.lax.dot_general(
            l_incl, contrib * cg_dot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [CHUNK, 256]
        cf_dot = jnp.sum(c_final * g_rgbd, axis=0, keepdims=True)      # [1,256]
        acc_dot = jnp.sum(acc_ref[A_R:A_DEPTH + 1, :] * g_rgbd, axis=0,
                          keepdims=True)
        sdotg = cf_dot - acc_dot - prefix_dot
        # replayed accumulator update (same matmul as the forward)
        acc_ref[A_R:A_DEPTH + 1, :] += jax.lax.dot_general(
            cd, contrib, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        inv_q = 1.0 / q
        galpha = t_excl * cg_dot - sdotg * inv_q - g_t * t_final * inv_q
        # only entries that were actually composited get gradient
        galpha = galpha * applied * (alpha > 0.0).astype(jnp.float32)

        # through alpha = min(0.99, opa*exp(power)), skip-clamps zero elsewhere
        unclamped = (v["raw"] < ALPHA_MAX).astype(jnp.float32)
        g_exp = galpha * unclamped                        # d wrt (opa*G) pre-clamp
        gpower = g_exp * v["raw"]                         # [CHUNK, 256]
        opa = rec[:, F_OPA][:, None]
        g_opa = jnp.sum(g_exp * jnp.exp(v["power"]), axis=1)   # [CHUNK]

        dx, dy = v["dx"], v["dy"]
        ca = rec[:, F_CA][:, None]
        cb = rec[:, F_CB][:, None]
        cc = rec[:, F_CC][:, None]
        # power = -0.5(ca dx^2 + cc dy^2) - cb dx dy ; d/ddx with dx = mx - px
        g_mx = jnp.sum(gpower * (-(ca * dx + cb * dy)), axis=1)
        g_my = jnp.sum(gpower * (-(cc * dy + cb * dx)), axis=1)
        g_ca = jnp.sum(gpower * (-0.5 * dx * dx), axis=1)
        g_cb = jnp.sum(gpower * (-dx * dy), axis=1)
        g_cc = jnp.sum(gpower * (-0.5 * dy * dy), axis=1)

        acc_ref[A_T, :] = v["t_new"][0]

        # column order must match the record layout F_MX..F_DEPTH (0..9)
        grec_ref[:] = jnp.concatenate(
            [
                g_mx[:, None], g_my[:, None], g_ca[:, None], g_cb[:, None],
                g_cc[:, None], g_opa[:, None], gcd,
                jnp.zeros((chunk, REC_WIDTH - 10), jnp.float32),
            ],
            axis=1,
        )


@functools.partial(jax.jit, static_argnames=("n_tiles", "chunk", "interpret"))
def composite_backward(
    records: jnp.ndarray,
    tile_x0: jnp.ndarray,
    tile_y0: jnp.ndarray,
    first_chunk: jnp.ndarray,
    tile_of_chunk: jnp.ndarray,
    final_accums: jnp.ndarray,   # [n_tiles+1, 8, 256] forward output
    grad_accums: jnp.ndarray,    # [n_tiles+1, 8, 256] cotangents
    n_tiles: int,
    chunk: int = 128,
    interpret: bool = False,
):
    pad_cap = records.shape[0]
    n_chunks = pad_cap // chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, REC_WIDTH), lambda c, tx, ty, f, t: (c, 0)),
            pl.BlockSpec(
                (1, ACC_ROWS, TILE_PIX), lambda c, tx, ty, f, t: (t[c], 0, 0)
            ),
            pl.BlockSpec(
                (1, ACC_ROWS, TILE_PIX), lambda c, tx, ty, f, t: (t[c], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((chunk, REC_WIDTH), lambda c, tx, ty, f, t: (c, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((ACC_ROWS, TILE_PIX), jnp.float32)],
    )
    (grec,) = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_cap, REC_WIDTH), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_x0, tile_y0, first_chunk, tile_of_chunk, records, final_accums, grad_accums)
    return grec
