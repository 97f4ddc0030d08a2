"""Differentiable 3D Gaussian splat rasterizer — public API.

TPU-native equivalent of `comp-diff-gaussian-rasterization`'s
`GaussianRasterizer(settings)(means3D, means2D, shs, colors_precomp,
opacities, scales, rotations, cov3D_precomp)` contract (reference call
sites: scene_gaussian.py:586-599, 861-870, 637-648; SURVEY.md §2.9.1):

  render(...) -> {image [3,H,W], depth [H,W], alpha [H,W], radii [N],
                  important_score [N], t_final [H,W], n_dropped}

Differences by design (TPU-first):
  * N is a static capacity; inactive slots are masked via `valid_mask`.
  * The screen-space mean gradient used for densification is harvested via
    an explicit zero-valued `means2d_probe` input (its cotangent is exactly
    d(loss)/d(mean2d)) instead of torch's retain_grad dummy.
  * `important_score` (score_flag=True variant) is always available — the
    forward kernel emits per-entry blend weights for free.

Pipeline: project (jnp, autodiff) -> bin (int plumbing, stop-grad)
-> gather records (jnp, autodiff scatters grads back) -> Pallas composite
(hand-derived VJP) -> image assembly (jnp, autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dreamscene_tpu.ops.binning import bin_splats, cdiv, resolve_tile
from dreamscene_tpu.ops import composite as _composite
from dreamscene_tpu.ops.composite import (
    ACC_ROWS,
    N_LIVE_FIELDS,
    REC_WIDTH,
    composite_backward,
    composite_forward,
)
from dreamscene_tpu.ops.projection import project_gaussians


from dreamscene_tpu.ops.gather import u16_row_gather as _u16_row_gather

# Measured dead ends (round 2, on-chip A/B — see ARCHITECTURE.md
# "Measured dead ends"): packed dense-row gathers for the grad table and
# record table, and a fully-dense VJP chain, all regressed vs the plain
# f32/u16 gathers below despite winning on CPU-replica microbenches.
# XLA-TPU's row gather is faster in situ than the relayout chains needed
# to feed packed tables. The tree keeps single paths.


import os as _os

# The r4 blocked-index gather (_gathered_blocked_cumsum) was built to
# stop XLA materializing a [1.2M, 10] -> [nb, 128, 10] relayout after
# the grad gather (measured 0.86 ms saved at 16x16/chunk 384). The r5
# HLO at 32x16/chunk 512 shows XLA now RE-INSERTS that relayout anyway
# (reshape.318, 1.02 ms: gather emits [1425024,10]{0,1}, reshape to
# [11133,128,10]{1,0,2}) — so the flat formulation (plain row gather +
# two-level blocked cumsum, bit-identical math — pinned by
# tests/test_gated_variants.py) went back on chip and WON: interleaved
# A/B device-steady 4.875/4.873 (on) vs 4.825 (off; a fourth leg
# anomalied at 1.5 and was discarded) = +1.0%. Default ON since r5;
# DS_FLAT_VJP_CUMSUM=0 reverts to the blocked-index form.
_FLAT_VJP_CUMSUM = _os.environ.get("DS_FLAT_VJP_CUMSUM", "1") == "1"


def _gathered_blocked_cumsum(g10, pos_safe, zero_col, block=128):
    """rows = transpose(g10)[pos_safe], then blocked inclusive cumsum
    over axis 0 — with the [nb, block] index pre-shaping done BEFORE the
    gather, so the gather emits the 3D blocked form directly instead of
    XLA materializing a [1.2M, 10] -> [nb, 128, 10] relayout reshape
    after it (measured 0.86 ms at bench scale on v5e). Padding rows
    gather the structural zero column, so the carry chain is exact."""
    m = pos_safe.shape[0]
    w = g10.shape[0]
    nb = -(-m // block)
    pos_pad = jnp.concatenate(
        [pos_safe,
         jnp.full((nb * block - m,), zero_col, jnp.int32)]
    ).reshape(nb, block)
    g3 = jnp.transpose(g10)[pos_pad]                  # [nb, block, w]
    inner = jnp.cumsum(g3, axis=1)
    carry = _blocked_cumsum(inner[:, -1, :], block)
    carry = jnp.concatenate(
        [jnp.zeros((1, w), g10.dtype), carry[:-1]], axis=0
    )
    return (inner + carry[:, None, :]).reshape(nb * block, w)[:m]


def _blocked_cumsum(x, block=128):
    """Inclusive cumsum over axis 0, two-level blocked. XLA lowers a flat
    cumsum to log2(M) shifted-add passes over the whole array (measured
    3.0 ms for [1.2M, 16] f32 on v5e = ~21 full-array sweeps); blocking
    cuts that to log2(block) sweeps + a recursively tiny carry cumsum
    (measured ~1.4 ms incl. the boundary gathers). Same reassociated-fp32
    error class as the log-tree."""
    m, w = x.shape
    if m <= block:
        return jnp.cumsum(x, axis=0)
    nb = -(-m // block)
    xp = jnp.pad(x, ((0, nb * block - m), (0, 0)))
    inner = jnp.cumsum(xp.reshape(nb, block, w), axis=1)
    carry = _blocked_cumsum(inner[:, -1, :], block)
    carry = jnp.concatenate([jnp.zeros((1, w), x.dtype), carry[:-1]], axis=0)
    return (inner + carry[:, None, :]).reshape(nb * block, w)[:m]


def _gather(rec_n, gid_pad):
    """records_t[:, s] = rec_n[gid_pad[s]]: ONE row gather straight from
    the original-order record table into sorted-entry order (the entry
    sort carries the original splat id as payload, ops/binning.py step
    4), plus a transpose into the field-major layout the composite
    kernels DMA ([16, cap_pad]: lane-aligned [16, CHUNK] slices).
    Columns past `n_entries` gather arbitrary (real) rows — the kernels
    mask them by the per-chunk live window, so no select is needed."""
    return jnp.transpose(_u16_row_gather(rec_n, gid_pad))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def gather_composite(rec_n, inv_perm, gid_pad, pos_of_entry, surv,
                     seg_starts, chunks, n_tiles, tiles_x, chunk, tile_w,
                     tile_h, interpret):
    """Record gather + Pallas compositing under ONE custom VJP (the
    backward's chunk-aligned field-major grad table is an internal layout
    that must not cross a VJP boundary).

    Backward: the natural scatter-add back to splats serializes on TPU
    (measured 92ms at 1.33M entries). Because binning expands entries in
    depth-rank order, each splat's entries are CONTIGUOUS in expansion
    order — so no sort is needed: gather the grad rows from the
    chunk-aligned grad table into expansion order via `pos_of_entry`,
    reduce each rank's segment with a cumsum difference (XLA's log-tree
    cumsum keeps fp32 error ~1e-6 relative), and undo the depth
    permutation with one small row gather."""
    records_t = _gather(rec_n, gid_pad)
    return composite_forward(
        records_t, *chunks,
        n_tiles=n_tiles, tiles_x=tiles_x, chunk=chunk,
        tile_w=tile_w, tile_h=tile_h, interpret=interpret,
    )


def _gather_composite_fwd(rec_n, inv_perm, gid_pad, pos_of_entry,
                          surv, seg_starts, chunks, n_tiles, tiles_x, chunk,
                          tile_w, tile_h, interpret):
    records_t = _gather(rec_n, gid_pad)
    if _composite._BWD_TCAR:
        # forward also emits the per-chunk incoming-transmittance table
        # so the backward kernel skips the serial cross-chunk replay
        # (composite.py DS_BWD_TCAR)
        out, tcar = composite_forward(
            records_t, *chunks,
            n_tiles=n_tiles, tiles_x=tiles_x, chunk=chunk,
            tile_w=tile_w, tile_h=tile_h, interpret=interpret,
            emit_tcar=True,
        )
    else:
        out = composite_forward(
            records_t, *chunks,
            n_tiles=n_tiles, tiles_x=tiles_x, chunk=chunk,
            tile_w=tile_w, tile_h=tile_h, interpret=interpret,
        )
        tcar = None
    return out, (records_t, chunks, out, inv_perm, pos_of_entry, surv,
                 seg_starts, tcar)


def _gather_composite_bwd(n_tiles, tiles_x, chunk, tile_w, tile_h,
                          interpret, res, g_out):
    (records_t, chunks, out, inv_perm, pos_of_entry, surv, seg_starts,
     tcar) = res
    grec_t = composite_backward(
        records_t, *chunks,
        out, g_out, n_tiles=n_tiles, tiles_x=tiles_x, chunk=chunk,
        tile_w=tile_w, tile_h=tile_h, interpret=interpret, tcar=tcar,
    )                                             # [16, n_chunks*chunk]
    # Gather formulation (measured on-chip, v5e, round-2 trace): ONE
    # exact f32 row gather (7.7 ms at 1.2M output rows). The earlier
    # bf16 hi/lo pair gather — meant to hit XLA's cheap 16-bit gather
    # path — stopped paying once the masked-select pass was replaced by
    # the index redirect: each half then fused with its f32 convert and
    # transpose into a full-price ~7.9 ms fusion, so the pair cost
    # 15.8 ms/step for a lossy result. Rows past N_LIVE_FIELDS are
    # structurally zero (kernel pads for 8-aligned sublane DMA) and are
    # sliced off first.
    capacity = pos_of_entry.shape[0]
    # Masked-entry redirect instead of a masked select pass: rows past
    # the live entries (dropped) and rows whose grad-table position lies
    # past the live-chunk bound (culled/trash entries — the backward
    # kernel's dynamic loop never writes there) must enter the cumsum as
    # zero. The kernel zeroes chunk u_used explicitly (composite.py bwd
    # epilogue), so pointing those entries' gather index at column
    # u_used*chunk yields exact zeros for free — no [capacity, 10]
    # select pass, and garbage HBM is never even read.
    n_live = jnp.sum(surv)
    e = jnp.arange(capacity, dtype=jnp.int32)
    u_used = chunks[-1]
    keep = (e < n_live) & (pos_of_entry < u_used * chunk)
    pos_safe = jnp.where(keep, pos_of_entry, u_used * chunk)
    g10 = grec_t[:N_LIVE_FIELDS]              # [10, n_chunks*chunk]
    # segments are CONSECUTIVE in expansion order (ends[r] ==
    # starts[r+1] up to dropped entries, which are exactly the zeroed
    # rows), so one boundary gather at starts-1 yields both segment
    # ends — top[r] = bot[r+1] — instead of separate top/bot gathers
    # (each ~1.4-1.9ms at 300K rows on v5e).
    if _FLAT_VJP_CUMSUM:
        csum = _blocked_cumsum(jnp.transpose(g10)[pos_safe], 128)
    else:
        csum = _gathered_blocked_cumsum(g10, pos_safe, u_used * chunk)
    bot = jnp.where(
        (seg_starts > 0)[:, None],
        csum[jnp.clip(seg_starts - 1, 0, capacity - 1)],
        0.0,
    )                                  # [N, N_LIVE_FIELDS] (1.2M-row src:
    top = jnp.concatenate([bot[1:], csum[-1:]], axis=0)  # f32 beats u16)
    grad_rank = top - bot                 # [N, N_LIVE_FIELDS] rank order
    grad_n = _u16_row_gather(grad_rank, inv_perm)  # 300K-row src: u16 wins
    grad_n = jnp.concatenate(
        [grad_n,
         jnp.zeros((grad_n.shape[0], REC_WIDTH - N_LIVE_FIELDS),
                   grad_n.dtype)],
        axis=1,
    )
    return grad_n, None, None, None, None, None, None


gather_composite.defvjp(_gather_composite_fwd, _gather_composite_bwd)


def render(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray | None,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    tanfovx: float,
    tanfovy: float,
    width: int,
    height: int,
    bg: jnp.ndarray,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    capacity: int | None = None,
    chunk: int = 512,
    valid_mask: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    means2d_probe: jnp.ndarray | None = None,
    colors_probe: jnp.ndarray | None = None,
    pixel_offset_y: jnp.ndarray | int = 0,
    full_height: int | None = None,
    interpret: bool = False,
    tile_w: int | None = None,
    tile_h: int | None = None,
) -> dict:
    """Render N Gaussians to an RGB+depth+alpha image. See module docstring.

    pixel_offset_y / full_height: the multi-chip tile-band path renders
    band b of a full_height-pixel image by projecting against the FULL
    image (focal lengths and NDC mapping use full_height), shifting
    screen y by b*band_height, and rasterizing only `height` rows
    (parallel/sharded_render).
    """
    n = means3d.shape[0]
    if capacity is None:
        capacity = max(4 * n, 2048)

    splats = project_gaussians(
        means3d, scales, quats, opacities, shs,
        viewmatrix, projmatrix, campos, tanfovx, tanfovy, width,
        full_height or height,
        sh_degree=sh_degree, scale_modifier=scale_modifier,
        colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
        valid_mask=valid_mask,
    )
    means2d = splats.means2d
    if means2d_probe is not None:
        means2d = means2d + means2d_probe
    colors = splats.colors
    if colors_probe is not None:
        # post-clamp color probe: its cotangent is the per-splat blend
        # weight sum (the comp- rasterizer's important_score)
        colors = colors + colors_probe
    splats = splats._replace(means2d=means2d, colors=colors)
    return render_from_splats(
        splats, width, height, bg,
        capacity=capacity, chunk=chunk,
        pixel_offset_y=pixel_offset_y, interpret=interpret,
        tile_w=tile_w, tile_h=tile_h,
    )


def render_from_splats(
    splats,
    width: int,
    height: int,
    bg: jnp.ndarray,
    capacity: int,
    chunk: int = 512,
    pixel_offset_y: jnp.ndarray | int = 0,
    interpret: bool = False,
    tile_w: int | None = None,
    tile_h: int | None = None,
) -> dict:
    """Rasterize already-projected splats (a ProjectedSplats, probes
    applied) into a height-row image starting at screen row
    `pixel_offset_y`. Split out of `render` so the primitive-sharded
    multi-chip path (parallel/sharded_render) can project each device's
    LOCAL splat shard and all-gather the compact projected records — not
    the raw parameters — to the tile-band owners; the all_gather's VJP
    (psum_scatter) routes record gradients straight back to the owning
    shard."""
    n = splats.means2d.shape[0]
    tile_w, tile_h = resolve_tile(tile_w, tile_h)
    tiles_x = cdiv(width, tile_w)
    tiles_y = cdiv(height, tile_h)
    n_tiles = tiles_x * tiles_y

    means2d = splats.means2d
    if not (isinstance(pixel_offset_y, int) and pixel_offset_y == 0):
        means2d = means2d - jnp.stack(
            [jnp.zeros_like(jnp.asarray(pixel_offset_y, jnp.float32)),
             jnp.asarray(pixel_offset_y, jnp.float32)]
        )

    binned = bin_splats(
        means2d, splats.depths, splats.radii, splats.visible,
        width, height, capacity=capacity, chunk=chunk,
        conics=jax.lax.stop_gradient(splats.conics),
        opacities=jax.lax.stop_gradient(splats.opacities),
        interpret=interpret, tile_w=tile_w, tile_h=tile_h,
    )

    # --- gather per-entry records (differentiable: grads scatter-add back)
    rec_n = jnp.concatenate(
        [
            means2d,                                   # 0,1
            splats.conics,                             # 2,3,4
            splats.opacities[:, None],                 # 5
            splats.colors,                             # 6,7,8
            splats.depths[:, None],                    # 9
            jnp.zeros((n, REC_WIDTH - 10), means2d.dtype),
        ],
        axis=1,
    )
    cap_pad = cdiv(capacity, 128) * 128 + chunk
    gid_pad = jnp.concatenate(
        [binned.gid_sorted,
         jnp.zeros((cap_pad - capacity,), jnp.int32)]
    )
    tiles_out = gather_composite(
        rec_n.astype(jnp.float32), binned.inv_perm,
        gid_pad, binned.pos_of_entry, binned.surv_counts,
        binned.seg_starts,
        (binned.chunk_tile, binned.chunk_s0, binned.chunk_lo,
         binned.chunk_hi, binned.chunk_first, binned.n_chunks_used),
        n_tiles, tiles_x, chunk, tile_w, tile_h, interpret,
    )

    # --- assemble images -------------------------------------------------
    body = tiles_out[:n_tiles].reshape(
        tiles_y, tiles_x, ACC_ROWS, tile_h, tile_w)
    full = body.transpose(2, 0, 3, 1, 4).reshape(
        ACC_ROWS, tiles_y * tile_h, tiles_x * tile_w
    )[:, :height, :width]
    rgb_acc = full[0:3]
    depth_acc = full[3]
    t_final = full[4]
    image = rgb_acc + t_final[None] * bg[:, None, None]

    return {
        "image": image,
        "depth": depth_acc,
        "alpha": 1.0 - t_final,
        "t_final": t_final,
        "radii": splats.radii,
        "visibility_filter": splats.visible,
        "n_dropped": binned.n_dropped,
        "n_entries": binned.n_entries,
    }


def score_render(**kwargs) -> dict:
    """Render + per-splat importance (the comp- rasterizer's
    score_flag=True variant, SURVEY.md §2.9.1): important_score[g] =
    sum over pixels of the splat's blend weight T*alpha — obtained as the
    VJP of sum(rgb_accum) w.r.t. a post-clamp color probe, reusing the
    hand-derived backward kernel."""
    n = kwargs["means3d"].shape[0]
    probe = jnp.zeros((n, 3), jnp.float32)

    def channel_sum(p):
        out = render(**kwargs, colors_probe=p)
        # pre-background accumulated rgb = image - T*bg; per-channel grad
        # of its sum w.r.t. the probe is the blend-weight sum
        rgb_acc = out["image"] - out["t_final"][None] * kwargs["bg"][:, None, None]
        return jnp.sum(rgb_acc[0]), out

    (_, out), g = jax.value_and_grad(channel_sum, has_aux=True)(probe)
    out["important_score"] = jax.lax.stop_gradient(g[:, 0])
    return out
