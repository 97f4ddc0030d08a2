"""Tile binning for the Pallas rasterizer — static shapes, no atomics.

TPU-native replacement for the CUDA rasterizer's duplicate+radix-sort
binning stage (reference contract: SURVEY.md §2.9.1 "binning"): instead of
dynamically-sized duplication, splats are expanded into a **fixed-capacity
entry table**:

  1. depth-sort the N splats once (one small 2-operand XLA sort); all
     later stages work in *depth-rank* space, so an entry's secondary sort
     key is just its splat's rank — no float depth keys downstream;
  2. each visible splat owns a contiguous run of entries — one per touched
     (tile_w x tile_h) tile (16x16 default; anisotropic 32x16 cuts raw
     entries ~0.64x on real scenes) — located via an exclusive cumsum of
     touched-tile counts;
     the entry->rank mapping is recovered with a scatter+cumsum (no
     searchsorted, no per-splat loops);
  3. entries are sorted by a SINGLE packed uint32 key `(tile << S) | rank`
     carrying the entry index and splat id as payloads; when tile+rank
     bits exceed 32 the low rank bits are DROPPED from the key — the
     sort is stable and expansion order is rank-major, so ties keep
     exact depth order; per-tile runs come out front-to-back;
  4. instead of materializing a chunk-padded record table (measured ~25ms
     of XLA gather/select at 1.2M entries), binning emits tiny per-chunk
     metadata (tile, start row, live rows, tile-start flag) and the
     composite mega-kernel streams CHUNK-row slices of the *sorted*
     record table straight from HBM at those dynamic offsets
     (ops/composite.py).

Because expansion happens in depth-rank order, each splat's entries are
contiguous *in expansion order* — so the backward record-gather reduction
needs NO scatter: `pos_of_entry` (the chunk-aligned grad-table position of
each expansion entry, recovered with one cheap 2-operand sort) lets the
VJP gather grad rows into rank-contiguous order and segment-reduce with a
cumsum difference (ops/rasterizer.gather_records).

Overflow beyond `capacity` drops the *farthest* splats (graceful quality
degradation, reported via `n_dropped`).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dreamscene_tpu.ops.expand import expand_entries
from dreamscene_tpu.ops.gather import u16_row_gather_i32

TILE = 16          # legacy square-tile side (16x16 default)
TILE_PIX = TILE * TILE

# Anisotropic tile shape (ROADMAP lead 1): a (tile_w, tile_h) tile trades
# kernel entry-pixel pairs against raw entry count — measured on the
# bench scene, 32x16 cuts raw entries to 0.643x (so the capacity-
# proportional XLA per-entry stack shrinks with it) at 1.286x pairs.
# 32x16 is the measured round-4 default: controller-tracked zero-drop
# throughput 2.98 -> 4.66 Mpix/s on-chip vs 16x16 (chunk 384), with
# full-scale compiled parity green at both shapes.
# Resolution order: explicit argument > DS_TILE_W/DS_TILE_H env > default.
# NOTE: the env vars are read ONCE at import time (frozen here) — setting
# them after `import dreamscene_tpu` has no effect, and every process of a
# multi-process run must launch with the same values (the sharded-render
# band-alignment asserts check DEFAULT_TILE_H). Upstream-bit-comparable
# runs against the CUDA reference's fixed 16x16 getRect granularity must
# set DS_TILE_W=16 DS_TILE_H=16 before import (the in-repo parity golden
# is tile-parameterized; tests keep a 16x16-pinned leg).
DEFAULT_TILE_W = int(os.environ.get("DS_TILE_W", "32"))
DEFAULT_TILE_H = int(os.environ.get("DS_TILE_H", "16"))


def resolve_tile(tile_w: int | None, tile_h: int | None) -> tuple[int, int]:
    return (DEFAULT_TILE_W if tile_w is None else tile_w,
            DEFAULT_TILE_H if tile_h is None else tile_h)

# Carry the 3 capsule-cull channels through the depth sort as extra
# payload operands instead of the rank-order row gather. Result-identical
# (payloads ride the same stable sort, pinned bit-exact by
# tests/test_gated_variants.py); measured ON-CHIP as the only winner of
# the round-2 gate sweep: solo 4.91 vs 4.70 Mpix/s defaults (+4.5%).
# DS_CAPS_VIA_SORT=0 reverts to the rank-order gather.
_CAPS_VIA_SORT = os.environ.get("DS_CAPS_VIA_SORT", "1") == "1"
# packed (basenx, count) single-payload sort applies while their bits fit
# this budget (module-level so tests can force the unpacked branch)
_SORT_PACK_BIT_BUDGET = 31
# expand-kernel entry block length. Its window-mask compare cost scales
# ~ capacity * (block / (128 * entries_per_splat) + 2): wider tiles
# (fewer entries/splat) push the optimum DOWN, per-block fixed cost
# pushes it up — A/B'd on chip (see ROADMAP round-4).
_EXPAND_BLOCK = int(os.environ.get("DS_EXPAND_BLOCK", "2048"))


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


class BinnedSplats(NamedTuple):
    rank_sorted: jnp.ndarray   # [capacity] int32 depth rank of sorted entry
    gid_sorted: jnp.ndarray    # [capacity] int32 original splat id of entry
    n_chunks_used: jnp.ndarray # [] int32 live chunk count (kernel loop bound)
    chunk_tile: jnp.ndarray    # [n_chunks] int32 tile id (n_tiles = trash)
    chunk_s0: jnp.ndarray      # [n_chunks] int32 128-aligned sorted column
    chunk_lo: jnp.ndarray      # [n_chunks] int32 first live lane of chunk
    chunk_hi: jnp.ndarray      # [n_chunks] int32 end of live lanes
    chunk_first: jnp.ndarray   # [n_chunks+1] int32 1 = chunk starts a tile
    n_entries: jnp.ndarray     # [] int32 actual entries before padding
    n_dropped: jnp.ndarray     # [] int32 entries lost to capacity overflow
    perm: jnp.ndarray          # [N] int32 depth rank -> original splat id
    inv_perm: jnp.ndarray      # [N] int32 original splat id -> depth rank
    surv_counts: jnp.ndarray   # [N] int32 surviving entries per rank
    seg_starts: jnp.ndarray    # [N] int32 expansion-order segment start per rank
    pos_of_entry: jnp.ndarray  # [capacity] int32 grad-table position of entry e


ALIGN = 128   # DMA lane alignment of chunk starts


def max_chunks(capacity: int, n_tiles: int, chunk: int) -> int:
    """Static chunk-count bound. Tile t occupies cdiv(off_t + c_t, chunk)
    chunks with off_t in [0, ALIGN); summing the bound
    (off_t + c_t + chunk - 1) / chunk over tiles gives
    capacity/chunk + n_tiles*(ALIGN - 1 + chunk - 1)/chunk (+1 for the
    outer cdiv) — at chunk=2*ALIGN that is ~1.5 chunks/tile of slack
    instead of the naive 2 (the grad table, both composite kernel loops
    and the backward grad gather all scale with this bound)."""
    return (
        cdiv(capacity, chunk)
        + cdiv(n_tiles * (ALIGN - 1 + chunk - 1), chunk)
        + 1
    )


def bin_splats(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    visible: jnp.ndarray,
    width: int,
    height: int,
    capacity: int,
    chunk: int = 256,
    conics: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
    interpret: bool = False,
    rank_drop_override: int | None = None,
    tile_w: int | None = None,
    tile_h: int | None = None,
) -> BinnedSplats:
    """Build the tile-sorted, depth-ordered entry table + chunk metadata.

    When `conics`/`opacities` are given, entries whose splat cannot reach
    alpha >= 1/255 anywhere in their (tile_w x tile_h) tile are re-keyed to
    the trash tile
    (conservative capsule+circle test, see `_capsule_params`). This BEATS the
    CUDA reference's square-rect binning: those entries contribute
    EXACTLY zero in the composite kernel (its `raw < ALPHA_MIN` mask),
    so results are unchanged while live per-tile runs — and both
    composite kernels' work — shrink by the cull rate."""
    n = means2d.shape[0]
    tile_w, tile_h = resolve_tile(tile_w, tile_h)
    tiles_x = cdiv(width, tile_w)
    tiles_y = cdiv(height, tile_h)
    n_tiles = tiles_x * tiles_y
    n_chunks = max_chunks(capacity, n_tiles, chunk)

    means2d = jax.lax.stop_gradient(means2d)
    depths_sg = jax.lax.stop_gradient(depths)

    # 1. touched-tile rects in ORIGINAL order (all elementwise).
    # CUDA getRect semantics (rect of tiles covering mean +- radius) —
    # tightened per-axis to the ellipse's axis-aligned bounding box at
    # the alpha = 1/255 level when conics/opacities are available:
    # hx = sqrt(tq * cov_xx) with cov = conic^-1, tq = 2*log(255*opa).
    # Tiles beyond the AABB are zero contributors (raw < ALPHA_MIN or
    # outside the reference's square rect), so this is result-neutral
    # while, unlike the post-expansion cull, it happens BEFORE the
    # capacity cut — anisotropic and low-opacity splats stop consuming
    # entry slots at all (opa < 1/255 splats vanish from binning).
    mx, my = means2d[:, 0], means2d[:, 1]
    r = radii.astype(jnp.float32)
    if conics is not None and opacities is not None:
        ca, cb, cc = conics[:, 0], conics[:, 1], conics[:, 2]
        tq = 2.0 * jnp.log(
            255.0 * jnp.maximum(opacities.astype(jnp.float32), 1e-30)
        )
        det = jnp.maximum(ca * cc - cb * cb, 1e-24)
        tq_pos = jnp.maximum(tq, 0.0)
        # +0.6 px: fp slop + the half-open pixel-vs-rect convention
        hx = jnp.sqrt(tq_pos * jnp.maximum(cc, 0.0) / det) + 0.6
        hy = jnp.sqrt(tq_pos * jnp.maximum(ca, 0.0) / det) + 0.6
        vis_extra = tq > 0   # opa < 1/255 never passes ALPHA_MIN: 0 entries
    else:
        hx = hy = None
        vis_extra = True
    vis = visible.astype(bool) & vis_extra
    # the contract rect (must never be EXCEEDED: the golden zeroes tiles
    # outside it by fiat, so extra tiles would ADD contributions)
    x0 = jnp.clip(jnp.floor((mx - r) / tile_w), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / tile_h), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r + tile_w - 1) / tile_w), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r + tile_h - 1) / tile_h), 0, tiles_y).astype(jnp.int32)
    if hx is not None:
        # intersect with the ellipse AABB using mathematically-INCLUSIVE
        # tile ends (the CUDA-replica `floor((E + 15)/16)` end formula
        # under-includes fractional ends — only consistent when both
        # sides use the same extent, so the tightened axes must include
        # the tile containing mx +- hx outright)
        x0 = jnp.maximum(x0, jnp.clip(
            jnp.floor((mx - hx) / tile_w), 0, tiles_x).astype(jnp.int32))
        y0 = jnp.maximum(y0, jnp.clip(
            jnp.floor((my - hy) / tile_h), 0, tiles_y).astype(jnp.int32))
        x1 = jnp.minimum(x1, jnp.clip(
            jnp.floor((mx + hx) / tile_w) + 1, 0, tiles_x).astype(jnp.int32))
        y1 = jnp.minimum(y1, jnp.clip(
            jnp.floor((my + hy) / tile_h) + 1, 0, tiles_y).astype(jnp.int32))
    nx = jnp.where(vis, x1 - x0, 0)
    ny = jnp.where(vis, y1 - y0, 0)
    count0 = nx * ny                                      # [N] original order
    # basenx packs the splat's first tile id and rect width into one i32
    # (nx <= tiles_x <= 255 for any width <= 255 * tile_w px).
    assert tiles_x <= 255, "image wider than 255 tiles: widen basenx packing"
    basenx0 = (y0 * tiles_x + x0) * 256 + nx

    # 2. depth pre-sort with EMPTY SPLATS FORCED TO THE TAIL: positive-f32
    # bit patterns sort like u32 ints and stay below 2^31, so oring
    # (count==0) into bit 31 of a u32 key sorts all entry-producing splats
    # front in depth order and all empties last — at zero extra cost.
    # This makes `offsets` strictly increasing over the kept prefix —
    # the contiguity the expand kernel's splat windows rely on. The geo
    # columns ride the same sort as payloads (a 4-operand 300K sort costs
    # ~0.4ms more than 2-operand; the alternative [N,2] row gather by
    # perm measured 1.8ms). Rank r >= n_kept (empty) owns zero entries.
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depths_sg, 1e-6).astype(jnp.float32), jnp.uint32
    )
    dkey = depth_bits | (jnp.uint32(1) << 31) * (count0 == 0).astype(jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.int32)
    use_cull = conics is not None and opacities is not None
    caps_extra = ()
    if use_cull and _CAPS_VIA_SORT:
        caps_extra = _capsule_params(means2d, conics, opacities)
    # pack (basenx, count) into ONE u32 payload when the bit budget
    # allows (512^2: 18+11 bits) — a 3-operand 300K sort runs ~0.5 ms
    # faster than 4-operand on v5e
    max_count_bits = (tiles_x * tiles_y).bit_length()   # count <= n_tiles
    base_bits = ((n_tiles - 1) * 256 + 255).bit_length()
    if base_bits + max_count_bits <= _SORT_PACK_BIT_BUDGET:
        packed0 = jax.lax.bitcast_convert_type(
            basenx0 << max_count_bits, jnp.uint32
        ) | count0.astype(jnp.uint32)
        _, perm, packed, *caps_s = jax.lax.sort(
            (dkey, idx, packed0, *caps_extra), num_keys=1)
        basenx = jax.lax.bitcast_convert_type(
            packed >> max_count_bits, jnp.int32)
        count = jax.lax.bitcast_convert_type(
            packed & jnp.uint32((1 << max_count_bits) - 1), jnp.int32)
    else:
        _, perm, basenx, count, *caps_s = jax.lax.sort(
            (dkey, idx, basenx0, count0, *caps_extra), num_keys=1
        )
    # invert the permutation with a second small sort (2-op sorts run at
    # ~0.4ms/300K on v5e; an equivalent int scatter measured 1.75ms)
    _, inv_perm = jax.lax.sort((perm, idx), num_keys=1)

    offsets = jnp.cumsum(count) - count                   # exclusive
    total = jnp.minimum(offsets[-1] + count[-1], capacity)
    n_dropped = jnp.maximum(offsets[-1] + count[-1] - capacity, 0)

    # 3. per-entry packed sort key (tile << shift | rank) and original
    # splat id via the Pallas ragged-expand kernel (ops/expand.py) — the
    # XLA delta-scatter+cumsum formulation measured 13.1ms at 300K->1.2M
    # (layout-transposed scatter writes); the kernel's window matmuls do
    # it in <1ms. Emitting gid here lets the entry sort carry the
    # record-gather index directly, deleting the [N,16] depth-reorder
    # gather of the record table (measured 1.9-6.6ms depending on XLA's
    # layout mood).
    # key budget: tile needs bit_length(n_tiles) bits (trash = n_tiles),
    # rank needs bit_length(n-1). When the sum exceeds 32 (e.g. 3M
    # splats at 512^2), drop low rank bits from the key: the entry sort
    # is STABLE and expansion order is rank-major, so entries tying on
    # (tile, coarse rank) still come out in exact depth order.
    shift = max(int(n - 1).bit_length(), 1)
    rank_drop = max(0, int(n_tiles).bit_length() + shift - 32)
    if rank_drop_override is not None:   # test hook: exercise the
        rank_drop = rank_drop_override   # coarse-key path at small N
    shift -= rank_drop
    assert shift >= 1, "image too large: tile bits alone exceed the key"
    caps = None
    if use_cull:
        # per-splat capsule channels for the IN-KERNEL entry cull: the
        # expand window table has 3 idle rows riding an already-paid
        # matmul, so the test data travels for free (the previous
        # XLA-side exact-Q cull paid a ~2 ms per-entry feature gather).
        if _CAPS_VIA_SORT:
            caps = tuple(caps_s)                             # rank order
        else:
            caps0 = jnp.stack(
                _capsule_params(means2d, conics, opacities), axis=1)
            caps = u16_row_gather_i32(caps0, perm)           # rank order
            caps = tuple(caps[:, j] for j in range(3))
    key_i32, gid = expand_entries(
        offsets, basenx, perm, total,
        capacity=capacity, n=n, n_tiles=n_tiles, tiles_x=tiles_x,
        shift=shift, rank_drop=rank_drop, caps=caps, interpret=interpret,
        block=_EXPAND_BLOCK, tile_w=tile_w, tile_h=tile_h,
    )

    # 4. sort entries by the packed key (u32-reinterpreted: the in-kernel
    # i32 shift may wrap into the sign bit), carrying the entry index and
    # the splat id.
    e = jnp.arange(capacity, dtype=jnp.int32)
    key_u = jax.lax.bitcast_convert_type(key_i32, jnp.uint32)
    key_s, e_s, gid_s = jax.lax.sort((key_u, e, gid), num_keys=1)
    tile_s = (key_s >> shift).astype(jnp.int32)
    # coarse when rank_drop > 0 (low bits dropped from the key; order is
    # still exact by stability) — diagnostics only
    rank_s = ((key_s & jnp.uint32((1 << shift) - 1))
              << rank_drop).astype(jnp.int32)

    # 5. per-chunk metadata from per-tile runs (1025 binary searches over
    # the sorted keys — cheap; a scatter-add histogram is not). Each
    # tile's DMA window starts at its run start rounded DOWN to a lane
    # boundary so every record slice is (8,128)-tile aligned; the leading
    # overlap (a neighbor tile's entries) is masked out via the per-chunk
    # live-lane window [lo, hi).
    assert chunk % ALIGN == 0
    tile_first = _counts_below_sorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), pad_val=n_tiles
    )
    counts_t = tile_first[1:] - tile_first[:-1]           # [n_tiles]
    s0_full = (tile_first // ALIGN) * ALIGN               # [n_tiles + 1]
    off_t = tile_first[:-1] - s0_full[:-1]                # [0, ALIGN)
    chunks_per_tile = cdiv_dyn(off_t + counts_t, chunk) * (counts_t > 0)
    chunk_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(chunks_per_tile).astype(jnp.int32)]
    )                                                     # [n_tiles + 1]
    u_used = chunk_base[-1]

    u = jnp.arange(n_chunks, dtype=jnp.int32)
    # side="right" searchsorted over the SMALL [n_tiles+1] chunk_base:
    # one broadcast compare+reduce beats the per-query while-loop
    chunk_tile = jnp.sum(
        chunk_base[None, :] <= u[:, None], axis=1
    ).astype(jnp.int32) - 1
    chunk_tile = jnp.where(u < u_used, chunk_tile, n_tiles)
    tclip = jnp.clip(chunk_tile, 0, n_tiles - 1)
    tpack = jnp.stack(
        [chunk_base[:-1], s0_full[:-1], off_t, counts_t], axis=1
    )
    tg = tpack[tclip]                                     # [n_chunks, 4]
    k = u - tg[:, 0]
    in_use = u < u_used
    chunk_s0 = jnp.where(in_use, tg[:, 1] + k * chunk, 0)
    chunk_lo = jnp.where(in_use, jnp.clip(tg[:, 2] - k * chunk, 0, chunk), 0)
    chunk_hi = jnp.where(
        in_use, jnp.clip(tg[:, 2] + tg[:, 3] - k * chunk, 0, chunk), 0
    )
    chunk_first = jnp.where(in_use, (k == 0), u == u_used).astype(jnp.int32)
    chunk_first = jnp.concatenate(
        [chunk_first, jnp.ones((1,), jnp.int32)]
    )                                                     # flush sentinel

    # 6. grad-table position of each expansion entry (for the sort-free
    # gather-VJP): sorted position s sits at grad column
    # s + padfix[tile(s)] (chunk-aligned layout). padfix is constant
    # across each tile's sorted run, so it is reconstructed with the same
    # delta-scatter + cumsum trick (a 1026-element scatter; the
    # equivalent [1.2M] scalar gather measured 8ms). The
    # expansion->sorted permutation is undone with one cheap 2-operand
    # sort on the carried entry index.
    padfix = chunk_base * chunk - s0_full                 # [n_tiles + 1]
    pdelta = jnp.zeros((capacity,), jnp.int32).at[tile_first].add(
        padfix - jnp.concatenate([jnp.zeros((1,), jnp.int32), padfix[:-1]]),
        mode="drop",
    )
    pos_sorted = e + jnp.cumsum(pdelta)
    _, pos_of_entry = jax.lax.sort((e_s, pos_sorted), num_keys=1)
    pos_of_entry = jnp.clip(pos_of_entry, 0, n_chunks * chunk - 1)

    # per-rank survivor segments: expansion order is rank-contiguous.
    surv = jnp.clip(jnp.minimum(offsets + count, total) - offsets, 0, count)

    return BinnedSplats(
        rank_sorted=rank_s,
        gid_sorted=gid_s,
        n_chunks_used=u_used,
        chunk_tile=chunk_tile,
        chunk_s0=chunk_s0,
        chunk_lo=chunk_lo,
        chunk_hi=chunk_hi,
        chunk_first=chunk_first,
        n_entries=total,
        n_dropped=n_dropped,
        perm=perm,
        inv_perm=inv_perm,
        surv_counts=surv,
        seg_starts=offsets,
        pos_of_entry=pos_of_entry,
    )


def cdiv_dyn(a: jnp.ndarray, b: int) -> jnp.ndarray:
    return -(-a // b)


_SS_STRIDE = 512


def _counts_below_sorted(sorted_vals: jnp.ndarray, t: jnp.ndarray,
                         pad_val: int) -> jnp.ndarray:
    """searchsorted-left over a SORTED i32 array, vectorized for TPU:
    jnp.searchsorted lowers to a per-query binary-search while-loop
    (measured ~1.2 ms combined for the two binning call sites at
    1.2M entries on v5e). Instead: count strided samples < t (one
    broadcast compare), row-gather the one stride-window the answer
    lands in, and count within it. ~0.1 ms, exact.

    sorted_vals is padded to a stride multiple with pad_val, which must
    be >= max(t) so padding never counts."""
    m = sorted_vals.shape[0]
    nb = cdiv(m, _SS_STRIDE)
    sv = jnp.pad(sorted_vals, (0, nb * _SS_STRIDE - m),
                 constant_values=pad_val)
    rows = sv.reshape(nb, _SS_STRIDE)
    samp = rows[:, 0]                                   # [nb]
    # j* = first sample >= t; the answer lies in window max(j*-1, 0)
    jstar = jnp.sum(samp[None, :] < t[:, None], axis=1)  # [T]
    jm = jnp.maximum(jstar - 1, 0).astype(jnp.int32)
    win = rows[jm]                                      # [T, STRIDE]
    return (jm * _SS_STRIDE
            + jnp.sum(win < t[:, None], axis=1)).astype(jnp.int32)


def _capsule_params(means2d, conics, opacities):
    """Per-splat capsule channels for the in-kernel entry cull.

    The composite kernel zeroes any entry-pixel pair with
    raw = opa * exp(-0.5 Q(d)) < ALPHA_MIN (1/255): the reachable set is
    the ellipse Q(d) <= tq, tq = 2*log(255*opa). A CONSERVATIVE superset
    of that ellipse is capsule(segment mid +- v, radius B) INTERSECT
    circle(mid, |v|), where v = A * u_major, A/B the semi-major/minor
    radii at the tq level. The expand kernel tests the entry's 16x16
    tile against both (ops/expand.py) and re-keys provably-zero entries
    to the trash tile — exactly the entries whose work the kernel would
    mask to zero, so results are unchanged (the CUDA reference bins the
    full square rect and pays for them).

    Encoding: 6 x 12-bit fields packed into 3 i32 (values < 2^24, so the
    window delta-sums stay exact in f32): mid_x, mid_y (0.5 px grid,
    [-1024, 1023.5]), v_x, v_y (0.5 px, outward-rounded so the capsule
    only grows), B (0.5 px, +1 px cushion absorbing quantization + fp
    slop; the kernel also widens the per-axis tile half-extents by
    0.3 px — e.g. 7.8 for a 16-px axis, 15.8 for 32 — absorbing the
    0.5-px mid grid, and applies a rotation-aware test threshold),
    no_cull flag (range overflow -> never cull)."""
    ca, cb, cc = conics[:, 0], conics[:, 1], conics[:, 2]
    opa = opacities.astype(jnp.float32)
    tq = 2.0 * jnp.log(255.0 * jnp.maximum(opa, 1e-30))
    half_tr = 0.5 * (ca + cc)
    root = jnp.sqrt(jnp.maximum(0.25 * (ca - cc) ** 2 + cb * cb, 0.0))
    lam_min = jnp.maximum(half_tr - root, 1e-12)
    lam_max = jnp.maximum(half_tr + root, 1e-12)
    tq_pos = jnp.maximum(tq, 0.0)
    big_a = jnp.sqrt(tq_pos / lam_min)
    big_b = jnp.sqrt(tq_pos / lam_max)
    # eigenvector of lam_min (major axis); degenerate -> (1, 0)
    ex = cb
    ey = lam_min - ca
    en = jnp.sqrt(ex * ex + ey * ey)
    degen = en < 1e-8
    ux = jnp.where(degen, 1.0, ex / jnp.maximum(en, 1e-30))
    uy = jnp.where(degen, 0.0, ey / jnp.maximum(en, 1e-30))
    vx = ux * big_a
    vy = uy * big_a

    mx = means2d[:, 0].astype(jnp.float32)
    my = means2d[:, 1].astype(jnp.float32)
    no_cull = (
        (jnp.abs(mx) > 1023.0) | (jnp.abs(my) > 1023.0)
        | (big_a > 1022.0) | ~jnp.isfinite(big_a) | ~jnp.isfinite(vx)
        | ~jnp.isfinite(vy)
    )

    def q_mid(x):      # 0.5-px grid, offset-2048 12-bit
        return jnp.clip(jnp.round(x * 2.0) + 2048.0, 0, 4095)

    def q_out(x):      # outward rounding: the capsule/circle only grow
        return jnp.clip(
            jnp.sign(x) * jnp.ceil(jnp.abs(x) * 2.0) + 2048.0, 0, 4095
        )

    b_enc = jnp.clip(jnp.ceil(big_b * 2.0) + 1.0, 0, 4095)  # +0.5 px cushion
    ch0 = q_mid(mx) * 4096.0 + q_mid(my)
    ch1 = q_out(vx) * 4096.0 + q_out(vy)
    ch2 = b_enc * 4096.0 + no_cull.astype(jnp.float32)
    return (ch0.astype(jnp.int32), ch1.astype(jnp.int32),
            ch2.astype(jnp.int32))
