"""Tile binning for the Pallas rasterizer — static shapes, no atomics.

TPU-native replacement for the CUDA rasterizer's duplicate+radix-sort
binning stage (reference contract: SURVEY.md §2.9.1 "binning"): instead of
dynamically-sized duplication, splats are expanded into a **fixed-capacity
entry table**:

  1. depth-sort the N splats once (one small 2-operand XLA sort); all
     later stages work in *depth-rank* space, so an entry's secondary sort
     key is just its splat's rank — no float depth keys downstream;
  2. each visible splat owns a contiguous run of entries — one per touched
     16x16 tile — located via an exclusive cumsum of touched-tile counts;
     the entry->rank mapping is recovered with a scatter+cumsum (no
     searchsorted, no per-splat loops);
  3. entries are sorted by a SINGLE packed uint32 key `(tile << S) | rank`
     carrying only the entry index as payload (falls back to a 2-key sort
     when tile/rank bits exceed 32); per-tile runs come out front-to-back;
  4. every tile's run is padded to a multiple of CHUNK entries (min one
     chunk, so empty tiles still emit background) and re-scattered into a
     padded table whose chunk c maps to exactly one tile — this is what
     lets the composite kernel run a flat 1D grid with automatically
     pipelined record fetches.

Because expansion happens in depth-rank order, each splat's entries are
contiguous *in expansion order* — so the backward record-gather reduction
needs NO sort: `pos_of_entry` (padded-table position of each expansion
entry, one int scatter here) lets the VJP gather grad rows into
rank-contiguous order and segment-reduce with a cumsum difference
(ops/rasterizer.gather_records).

Overflow beyond `capacity` drops the *farthest* splats (graceful quality
degradation, reported via `n_dropped`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16          # pixels per tile side
TILE_PIX = TILE * TILE


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


class BinnedSplats(NamedTuple):
    entry_rank: jnp.ndarray    # [padded_capacity] int32 depth rank, -1 = empty
    tile_of_chunk: jnp.ndarray  # [n_chunks] int32 tile id (n_tiles = trash)
    first_chunk: jnp.ndarray   # [n_chunks] int32 1 if first chunk of its tile
    tile_x0: jnp.ndarray       # [n_chunks] int32 tile pixel origin x
    tile_y0: jnp.ndarray       # [n_chunks] int32 tile pixel origin y
    n_entries: jnp.ndarray     # [] int32 actual entries before padding
    n_dropped: jnp.ndarray     # [] int32 entries lost to capacity overflow
    perm: jnp.ndarray          # [N] int32 depth rank -> original splat id
    inv_perm: jnp.ndarray      # [N] int32 original splat id -> depth rank
    surv_counts: jnp.ndarray   # [N] int32 surviving entries per rank
    seg_starts: jnp.ndarray    # [N] int32 expansion-order segment start per rank
    pos_of_entry: jnp.ndarray  # [capacity] int32 padded position of entry e
                               # (= padded_capacity for absent entries)


def padded_capacity(capacity: int, n_tiles: int, chunk: int) -> int:
    """Static size of the padded entry table."""
    cap = cdiv(capacity, chunk) * chunk + n_tiles * chunk
    return cap


def bin_splats(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    visible: jnp.ndarray,
    width: int,
    height: int,
    capacity: int,
    chunk: int = 128,
) -> BinnedSplats:
    """Build the padded, tile-sorted, depth-ordered entry table."""
    n = means2d.shape[0]
    tiles_x = cdiv(width, TILE)
    tiles_y = cdiv(height, TILE)
    n_tiles = tiles_x * tiles_y
    pad_cap = padded_capacity(capacity, n_tiles, chunk)

    means2d = jax.lax.stop_gradient(means2d)
    depths_sg = jax.lax.stop_gradient(depths)

    # 1. depth pre-sort: positive-f32 bit patterns sort like floats, and the
    # stable sort keeps original-index tie order. Everything below works in
    # depth-rank space (rank 0 = nearest).
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depths_sg, 1e-6).astype(jnp.float32), jnp.int32
    )
    idx = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((depth_bits, idx), num_keys=1)
    inv_perm = jnp.zeros((n,), jnp.int32).at[perm].set(idx)

    # 2. touched-tile rects in RANK order (one packed row gather).
    # CUDA getRect semantics (rect of tiles covering mean +- radius).
    geo = jnp.stack(
        [means2d[:, 0], means2d[:, 1], radii.astype(jnp.float32),
         visible.astype(jnp.float32)],
        axis=1,
    )[perm]                                               # [N, 4]
    mx, my, r, vis = geo[:, 0], geo[:, 1], geo[:, 2], geo[:, 3] > 0.5
    x0 = jnp.clip(jnp.floor((mx - r) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    nx = jnp.where(vis, x1 - x0, 0)
    ny = jnp.where(vis, y1 - y0, 0)
    count = nx * ny                                       # [N] rank order
    offsets = jnp.cumsum(count) - count                   # exclusive
    total = jnp.minimum(offsets[-1] + count[-1], capacity)
    n_dropped = jnp.maximum(offsets[-1] + count[-1] - capacity, 0)

    # 3. entry -> rank (scatter + cumsum trick).
    # PERF NOTES (measured on v5e): one scatter + cumsum beats
    # jnp.searchsorted over entry-sized arrays by >100x; all per-entry
    # splat fields are fetched with ONE packed row gather (scalar gathers
    # of 1M+ elements cost ~13ms each).
    marks = jnp.zeros((capacity,), jnp.int32).at[offsets].add(1, mode="drop")
    drank = jnp.cumsum(marks) - 1                         # [capacity]
    e = jnp.arange(capacity, dtype=jnp.int32)

    pack = jnp.stack([x0, y0, nx, count, offsets], axis=1)
    g = pack[drank]                                       # [capacity, 5]
    slot = e - g[:, 4]
    valid = (e < total) & (slot < g[:, 3]) & (slot >= 0)
    gnx = jnp.maximum(g[:, 2], 1)
    tx = g[:, 0] + slot % gnx
    ty = g[:, 1] + slot // gnx
    tile = jnp.where(valid, ty * tiles_x + tx, n_tiles)   # trash tile = n_tiles

    # 4. sort entries by (tile, rank) carrying only the entry index.
    # Fast path: one packed uint32 key — halves the sort operands vs the
    # 2-key form; exact fallback when (tile, rank) exceeds 32 bits.
    shift = max(int(n - 1).bit_length(), 1)
    if (n_tiles + 1) * (1 << shift) <= (1 << 32):
        key = (tile.astype(jnp.uint32) << shift) | jnp.clip(
            drank, 0, n - 1
        ).astype(jnp.uint32)
        key_s, e_s = jax.lax.sort((key, e), num_keys=1)
        tile_s = (key_s >> shift).astype(jnp.int32)
        rank_s = (key_s & jnp.uint32((1 << shift) - 1)).astype(jnp.int32)
    else:
        tile_s, rank_s, e_s = jax.lax.sort(
            (tile, jnp.clip(drank, 0, n - 1), e), num_keys=2
        )

    # per-tile first indices from the sorted keys (1025 binary searches
    # over the sorted array — cheap; the scatter-add histogram is not)
    tile_first = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts_t = tile_first[1:] - tile_first[:-1]           # [n_tiles]
    padded_counts = jnp.maximum(cdiv_dyn(counts_t, chunk), 1) * chunk
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)]
    )  # [n_tiles + 1]

    # 5. padded table by gather: chunk-aligned padding means a position's
    # tile is its chunk's tile (computed by 10K cheap binary searches)
    n_chunks_l = pad_cap // chunk
    c_start = jnp.arange(n_chunks_l, dtype=jnp.int32) * chunk
    tile_of_chunk = (
        jnp.searchsorted(padded_starts, c_start, side="right").astype(jnp.int32)
        - 1
    )
    tile_of_chunk = jnp.where(
        c_start < padded_starts[-1], tile_of_chunk, n_tiles
    ).astype(jnp.int32)
    t_of_p = jnp.repeat(tile_of_chunk, chunk)             # [pad_cap]
    t_clip = jnp.clip(t_of_p, 0, n_tiles - 1)
    tpack = jnp.stack(
        [padded_starts[:-1], tile_first[:-1], counts_t], axis=1
    )                                                     # [n_tiles, 3]
    tg = tpack[t_clip]                                    # [pad_cap, 3]
    p = jnp.arange(pad_cap, dtype=jnp.int32)
    prank = p - tg[:, 0]
    in_use = (t_of_p < n_tiles) & (prank >= 0) & (prank < tg[:, 2])
    src = jnp.clip(tg[:, 1] + prank, 0, capacity - 1)
    se = jnp.stack([rank_s, e_s], axis=1)[src]            # [pad_cap, 2]
    entry_rank = jnp.where(in_use, se[:, 0], -1)

    # padded position of each expansion-order entry (for the sort-free
    # gather-VJP): invert the injective in_use -> entry map with one int
    # scatter; absent entries point at the trash row pad_cap.
    e_of_p = jnp.where(in_use, se[:, 1], capacity)        # capacity = OOB, dropped
    pos_of_entry = jnp.full((capacity,), pad_cap, jnp.int32).at[e_of_p].set(
        p, mode="drop"
    )

    # per-rank survivor segments: expansion order is rank-contiguous.
    surv = jnp.clip(jnp.minimum(offsets + count, total) - offsets, 0, count)

    # 6. per-chunk metadata
    first_chunk = (
        c_start == padded_starts[jnp.clip(tile_of_chunk, 0, n_tiles)]
    ) | (tile_of_chunk == n_tiles)
    # trash chunks: mark only the very first as "first" (state reset once)
    is_trash = tile_of_chunk == n_tiles
    first_trash = is_trash & ~jnp.concatenate(
        [jnp.zeros((1,), bool), is_trash[:-1]]
    )
    first_chunk = jnp.where(is_trash, first_trash, first_chunk).astype(jnp.int32)

    tile_clamped = jnp.minimum(tile_of_chunk, n_tiles)
    tile_x0 = jnp.where(is_trash, 0, (tile_clamped % tiles_x) * TILE).astype(jnp.int32)
    tile_y0 = jnp.where(is_trash, tiles_y * TILE, (tile_clamped // tiles_x) * TILE)
    tile_y0 = tile_y0.astype(jnp.int32)

    return BinnedSplats(
        entry_rank=entry_rank,
        tile_of_chunk=tile_of_chunk,
        first_chunk=first_chunk,
        tile_x0=tile_x0,
        tile_y0=tile_y0,
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
