"""Tile binning for the Pallas rasterizer — static shapes, no atomics.

TPU-native replacement for the CUDA rasterizer's duplicate+radix-sort
binning stage (reference contract: SURVEY.md §2.9.1 "binning"): instead of
dynamically-sized duplication, splats are expanded into a **fixed-capacity
entry table**:

  1. depth-sort the N splats (one XLA sort of N keys);
  2. each visible splat owns a contiguous run of entries — one per touched
     16x16 tile — located via an exclusive cumsum of touched-tile counts;
     the entry->splat mapping is recovered with a scatter+cumsum (no
     searchsorted, no per-splat loops);
  3. entries are stable-sorted by tile id (splats are already in depth
     order, so per-tile order is front-to-back);
  4. every tile's run is padded to a multiple of CHUNK entries (min one
     chunk, so empty tiles still emit background) and re-scattered into a
     padded table whose chunk c maps to exactly one tile — this is what
     lets the composite kernel run a flat 1D grid with automatically
     pipelined record fetches.

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
    entry_gid: jnp.ndarray     # [padded_capacity] int32 splat index, -1 = empty
    tile_of_chunk: jnp.ndarray  # [n_chunks] int32 tile id (n_tiles = trash)
    first_chunk: jnp.ndarray   # [n_chunks] int32 1 if first chunk of its tile
    tile_x0: jnp.ndarray       # [n_chunks] int32 tile pixel origin x
    tile_y0: jnp.ndarray       # [n_chunks] int32 tile pixel origin y
    n_entries: jnp.ndarray     # [] int32 actual entries before padding
    n_dropped: jnp.ndarray     # [] int32 entries lost to capacity overflow
    surv_counts: jnp.ndarray   # [N] int32 entries of each splat that survived
    seg_starts: jnp.ndarray    # [N] int32 segment start in gid-sorted order


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
    n_chunks = pad_cap // chunk

    means2d = jax.lax.stop_gradient(means2d)
    depths_sg = jax.lax.stop_gradient(depths)

    # 1. touched-tile rects in ORIGINAL splat order (no pre-sort, no
    # gathers; depth ordering is folded into the entry sort below).
    # CUDA getRect semantics (rect of tiles covering mean +- radius).
    mx = means2d[:, 0]
    my = means2d[:, 1]
    r = radii.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((mx - r) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    nx = jnp.where(visible, x1 - x0, 0)
    ny = jnp.where(visible, y1 - y0, 0)
    count = nx * ny                                       # [N]
    offsets = jnp.cumsum(count) - count                   # exclusive
    total = jnp.minimum(offsets[-1] + count[-1], capacity)
    n_dropped = jnp.maximum(offsets[-1] + count[-1] - capacity, 0)

    # 2. entry -> splat (scatter + cumsum trick).
    # PERF NOTES (measured on v5e): one scatter + cumsum beats
    # jnp.searchsorted over entry-sized arrays by >100x; all per-entry
    # splat fields are fetched with ONE packed row gather (scalar gathers
    # of 1M+ elements cost ~13ms each); depth enters the entry sort as a
    # second key (positive-f32 bits sort like floats), killing the
    # depth argsort + re-gather chain entirely.
    marks = jnp.zeros((capacity,), jnp.int32).at[offsets].add(1, mode="drop")
    dsplat = jnp.cumsum(marks) - 1                        # [capacity]
    e = jnp.arange(capacity, dtype=jnp.int32)

    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depths_sg, 1e-6).astype(jnp.float32), jnp.int32
    )
    pack = jnp.stack([x0, y0, nx, count, offsets, depth_bits], axis=1)
    g = pack[dsplat]                                      # [capacity, 6]
    slot = e - g[:, 4]
    valid = (e < total) & (slot < g[:, 3]) & (slot >= 0)
    gnx = jnp.maximum(g[:, 2], 1)
    tx = g[:, 0] + slot % gnx
    ty = g[:, 1] + slot // gnx
    tile = jnp.where(valid, ty * tiles_x + tx, n_tiles)   # trash tile = n_tiles

    # 3. sort entries by (tile, depth) carrying the splat id
    gid0 = jnp.where(valid, dsplat, -1)
    tile_s, _, gid_s = jax.lax.sort(
        (tile, g[:, 5], gid0), num_keys=2
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

    # 4. padded table by gather: chunk-aligned padding means a position's
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
    rank = p - tg[:, 0]
    in_use = (t_of_p < n_tiles) & (rank >= 0) & (rank < tg[:, 2])
    src = jnp.clip(tg[:, 1] + rank, 0, capacity - 1)
    entry_gid = jnp.where(in_use, gid_s[src], -1)

    # per-splat survivor segments (for the gather-VJP segmented reduction,
    # rasterizer.gather_records): in gid-sorted order the -1 padding rows
    # come first, then each splat's entries contiguously.
    surv = jnp.clip(jnp.minimum(offsets + count, total) - offsets, 0, count)
    n_pad_rows = pad_cap - jnp.sum(surv)
    seg_starts = n_pad_rows + jnp.cumsum(surv) - surv

    # 5. per-chunk metadata
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
        entry_gid=entry_gid,
        tile_of_chunk=tile_of_chunk,
        first_chunk=first_chunk,
        tile_x0=tile_x0,
        tile_y0=tile_y0,
        n_entries=total,
        n_dropped=n_dropped,
        surv_counts=surv,
        seg_starts=seg_starts,
    )


def cdiv_dyn(a: jnp.ndarray, b: int) -> jnp.ndarray:
    return -(-a // b)
