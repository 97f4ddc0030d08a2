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
    depth_order: jnp.ndarray   # [N] int32 splat indices sorted by depth


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

    # 1. depth order (invisible splats pushed to the back)
    order = jnp.argsort(jnp.where(visible, depths_sg, jnp.inf)).astype(jnp.int32)
    mx = means2d[order, 0]
    my = means2d[order, 1]
    r = radii[order].astype(jnp.float32)
    vis = visible[order]

    # 2. touched-tile rects (CUDA getRect semantics)
    x0 = jnp.clip(jnp.floor((mx - r) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    nx = jnp.where(vis, x1 - x0, 0)
    ny = jnp.where(vis, y1 - y0, 0)
    count = nx * ny                                       # [N]
    offsets = jnp.cumsum(count) - count                   # exclusive, ascending
    total = jnp.minimum(offsets[-1] + count[-1], capacity)
    n_dropped = jnp.maximum(offsets[-1] + count[-1] - capacity, 0)

    # 3. entry -> depth-ranked splat. NOTE: scatter-free — XLA scatters
    # with colliding indices serialize badly on TPU (measured 10x+ the
    # whole composite kernel); every step below is searchsorted + gather.
    n = count.shape[0]
    e = jnp.arange(capacity, dtype=jnp.int32)
    drank = jnp.clip(
        jnp.searchsorted(offsets, e, side="right").astype(jnp.int32) - 1,
        0, n - 1,
    )
    slot = e - offsets[drank]
    valid = (e < total) & (slot < count[drank]) & (slot >= 0)
    tx = x0[drank] + slot % jnp.maximum(nx[drank], 1)
    ty = y0[drank] + slot // jnp.maximum(nx[drank], 1)
    tile = jnp.where(valid, ty * tiles_x + tx, n_tiles)   # trash tile = n_tiles

    # 4. stable sort by tile (preserves depth order within tile)
    perm = jnp.argsort(tile, stable=True).astype(jnp.int32)
    tile_s = tile[perm]
    gid_s = jnp.where(valid[perm], order[drank[perm]], -1)

    # per-tile counts from the sorted keys (no histogram scatter)
    tile_first = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts_t = tile_first[1:] - tile_first[:-1]           # [n_tiles]
    padded_counts = jnp.maximum(cdiv_dyn(counts_t, chunk), 1) * chunk
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)]
    )  # [n_tiles + 1]

    # 5. padded table by GATHER: position p belongs to tile t; its source
    # is the rank-th sorted entry of that tile.
    p = jnp.arange(pad_cap, dtype=jnp.int32)
    t_of_p = jnp.clip(
        jnp.searchsorted(padded_starts, p, side="right").astype(jnp.int32) - 1,
        0, n_tiles - 1,
    )
    rank = p - padded_starts[t_of_p]
    in_use = (p < padded_starts[-1]) & (rank < counts_t[t_of_p])
    src = jnp.clip(tile_first[t_of_p] + rank, 0, capacity - 1)
    entry_gid = jnp.where(in_use, gid_s[src], -1)

    # 5. per-chunk metadata
    c_start = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    tile_of_chunk = (
        jnp.searchsorted(padded_starts, c_start, side="right").astype(jnp.int32) - 1
    )
    tile_of_chunk = jnp.where(
        c_start < padded_starts[-1], tile_of_chunk, n_tiles
    ).astype(jnp.int32)
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
        depth_order=order,
    )


def cdiv_dyn(a: jnp.ndarray, b: int) -> jnp.ndarray:
    return -(-a // b)
