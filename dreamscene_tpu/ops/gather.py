"""Row-gather helpers tuned to XLA-TPU's gather cost model.

Measured on v5e (scripts/micro_gather*.py, in-one-jit bisection — the
tunnel makes standalone op timings lie): gather cost is dominated by the
SOURCE table size, and sub-32-bit element types run ~5x faster per
source row — but only worth it for small sources (u16 from a 1.7M-row
table measured SLOWER than the plain f32 transpose+gather fusion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def u16_row_gather(src, idx):
    """Exact f32 row gather through a uint16-pair bitcast. XLA's TPU
    gather path runs ~5x faster on sub-32-bit element types (measured
    v5e, 1.2M rows x 16 f32: 9.6-10.3 ms for any 32-bit element form vs
    2.05 ms as u16x32 — scripts/micro_gather2/3.py); splitting each f32
    into its two u16 halves is bit-exact."""
    n, w = src.shape
    s16 = jax.lax.bitcast_convert_type(
        src.astype(jnp.float32), jnp.uint16
    ).reshape(n, 2 * w)
    g = s16[idx]
    return jax.lax.bitcast_convert_type(
        g.reshape(idx.shape[0], w, 2), jnp.float32
    )


def u16_row_gather_i32(src, idx):
    """Exact i32 row gather through the same uint16-pair fast path."""
    n, w = src.shape
    s16 = jax.lax.bitcast_convert_type(
        src.astype(jnp.int32), jnp.uint16
    ).reshape(n, 2 * w)
    g = s16[idx]
    return jax.lax.bitcast_convert_type(
        g.reshape(idx.shape[0], w, 2), jnp.int32
    )


def packed_rows_u16(src_t, idx, pack: int = 4):
    """Gather+select core of the packed-row paths: [K, 2W]-u16 rows (one
    per index) from a FIELD-MAJOR f32 table [W, M], routed through a
    DENSE [M/pack, pack*2W]-u16 packed table.

    Rationale (TPU layout): a [M, 2W]-u16 row table is stored lane-padded
    to 128 (`T(16,128)` tiling), so XLA's gather scans up to 4x the
    payload bytes; packing `pack` records per row makes rows exactly
    128 u16 lanes wide at W=16 — dense storage, pack-x fewer source rows —
    and the record is then selected within the gathered row with pack-1
    cheap lane selects. Bit-exact (u16 pairs reassemble the f32 bits).

    Requires M % pack == 0 and pack * 2W == a lane-friendly width.
    """
    w, m = src_t.shape
    assert m % pack == 0, (m, pack)
    rows = jax.lax.bitcast_convert_type(
        jnp.transpose(src_t), jnp.uint16
    ).reshape(m // pack, pack * 2 * w)
    g = rows[idx // pack]                       # [K, pack*2W] u16
    sub = idx % pack
    out = g[:, 0:2 * w]
    for k in range(1, pack):
        out = jnp.where(
            (sub == k)[:, None], g[:, k * 2 * w:(k + 1) * 2 * w], out
        )
    return out                                  # [K, 2W] u16


def packed_row_gather_cols(src_t, idx, pack: int = 4):
    """Exact f32 row gather from a FIELD-MAJOR table [W, M] at row
    indices `idx` into [len(idx), W] via `packed_rows_u16`."""
    w = src_t.shape[0]
    out = packed_rows_u16(src_t, idx, pack)
    return jax.lax.bitcast_convert_type(
        out.reshape(idx.shape[0], w, 2), jnp.float32
    )


def packed_row_gather_rows(src, idx, pack: int = 4):
    """Exact f32 row gather from a ROW-MAJOR [N, W] table via the same
    dense-packed-row trick as `packed_row_gather_cols` (no transpose —
    the packed view is a plain reshape of the row-major bytes).
    Requires N % pack == 0."""
    n, w = src.shape
    assert n % pack == 0, (n, pack)
    rows = jax.lax.bitcast_convert_type(
        src.astype(jnp.float32), jnp.uint16
    ).reshape(n // pack, pack * 2 * w)
    g = rows[idx // pack]
    sub = idx % pack
    out = g[:, 0:2 * w]
    for k in range(1, pack):
        out = jnp.where(
            (sub == k)[:, None], g[:, k * 2 * w:(k + 1) * 2 * w], out
        )
    return jax.lax.bitcast_convert_type(
        out.reshape(idx.shape[0], w, 2), jnp.float32
    )
