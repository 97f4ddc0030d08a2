"""Row-gather helpers tuned to XLA-TPU's gather cost model.

Measured on v5e (scripts/micro_gather.py, in-one-jit bisection — the
tunnel makes standalone op timings lie): gather cost is dominated by the
SOURCE table size, and sub-32-bit element types run ~5x faster per
source row — but only worth it for small sources (u16 from a 1.7M-row
table measured SLOWER than the plain f32 transpose+gather fusion).

Packed dense-row variants (4 records per 128-lane u16 row, killing the
T(8,128) lane-padding tax) were measured on chip in round 2 and
REGRESSED — the relayout passes feeding them cost more than the padded
gathers they replaced (ARCHITECTURE.md "Measured dead ends").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def u16_row_gather(src, idx):
    """Exact f32 row gather through a uint16-pair bitcast. XLA's TPU
    gather path runs ~5x faster on sub-32-bit element types (measured
    v5e, 1.2M rows x 16 f32: 9.6-10.3 ms for any 32-bit element form vs
    2.05 ms as u16x32); splitting each f32 into its two u16 halves is
    bit-exact."""
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
