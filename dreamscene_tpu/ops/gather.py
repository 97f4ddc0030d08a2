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

The u16 halves live in separate COLUMN BLOCKS of the source row
([lo_0..lo_{w-1} | hi_0..hi_{w-1}]) rather than interleaved (lo_0, hi_0,
...) pairs: reconstructing f32 from interleaved pairs needs a
[rows, w, 2] regroup of the gathered u16s, which XLA materializes as a
layout copy + relayout reshape chain (measured 2.0 ms of glue after a
2.0 ms gather at 1.2M x 32 on v5e). With block halves the rebuild is two
lane-block slices + one (hi << 16 | lo) fusion — no lane regrouping.
The pre-gather source relayout runs on the small table (n rows, not the
1.2M gathered rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _halves_table(src32):
    """[n, w] 32-bit -> [n, 2w] u16 with lo halves in columns [:w] and
    hi halves in columns [w:] (little-endian bitcast: part 0 = low)."""
    n, w = src32.shape
    s16 = jax.lax.bitcast_convert_type(src32, jnp.uint16)   # [n, w, 2]
    return jnp.transpose(s16, (0, 2, 1)).reshape(n, 2 * w)


def _rebuild_u32(g, w):
    lo = g[:, :w].astype(jnp.uint32)
    hi = g[:, w:].astype(jnp.uint32)
    return (hi << 16) | lo


def u16_row_gather(src, idx):
    """Exact f32 row gather through a uint16-halves bitcast. XLA's TPU
    gather path runs ~5x faster on sub-32-bit element types (measured
    v5e, 1.2M rows x 16 f32: 9.6-10.3 ms for any 32-bit element form vs
    2.05 ms as u16x32); splitting each f32 into its two u16 halves is
    bit-exact."""
    n, w = src.shape
    g = _halves_table(
        jax.lax.bitcast_convert_type(src.astype(jnp.float32), jnp.uint32)
    )[idx]
    return jax.lax.bitcast_convert_type(_rebuild_u32(g, w), jnp.float32)


def u16_row_gather_i32(src, idx):
    """Exact i32 row gather through the same uint16-halves fast path."""
    n, w = src.shape
    g = _halves_table(
        jax.lax.bitcast_convert_type(src.astype(jnp.int32), jnp.uint32)
    )[idx]
    return jax.lax.bitcast_convert_type(_rebuild_u32(g, w), jnp.int32)
