"""Round-2 follow-up gather micros (after the on-chip gate sweep).

micro_gather5 established: u16x20 row gather = ~1.4 ms at 1.2M output
rows regardless of source size, while every RELAYOUT into that u16 row
form (transpose + bitcast + reshape) costs 10+ ms. Questions here:

  A. plain f32 [GT,10] gather incl. the [10,GT] transpose — the new
     default VJP path (rasterizer._gather_composite_bwd). Expected ~7.7.
  B. bitcast-VIEW gather: bitcast f32[GT,10] -> u16[GT,10,2] (no data
     movement if layout assignment treats it as a view), gather on dim0,
     bitcast back. If the 16-bit fast gather path applies to the 3-D
     operand this is the ~1.4 ms prize without any relayout pass.
  C. transpose-only: what the [10,GT] -> [GT,10] f32 transpose costs by
     itself (isolates the gather from the relayout in A).
  D. B without the transpose: gather from a pre-transposed table
     (bounds B's gather cost alone).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

CAP = 1_200_000
GT = 1_740_800
W = 10
K = 20

rng = np.random.RandomState(0)
g10 = jnp.asarray(rng.randn(W, GT), jnp.float32)
rows_f32 = jnp.asarray(rng.randn(GT, W), jnp.float32)
pos = jnp.asarray(rng.randint(0, GT, CAP).astype(np.int32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:58s} {dt:7.3f} ms/op", flush=True)


def loop(op, x):
    def body(c, _):
        y = op(c)
        return c + y.reshape(-1)[0].astype(c.dtype) * 0, None
    return jax.lax.scan(body, x, None, length=K)[0]


timeit("A. f32 transpose + gather (new default)",
       lambda x: loop(lambda t: jnp.transpose(t)[pos], x), g10)


def bitcast_view_gather(t):
    u = jax.lax.bitcast_convert_type(jnp.transpose(t), jnp.uint16)
    return jax.lax.bitcast_convert_type(u[pos], jnp.float32)


timeit("B. transpose + bitcast-view u16[GT,10,2] gather",
       lambda x: loop(bitcast_view_gather, x), g10)

timeit("C. transpose only ([10,GT] -> [GT,10] f32)",
       lambda x: loop(lambda t: jnp.transpose(t), x), g10)

timeit("D. pre-transposed f32 gather (no transpose)",
       lambda x: loop(lambda t: t[pos], x), rows_f32)


def bitcast_pre(t):
    u = jax.lax.bitcast_convert_type(t, jnp.uint16)
    return jax.lax.bitcast_convert_type(u[pos], jnp.float32)


timeit("E. pre-transposed bitcast-view u16 gather",
       lambda x: loop(bitcast_pre, x), rows_f32)
