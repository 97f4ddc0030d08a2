"""Microbench: XLA row-gather / scatter cost vs width and dtype on TPU.

Each timing loops the op K times inside one jit (tunnel per-execute
overhead ~1.5ms must be amortized; chained via dummy dependency).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

N = 300_000
CAP = 1_200_000
K = 20

rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
idx_n = jnp.asarray(rng.randint(0, CAP, N).astype(np.int32))
off = jnp.asarray(np.sort(rng.randint(0, CAP, N).astype(np.int32)))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:44s} {dt:7.3f} ms/op")


def loop(op, x):
    def body(c, _):
        y = op(c)
        # fold output back so iterations chain (prevent CSE/overlap)
        return c + y[0, 0].astype(c.dtype) * 0, None
    return jax.lax.scan(body, x, None, length=K)[0]


for w, dt_ in [(16, jnp.float32), (16, jnp.bfloat16), (8, jnp.float32),
               (32, jnp.float32), (4, jnp.float32)]:
    src = jnp.asarray(rng.randn(N, w), dt_)
    timeit(f"gather [{CAP}] rows from [{N},{w}] {dt_.__name__}",
           lambda s: loop(lambda x: x[idx], s), src)

src = jnp.asarray(rng.randn(CAP, 16), jnp.float32)
timeit("gather [300K] rows from [1.2M,16] f32",
       lambda s: loop(lambda x: x[idx_n], s), src)
src = jnp.asarray(rng.randn(CAP, 16), jnp.bfloat16)
timeit("gather [300K] rows from [1.2M,16] bf16",
       lambda s: loop(lambda x: x[idx_n], s), src)

# scatter-add rows at sorted offsets (binning.py:151 shape)
for w in (3, 1):
    upd = jnp.asarray(rng.randn(N, w).astype(np.float32))
    timeit(f"scatter-add [{N},{w}] f32 -> [{CAP},{w}]",
           lambda u: loop(
               lambda x: jnp.zeros((CAP, w), jnp.float32)
               .at[off].add(x, mode="drop") + x[0, 0] * 0, u), upd)
upd3 = jnp.asarray(rng.randn(N, 3).astype(np.int32))
timeit("scatter-add [300K,3] i32 -> [1.2M,3]",
       lambda u: loop(
           lambda x: jnp.zeros((CAP, 3), jnp.int32)
           .at[off].add(x, mode="drop") + x[0, 0] * 0, upd3), upd3)

# cumsum over [CAP,16]
src = jnp.asarray(rng.randn(CAP, 16).astype(np.float32))
timeit("cumsum [1.2M,16] f32 axis0",
       lambda s: loop(lambda x: jnp.cumsum(x, axis=0), s), src)
