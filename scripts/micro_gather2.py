"""Gather cost surface on TPU: dtype x width x index pattern.

Goal: find a fast path for the two 1.2M-row expansion gathers
(ops/rasterizer.py fusion.5/6, ~8ms each at f32x16). Hypotheses:
  * sub-32-bit dtypes gather >1 element/cycle (bf16 measured 2.5x);
  * width is nearly free below some threshold (latency per row);
  * monotone indices hit a faster path than random.
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
idx_rand = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
idx_mono = jnp.asarray(np.sort(rng.randint(0, N, CAP)).astype(np.int32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:46s} {dt:7.3f} ms/op")


def loop(op, x):
    def body(c, _):
        y = op(c)
        return c + y.reshape(-1)[0].astype(c.dtype) * 0, None
    return jax.lax.scan(body, x, None, length=K)[0]


cases = [
    (jnp.float32, 16), (jnp.float32, 64), (jnp.float32, 128),
    (jnp.bfloat16, 16), (jnp.bfloat16, 32), (jnp.bfloat16, 48),
    (jnp.uint16, 16), (jnp.uint16, 32),
    (jnp.uint8, 32), (jnp.uint8, 64),
    (jnp.uint32, 16),
]
for dt_, w in cases:
    if jnp.issubdtype(dt_, jnp.floating):
        src = jnp.asarray(rng.randn(N, w), dt_)
    else:
        src = jnp.asarray(rng.randint(0, 100, (N, w)), dt_)
    timeit(f"gather rand [{CAP}] from [{N},{w}] {np.dtype(dt_).name}",
           lambda s: loop(lambda x: x[idx_rand], s), src)

src = jnp.asarray(rng.randn(N, 16), jnp.float32)
timeit("gather MONO [1.2M] from [300K,16] f32",
       lambda s: loop(lambda x: x[idx_mono], s), src)

# transposed-output form: gather then transpose (what fusion.5 fuses)
timeit("gather rand + transpose -> [16,1.2M] f32",
       lambda s: loop(lambda x: jnp.transpose(x[idx_rand]), s), src)

# u16-pair reconstruction of f32: one u16x32 gather + bitcast trick cost
src16 = jax.lax.bitcast_convert_type(src, jnp.uint16).reshape(N, 32)
def u16pair(x):
    g = x[idx_rand]                       # [CAP, 32] u16
    return jax.lax.bitcast_convert_type(g.reshape(CAP, 16, 2), jnp.float32)
timeit("gather u16x32 + bitcast->f32x16", lambda s: loop(u16pair, s), src16)
