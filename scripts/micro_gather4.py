"""Backward-gather design space: transpose cost, u16 row gather from the
materialized table, field-major column gathers, cumsum orientation."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

N = 300_000
CAP = 1_200_000
GT = 1_740_800
K = 20

rng = np.random.RandomState(0)
pos = jnp.asarray(rng.randint(0, GT, CAP).astype(np.int32))
inv = jnp.asarray(rng.permutation(N).astype(np.int32))
grad_t = jnp.asarray(rng.randn(16, GT).astype(np.float32))
tab_cap = jnp.asarray(rng.randn(CAP, 16).astype(np.float32))
tab_cap_t = jnp.asarray(rng.randn(16, CAP).astype(np.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:56s} {dt:7.3f} ms/op", flush=True)


def loop(op, x):
    def body(c, _):
        y = op(c)
        return c + y.reshape(-1)[0].astype(c.dtype) * 0, None
    return jax.lax.scan(body, x, None, length=K)[0]


timeit("transpose [16,GT]->[GT,16] alone",
       lambda g: loop(lambda x: jax.lax.optimization_barrier(jnp.transpose(x)), g),
       grad_t)

gt_rows = jnp.asarray(np.asarray(grad_t).T)   # pre-materialized [GT,16]
def u16row(x):
    s16 = jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(GT, 32)
    g = s16[pos]
    return jax.lax.bitcast_convert_type(g.reshape(CAP, 16, 2), jnp.float32)
timeit("u16 row gather CAP from materialized [GT,16]",
       lambda x: loop(u16row, x), gt_rows)

timeit("f32 col gather [16,GT] -> [16,CAP]",
       lambda g: loop(lambda x: x[:, pos], g), grad_t)

def u16col(x):
    s16 = jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(16, 2 * GT)
    idx = jnp.stack([2 * pos, 2 * pos + 1], axis=1).reshape(-1)  # [2CAP]
    g = s16[:, idx]
    return jax.lax.bitcast_convert_type(
        g.reshape(16, CAP, 2), jnp.float32)
timeit("u16 col-pair gather [16,GT] -> [16,CAP]",
       lambda x: loop(u16col, x), grad_t)

timeit("cumsum [CAP,16] axis0", lambda x: loop(
    lambda t: jnp.cumsum(t, axis=0), x), tab_cap)
timeit("cumsum [16,CAP] axis1", lambda x: loop(
    lambda t: jnp.cumsum(t, axis=1), x), tab_cap_t)

# boundary gathers at N scale
timeit("u16 row gather N from [CAP,16]", lambda x: loop(
    lambda t: jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(t, jnp.uint16).reshape(CAP, 32)[
            inv % CAP].reshape(N, 16, 2), jnp.float32), x), tab_cap)
timeit("f32 col gather N from [16,CAP]", lambda x: loop(
    lambda t: t[:, inv % CAP], x), tab_cap_t)
