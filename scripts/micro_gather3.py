"""Verify the int-bitcast gather trick survives the surrounding ops
(bitcasts + transpose into [16, CAP] field-major) that rasterizer._gather
needs, and measure the backward-direction variant."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

N = 300_000
CAP = 1_200_000
GT = 1_740_800  # ~ n_chunks*chunk grad-table rows
K = 20

rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
idx_gt = jnp.asarray(rng.randint(0, GT, CAP).astype(np.int32))
src = jnp.asarray(rng.randn(N, 16), jnp.float32)
grad_t = jnp.asarray(rng.randn(16, GT), jnp.float32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:52s} {dt:7.3f} ms/op")


def loop(op, x):
    def body(c, _):
        y = op(c)
        return c + y.reshape(-1)[0].astype(c.dtype) * 0, None
    return jax.lax.scan(body, x, None, length=K)[0]


# --- forward gather variants (want [16, CAP] f32 out) ---------------------
timeit("fwd f32 gather+T (current)",
       lambda s: loop(lambda x: jnp.transpose(x[idx]), s), src)

def u32_t(x):
    g = jax.lax.bitcast_convert_type(x, jnp.uint32)[idx]
    return jnp.transpose(jax.lax.bitcast_convert_type(g, jnp.float32))
timeit("fwd u32 bitcast gather + T", lambda s: loop(u32_t, s), src)

def u32_notr(x):
    g = jax.lax.bitcast_convert_type(x, jnp.uint32)[idx]
    return jax.lax.bitcast_convert_type(g, jnp.float32)
timeit("fwd u32 bitcast gather (no T)", lambda s: loop(u32_notr, s), src)

src16 = jax.lax.bitcast_convert_type(src, jnp.uint16).reshape(N, 32)
def u16_t(x):
    g = x[idx].reshape(CAP, 16, 2)
    return jnp.transpose(jax.lax.bitcast_convert_type(g, jnp.float32))
timeit("fwd u16x32 gather + bitcast + T", lambda s: loop(u16_t, s), src16)

# --- backward: gather CAP rows from the [16, GT] grad table ---------------
gt_rows = jnp.transpose(grad_t)  # [GT, 16] row-major view of grad table
timeit("bwd f32 rows gather (current)",
       lambda g: loop(lambda x: x[idx_gt], g), gt_rows)

def bwd_u32(g):
    gu = jax.lax.bitcast_convert_type(g, jnp.uint32)[idx_gt]
    return jax.lax.bitcast_convert_type(gu, jnp.float32)
timeit("bwd u32 bitcast rows gather", lambda g: loop(bwd_u32, g), gt_rows)

# transposed source: gather columns instead (grad table is [16, GT])
def bwd_cols(g):
    gu = jax.lax.bitcast_convert_type(g, jnp.uint32)[:, idx_gt]
    return jax.lax.bitcast_convert_type(gu, jnp.float32)
timeit("bwd u32 col-gather from [16,GT]", lambda g: loop(bwd_cols, g), grad_t)
