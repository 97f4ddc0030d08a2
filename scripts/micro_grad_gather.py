"""Microbench: grad-table gather variants at bench scale (chunk=384).

The 7.7 ms bwd grad gather is the single biggest non-kernel cost. Round-2
established: packed dense rows lose (relayout + slow big-table u16
gathers), source-row count dominates f32 gather cost. This micro probes
the remaining angles:
  * entry-major [GT, 16] source (what kernel-native entry-major emission
    would feed) vs the fused transpose(field-major) baseline;
  * source-sliced gathers (k slices of GT/k rows + masked select) — pays
    k x output traffic to cut per-gather source size;
  * the u16 fast-path cliff at this GT (u16 won at 300K-row sources,
    lost at 1.7M);
  * entry-sort payload count: carrying gid as a 3rd sort operand vs
    recomputing it with a 1-D 300K-source gather after a 2-op sort;
  * pos-of-entry inversion: 2-op sort baseline vs single-key u64 pack.

Each timing loops K times inside one jit chained through a non-foldable
nudge (tunnel per-execute overhead must be amortized).
"""
import os as _os_cache
_os_cache.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os_cache.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "4")
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

N = 300_000
CAP = 1_200_000
CHUNK = 384
N_CHUNKS = 4486            # max_chunks(CAP, 1024 tiles, 384)
GT = N_CHUNKS * CHUNK      # 1,722,624
K = 10

rng = np.random.RandomState(0)
pos = jnp.asarray(rng.randint(0, GT, CAP).astype(np.int32))

grec_t = jnp.asarray(rng.randn(16, GT).astype(np.float32))   # field-major
grec_r = jnp.asarray(rng.randn(GT, 16).astype(np.float32))   # entry-major


def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:56s} {dt:7.3f} ms/op", flush=True)
    return dt


def loop(op, x):
    def body(c, _):
        y = op(c)
        nudge = (1e-30 * y.reshape(-1)[0].astype(jnp.float32)).astype(c.dtype)
        return c + nudge, None
    return jax.lax.scan(body, x, None, length=K)[0]


def loop1(op, x):
    """Like `loop` but for ops whose output dtype differs from the carry."""
    def body(c, _):
        y = op(c)
        nudge = (1e-30 * y.reshape(-1)[0].astype(jnp.float32)).astype(c.dtype)
        return c + nudge, None
    return jax.lax.scan(body, x, None, length=K)[0]


print(f"GT={GT} CAP={CAP} N={N} chunk={CHUNK}", flush=True)

# --- gather formulations ---------------------------------------------------
import os
if os.environ.get("MICRO_SKIP_GATHERS") != "1":
    timeit("A fused transpose[16,GT][pos] (10 col)",
           lambda g: loop(lambda x: jnp.transpose(x[:10])[pos], g), grec_t)
    timeit("B entry-major [GT,16][pos]",
           lambda g: loop(lambda x: x[pos], g), grec_r)
    timeit("B10 entry-major [GT,16][pos][:, :10]",
           lambda g: loop(lambda x: x[pos][:, :10], g), grec_r)


    def sliced(x, k):
        n_rows = GT // k
        outs = None
        for i in range(k):
            sl = jax.lax.dynamic_slice(x, (i * n_rows, 0), (n_rows, 16))
            li = jnp.clip(pos - i * n_rows, 0, n_rows - 1)
            g = sl[li]
            if outs is None:
                outs = g
            else:
                outs = jnp.where(((pos >= i * n_rows)
                                  & (pos < (i + 1) * n_rows))[:, None], g, outs)
        return outs


    timeit("C sliced x2 from [GT/2,16] f32 + select",
           lambda g: loop(lambda x: sliced(x, 2), g), grec_r)
    timeit("C sliced x4 from [GT/4,16] f32 + select",
           lambda g: loop(lambda x: sliced(x, 4), g), grec_r)


    def u16_gather(x):
        s16 = jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(GT, 32)
        return jax.lax.bitcast_convert_type(
            s16[pos].reshape(CAP, 16, 2), jnp.float32)


    timeit("D u16x32 from [GT,16] (big-source u16 cliff)",
           lambda g: loop(u16_gather, g), grec_r)


    def sliced_u16(x, k):
        n_rows = GT // k
        s16 = jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(GT, 32)
        outs = None
        for i in range(k):
            sl = jax.lax.dynamic_slice(s16, (i * n_rows, 0), (n_rows, 32))
            li = jnp.clip(pos - i * n_rows, 0, n_rows - 1)
            g = sl[li]
            if outs is None:
                outs = g
            else:
                outs = jnp.where(((pos >= i * n_rows)
                                  & (pos < (i + 1) * n_rows))[:, None], g, outs)
        return jax.lax.bitcast_convert_type(
            outs.reshape(CAP, 16, 2), jnp.float32)


    timeit("E sliced x2 u16 from [GT/2] + select",
           lambda g: loop(lambda x: sliced_u16(x, 2), g), grec_r)
    timeit("E sliced x4 u16 from [GT/4] + select",
           lambda g: loop(lambda x: sliced_u16(x, 4), g), grec_r)
    timeit("E sliced x8 u16 from [GT/8] + select",
           lambda g: loop(lambda x: sliced_u16(x, 8), g), grec_r)

# --- entry sort payload count ----------------------------------------------
key = jnp.asarray(rng.randint(0, 1 << 30, CAP).astype(np.uint32))
e = jnp.arange(CAP, dtype=jnp.int32)
gid = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))

timeit("S1 entry sort 3-op (key,e,gid)",
       lambda k_: loop1(
           lambda c: jax.lax.sort((c, e, gid), num_keys=1)[0], k_), key)
timeit("S2 entry sort 2-op (key,e)",
       lambda k_: loop1(
           lambda c: jax.lax.sort((c, e), num_keys=1)[0], k_), key)
rank_s = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
timeit("S2b gid recompute perm[rank_s] (300K src 1-D)",
       lambda p: loop(lambda x: x[rank_s], p), perm)

# --- pos inversion ----------------------------------------------------------
e_s = jnp.asarray(rng.permutation(CAP).astype(np.int32))
pos_sorted = jnp.asarray(
    (np.arange(CAP) + rng.randint(0, 130, CAP)).astype(np.int32))
timeit("P1 inversion 2-op sort (e_s, pos_sorted)",
       lambda x: loop1(
           lambda c: jax.lax.sort((c, pos_sorted), num_keys=1)[1], x), e_s)


def packed_inv(x):
    p64 = x.astype(jnp.int64) << 23 | pos_sorted.astype(jnp.int64)
    s = jax.lax.sort(p64)
    return (s & ((1 << 23) - 1)).astype(jnp.int32)


timeit("P2 inversion 1-op i64 packed sort",
       lambda x: loop(packed_inv, x), e_s)
