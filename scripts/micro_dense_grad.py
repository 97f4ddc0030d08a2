"""Microbench: grad-table VJP-chain variants assuming the bwd kernel
emits the grad table in a DENSE [GT/8, 128]-f32 layout (8 entries x 16
fields per row) instead of the field-major [16, GT] it writes today.

Round-2's packed-gather gates lost because the RELAYOUT pass feeding the
packed table cost more than the padded gather it replaced. Kernel-native
dense emission deletes that relayout; this micro times the downstream
chain both ways to decide whether the kernel change pays.

Each timing loops K times inside one jit, chained through a non-foldable
1e-30 nudge (tunnel per-execute overhead must be amortized).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from dreamscene_tpu.ops.rasterizer import _blocked_cumsum, N_LIVE_FIELDS
from dreamscene_tpu.ops.gather import u16_row_gather

N = 300_000
CAP = 1_200_000          # entry capacity (divisible by 8)
N_CHUNKS = 6217          # real bench chunk bound at chunk=256
CHUNK = 256
GT = N_CHUNKS * CHUNK    # grad-table columns (1,591,552; div by 8)
K = 10

rng = np.random.RandomState(0)
pos = jnp.asarray(rng.randint(0, GT, CAP).astype(np.int32))
seg_starts = jnp.asarray(np.sort(rng.randint(0, CAP, N)).astype(np.int32))
inv_perm = jnp.asarray(rng.permutation(N).astype(np.int32))

grec_t = jnp.asarray(rng.randn(16, GT).astype(np.float32))      # field-major
dense = jnp.asarray(rng.randn(GT // 8, 128).astype(np.float32))  # kernel-dense


def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:52s} {dt:7.3f} ms/op")
    return dt


def loop(op, x):
    def body(c, _):
        y = op(c)
        return c + 1e-30 * y.reshape(-1)[0].astype(c.dtype), None
    return jax.lax.scan(body, x, None, length=K)[0]


def tail(grad_rank):
    """Shared epilogue: undo depth permutation (N-row source: u16 wins)."""
    return u16_row_gather(grad_rank, inv_perm)


def chain_a(gt):
    """Current default: transpose+gather from the field-major table."""
    g10 = gt[:N_LIVE_FIELDS]
    grec_e = jnp.transpose(g10)[pos]                 # [CAP, 10]
    csum = _blocked_cumsum(grec_e)
    bot = jnp.where((seg_starts > 0)[:, None],
                    csum[jnp.clip(seg_starts - 1, 0, CAP - 1)], 0.0)
    top = jnp.concatenate([bot[1:], csum[-1:]], axis=0)
    return tail(top - bot)


def dense_gather_u16(d, idx, k_out):
    """[k_out, 32]-u16 rows (= 16 f32 fields) from the dense table via
    the pack-4 u16 view: [GT/8,128]f32 -> [GT/4,128]u16, gather idx//4,
    3 lane selects."""
    rows = jax.lax.bitcast_convert_type(d, jnp.uint16).reshape(GT // 4, 128)
    g = rows[idx // 4]                               # [k_out, 128] u16
    sub = idx % 4
    out = g[:, 0:32]
    for k in range(1, 4):
        out = jnp.where((sub == k)[:, None], g[:, k * 32:(k + 1) * 32], out)
    return out                                       # [k_out, 32] u16


def chain_b1(d):
    """Dense-emitted table -> packed u16 gather -> current cumsum tail."""
    g16 = jax.lax.bitcast_convert_type(
        dense_gather_u16(d, pos, CAP).reshape(CAP, 16, 2), jnp.float32)
    grec_e = g16[:, :N_LIVE_FIELDS]
    csum = _blocked_cumsum(grec_e)
    bot = jnp.where((seg_starts > 0)[:, None],
                    csum[jnp.clip(seg_starts - 1, 0, CAP - 1)], 0.0)
    top = jnp.concatenate([bot[1:], csum[-1:]], axis=0)
    return tail(top - bot)


def chain_b2(d):
    """Dense-emitted table -> packed u16 gather -> DENSE cumsum (rows of
    8 entries x 16 fields; 3 record-aligned lane shifts + tiny carry) ->
    packed boundary gather."""
    out = dense_gather_u16(d, pos, CAP)              # [CAP, 32] u16
    x = jax.lax.bitcast_convert_type(
        out.reshape(CAP // 8, 128, 2), jnp.float32)  # [CAP/8, 128]
    for s in (16, 32, 64):
        x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :-s]
    carry = _blocked_cumsum(x[:, 112:128])
    carry = jnp.concatenate(
        [jnp.zeros((1, 16), jnp.float32), carry[:-1]], axis=0)
    x = x + jnp.tile(carry, (1, 8))
    b = jnp.clip(seg_starts - 1, 0, CAP - 1)
    xr = jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(CAP // 4, 128)
    br = xr[b // 4]
    slot = b % 4
    bot = br[:, 0:32]
    for k in range(1, 4):
        bot = jnp.where((slot == k)[:, None], br[:, k * 32:(k + 1) * 32], bot)
    # the boundary entry sits at sub-slot b%8 within its f32 row; the u16
    # pack-4 view splits each dense row in two, handled by b//4 above —
    # but the 16-field record inside the 32-u16 row is at offset
    # (b%8//4)*32 ... wait: dense row = 8 entries; u16 row = 4 entries.
    bot_f = jax.lax.bitcast_convert_type(
        bot.reshape(N, 16, 2), jnp.float32)
    bot_f = jnp.where((seg_starts > 0)[:, None], bot_f, 0.0)
    top = jnp.concatenate(
        [bot_f[1:],
         jax.lax.bitcast_convert_type(
             xr[-1:, 96:128].reshape(1, 16, 2), jnp.float32)], axis=0)
    return tail(top - bot_f)


print(f"GT={GT} CAP={CAP} N={N}")
timeit("A  current: transpose+gather [16,GT] chain", lambda g: loop(chain_a, g), grec_t)
timeit("B1 dense-emit: packed u16 gather + cumsum", lambda d: loop(chain_b1, d), dense)
timeit("B2 dense-emit: packed gather + dense cumsum", lambda d: loop(chain_b2, d), dense)

# piece attribution
timeit("  piece: gather transpose[16,GT][pos] (10 col)",
       lambda g: loop(lambda x: jnp.transpose(x[:N_LIVE_FIELDS])[pos], g), grec_t)
timeit("  piece: dense u16 pack4 gather+selects",
       lambda d: loop(lambda x: dense_gather_u16(x, pos, CAP), d), dense)
timeit("  piece: u16 view reshape only",
       lambda d: loop(lambda x: jax.lax.bitcast_convert_type(
           x, jnp.uint16).reshape(GT // 4, 128) * jnp.uint16(1), d), dense)
timeit("  piece: blocked cumsum [CAP,10]",
       lambda d: loop(_blocked_cumsum,
                      jnp.asarray(rng.randn(CAP, 10).astype(np.float32))), None)

# sort payload count (entry sort currently carries key + e + gid)
key = jnp.asarray(rng.randint(0, 1 << 30, CAP).astype(np.uint32))
e = jnp.arange(CAP, dtype=jnp.int32)
gid = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
timeit("sort 1.2M 3-op (key,e,gid)",
       lambda k_: loop(lambda x: jax.lax.sort((x, e, gid), num_keys=1)[0], k_), key)
timeit("sort 1.2M 2-op (key,e)",
       lambda k_: loop(lambda x: jax.lax.sort((x, e), num_keys=1)[0], k_), key)
perm300 = jnp.asarray(rng.permutation(N).astype(np.int32))
rank_s = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
timeit("  gid recompute: perm[rank_s] 1-D gather",
       lambda p: loop(lambda x: x[rank_s], p), perm300)
