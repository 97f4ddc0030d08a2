"""Find the source-row cliff of XLA-TPU's fast u16 gather path and test
split-table gathers for the backward grad-table reduction.

Context: u16x32 gather from a 1.2M-row source measured 2.05 ms
(micro_gather2/3.py) but from a 1.7M-row source it was SLOWER than plain
f32 — there is a cliff somewhere between. If the cliff sits above half
the grad-table size, gathering from two half-tables (select on the index
high bit) should beat the current bf16 hi/lo pair gather (~7.7 ms).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

CAP = 1_200_000      # output rows (expansion entries)
GT = 1_740_800       # grad-table rows (n_chunks * chunk at 300K/512^2)
W = 10               # live grad fields
K = 20

rng = np.random.RandomState(0)


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


# --- 1. cliff sweep: u16 gather cost vs source rows ------------------------
for rows in (400_000, 600_000, 800_000, 1_000_000, 1_200_000,
             1_400_000, 1_600_000, 1_740_800):
    src16 = jnp.asarray(
        rng.randint(0, 1 << 16, (rows, 2 * W)).astype(np.uint16))
    idx = jnp.asarray(rng.randint(0, rows, CAP).astype(np.int32))

    def g(x, idx=idx):
        return loop(lambda s: s[idx], x)

    timeit(f"u16x{2*W} gather src={rows/1e6:.2f}M out={CAP/1e6:.1f}M", g, src16)

# --- 2. candidate bwd grad gathers from the full GT table ------------------
g10 = jnp.asarray(rng.randn(W, GT), jnp.float32)   # kernel layout [W, GT]
pos = jnp.asarray(rng.randint(0, GT, CAP).astype(np.int32))

def current_bf16(gt):
    """Current production path: transpose + bf16 hi/lo pair gathers."""
    ghi = gt.astype(jnp.bfloat16)
    glo = (gt - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
    hi_rows = jnp.transpose(ghi)
    lo_rows = jnp.transpose(glo)
    return (hi_rows[pos].astype(jnp.float32)
            + lo_rows[pos].astype(jnp.float32))

timeit("bwd CURRENT bf16 hi/lo pair (incl. transpose)",
       lambda x: loop(current_bf16, x), g10)


def split2_u16(gt):
    """Transpose to rows, bitcast u16, gather from two half tables."""
    rows = jax.lax.bitcast_convert_type(
        jnp.transpose(gt), jnp.uint16).reshape(GT, 2 * W)
    h = GT // 2
    lo_t = rows[:h]
    hi_t = rows[h:]
    in_hi = pos >= h
    a = lo_t[jnp.minimum(pos, h - 1)]
    b = hi_t[jnp.maximum(pos - h, 0)]
    g = jnp.where(in_hi[:, None], b, a)
    return jax.lax.bitcast_convert_type(
        g.reshape(CAP, W, 2), jnp.float32)

timeit("bwd split2 u16 (two half-table gathers + select)",
       lambda x: loop(split2_u16, x), g10)


def split3_u16(gt):
    rows = jax.lax.bitcast_convert_type(
        jnp.transpose(gt), jnp.uint16).reshape(GT, 2 * W)
    h = GT // 3 + 1
    parts = [rows[i * h:(i + 1) * h] for i in range(3)]
    outs = []
    for i, p in enumerate(parts):
        li = jnp.clip(pos - i * h, 0, p.shape[0] - 1)
        outs.append(p[li])
    sel = pos // h
    g = jnp.where((sel == 0)[:, None], outs[0],
                  jnp.where((sel == 1)[:, None], outs[1], outs[2]))
    return jax.lax.bitcast_convert_type(
        g.reshape(CAP, W, 2), jnp.float32)

timeit("bwd split3 u16", lambda x: loop(split3_u16, x), g10)


def full_u16(gt):
    rows = jax.lax.bitcast_convert_type(
        jnp.transpose(gt), jnp.uint16).reshape(GT, 2 * W)
    g = rows[pos]
    return jax.lax.bitcast_convert_type(
        g.reshape(CAP, W, 2), jnp.float32)

timeit("bwd full-table u16 (past the cliff?)",
       lambda x: loop(full_u16, x), g10)


# --- 3. packed-row gathers --------------------------------------------------
# Theory: TPU layouts pad the minor dim toward 128 lanes, so a [GT, 20]
# u16 table is stored (and scanned by gather) much wider than its payload.
# Packing P records per row gives full-width rows: gather [GT/P, P*20],
# then select the record within the row (P-1 cheap selects).

def packed_u16(gt, p):
    rows = jax.lax.bitcast_convert_type(
        jnp.transpose(gt), jnp.uint16).reshape(GT // p, p * 2 * W)
    g = rows[pos // p]                       # [CAP, p*2W]
    sub = pos % p
    out = g[:, 0:2 * W]
    for k in range(1, p):
        out = jnp.where((sub == k)[:, None], g[:, k * 2 * W:(k + 1) * 2 * W],
                        out)
    return jax.lax.bitcast_convert_type(
        out.reshape(CAP, W, 2), jnp.float32)

for p in (2, 4, 8):
    timeit(f"bwd packed u16 p={p} (src rows {GT//p/1e6:.2f}M x {p*2*W} lanes)",
           lambda x, p=p: loop(lambda t: packed_u16(t, p), x), g10)


def packed_f32(gt, p):
    rows = jnp.transpose(gt).reshape(GT // p, p * W)
    g = rows[pos // p]
    sub = pos % p
    out = g[:, 0:W]
    for k in range(1, p):
        out = jnp.where((sub == k)[:, None], g[:, k * W:(k + 1) * W], out)
    return out

for p in (4, 8):
    timeit(f"bwd packed f32 p={p} (src rows {GT//p/1e6:.2f}M x {p*W} lanes)",
           lambda x, p=p: loop(lambda t: packed_f32(t, p), x), g10)


# --- 4. fwd-gather packed variant (source 300K x 16 f32) -------------------
N = 300_000
src = jnp.asarray(rng.randn(N, 16), jnp.float32)
idxf = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))

def fwd_current(s):
    s16 = jax.lax.bitcast_convert_type(s, jnp.uint16).reshape(N, 32)
    g = s16[idxf]
    return jnp.transpose(jax.lax.bitcast_convert_type(
        g.reshape(CAP, 16, 2), jnp.float32))

timeit("fwd CURRENT u16x32 gather + T", lambda x: loop(fwd_current, x), src)

def fwd_packed_u16(s, p):
    s16 = jax.lax.bitcast_convert_type(s, jnp.uint16).reshape(N // p, p * 32)
    g = s16[idxf // p]
    sub = idxf % p
    out = g[:, 0:32]
    for k in range(1, p):
        out = jnp.where((sub == k)[:, None], g[:, k * 32:(k + 1) * 32], out)
    return jnp.transpose(jax.lax.bitcast_convert_type(
        out.reshape(CAP, 16, 2), jnp.float32))

for p in (2, 4):
    timeit(f"fwd packed u16 p={p}", lambda x, p=p: loop(
        lambda t: fwd_packed_u16(t, p), x), src)


# --- 5. full VJP reduction chain: current vs packed -------------------------
# Layout fact (TPU HLO: f32[1200256,16]{1,0:T(8,128)}): [R, 16]-ish tables
# are lane-padded to 128 — every gather/transpose/cumsum over them moves
# ~8x (f32) / ~4x (u16x32) the payload bytes. The packed chain keeps the
# table as dense [GT/4, 128] u16 rows (4 records of 32 u16).
NSPL = 300_000
seg_starts = jnp.asarray(
    np.sort(rng.randint(0, CAP, NSPL)).astype(np.int32))
inv_perm = jnp.asarray(rng.permutation(NSPL).astype(np.int32))


def _blocked_cumsum(x, block=128):
    m, w = x.shape
    if m <= block:
        return jnp.cumsum(x, axis=0)
    nb = -(-m // block)
    xp = jnp.pad(x, ((0, nb * block - m), (0, 0)))
    inner = jnp.cumsum(xp.reshape(nb, block, w), axis=1)
    carry = _blocked_cumsum(inner[:, -1, :], block)
    carry = jnp.concatenate([jnp.zeros((1, w), x.dtype), carry[:-1]], axis=0)
    return (inner + carry[:, None, :]).reshape(nb * block, w)[:m]


def chain_current(gt):
    g10 = gt[:W]
    ghi = g10.astype(jnp.bfloat16)
    glo = (g10 - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
    grec_e = (jnp.transpose(ghi)[pos].astype(jnp.float32)
              + jnp.transpose(glo)[pos].astype(jnp.float32))
    keep = (jnp.arange(CAP) < 1_150_000)
    grec_e = jnp.where(keep[:, None], grec_e, 0.0)
    csum = _blocked_cumsum(grec_e)
    bot = jnp.where((seg_starts > 0)[:, None],
                    csum[jnp.clip(seg_starts - 1, 0, CAP - 1)], 0.0)
    top = jnp.concatenate([bot[1:], csum[-1:]], axis=0)
    grad_rank = top - bot
    s16 = jax.lax.bitcast_convert_type(grad_rank, jnp.uint16).reshape(
        NSPL, 2 * W)
    return jax.lax.bitcast_convert_type(
        s16[inv_perm].reshape(NSPL, W, 2), jnp.float32)

timeit("VJP chain CURRENT (hi/lo gathers + cumsum + boundary)",
       lambda x: loop(chain_current, x), g10)


def chain_packed(gt):
    # gt [10, GT] -> [16, GT] padded fields -> dense [GT/4, 128] u16 rows
    gt16 = jnp.concatenate(
        [gt, jnp.zeros((16 - W, GT), jnp.float32)], axis=0)
    rows = jax.lax.bitcast_convert_type(
        jnp.transpose(gt16), jnp.uint16).reshape(GT // 4, 128)
    g = rows[pos // 4]                                   # [CAP, 128] u16
    sub = pos % 4
    out = g[:, 0:32]
    for k in range(1, 4):
        out = jnp.where((sub == k)[:, None], g[:, k * 32:(k + 1) * 32], out)
    grec_e = jax.lax.bitcast_convert_type(
        out.reshape(CAP, 16, 2), jnp.float32)[:, :W]
    keep = (jnp.arange(CAP) < 1_150_000)
    grec_e = jnp.where(keep[:, None], grec_e, 0.0)
    csum = _blocked_cumsum(grec_e)
    bot = jnp.where((seg_starts > 0)[:, None],
                    csum[jnp.clip(seg_starts - 1, 0, CAP - 1)], 0.0)
    top = jnp.concatenate([bot[1:], csum[-1:]], axis=0)
    grad_rank = top - bot
    s16 = jax.lax.bitcast_convert_type(grad_rank, jnp.uint16).reshape(
        NSPL, 2 * W)
    return jax.lax.bitcast_convert_type(
        s16[inv_perm].reshape(NSPL, W, 2), jnp.float32)

timeit("VJP chain PACKED (dense [GT/4,128]u16 gather)",
       lambda x: loop(chain_packed, x), g10)


def chain_dense(gt):
    """Fully-dense chain: packed gather -> [CAP/8, 128]-f32 dense rows
    (8 entries x 16 fields) -> lane-shift cumsum -> packed boundary
    gather. No [CAP, 10/16]-padded arrays anywhere (each of those moves
    8x its payload); masked entries use the zero-row redirect (free)."""
    gt16 = jnp.concatenate(
        [gt, jnp.zeros((16 - W, GT), jnp.float32)], axis=0)
    rows = jax.lax.bitcast_convert_type(
        jnp.transpose(gt16), jnp.uint16).reshape(GT // 4, 128)
    g = rows[pos // 4]                                   # [CAP, 128] u16
    sub = pos % 4
    out = g[:, 0:32]
    for k in range(1, 4):
        out = jnp.where((sub == k)[:, None], g[:, k * 32:(k + 1) * 32], out)
    x = jax.lax.bitcast_convert_type(
        out.reshape(CAP // 8, 128, 2), jnp.float32)      # [CAP/8, 128] f32
    # inclusive per-entry prefix: 3 record-shift adds within the row,
    # then a row-carry cumsum on the 16x-smaller totals
    for s in (16, 32, 64):
        x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :-s]
    tot = x[:, 112:128]                                  # [CAP/8, 16]
    carry = _blocked_cumsum(tot)
    carry = jnp.concatenate(
        [jnp.zeros((1, 16), jnp.float32), carry[:-1]], axis=0)
    x = x + jnp.tile(carry, (1, 8))
    # boundary: csum at entry starts-1 = row (s-1)//8, record slot (s-1)%8
    b = jnp.clip(seg_starts - 1, 0, CAP - 1)
    br = x[b // 8]                                       # [N, 128] f32
    slot = b % 8
    bot = br[:, 0:16]
    for k in range(1, 8):
        bot = jnp.where((slot == k)[:, None], br[:, k * 16:(k + 1) * 16], bot)
    bot = jnp.where((seg_starts > 0)[:, None], bot, 0.0)
    last = x[-1:, 112:128]
    top = jnp.concatenate([bot[1:], last], axis=0)
    grad_rank = (top - bot)[:, :W]
    s16 = jax.lax.bitcast_convert_type(grad_rank, jnp.uint16).reshape(
        NSPL, 2 * W)
    return jax.lax.bitcast_convert_type(
        s16[inv_perm].reshape(NSPL, W, 2), jnp.float32)

timeit("VJP chain DENSE ([CAP/8,128] rows everywhere)",
       lambda x: loop(chain_dense, x), g10)


def relayout_only(gt):
    gt16 = jnp.concatenate(
        [gt, jnp.zeros((16 - W, GT), jnp.float32)], axis=0)
    return jax.lax.bitcast_convert_type(
        jnp.transpose(gt16), jnp.uint16).reshape(GT // 4, 128)

timeit("packed relayout alone ([10,GT] -> [GT/4,128]u16)",
       lambda x: loop(relayout_only, x), g10)


def cumsum_only(gt):
    grec_e = jnp.transpose(
        jnp.concatenate([gt, gt[:6]], 0)).reshape(GT // 8, 128)[:CAP // 8]
    return _blocked_cumsum(grec_e.astype(jnp.float32))

timeit("blocked cumsum on DENSE [CAP/8,128] (vs [CAP,10] inside chains)",
       lambda x: loop(cumsum_only, x), g10)
