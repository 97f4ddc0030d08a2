"""Does index LOCALITY move the grad-table gather cost? The in-situ
gather (real pos_of_entry, tile-run structure) runs 7.7 ms vs 11.3 ms
with uniform-random indices — so locality already buys 30%. This micro
bounds the remaining headroom: if a fully-sorted index stream approaches
sequential-copy speed, reordering the VJP's segment order (the
cumsum/boundary reduction is order-free ACROSS segments) is worth its
~2 ms of permutation plumbing.

Run on the TPU tunnel: timeout 900 python scripts/micro_gather_locality.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

CAP = 1_200_000
GT = 1_722_624
K = 10
W = 10

rng = np.random.RandomState(0)

grec_t = jnp.asarray(rng.randn(16, GT).astype(np.float32))   # field-major


def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    o = jax.block_until_ready(f(*args))
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:44s} {dt:7.3f} ms/op", flush=True)
    return dt


def loop(op, x):
    def body(c, _):
        y = op(c)
        nudge = (1e-30 * y.reshape(-1)[0].astype(jnp.float32)).astype(c.dtype)
        return c + nudge, None
    return jax.lax.scan(body, x, None, length=K)[0]


def gather10(pos):
    pos = jnp.asarray(pos.astype(np.int32))

    # chain through the big table (nudge on t) so each iter re-gathers
    def body(c, _):
        g = jnp.transpose(c[:W])[pos]
        nudge = (1e-30 * g[0, 0]).astype(c.dtype)
        return c + nudge, None

    return lambda t: jax.lax.scan(body, t, None, length=K)[0]


variants = {}
variants["random"] = rng.randint(0, GT, CAP)
variants["sorted"] = np.sort(variants["random"])
# expansion-like: 300K segments of ~4 entries, each entry one tile-run
# (~1500 positions) apart, segments in rank order = base drifts slowly
seg = 4
n_seg = CAP // seg
base = rng.randint(0, GT - 8000, n_seg)
base.sort()
offs = (np.arange(seg) * 1500 + rng.randint(0, 256, (n_seg, seg)))
variants["segmented(rank order)"] = (base[:, None] + offs).reshape(-1)
# same segments, reordered by first position (what the VJP could do)
order = np.argsort(base, kind="stable")
variants["segmented(pos order)"] = (base[order][:, None] + offs[order]).reshape(-1)
# strided sweep: sequential but 1500 apart wrapping (pure non-locality)
variants["strided sweep"] = (np.arange(CAP, dtype=np.int64) * 1499 % GT)

for name, pos in variants.items():
    fn = gather10(np.clip(pos, 0, GT - 1))
    timeit(name, fn, grec_t)
