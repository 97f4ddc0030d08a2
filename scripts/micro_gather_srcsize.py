"""Does XLA-TPU row-gather cost scale with the STATIC source-table row
count (SOL.md lead: trimming the grad table 1.75M -> 1.45M rows via
sorted-position emission)?

Three measured in-situ points fit cost ~ 4.5-5 ns x src_rows (grad
gather 1.75M src -> 9.1 ms, record gather 0.3M src x2 passes -> 2.7,
boundary 1.43M src... 1.4 ms — the last one BREAKS the model, so the
model is uncertain and the kernel rework it would justify is not).
This probe holds the output fixed (1.425M rows gathered, same index
distribution as the real VJP: tile-run-local positions) and sweeps the
source row count. If t(1.45M) ~= t(1.75M), the trim is dead; if it
scales ~linearly, the rolling-window grad-table rework saves ~1.4 ms.
"""
import os as _os_cache
_os_cache.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    out_rows = 1_425_000
    width = 10
    # index stream with tile-run locality like pos_of_entry: blocks of
    # consecutive runs at scattered bases
    def make_idx(src_rows):
        n_runs = 6000
        starts = rng.randint(0, src_rows - 400, n_runs)
        lens = rng.randint(100, 400, n_runs)
        idx = np.concatenate([np.arange(s, s + l) for s, l in zip(starts, lens)])
        idx = np.resize(idx, out_rows).astype(np.int32)
        return jnp.asarray(idx % src_rows)

    # chain iterations so no dispatch can overlap or be elided: each
    # round's table is perturbed by the previous result's first element
    # (a scalar add — fused, ~free), and the loop runs IN ONE JIT via
    # lax.scan so the tunnel's ~1.5 ms/execute tax drops out.
    def bench(src, fn, label):
        tab = jnp.asarray(rng.randn(src, width).astype(np.float32))
        idx = make_idx(src)

        @jax.jit
        def run(tab, idx):
            src_rows = tab.shape[0]

            def body(carry, k):
                # iteration-DEPENDENT indices: v1 of this probe read only
                # r[0,0]/r[-1,-1] (DCE shrank the gather to 2 rows); v2
                # summed r but perturbed only the TABLE by a scalar, so
                # sum((tab+c)[idx]) = sum(tab[idx]) + c*N and the gather
                # hoisted out of the scan as loop-invariant. Rotating the
                # index stream each iteration defeats both.
                r = fn(tab, (idx + k) % src_rows)
                s = jnp.sum(r)
                return carry + s, s
            _, outs = jax.lax.scan(
                body, 0.0, jnp.arange(20, dtype=jnp.int32))
            return outs

        # device_get, not block_until_ready: the axon tunnel's async
        # block returns EARLY for the 2nd+ heavy executable dispatched
        # in one process (documented anomaly in bench.py measure());
        # fetching the scan's output bytes cannot under-count.
        np.asarray(run(tab, idx))
        t0 = time.perf_counter()
        r = np.asarray(run(tab, idx))
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{label} src={src:>9} out={out_rows} width={width}: "
              f"{dt:.3f} ms ({dt*1e6/src:.2f} ns/src-row, "
              f"{dt*1e6/out_rows:.2f} ns/out-row)")

    for src in (1_450_000, 1_600_000, 1_750_000, 2_100_000):
        bench(src, lambda t, i: t[i], "gather")
    # calibration: a streaming slice-copy of the same output bytes
    bench(1_750_000, lambda t, i: t[:out_rows] * 1.0000001, "copy  ")


if __name__ == "__main__":
    main()
