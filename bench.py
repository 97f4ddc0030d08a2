"""Benchmark: fwd+bwd differentiable render throughput on real TPU.

Measures the driver-defined primary metric (BASELINE.md): pixels/s through
a full forward+backward of the Pallas rasterizer at 512x512 on a
300K-splat scene, gradients taken w.r.t. every splat parameter.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured against a nominal CUDA reference throughput of
26.2 Mpix/s fwd+bwd (the ~100 FPS at 512^2 that Inria's
diff-gaussian-rasterization reports on an A100-class GPU for ~300K
splats; the DreamScene reference itself publishes no numbers —
BASELINE.json "published": {}).

Headline methodology (round 4, VERDICT r3 item 1): CONTROLLER-TRACKED
capacity — the entry table is sized the way training actually sizes it
(CapacityController: raw entry demand x 1.1 pad, quantized to N/4), so
every raw entry is composited (zero-drop semantics; honest full
workload). Companions: the rounds-1..3 CAP_MULT=4 methodology (drops
~40% of this deliberately dense scene's entries — kept for
comparability with every recorded number) and a device-steady lax.scan
chain (no per-step dispatch, so the axon tunnel's ~1.5 ms per-execute
tax drops out).
"""
import os as _os_cache
_os_cache.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os_cache.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "4")

import json
import os
import time

import numpy as np

N_GAUSSIANS = 300_000
WIDTH = HEIGHT = 512
ITERS = 10
CUDA_NOMINAL_PIXPS = 26.2e6
# Comparability-companion capacity multiplier (the rounds-1..3 headline
# methodology: 4N saturates on this deliberately dense synthetic scene,
# cutting the farthest ~40% of raw entries).
CAP_MULT = int(os.environ.get("BENCH_CAP_MULT", 4))
# composite record-chunk length. Round-4 A/B at 32x16 tiles, zero-drop
# capacity 1.425M: 256 -> 4.61, 384 -> 4.65, 512 -> 4.70 Mpix/s (the
# round-3 16x16 sweep had 384 optimal; wider tiles amortize per-chunk
# fixed cost so the bigger chunk wins). Must be a multiple of 128.
CHUNK = int(os.environ.get("BENCH_CHUNK", 512))
# 1 (default) = time a host-side python loop over jitted steps — the
# dispatch pipelines (async), so this is close to device time and is the
# methodology of every recorded number (BENCH_r01/r02, ROADMAP A/Bs).
# 0 = chain ITERS steps on-device via lax.scan (pure device steady-state,
# no per-step dispatch at all); kept for cross-checking, NOT the headline.
HOST_LOOP = int(os.environ.get("BENCH_HOST_LOOP", 1))


def build_scene(n, seed=0, sh_degree=2):
    rng = np.random.RandomState(seed)
    import jax.numpy as jnp

    k = (sh_degree + 1) ** 2
    # indoor-like: box shell + interior clutter
    n_shell = n // 2
    shell = rng.uniform(-1, 1, (n_shell, 3))
    axis = rng.randint(0, 3, n_shell)
    sign = rng.randint(0, 2, n_shell) * 2 - 1
    shell[np.arange(n_shell), axis] = sign
    shell *= np.array([3.5, 2.5, 2.5])
    interior = rng.randn(n - n_shell, 3) * 0.8
    pts = np.concatenate([shell, interior]).astype(np.float32)

    quats = rng.randn(n, 4).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    shs = (rng.randn(n, k, 3) * 0.2).astype(np.float32)
    shs[:, 0] += 0.5
    return dict(
        means3d=jnp.asarray(pts),
        scales=jnp.asarray(np.exp(rng.randn(n, 3) * 0.3 - 3.2).astype(np.float32)),
        quats=jnp.asarray(quats),
        opacities=jnp.asarray((1 / (1 + np.exp(-rng.randn(n)))).astype(np.float32)),
        shs=jnp.asarray(shs),
    )


def tracked_capacity(scene, cam, cam_arrays):
    """Raw entry demand of the bench view -> the capacity the
    CapacityController would converge to (pad + N/4 quantization):
    the zero-drop table the training step actually runs at."""
    import jax
    import jax.numpy as jnp

    from dreamscene_tpu.ops.rasterizer import render
    from dreamscene_tpu.training.capacity import CapacityController

    probe_cap = min(16 * N_GAUSSIANS, CapacityController.HARD_CAP)

    @jax.jit
    def raw_entries(params):
        out = render(
            **params, **cam_arrays,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            width=WIDTH, height=HEIGHT,
            bg=jnp.zeros((3,), jnp.float32), sh_degree=2,
            capacity=probe_cap, chunk=CHUNK,
        )
        return out["n_entries"] + out["n_dropped"]

    raw = int(raw_entries(scene))
    ctrl = CapacityController()
    ctrl.mult = ctrl._quantize(raw * ctrl.pad / N_GAUSSIANS, N_GAUSSIANS)
    return ctrl.capacity(N_GAUSSIANS), raw


def measure(scene, cam, cam_arrays, capacity, host_loop=None, tile=None,
            chunk=None):
    import jax
    import jax.numpy as jnp

    from dreamscene_tpu.ops.rasterizer import render

    if host_loop is None:
        host_loop = HOST_LOOP
    if chunk is None:
        chunk = CHUNK
    tile_w, tile_h = tile if tile else (None, None)

    def loss_fn(params):
        out = render(
            **params, **cam_arrays,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            width=WIDTH, height=HEIGHT,
            bg=jnp.zeros((3,), jnp.float32), sh_degree=2, capacity=capacity,
            chunk=chunk, tile_w=tile_w, tile_h=tile_h,
        )
        return (
            jnp.mean(out["image"]) + 0.1 * jnp.mean(out["depth"])
            + 0.01 * jnp.mean(out["alpha"])
        ), out["n_dropped"]

    if host_loop:
        step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

        # warmup / compile
        (loss, n_dropped), grads = step(scene)
        jax.block_until_ready((loss, grads))

        t0 = time.perf_counter()
        for _ in range(ITERS):
            (loss, n_dropped), grads = step(scene)
        jax.block_until_ready((loss, grads))
        dt = time.perf_counter() - t0
        if WIDTH * HEIGHT * ITERS / dt > 40e6:
            # tunnel completion anomaly (observed once: the async block
            # returned early for the 2nd heavy executable dispatched in
            # one process, yielding an impossible 1.9e9 pix/s) — re-time
            # with a per-step barrier, which cannot under-count
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = step(scene)
                jax.block_until_ready(out)
            dt = time.perf_counter() - t0
    else:
        # steady-state: chain ITERS fwd+bwd steps on-device. Each step
        # feeds the next through a non-foldable 1e-30*grad nudge (adds
        # ~1e-33 to O(1) params — numerically a no-op, but XLA cannot
        # elide the grads), so the chain is sequential like a real
        # optimizer loop and the tunnel is crossed once, not ITERS times.
        def one_step(params, _):
            (loss, nd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            nudged = jax.tree_util.tree_map(
                lambda p, g: p + 1e-30 * g, params, grads
            )
            return nudged, (loss, nd)

        @jax.jit
        def run_iters(params):
            return jax.lax.scan(one_step, params, None, length=ITERS)

        out = run_iters(scene)            # warmup / compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run_iters(scene)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        n_dropped = out[1][1][-1]

    pix_ps = WIDTH * HEIGHT * ITERS / dt
    return pix_ps, int(n_dropped)


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _camera

    scene = build_scene(N_GAUSSIANS)
    cam = _camera(WIDTH, HEIGHT)
    cam_arrays = dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
    )

    from dreamscene_tpu.ops.binning import DEFAULT_TILE_H, DEFAULT_TILE_W

    # headline: controller-tracked capacity (zero-drop semantics — the
    # table training actually runs at; VERDICT r3 item 1)
    cap, raw = tracked_capacity(scene, cam, cam_arrays)
    pix_ps, n_dropped = measure(scene, cam, cam_arrays, cap)
    result = {
        "metric": "pixels_per_s_fwd_bwd_512sq_300k_gaussians",
        "value": round(pix_ps, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pix_ps / CUDA_NOMINAL_PIXPS, 4),
        # BASELINE.json's primary metric is "Pixels/s AND Gaussians/s":
        # splats processed per second through the same fwd+bwd step
        "gaussians_per_s": round(N_GAUSSIANS * pix_ps / (WIDTH * HEIGHT), 1),
        "methodology": "controller_tracked_capacity",
        "capacity": cap,
        "raw_entries": raw,
        "entries_dropped": n_dropped,
        "tile": [DEFAULT_TILE_W, DEFAULT_TILE_H],
        "chunk": CHUNK,
    }
    # comparability companion: the rounds-1..3 CAP_MULT=4 methodology
    # (saturates this scene, cutting ~40% of raw entries). Companion legs
    # use the one-dispatch scan methodology (host_loop=0): a second
    # host-loop executable in the same process once hit a tunnel
    # async-completion anomaly (impossible 1.9e9 pix/s); the scan chain
    # crosses the tunnel once so its timing cannot under-count (measured
    # equal to host-loop at cap4 in BENCH_r03: 6.518 vs 6.515 Mpix/s).
    if os.environ.get("BENCH_SKIP_CAP4") != "1":
        # pinned to 16x16 tiles AND chunk 384: the rounds-1..3
        # methodology was CAP4 at 16x16/chunk-384 (384 is the measured
        # optimum for that combination — 512 regressed it to ~5.5), and
        # the tile shape changes both raw entries and work per entry —
        # only the full recorded combination is comparable.
        c4_pix_ps, c4_dropped = measure(
            scene, cam, cam_arrays, CAP_MULT * N_GAUSSIANS, host_loop=0,
            tile=(16, 16), chunk=384)
        result["cap4_pixels_per_s"] = round(c4_pix_ps, 1)
        result["cap4_vs_baseline"] = round(c4_pix_ps / CUDA_NOMINAL_PIXPS, 4)
        result["cap4_entries_dropped"] = c4_dropped
        result["cap4_cap_mult"] = CAP_MULT
        result["cap4_tile"] = [16, 16]
        result["cap4_chunk"] = 384
    # device-steady-state companion: the headline step chained on-device
    # via lax.scan — no per-step dispatch, so the axon tunnel's ~1.5ms
    # per-execute overhead (absent on local TPU hardware) drops out.
    if os.environ.get("BENCH_SKIP_DEVICE_STEADY") != "1" and HOST_LOOP:
        ds_pix_ps, _ = measure(scene, cam, cam_arrays, cap, host_loop=0)
        result["device_steady_pixels_per_s"] = round(ds_pix_ps, 1)
        result["device_steady_vs_baseline"] = round(
            ds_pix_ps / CUDA_NOMINAL_PIXPS, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
