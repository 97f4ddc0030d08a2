"""Measurement config #2 of BASELINE.json: the 50K-Gaussian object FPS
training loop at 512^2 on the real TPU — the full per-iteration cost a
user pays during object generation (reference loop:
training/object_trainer.py:238-459).

The SD stack is the real SD2.1 ARCHITECTURE (sd21_unet_config + full VAE)
with random-init weights — identical FLOPs/memory to real weights, no
checkpoint needed. One jitted step = render C_batch=4 cameras, VAE-encode,
multi-timestep CSD ladder through the UNet (3-way cond/uncond/null batch),
regularizers, backward to all splat params, masked Adam.

Prints one JSON line with steps/s and ms/step per ladder length.
"""
import os as _os_cache
_os_cache.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os_cache.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "4")
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N_PTS = int(os.environ.get("BENCH_FPS_PTS", 50_000))
IMG = int(os.environ.get("BENCH_FPS_IMG", 512))
TINY = os.environ.get("BENCH_FPS_TINY") == "1"   # CI smoke: tiny SD stack


def main():
    import jax

    from dreamscene_tpu.guidance import mtsd
    from dreamscene_tpu.guidance.sd_flax import sd21_unet_config, VAEConfig
    from dreamscene_tpu.training.object_trainer import ObjectTrainer
    from dreamscene_tpu.utils.config import ObjectsParamsGroups

    cfg = ObjectsParamsGroups()
    cfg.log = {"exp_name": "bench_fps"}
    cfg.objectParams.id = "bench"
    cfg.objectParams.init_guided = "default"
    cfg.objectParams.num_pts = N_PTS
    cfg.objectParams.sh_degree = 2
    cfg.objectParams.text = "a ceramic vase"
    cfg.optimizationParams.iterations = 10_000
    cfg.optimizationParams.densify_from_iter = 1 << 30   # measure pure steps
    cfg.optimizationParams.max_point_number = N_PTS + 10_000
    cfg.guidanceParams.C_batch_size = 4
    cfg.generateCamParams.image_w = IMG
    cfg.generateCamParams.image_h = IMG
    cfg.mode_args = {}

    if TINY:
        guidance = mtsd.make_tiny_guidance(cfg.guidanceParams, downscale=8)
    else:
        guidance = mtsd.make_tiny_guidance(
            cfg.guidanceParams,
            unet_config=sd21_unet_config(),
            vae_config=VAEConfig(),
            token_len=77,
        )

    tr = ObjectTrainer(cfg, exp_root="/tmp/bench_fps_exp",
                       guidance=guidance,
                       interpret=jax.default_backend() == "cpu")
    tr.prepare_train()

    # warm the ladder-length jit variants (1..4 rungs, host-random)
    t0 = time.perf_counter()
    for _ in range(10):
        float(tr.train_step())     # float() syncs the async dispatch
    warm = time.perf_counter() - t0

    # per-step timing, median-of-16: a late first-seen ladder length
    # costs one compile; the median is immune to it
    times = []
    for _ in range(16):
        t0 = time.perf_counter()
        float(tr.train_step())
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    print(json.dumps({
        "metric": "object_fps_step_50k_512sq_sd21_arch",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        "ms_per_step_median": round(dt * 1e3, 1),
        "ms_per_step_min": round(min(times) * 1e3, 1),
        "warmup_s": round(warm, 1),
        "n_splats": N_PTS,
        "c_batch": 4,
    }))


if __name__ == "__main__":
    main()
