"""On-chip end-to-end object-training soak (VERDICT r3 item 5).

Runs a FULL object training (default 1500 FPS iters + recon refine +
filtering + orbit videos) on the real TPU at real raster scale
(50K splats, 512^2 cameras) with the tiny-SD guidance stack at
SD-realistic latent shapes (downscale=8) so wall-clock goes to the
pipeline under test — densify cadence, capacity-controller grow/shrink,
re-jit thrash, opacity resets, gaussian_filtering, video inference —
rather than to a random-weight UNet.

Prints a JSON summary (iters/s, densify/controller/jit-cache stats,
final PLY stats) and leaves the experiment dir + log.txt in place.
Reference pipeline: object training loop (training/object_trainer.py
train(); reference object_trainer.py:695-738).
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

ITERS = int(os.environ.get("SOAK_ITERS", 1500))
N_PTS = int(os.environ.get("SOAK_PTS", 50_000))
IMG = int(os.environ.get("SOAK_IMG", 512))


def main():
    import jax

    from dreamscene_tpu.guidance import mtsd
    from dreamscene_tpu.models.gaussians import num_active
    from dreamscene_tpu.training.object_trainer import ObjectTrainer
    from dreamscene_tpu.utils.config import ObjectsParamsGroups

    cfg = ObjectsParamsGroups()
    cfg.log = {"exp_name": "soak_object"}
    cfg.objectParams.id = "soak"
    cfg.objectParams.init_guided = "default"
    cfg.objectParams.num_pts = N_PTS
    cfg.objectParams.sh_degree = 2
    cfg.objectParams.text = "a ceramic vase"
    cfg.optimizationParams.iterations = ITERS
    # reference-cadence densification, scaled to the run length
    cfg.optimizationParams.densify_from_iter = 100
    cfg.optimizationParams.densify_until_iter = ITERS
    cfg.optimizationParams.densification_interval = 100
    cfg.optimizationParams.opacity_reset_interval = 300
    cfg.optimizationParams.max_point_number = 200_000
    cfg.reconOptimizationParams.iterations = int(
        os.environ.get("SOAK_RECON_ITERS", 300))
    cfg.guidanceParams.C_batch_size = 4
    cfg.generateCamParams.image_w = IMG
    cfg.generateCamParams.image_h = IMG
    cfg.mode_args = {}

    guidance = mtsd.make_tiny_guidance(cfg.guidanceParams, downscale=8)
    tr = ObjectTrainer(cfg, exp_root="/tmp/soak_object_exp",
                       guidance=guidance,
                       interpret=jax.default_backend() == "cpu")

    n0 = num_active(tr.state)
    mult_changes = []
    orig_update = tr.cap_ctrl.update

    def spy_update(n, n_entries, n_dropped):
        changed = orig_update(n, n_entries, n_dropped)
        if changed:
            mult_changes.append((tr.step, tr.cap_ctrl.mult))
        return changed

    tr.cap_ctrl.update = spy_update

    t0 = time.perf_counter()
    tr.train(make_videos=True)
    wall = time.perf_counter() - t0

    st = tr.state
    act = num_active(st)
    xyz = np.asarray(st.params.xyz[:act])
    print(json.dumps({
        "metric": "object_training_soak",
        "iters": ITERS,
        "recon_iters": cfg.reconOptimizationParams.iterations,
        "n_splats_init": int(n0),
        "n_splats_final": int(act),
        "wall_s": round(wall, 1),
        "iters_per_s": round(
            (ITERS + cfg.reconOptimizationParams.iterations) / wall, 3),
        "capacity_mult_final": tr.cap_ctrl.mult,
        "capacity_mult_changes": [
            [int(s), float(m)] for s, m in mult_changes],
        "n_jit_variants": len(tr._jit_cache),
        "xyz_extent": [round(float(x), 3)
                       for x in (xyz.max(0) - xyz.min(0))],
        "videos": sorted(
            p.name for p in tr.vis_path.glob("video_*.mp4")),
    }))


if __name__ == "__main__":
    main()
