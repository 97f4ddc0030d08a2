"""On-chip end-to-end SCENE-training soak (VERDICT r4 item 6: "the
scene trainer has never touched hardware").

Runs the full 3-stage indoor pipeline on the real TPU at small-but-real
scale: object task -> placement/composition -> stage-1 env -> stage-2
floor -> stage-3 refine (pseudo-GT + per-view recon) -> final combine,
with per-stage checkpoints and a second trainer instantiated afterwards
to prove stage-ckpt RESUME. Tiny-SD guidance at SD-realistic latent
shapes (downscale=8) keeps wall-clock on the pipeline under test.

Prints a JSON summary (per-stage wall-clock, splat counts, ckpt files,
resume stage) and leaves the experiment dir + log.txt in place.
Reference pipeline: training/scene_trainer.py:428-685.
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

STAGE1 = int(os.environ.get("SOAK_SCENE_STAGE1", 400))  # stage2 = STAGE1-300
N_STAGE3 = int(os.environ.get("SOAK_SCENE_STAGE3", 3))
OBJ_ITERS = int(os.environ.get("SOAK_SCENE_OBJ_ITERS", 150))
IMG = int(os.environ.get("SOAK_SCENE_IMG", 512))
# 0.08 lands the concatenated scene at ~300K splats — BASELINE.json
# config #4's "300K indoor scene, room-scale trajectory training" scale
# (the 8-device dryrun runs the same pipeline at 0.25 ~= 865K)
ENV_DENSITY = float(os.environ.get("SOAK_SCENE_ENV_DENSITY", 0.08))
EXP_ROOT = os.environ.get("SOAK_SCENE_EXP", "experiments")


def build_cfg():
    from dreamscene_tpu.utils.config import ParamsGroups

    cfg = ParamsGroups()
    cfg.log = {"exp_name": "soak_scene"}
    cfg.optimizationParams.iterations = OBJ_ITERS
    cfg.optimizationParams.densify_from_iter = 50
    cfg.optimizationParams.densification_interval = 50
    cfg.optimizationParams.opacity_reset_interval = 10**9
    cfg.optimizationParams.max_point_number = 60_000
    cfg.reconOptimizationParams.iterations = 20
    cfg.sceneOptimizationParams.iterations = STAGE1
    # reference-cadence scene densification, scaled to the run length
    cfg.sceneOptimizationParams.densify_from_iter = 100
    cfg.sceneOptimizationParams.densification_interval = 100
    cfg.sceneOptimizationParams.opacity_reset_interval = 10**9
    cfg.guidanceParams.C_batch_size = 4
    cfg.guidanceParams.vis_interval = 10**9
    cfg.generateCamParams.image_w = IMG
    cfg.generateCamParams.image_h = IMG
    cfg.sceneGenerateCamParams.image_w = IMG
    cfg.sceneGenerateCamParams.image_h = IMG
    cfg.mode_args = {}
    cfg.scene_configs = {
        "objects": [
            {"id": "vase", "sh_degree": 2, "text": "a ceramic vase",
             "negative_text": "", "init_guided": "default",
             "num_pts": 20_000, "radius": 0.4},
        ],
        "scene": {
            "scene_name": "soak_room",
            "compress_n_views": 8,
            "sh_degree": 2,
            "cam_pose_method": "indoor",
            "scene_text": "a cozy room",
            "negative_text": "",
            "zero_ground": True,
            "floor_init_color": [240, 240, 244],
            "env_init_color": [200, 180, 160],
            "radius": [3.5, 2.5, 5.0],
            "scene_composition": [
                {"id": "vase", "params": [
                    {"center": [-1.0, 1.0, 0.0],
                     "rotation": [0.0, 0.0, 0.0],
                     "scale": [1.5, 1.5, 1.5]},
                ]},
            ],
        },
    }
    return cfg


def main():
    import jax

    from dreamscene_tpu.guidance import mtsd
    from dreamscene_tpu.models.gaussians import num_active
    from dreamscene_tpu.training.scene_trainer import SceneTrainer

    cfg = build_cfg()
    guidance = mtsd.make_tiny_guidance(cfg.guidanceParams, downscale=8)
    interpret = jax.default_backend() == "cpu"
    tr = SceneTrainer(cfg, guidance=guidance, exp_root=EXP_ROOT,
                      interpret=interpret, env_density=ENV_DENSITY)

    stage_t = {}
    orig_save = tr.save_ckpt
    last = [time.perf_counter()]

    def timed_save():
        stage_t[f"stage{tr.scene.stage_n}_s"] = round(
            time.perf_counter() - last[0], 1)
        last[0] = time.perf_counter()
        return orig_save()

    tr.save_ckpt = timed_save

    t0 = time.perf_counter()
    combined = tr.train(n_stage3=N_STAGE3, make_videos=False)
    wall = time.perf_counter() - t0

    # prove stage-ckpt RESUME: a fresh trainer must fast-forward to
    # stage 3 from the saved scene checkpoints and skip all training
    tr2 = SceneTrainer(build_cfg(), guidance=guidance, exp_root=EXP_ROOT,
                       interpret=interpret, env_density=ENV_DENSITY)
    t1 = time.perf_counter()
    tr2.train(n_stage3=N_STAGE3, make_videos=False)
    resume_wall = time.perf_counter() - t1

    print(json.dumps({
        "metric": "scene_training_soak",
        "stage1_iters": STAGE1,
        "stage2_iters": max(STAGE1 - 300, 1),
        "stage3_iters": N_STAGE3,
        "img": IMG,
        "env_density": ENV_DENSITY,
        "wall_s": round(wall, 1),
        "stage_wall_s": stage_t,
        "resume_stage_n": int(tr2.scene.stage_n),
        "resume_wall_s": round(resume_wall, 1),
        "n_env": int(num_active(tr.scene.env)),
        "n_floor": int(num_active(tr.scene.floor)),
        "n_objects": {k: int(num_active(o.state))
                      for k, o in tr.scene.objects.items()},
        "n_combined": int(num_active(combined)) if combined is not None else 0,
        "ckpts": sorted(p.name for p in tr.scene_ckpt_path.iterdir()),
    }))


if __name__ == "__main__":
    main()
