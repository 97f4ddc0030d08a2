"""End-to-end trainer smoke tests on CPU (tiny scenes, tiny guidance,
interpret-mode Pallas): the object FPS loop, refine phase, and the scene
pipeline each run a few steps, update parameters, and produce checkpoints
— the minimum end-to-end slice of SURVEY.md §7."""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dreamscene_tpu.utils.config import (
    ObjectsParamsGroups,
    ParamsGroups,
)
from dreamscene_tpu.guidance import mtsd
from dreamscene_tpu.models.gaussians import num_active


def tiny_object_cfg(tmp_path, obj_id="obj1", iters=3):
    cfg = ObjectsParamsGroups()
    cfg.log = {"exp_name": "t"}
    cfg.objectParams.id = obj_id
    cfg.objectParams.init_guided = "default"
    cfg.objectParams.num_pts = 40
    cfg.objectParams.sh_degree = 1
    cfg.objectParams.text = "a thing"
    cfg.optimizationParams.iterations = iters
    cfg.optimizationParams.densify_from_iter = 1
    cfg.optimizationParams.densification_interval = 2
    cfg.optimizationParams.densify_until_iter = iters + 1
    cfg.optimizationParams.opacity_reset_interval = 1000
    cfg.optimizationParams.max_point_number = 400
    cfg.reconOptimizationParams.iterations = 1
    cfg.reconOptimizationParams.densification_interval = 1000
    cfg.reconOptimizationParams.opacity_reset_interval = 1000
    cfg.guidanceParams.C_batch_size = 2
    cfg.generateCamParams.image_w = 32
    cfg.generateCamParams.image_h = 32
    cfg.mode_args = {}
    return cfg


class TestObjectTrainer:
    def test_fps_steps_update_params(self, tmp_path):
        from dreamscene_tpu.training.object_trainer import ObjectTrainer

        cfg = tiny_object_cfg(tmp_path)
        tr = ObjectTrainer(cfg, exp_root=str(tmp_path), interpret=True)
        # observability: per-experiment log sink + config snapshot
        # (reference: scene_trainer.py:56-65, 254-259)
        assert (tr.exp_path / "config_snapshot.yaml").exists()
        tr.prepare_train()
        assert (tr.exp_path / "log.txt").exists()
        xyz0 = np.asarray(tr.state.params.xyz).copy()
        loss = tr.train_step()
        assert np.isfinite(loss)
        assert not np.allclose(np.asarray(tr.state.params.xyz), xyz0)
        # second step reuses the jit cache for same ladder length
        tr.train_step()
        assert np.isfinite(np.asarray(tr.state.params.xyz)).all()

    def test_full_train_saves_final_and_skips_rerun(self, tmp_path):
        from dreamscene_tpu.training.object_trainer import ObjectTrainer

        cfg = tiny_object_cfg(tmp_path, iters=2)
        tr = ObjectTrainer(cfg, exp_root=str(tmp_path), interpret=True)
        tr.train()
        final = tr.ckpt_path / "obj1_final_model.ply"
        assert final.exists()
        # idempotent restart (reference: object_trainer.py:700-702)
        tr2 = ObjectTrainer(cfg, exp_root=str(tmp_path), interpret=True)
        tr2.exp_path = tr.exp_path
        tr2.ckpt_path = tr.ckpt_path
        tr2.train()
        assert num_active(tr2.state) > 0


def tiny_scene_cfg(tmp_path):
    cfg = ParamsGroups()
    cfg.log = {"exp_name": "t"}
    for opt in (cfg.optimizationParams, cfg.sceneOptimizationParams,
                cfg.reconSceneOptimizationParams,
                cfg.fineSceneOptimizationParams, cfg.reconOptimizationParams):
        opt.iterations = 2
        opt.densify_from_iter = 1000
        opt.densification_interval = 1000
        opt.opacity_reset_interval = 1000
    cfg.sceneOptimizationParams.iterations = 2
    cfg.guidanceParams.C_batch_size = 2
    cfg.generateCamParams.image_w = 32
    cfg.generateCamParams.image_h = 32
    cfg.sceneGenerateCamParams.image_w = 32
    cfg.sceneGenerateCamParams.image_h = 32
    cfg.mode_args = {}
    cfg.scene_configs = {
        "objects": [
            {"id": "obj1", "sh_degree": 1, "text": "a chair",
             "negative_text": "", "init_guided": "default", "num_pts": 30,
             "radius": 0.4},
        ],
        "scene": {
            "scene_name": "room",
            "compress_n_views": 4,
            "sh_degree": 1,
            "cam_pose_method": "indoor",
            "scene_text": "a room",
            "negative_text": "",
            "zero_ground": True,
            "floor_init_color": [240, 240, 244],
            "env_init_color": [255, 80, 80],
            "radius": [3.5, 2.5, 5.0],
            "scene_composition": [
                {"id": "obj1", "params": [
                    {"center": [-1.0, 1.0, 0.0],
                     "rotation": [0.0, 0.0, 0.0],
                     "scale": [1.5, 1.5, 1.5]},
                ]},
            ],
        },
    }
    return cfg


@pytest.mark.slow
class TestSceneTrainer:
    def test_scene_pipeline_end_to_end(self, tmp_path):
        from dreamscene_tpu.training.scene_trainer import SceneTrainer

        cfg = tiny_scene_cfg(tmp_path)
        tr = SceneTrainer(cfg, exp_root=str(tmp_path), interpret=True,
                          env_density=0.0003)
        combined = tr.train(n_stage3=1)
        assert combined is not None
        assert num_active(combined) > 0
        assert (tr.scene_ckpt_path / "scene_final_model.ply").exists()
        assert tr.scene.stage_n == 3
        # stage checkpoints written
        names = os.listdir(tr.scene_ckpt_path)
        assert any("1_stage" in n for n in names)
        assert any("2_stage" in n for n in names)

    def test_outdoor_refine_optimizes_floor_only(self, tmp_path):
        """Outdoor stage-3 key routing (reference scene_refine_step_outdoor
        driven with key_gs='floor' every iteration): the floor model must
        update against its pseudo-GT bank while the env model — already
        trained in stages 1-2 — stays bit-identical."""
        from dreamscene_tpu.training.scene_trainer import SceneTrainer

        cfg = tiny_scene_cfg(tmp_path)
        cfg.scene_configs["scene"]["cam_pose_method"] = "outdoor"
        tr = SceneTrainer(cfg, exp_root=str(tmp_path), interpret=True,
                          env_density=0.0003)
        for obj_cfg in tr.scene_objects:
            tr.object_task(obj_cfg)
        tr.prepare_train_scene()
        tr.scene.stage_n = 2          # jump straight to the refine stage
        tr.step = 0
        c_batch = tr.guidance_opt.C_batch_size
        tr.scene_cams = tr._stage3_cams(2 * c_batch)
        tr.gt_size = len(tr.scene_cams) // 4 * 4
        assert tr.gt_size >= 4
        tr.n_stage3 = 1

        env0 = np.asarray(tr.scene.env.params.xyz).copy()
        floor0 = np.asarray(tr.scene.floor.params.xyz).copy()
        tr.scene_refine_phase(only_env=True, scene_optim=False)
        np.testing.assert_array_equal(np.asarray(tr.scene.env.params.xyz),
                                      env0)
        assert not np.allclose(np.asarray(tr.scene.floor.params.xyz),
                               floor0)
