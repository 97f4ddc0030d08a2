"""Checkpoint/resume tests (SURVEY.md §3.4): scene stage checkpoints
round-trip through the npz archive, and a fresh SceneTrainer resumes at the
recorded stage with identical env/floor state."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from dreamscene_tpu.models.gaussians import create_from_points, num_active
from dreamscene_tpu.models.scene import SceneModel
from dreamscene_tpu.training.scene_trainer import SceneTrainer
from tests.test_trainers import tiny_scene_cfg


def make_trainer(tmp_path, cfg=None):
    cfg = cfg or tiny_scene_cfg(tmp_path)
    return SceneTrainer(cfg, exp_root=str(tmp_path), interpret=True,
                        env_density=0.0003)


class TestSceneCkpt:
    def test_save_and_resume_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        tr = make_trainer(tmp_path)
        env = create_from_points(
            rng.randn(30, 3).astype(np.float32),
            rng.rand(30, 3).astype(np.float32), sh_degree=1, capacity=30,
        )
        floor = create_from_points(
            rng.randn(20, 3).astype(np.float32),
            rng.rand(20, 3).astype(np.float32), sh_degree=1, capacity=20,
        )
        tr.scene = SceneModel(env=env, floor=floor)
        tr.scene.stage_n = 2
        tr.save_ckpt()

        tr2 = make_trainer(tmp_path)
        tr2.scene = SceneModel(
            env=dataclasses.replace(
                env, params=dataclasses.replace(
                    env.params, xyz=jnp.zeros_like(env.params.xyz)
                )
            ),
            floor=floor,
        )
        tr2._maybe_resume()
        assert tr2.scene.stage_n == 2
        np.testing.assert_allclose(tr2.scene.env.params.xyz, env.params.xyz)
        np.testing.assert_allclose(
            tr2.scene.env.opt.mu.xyz, env.opt.mu.xyz
        )
        assert num_active(tr2.scene.env) == 30

    def test_resume_prefers_highest_stage(self, tmp_path):
        rng = np.random.RandomState(1)
        tr = make_trainer(tmp_path)
        env = create_from_points(
            rng.randn(10, 3).astype(np.float32),
            rng.rand(10, 3).astype(np.float32), sh_degree=1, capacity=10,
        )
        tr.scene = SceneModel(env=env, floor=env)
        tr.scene.stage_n = 1
        tr.save_ckpt()
        tr.scene.stage_n = 2
        tr.save_ckpt()

        tr2 = make_trainer(tmp_path)
        tr2.scene = SceneModel(env=env, floor=env)
        tr2._maybe_resume()
        assert tr2.scene.stage_n == 2
