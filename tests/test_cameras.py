"""Camera sampler tests (pure numpy, no JAX): pose conventions, range
compliance, scene-AABB containment, curriculum behavior, rig shapes."""

import math

import numpy as np
import pytest

from dreamscene_tpu.cameras import sampling as S
from dreamscene_tpu.cameras import scene_sampling as SS
from dreamscene_tpu.utils.config import GenerateCamParams


def opt(**kw):
    o = GenerateCamParams()
    for k, v in kw.items():
        setattr(o, k, v)
    return o


def cam_world_pos(cam):
    return cam.camera_center


class TestDirInd:
    def test_lr_buckets(self):
        """The distinguish_lr classifier used for embedding selection
        (reference: cam_utils.py:66-92, object_trainer.py:203)."""
        from dreamscene_tpu.training.object_trainer import get_dir_ind_lr

        assert get_dir_ind_lr(0, 0, 3.5) == "front"
        assert get_dir_ind_lr(0, 90, 3.5) == "side"
        assert get_dir_ind_lr(0, 179, 3.5) == "back"
        assert get_dir_ind_lr(0, -90, 3.5) == "side"
        assert get_dir_ind_lr(-80, 0, 3.5) == "overhead"
        assert get_dir_ind_lr(85, 0, 3.5) == "bottom"

    def test_default_branch_reference_faithful(self):
        """The default branch shifts azimuth by 180 (reference:
        cam_utils.py:93-134) — delta-azimuth 0 lands in 'back'."""
        assert S.get_dir_ind(0, 0, 3.5) == "back"
        assert S.get_dir_ind(0, 180, 3.5) == "front"
        assert S.get_dir_ind(0, 0, 0.5) == "zoom in"


class TestRandPoses:
    def test_depth_positive_and_radius_in_range(self):
        rng = np.random.default_rng(0)
        o = opt(jitter_pose=False)
        for _ in range(50):
            cam = S.load_random_cam(rng, o)
            # splat at origin must be in front of the camera (+z view depth)
            v = cam.world_view_transform @ np.array([0, 0, 0, 1.0], np.float32)
            assert v[2] > 0
            r = np.linalg.norm(cam_world_pos(cam))
            assert o.radius_range[0] - 1e-4 <= r <= o.radius_range[1] + 1e-4

    def test_delta_azimuth_range(self):
        rng = np.random.default_rng(1)
        o = opt(jitter_pose=False)
        for _ in range(30):
            cam = S.load_random_cam(rng, o)
            assert -180 <= cam.delta_azimuth <= 180

    def test_avoid_multiface_early_locks_direction(self):
        rng = np.random.default_rng(2)
        o = opt(jitter_pose=False)
        cams = S.load_random_cam_avoid_multiface(rng, o, step_ratio=0.01)
        # early phase: whole batch front or back
        azims = [c.delta_azimuth for c in cams]
        all_front = all(abs(a) <= 35 for a in azims)
        all_back = all(abs(a) >= 145 for a in azims)
        assert all_front or all_back


class TestRigs:
    def test_circle_cam_counts(self):
        o = opt()
        cams = S.load_circle_cam(o, size=8, render45=True)
        assert len(cams) == 16
        cams = S.load_circle_cam(o, size=8, render45=False)
        assert len(cams) == 8

    def test_reco_rig_matches_reference_layout(self):
        o = opt()
        cams = S.load_reco_cam(o, (4, 12, 14, 6), (100, 85, 75, 55), 0.9)
        assert len(cams) == 36
        radii = {round(np.linalg.norm(cam_world_pos(c)), 3) for c in cams}
        assert len(radii) == 1  # all on the scaled default radius

    def test_sphere_cam_on_sphere(self):
        rng = np.random.default_rng(3)
        o = opt()
        cams = S.load_sphere_cam(rng, o, size=48)
        assert len(cams) == 48
        for c in cams[:5]:
            assert abs(np.linalg.norm(cam_world_pos(c)) - o.default_radius) < 1e-4

    def test_clip_cam(self):
        o = opt()
        cams = S.load_clip_cam(o, size=10)
        assert len(cams) == 20  # two rings


class FakeArgs:
    def __init__(self, bbox):
        self.bbox = np.asarray(bbox, np.float64)


class TestScenePoses:
    BOX = np.array([-3.5, -2.5, 0.0, 3.5, 2.5, 5.0])

    def test_viewpoint_in_scene(self):
        assert SS.viewpoint_in_scene([0, 0, 2], self.BOX, []) == 1
        assert SS.viewpoint_in_scene([9, 0, 2], self.BOX, []) == 0
        oa = FakeArgs([-1, -1, 0, 1, 1, 2])
        assert SS.viewpoint_in_scene([0, 0, 1], self.BOX, [oa], True) == 2

    def test_stage1_indoor_cams_inside_box(self):
        rng = np.random.default_rng(4)
        o = opt(jitter_pose=False)
        loader = SS.SceneCameraLoader(rng, o, self.BOX, [], "indoor")
        cams = loader.Stage1_Indoor()
        assert len(cams) >= 6
        for c in cams:
            pos = cam_world_pos(c)
            assert SS.viewpoint_in_scene(pos, self.BOX * 1.001, []) == 1, pos

    def test_stage1_outdoor_count(self):
        rng = np.random.default_rng(5)
        o = opt(jitter_pose=False)
        box = np.array([-15, -15, 0, 15, 15, 4.0])
        loader = SS.SceneCameraLoader(rng, o, box, [], "outdoor")
        cams = loader.Stage1_Outdoor()
        assert len(cams) == 12

    def test_stage2_outdoor_mirrored_scales(self):
        rng = np.random.default_rng(6)
        o = opt(jitter_pose=False)
        box = np.array([-15, -15, 0, 15, 15, 4.0])
        loader = SS.SceneCameraLoader(rng, o, box, [], "outdoor")
        cams = loader.Stage2_Outdoor()
        assert len(cams) == 4
        scales = sorted(c.scale for c in cams)
        assert scales[0] < 0 < scales[-1]

    def test_stage2_indoor_object_centric(self):
        rng = np.random.default_rng(7)
        o = opt(jitter_pose=False)
        loader = SS.SceneCameraLoader(rng, o, self.BOX, [], "indoor")
        aff = {"T": np.array([1.0, 1.0, 0.0]), "R": np.zeros(3),
               "S": np.array([1.0, 1.0, 1.0])}
        cams = loader.Stage2_Indoor(affine_params=aff)
        assert len(cams) == 8
        for c in cams:
            assert SS.viewpoint_in_scene(
                cam_world_pos(c), self.BOX * 1.001, []
            ) == 1

    def test_circle_inference_nonempty(self):
        rng = np.random.default_rng(8)
        o = opt(jitter_pose=False)
        loader = SS.SceneCameraLoader(rng, o, self.BOX, [], "indoor")
        cams = loader.Circle(circle_size=24)
        assert len(cams) >= 12

    def test_line_path(self):
        rng = np.random.default_rng(9)
        o = opt(jitter_pose=False)
        loader = SS.SceneCameraLoader(rng, o, self.BOX, [], "indoor")
        cams = loader.Line([-2, 0, 2], [2, 0, 2], 0.5)
        assert len(cams) == 8
        # camera positions march along the line
        xs = [cam_world_pos(c)[0] for c in cams]
        assert xs == sorted(xs) or xs == sorted(xs, reverse=True)

    def test_scale_anneal_raises_on_divergence(self):
        rng = np.random.default_rng(10)
        with pytest.raises(RuntimeError):
            SS.gen_random_delta(
                rng, np.array([100.0, 100, 100]), 1.0,
                [math.radians(80), math.radians(100)], [0, 2 * math.pi],
                [3.0, 3.1], self.BOX, 0.0, 1.0, [], "indoor",
            )
