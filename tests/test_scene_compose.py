"""Scene composition tests: placement math, render equivariance under
placement, multi-object concat render vs independent renders, combine."""

import math

import numpy as np
import jax.numpy as jnp

from dreamscene_tpu.cameras import Camera
from dreamscene_tpu.models.gaussians import create_from_points, num_active
from dreamscene_tpu.models.scene import (
    SceneModel,
    ObjectEntry,
    final_combine_all,
    place_object,
)
from dreamscene_tpu.rendering import object_render, scene_render
from tests.test_rasterizer_parity import make_camera

RNG = np.random.RandomState(7)


def make_obj(n=60, seed=0, offset=(0, 0, 0)):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32) * 0.3 + np.asarray(offset, np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    st = create_from_points(pts, cols, sh_degree=2, capacity=n)
    return st


class TestPlacement:
    def test_identity_placement_keeps_appearance(self):
        st = make_obj()
        placed, args, bbox = place_object(
            st, center=[0, 0, 0], rotation=[0, 0, 0], scale=[1, 1, 1],
            snap_floor=False,
        )
        np.testing.assert_allclose(placed.params.xyz, st.params.xyz, atol=1e-5)
        np.testing.assert_allclose(
            placed.params.features_rest, st.params.features_rest, atol=1e-4
        )
        np.testing.assert_allclose(placed.params.scaling, st.params.scaling, atol=1e-5)

    def test_zsnap_puts_min_z_at_center(self):
        st = make_obj()
        placed, args, bbox = place_object(
            st, center=[1.0, 2.0, 0.5], rotation=[0, 0, 0], scale=[1, 1, 1]
        )
        act = np.asarray(placed.aux.active)
        z = np.asarray(placed.params.xyz)[act][:, 2]
        assert abs(z.min() - 0.5) < 1e-5

    def test_scale_adds_log(self):
        st = make_obj()
        placed, _, _ = place_object(
            st, center=[0, 0, 0], rotation=[0, 0, 0], scale=[2.0, 2.0, 2.0],
            snap_floor=False,
        )
        np.testing.assert_allclose(
            placed.params.scaling, st.params.scaling + math.log(2.0), atol=1e-5
        )

    def test_rotation_equivariance_render(self):
        """Rendering the object rotated by Rz(90) from azimuth a equals
        rendering the original from azimuth a-90 — the end-to-end property
        the placement transform (xyz+quats+SH rotation) must satisfy."""
        st = make_obj(seed=3)
        placed, _, _ = place_object(
            st, center=[0, 0, 0], rotation=[0, 0, 90], scale=[1, 1, 1],
            snap_floor=False,
        )
        bg = jnp.asarray([0.0, 0.0, 0.0])
        cam_rot = make_camera(48, 48, azim=0.9)
        # reference azimuth convention of our test camera: azim about y...
        # use cameras rotated about z instead: build via phi sweep
        from dreamscene_tpu.cameras.sampling import circle_poses, _pose_to_rt
        from dreamscene_tpu.cameras.camera import focal2fov, fov2focal

        def cam_at_phi(phi):
            pose = circle_poses(3.0, 75.0, phi)
            R, T = _pose_to_rt(pose)
            return Camera(R=R.astype(np.float32), T=T.astype(np.float32),
                          fovx=0.7, fovy=0.7, width=48, height=48)

        out_rot = object_render(placed, cam_at_phi(30.0), bg_color=bg,
                                test=True, interpret=True)
        # object rotated by Rz(+90 deg): equivalent view of the original is
        # at phi' = 30 - 90 (phi measured from +y toward +x, z-rotation by
        # +90 carries +y onto... verify either sign)
        out_a = object_render(st, cam_at_phi(30.0 - 90.0), bg_color=bg,
                              test=True, interpret=True)
        out_b = object_render(st, cam_at_phi(30.0 + 90.0), bg_color=bg,
                              test=True, interpret=True)
        diff_a = float(jnp.abs(out_rot["image"] - out_a["image"]).mean())
        diff_b = float(jnp.abs(out_rot["image"] - out_b["image"]).mean())
        assert min(diff_a, diff_b) < 2e-3, (diff_a, diff_b)


class TestSceneRender:
    def test_concat_matches_reference_composite(self):
        """Two objects rendered jointly must equal the golden reference
        renderer on the concatenated splat set."""
        from dreamscene_tpu.ops.reference import render_reference
        from dreamscene_tpu.rendering import concat_states

        a = make_obj(50, seed=1, offset=(-0.8, 0, 0))
        b = make_obj(50, seed=2, offset=(0.8, 0, 0))
        cam = make_camera(64, 64)
        bg = jnp.asarray([0.2, 0.2, 0.2])

        out = scene_render([a, b], cam, bg_color=bg, test=True, interpret=True)
        inputs, offsets = concat_states([a, b])
        ref = render_reference(
            means3d=inputs["means3d"], scales=inputs["scales"],
            quats=inputs["quats"], opacities=inputs["opacities"],
            shs=inputs["shs"],
            viewmatrix=jnp.asarray(cam.world_view_transform),
            projmatrix=jnp.asarray(cam.full_proj_transform),
            campos=jnp.asarray(cam.camera_center),
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            width=cam.width, height=cam.height, bg=bg, sh_degree=0,
            valid_mask=inputs["valid_mask"],
        )
        np.testing.assert_allclose(out["image"], ref["image"], atol=1e-5, rtol=1e-4)
        assert list(out["segments"]) == [0, 50, 100]


class TestCombine:
    def test_final_combine_all(self):
        a = make_obj(40, seed=4)
        b = make_obj(30, seed=5)
        combined = final_combine_all([a, b])
        assert combined.capacity == 70
        assert num_active(combined) == 70
        np.testing.assert_allclose(combined.params.xyz[:40], a.params.xyz)
        np.testing.assert_allclose(combined.params.xyz[40:], b.params.xyz)

    def test_scene_model_box(self):
        sm = SceneModel()
        sm.grow_box(np.array([-1, -1, 0, 2, 2, 1], np.float32))
        np.testing.assert_allclose(sm.scene_box, [-1, -1, 0, 2, 2, 1])


class TestCompressObjects:
    def test_compress_reduces_points_and_preserves_render(self, tmp_path):
        """compress_objects (reference scene_gaussian.py:222-238) must
        drop low-importance points while leaving the object's render
        close to the original."""
        import math

        from dreamscene_tpu.rendering import object_render
        from dreamscene_tpu.training.filtering import importance_filter
        from dreamscene_tpu.utils.config import GenerateCamParams

        rng = np.random.default_rng(0)
        # a compact blob: half the points tiny+transparent (low importance)
        n = 120
        st = make_obj(n=n, seed=1)
        op = np.array(st.params.opacity)
        op[n // 2:] = -6.0           # sigmoid ~ 0.0025 -> negligible
        st = st.replace(params=st.params.replace(opacity=jnp.asarray(op)))

        pose_args = GenerateCamParams()
        pose_args.image_w = 32
        pose_args.image_h = 32
        n0 = num_active(st)
        st2 = importance_filter(st, rng, pose_args, prune_percent=0.5,
                                n_views=8, interpret=True)
        n1 = num_active(st2)
        assert n1 < n0

        cam = make_camera(32, 32)
        img_a = object_render(st, cam, test=True, interpret=True)["image"]
        img_b = object_render(st2, cam, test=True, interpret=True)["image"]
        assert float(jnp.mean(jnp.abs(img_a - img_b))) < 0.02


class TestDisparityGuard:
    def test_exactly_empty_region_yields_finite_disparity(self):
        """0/0 regression (round-5 scene-dryrun NaN): when a region's
        pixels are EXACTLY empty (no entries at all — here: a fully
        inactive splat set), every empty pixel shares disp = focal/1e-5
        bit-for-bit, so max(disp) == min_d and the reference's unguarded
        normalize (scene_gaussian.py:658,881) returns NaN. The guarded
        divide must return finite disparity (and zeros for the empty
        region)."""
        st = make_obj(40)
        st = st.replace(aux=st.aux.replace(
            active=jnp.zeros_like(st.aux.active)))
        cam = make_camera(32, 32)
        out = object_render(st, cam, bg_color=jnp.zeros(3), test=True,
                            interpret=True)
        assert np.isfinite(np.asarray(out["depth"])).all()
        assert np.isfinite(np.asarray(out["alpha"])).all()
        np.testing.assert_allclose(np.asarray(out["depth"]), 0.0, atol=1e-6)
