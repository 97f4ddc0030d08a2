"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4d): band-sharded render equals single-device render (no
seams), and the full sharded train step runs + produces finite updates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dreamscene_tpu.parallel.sharded_render import (
    make_mesh,
    make_sharded_render,
    make_sharded_train_step,
)
from tests.test_rasterizer_parity import make_camera, make_scene, camera_kwargs

BG = jnp.zeros((3,), jnp.float32)


def scene_inputs(scene):
    return dict(
        means3d=scene["means3d"],
        scales=scene["scales"],
        quats=scene["quats"],
        opacities=scene["opacities"],
        shs=scene["shs"],
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedRender:
    def test_band_render_matches_single_device(self):
        """4-way tile-band sharding must be seam-free and bit-comparable
        to the unsharded render."""
        from dreamscene_tpu.ops.rasterizer import render

        scene = make_scene(200, seed=0)
        cam = make_camera(64, 64)
        kw = camera_kwargs(cam)
        mesh = make_mesh(2, 4)

        render_fn = make_sharded_render(
            mesh, width=64, height=64, sh_degree=2,
            capacity=4 * 200, chunk=128, interpret=True,
        )
        cams = {
            "view": jnp.stack([kw["viewmatrix"]] * 2),
            "proj": jnp.stack([kw["projmatrix"]] * 2),
            "campos": jnp.stack([kw["campos"]] * 2),
            "tanfovx": jnp.asarray([kw["tanfovx"]] * 2, jnp.float32),
            "tanfovy": jnp.asarray([kw["tanfovy"]] * 2, jnp.float32),
        }
        bg = jnp.zeros((2, 3), jnp.float32)
        images, alphas = jax.jit(render_fn)(scene_inputs(scene), cams, bg)

        ref = render(**scene, **kw, bg=BG, sh_degree=2, interpret=True)
        np.testing.assert_allclose(
            np.asarray(images[0]), np.asarray(ref["image"]), atol=1e-5,
            rtol=1e-4,
        )
        # both dp replicas identical
        np.testing.assert_allclose(images[0], images[1], atol=1e-6)

    def test_sharded_train_step_runs(self):
        from dreamscene_tpu.guidance import mtsd
        from dreamscene_tpu.models.gaussians import create_from_points
        from dreamscene_tpu.utils.config import GuidanceParams

        rng = np.random.RandomState(0)
        n = 128
        state = create_from_points(
            rng.randn(n, 3).astype(np.float32) * 0.5,
            rng.rand(n, 3).astype(np.float32), sh_degree=1, capacity=n,
        )
        guidance = mtsd.make_tiny_guidance(GuidanceParams())
        mesh = make_mesh(2, 4)
        width, height = 32, 64
        b = 2
        step = make_sharded_train_step(
            mesh, guidance, width, height, sh_degree=1, capacity=4 * n,
            n_rungs=1, interpret=True,
        )
        cam = make_camera(width, height)
        kw = camera_kwargs(cam)
        cams = {
            "view": jnp.stack([kw["viewmatrix"]] * b),
            "proj": jnp.stack([kw["projmatrix"]] * b),
            "campos": jnp.stack([kw["campos"]] * b),
            "tanfovx": jnp.asarray([kw["tanfovx"]] * b, jnp.float32),
            "tanfovy": jnp.asarray([kw["tanfovy"]] * b, jnp.float32),
        }
        bg = jnp.zeros((b, 3), jnp.float32)
        text = guidance.get_text_embeds(["a"] * b + ["n"] * b + ["i"] * b)
        text3 = text.reshape(3, b, *text.shape[1:])
        noise = mtsd.make_ladder_noise(
            jax.random.key(0), guidance.latent_shape(b, height, width)
        )
        lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in
               ["xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation",
                "background"]}
        new_params, new_opt, loss = step(
            state.params, state.opt, state.aux.active, cams, bg, text3,
            jnp.asarray([300], jnp.int32), noise, jax.random.key(1), lrs,
        )
        assert np.isfinite(float(loss))
        # params actually moved
        assert not np.allclose(new_params.xyz, state.params.xyz)
        assert np.isfinite(np.asarray(new_params.xyz)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestPrimitiveSharded:
    """Splat-sharded + band-sharded path (BASELINE north star): forward
    parity with the single-device render and gradient parity through the
    all_gather/psum_scatter pair."""

    def _setup(self, n=192, w=64, h=64):
        from dreamscene_tpu.parallel.sharded_render import (
            make_mesh, make_primitive_sharded_render)

        scene = make_scene(n, seed=11)
        cam = make_camera(w, h)
        kw = camera_kwargs(cam)
        mesh = make_mesh(2, 4)
        render_fn = make_primitive_sharded_render(
            mesh, width=w, height=h, sh_degree=2,
            capacity=4 * n, chunk=128, interpret=True,
        )
        cams = {
            "view": jnp.stack([kw["viewmatrix"]] * 2),
            "proj": jnp.stack([kw["projmatrix"]] * 2),
            "campos": jnp.stack([kw["campos"]] * 2),
            "tanfovx": jnp.asarray([kw["tanfovx"]] * 2, jnp.float32),
            "tanfovy": jnp.asarray([kw["tanfovy"]] * 2, jnp.float32),
        }
        bg2 = jnp.zeros((2, 3), jnp.float32)
        return scene, cam, kw, render_fn, cams, bg2

    def test_forward_matches_single_device(self):
        from dreamscene_tpu.ops.rasterizer import render

        scene, cam, kw, render_fn, cams, bg2 = self._setup()
        images, alphas = jax.jit(render_fn)(scene_inputs(scene), cams, bg2)
        ref = render(**scene, **kw, bg=BG, sh_degree=2, interpret=True)
        np.testing.assert_allclose(
            np.asarray(images[0]), np.asarray(ref["image"]),
            atol=1e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(images[0], images[1], atol=1e-6)

    def test_gradients_match_single_device(self):
        """Parameter grads through the sharded path (all_gather fwd,
        psum_scatter bwd, psum over dp) == unsharded autodiff grads."""
        from dreamscene_tpu.ops.rasterizer import render

        scene, cam, kw, render_fn, cams, bg2 = self._setup(n=96, w=32, h=64)

        def loss_sharded(s3d):
            imgs, _ = render_fn({**scene_inputs(scene), "means3d": s3d},
                                cams, bg2)
            return jnp.sum(imgs ** 2) / 2.0   # 2 identical dp replicas

        def loss_single(s3d):
            out = render(**{**scene, "means3d": s3d}, **kw,
                         bg=jnp.zeros((3,), jnp.float32), sh_degree=2,
                         interpret=True)
            return jnp.sum(out["image"] ** 2)

        g_sh = np.asarray(jax.jit(jax.grad(loss_sharded))(scene["means3d"]))
        g_si = np.asarray(jax.grad(loss_single)(scene["means3d"]))
        np.testing.assert_allclose(g_sh, g_si, atol=2e-4, rtol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestTrainerMesh:
    """`parallelParams` makes the ACTUAL trainers mesh-capable: the same
    ObjectTrainer step runs SPMD (cameras over dp, tile bands over tp,
    optionally splat-sharded) — not a bespoke dryrun-only step."""

    def _trainer(self, tmp_path, sub, dp=1, tp=1, shard_splats=False):
        from dreamscene_tpu.training.object_trainer import ObjectTrainer
        from tests.test_trainers import tiny_object_cfg

        cfg = tiny_object_cfg(tmp_path)
        cfg.objectParams.num_pts = 64     # divisible by tp shards
        cfg.optimizationParams.densify_from_iter = 10**9  # keep N static
        cfg.parallelParams.dp = dp
        cfg.parallelParams.tp = tp
        cfg.parallelParams.shard_splats = shard_splats
        tr = ObjectTrainer(cfg, exp_root=str(tmp_path / sub), interpret=True)
        tr.prepare_train()
        return tr

    def test_mesh_trainer_matches_single_device(self, tmp_path):
        """Replicated-splat mesh mode (dp=2 cameras x tp=2 bands) is the
        SAME computation as the single-device loop — tiles are
        independent, aug noise keys fold the global camera index — so
        the loss trajectories must agree to fp tolerance."""
        tr0 = self._trainer(tmp_path, "a")
        tr1 = self._trainer(tmp_path, "b", dp=2, tp=2)
        for _ in range(2):
            l0 = tr0.train_step()
            l1 = tr1.train_step()
            # band rendering shifts screen-y before rasterizing, so
            # per-pixel fp rounding differs in ulps; CSD amplifies that
            # to ~1e-4-class loss noise
            np.testing.assert_allclose(l0, l1, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(tr0.state.params.xyz), np.asarray(tr1.state.params.xyz),
            atol=1e-4,
        )

    def test_mesh_trainer_shard_splats_runs(self, tmp_path):
        """Splat-sharded mode (params projected per-shard, records
        all_gathered): different noise partitioning, so check the step
        runs, is finite, and updates parameters."""
        tr = self._trainer(tmp_path, "c", dp=2, tp=2, shard_splats=True)
        xyz0 = np.asarray(tr.state.params.xyz).copy()
        loss = tr.train_step()
        assert np.isfinite(loss)
        assert not np.allclose(np.asarray(tr.state.params.xyz), xyz0)

    def test_shard_splats_state_is_tp_sharded(self, tmp_path):
        """VERDICT r3 weak 5 (second half): with shard_splats the
        PERSISTENT params/Adam/aux must actually live sharded over tp
        (1/n_tp rows per device — ZeRO-style memory scaling), not
        replicated — and stay sharded across steps (GSPMD propagates
        the elementwise Adam partition-local)."""
        tr = self._trainer(tmp_path, "z", dp=2, tp=2, shard_splats=True)
        for _ in range(2):
            loss = tr.train_step()
            assert np.isfinite(loss)
        cap = tr.state.capacity
        n_tp = tr.mesh.shape["tp"]
        for name, arr in [("params.xyz", tr.state.params.xyz),
                          ("opt.mu.xyz", tr.state.opt.mu.xyz),
                          ("opt.nu.scaling", tr.state.opt.nu.scaling),
                          ("aux.active", tr.state.aux.active)]:
            rows = arr.sharding.shard_shape(arr.shape)[0]
            assert rows == cap // n_tp, (
                f"{name} not tp-sharded: shard rows {rows} != "
                f"{cap}/{n_tp} (sharding={arr.sharding})")
        # replicated leaves stay replicated
        bg = tr.state.params.background
        assert bg.sharding.shard_shape(bg.shape) == bg.shape

    def test_mesh_trainer_densify_composes(self, tmp_path):
        """Densify/prune under the sharded step (VERDICT r2 missing #1):
        state lives host-side at a STATIC capacity with an active mask,
        so the masked clone/split/prune pass composes with any mesh
        layout — the gather-to-host is implicit (densify cadence reads
        the same host pytree the sharded step consumes). Run a
        splat-sharded trainer THROUGH a densify step and check the
        active count changed and later steps still run sharded."""
        from dreamscene_tpu.models.gaussians import num_active

        tr = self._trainer(tmp_path, "d", dp=2, tp=2, shard_splats=True)
        optim = tr.optim
        optim.densify_from_iter = 1
        optim.densification_interval = 2
        optim.densify_until_iter = 10
        optim.densify_grad_threshold = 1e-9   # force clones
        optim.opacity_reset_interval = 10**9
        n0 = num_active(tr.state)
        for _ in range(3):
            loss = tr.train_step()
            assert np.isfinite(loss)
        n1 = num_active(tr.state)
        assert n1 != n0, "densify never fired under the sharded step"


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestSceneTrainerMesh:
    """parallelParams routes the multi-model SCENE step through the same
    shard_map (dp cameras x tp tile bands over the concatenated splat
    axis); the mesh run must reproduce the single-device trajectory."""

    def test_scene_mesh_step_matches_single_device(self, tmp_path):
        from dreamscene_tpu.training.scene_trainer import SceneTrainer
        from tests.test_trainers import tiny_scene_cfg

        def make(dp=1, tp=1, shard=False):
            cfg = tiny_scene_cfg(tmp_path)
            cfg.parallelParams.dp = dp
            cfg.parallelParams.tp = tp
            cfg.parallelParams.shard_splats = shard
            tr = SceneTrainer(cfg, exp_root=str(tmp_path), interpret=True,
                              env_density=0.0003)
            for oc in tr.scene_objects:
                tr.object_task(oc)
            tr.prepare_train_scene()
            return tr

        make()          # throwaway: trains + caches the object PLY once,
        # so the two compared trainers both take the skip path and start
        # from identical guidance/rng state
        trainers = [make(), make(dp=2, tp=2, shard=True)]
        losses = []
        for tr in trainers:
            tr.iters = 2          # train() sets these before stepping
            tr.step = 0
            cams = tr._stage1_cams(tr.guidance_opt.C_batch_size)
            losses.append(tr.scene_train_step(cams, "env", only_env=False))
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(trainers[0].scene.env.params.xyz),
            np.asarray(trainers[1].scene.env.params.xyz), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(trainers[0].scene.floor.params.xyz),
            np.asarray(trainers[1].scene.floor.params.xyz), atol=1e-4)

    def test_scene_mesh_crosses_densify_boundary(self, tmp_path):
        """The scene mesh path must survive a densify call mid-trajectory
        (VERDICT r3 weak 6): densify_and_prune mutates the env/floor
        states within their static capacities, so the SAME jitted mesh
        step keeps running — and the trajectory must still match the
        single-device path across the boundary."""
        from dreamscene_tpu.models.gaussians import num_active
        from dreamscene_tpu.training.scene_trainer import SceneTrainer
        from tests.test_trainers import tiny_scene_cfg

        def make(dp=1, tp=1, shard=False):
            cfg = tiny_scene_cfg(tmp_path)
            # densify at scene step 2 (mid-trajectory)
            cfg.sceneOptimizationParams.densify_from_iter = 1
            cfg.sceneOptimizationParams.densification_interval = 2
            cfg.sceneOptimizationParams.densify_grad_threshold = 1e-8
            cfg.parallelParams.dp = dp
            cfg.parallelParams.tp = tp
            cfg.parallelParams.shard_splats = shard
            tr = SceneTrainer(cfg, exp_root=str(tmp_path), interpret=True,
                              env_density=0.0003)
            for oc in tr.scene_objects:
                tr.object_task(oc)
            tr.prepare_train_scene()
            return tr

        make()              # cache the object PLY (see test above)
        trainers = [make(), make(dp=2, tp=2, shard=True)]
        for tr in trainers:
            tr.iters = 3
            tr.step = 0
        n_before = [num_active(tr.scene.env) for tr in trainers]
        for step in range(3):
            losses = []
            for tr in trainers:
                cams = tr._stage1_cams(tr.guidance_opt.C_batch_size)
                losses.append(tr.scene_train_step(cams, "all"))
            np.testing.assert_allclose(losses[0], losses[1], rtol=1e-3,
                                       atol=1e-4)
        n_after = [num_active(tr.scene.env) for tr in trainers]
        assert n_after[0] != n_before[0], "densify never fired"
        assert n_after[0] == n_after[1], "densify diverged across paths"
        # The mesh step reduces in a different order than the
        # single-device step, and three Adam steps + a densify amplify
        # the kernel-numerics floor non-uniformly (measured: ~0.3% of
        # elements near 1e-3..5e-3 abs on ~5-magnitude coords while the
        # bulk is <1e-4). Gate the bulk tightly and the tail loosely —
        # a genuinely diverged trajectory (flipped densify decision)
        # moves whole rows by O(0.1).
        diff = np.abs(np.asarray(trainers[0].scene.env.params.xyz)
                      - np.asarray(trainers[1].scene.env.params.xyz))
        assert np.quantile(diff, 0.99) < 2e-3, np.quantile(diff, 0.99)
        assert diff.max() < 5e-2, diff.max()

    def test_scene_mesh_refine_stage(self, tmp_path):
        """Stage-3 refine under the mesh (VERDICT r3 weak 6: scene mesh
        coverage beyond stage 1): the outdoor floor-only refine step must
        run SPMD through the same shard_map, keep env bit-frozen on BOTH
        paths, and move the floor the same way as single-device."""
        from dreamscene_tpu.training.scene_trainer import SceneTrainer
        from tests.test_trainers import tiny_scene_cfg

        def make(dp=1, tp=1, shard=False):
            cfg = tiny_scene_cfg(tmp_path)
            cfg.scene_configs["scene"]["cam_pose_method"] = "outdoor"
            cfg.parallelParams.dp = dp
            cfg.parallelParams.tp = tp
            cfg.parallelParams.shard_splats = shard
            tr = SceneTrainer(cfg, exp_root=str(tmp_path), interpret=True,
                              env_density=0.0003)
            for oc in tr.scene_objects:
                tr.object_task(oc)
            tr.prepare_train_scene()
            tr.scene.stage_n = 2      # jump straight to the refine stage
            tr.step = 0
            c_batch = tr.guidance_opt.C_batch_size
            tr.scene_cams = tr._stage3_cams(2 * c_batch)
            tr.gt_size = len(tr.scene_cams) // 4 * 4
            tr.n_stage3 = 1
            return tr

        make()              # cache the object PLY (see tests above)
        trainers = [make(), make(dp=2, tp=2, shard=True)]
        envs0, floors0 = [], []
        for tr in trainers:
            envs0.append(np.asarray(tr.scene.env.params.xyz).copy())
            floors0.append(np.asarray(tr.scene.floor.params.xyz).copy())
            tr.scene_refine_phase(only_env=True, scene_optim=False)
        for i, tr in enumerate(trainers):
            np.testing.assert_array_equal(
                np.asarray(tr.scene.env.params.xyz), envs0[i],
                err_msg=f"env moved during outdoor refine (trainer {i})")
            assert not np.allclose(np.asarray(tr.scene.floor.params.xyz),
                                   floors0[i]), f"floor frozen (trainer {i})"
        diff = np.abs(np.asarray(trainers[0].scene.floor.params.xyz)
                      - np.asarray(trainers[1].scene.floor.params.xyz))
        assert np.quantile(diff, 0.99) < 2e-3, np.quantile(diff, 0.99)
        assert diff.max() < 5e-2, diff.max()

    def test_refine_c_batch1_folds_mesh_to_tile_bands(self, tmp_path,
                                                      monkeypatch):
        """VERDICT r4 weak 5: per-view refine steps (c_batch=1) must NOT
        drop to the single-device path on a dp>1 mesh — the step folds
        both axes into a flat (1 x dp*tp) tile-band mesh so every device
        keeps 1/(dp*tp) of the image, and the trajectory still matches
        single-device."""
        import dreamscene_tpu.parallel.sharded_render as sr
        from dreamscene_tpu.training.scene_trainer import SceneTrainer
        from tests.test_trainers import tiny_scene_cfg

        meshes_used = []
        real_make = sr.make_fps_camera_render

        def spy(mesh, *a, **k):
            meshes_used.append(dict(mesh.shape))
            return real_make(mesh, *a, **k)

        monkeypatch.setattr(sr, "make_fps_camera_render", spy)

        def make(dp=1, tp=1, shard=False):
            cfg = tiny_scene_cfg(tmp_path)
            cfg.scene_configs["scene"]["cam_pose_method"] = "outdoor"
            # 64px: splits into 4 tile-aligned 16-row bands for dp*tp=4
            cfg.sceneGenerateCamParams.image_w = 64
            cfg.sceneGenerateCamParams.image_h = 64
            cfg.parallelParams.dp = dp
            cfg.parallelParams.tp = tp
            cfg.parallelParams.shard_splats = shard
            tr = SceneTrainer(cfg, exp_root=str(tmp_path), interpret=True,
                              env_density=0.0003)
            for oc in tr.scene_objects:
                tr.object_task(oc)
            tr.prepare_train_scene()
            tr.scene.stage_n = 2
            tr.step = 0
            c_batch = tr.guidance_opt.C_batch_size
            tr.scene_cams = tr._stage3_cams(2 * c_batch)
            tr.gt_size = len(tr.scene_cams) // 4 * 4
            tr.n_stage3 = 1
            return tr

        make()              # cache the object PLY (see tests above)
        trainers = [make(), make(dp=2, tp=2, shard=True)]
        for tr in trainers:
            tr.scene_refine_phase(only_env=True, scene_optim=False)
        # the mesh trainer's c_batch=1 refine steps must have run on a
        # folded (dp=1, tp=4) mesh — no single-device fallback
        folded = [m for m in meshes_used if m == {"dp": 1, "tp": 4}]
        assert folded, f"no folded mesh used; meshes: {meshes_used}"
        diff = np.abs(np.asarray(trainers[0].scene.floor.params.xyz)
                      - np.asarray(trainers[1].scene.floor.params.xyz))
        assert np.quantile(diff, 0.99) < 2e-3, np.quantile(diff, 0.99)
        assert diff.max() < 5e-2, diff.max()
