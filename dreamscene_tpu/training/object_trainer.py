"""Object trainer: Formation Pattern Sampling + reconstructive refinement.

TPU re-design of the reference ObjectTrainer (reference:
training/object_trainer.py:19-738). The entire per-step pipeline —
C_batch renders, VAE encode, the DDIM-inversion UNet ladder, CSD gradient,
regularizers, backward through the Pallas rasterizer, and the masked Adam
update — traces into ONE jitted XLA program per (ladder-length) variant.
Host code only samples cameras/ladders and runs the (jitted) densification
ops between steps.

Faithful semantics ported:
  * LR schedules + SH degree step-up every 500 steps
    (object_trainer.py:238-244)
  * progressive camera-range scale-up (object_trainer.py:246-286)
  * C_batch_size random cameras, optional anti-multi-face curriculum
    (object_trainer.py:299-306)
  * loss = FPS guidance + lambda_tv*(tv(img)+tv(depth)) + lambda_scale*
    mean scale (object_trainer.py:361-381)
  * densify/prune cadence with max_point_number cap + gaussian_filtering
    (object_trainer.py:385-459)
  * densification stats from the LAST camera of the batch only — a
    reference quirk we replicate (out-vars overwritten in the loop,
    object_trainer.py:322-346, 390-402)
  * refine phase: 36-camera reco rig, one-shot pseudo-GT via the guidance
    ladder, per-view L2*100 recon loss (object_trainer.py:464-693).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from dreamscene_tpu.cameras import sampling as S
from dreamscene_tpu.guidance import mtsd
from dreamscene_tpu.models import densify as D
from dreamscene_tpu.models.gaussians import (
    GaussianState,
    adam_update,
    create_from_points,
    group_lrs,
    num_active,
    resize,
)
from dreamscene_tpu.models.init import init_object_points
from dreamscene_tpu.models.ply import load_splat_ply, save_splat_ply
from dreamscene_tpu.rendering import object_render, sample_aug
from dreamscene_tpu.utils.experiment import setup_experiment_logging
from dreamscene_tpu.utils.media import write_video

logger = logging.getLogger("dreamscene_tpu")

VD_DIRS = ["front", "side", "back", "overhead", "bottom"]
VD_NEG = {
    "front": "side view, back view, overhead view",
    "side": "front view, back view, overhead view",
    "back": "front view, side view, overhead view",
    "overhead": "front view, back view, side view",
    "bottom": "front view, back view, side view, overhead view",
}


def calc_text_embeddings(guidance: mtsd.MTSD, ref_text: str,
                         negative_text: str, opt_params) -> dict:
    """CSD embedding bank: default/uncond/inverse + 5 view-direction
    variants with negated-direction unconds (reference:
    object_trainer.py:152-181)."""
    e = {}
    sp = opt_params.style_prompt
    sn = opt_params.style_negative_prompt
    e["default"] = guidance.get_text_embeds([f"{ref_text}, {sp}"])
    e["uncond"] = guidance.get_text_embeds([f"{negative_text}, {sn}"])
    e["inverse_text"] = guidance.get_text_embeds(
        [guidance.guidance_opt.inverse_text]
    )
    e["text_embeddings_vd"] = {
        d: guidance.get_text_embeds([f"{ref_text}, {d} view, {sp}"])
        for d in VD_DIRS
    }
    e["uncond_text_embeddings_vd"] = {
        d: guidance.get_text_embeds([f"{negative_text}, {VD_NEG[d]}, {sn}"])
        for d in VD_DIRS
    }
    return e


def get_dir_ind_lr(theta, phi, radius, overhead_threshold=30, front_threshold=75):
    """distinguish_lr=True classifier used for embedding selection
    (reference: cam_utils.py:66-92)."""
    res = 0
    if -(front_threshold / 2) <= phi < front_threshold / 2:
        res = 0
    if -180 + front_threshold / 2 <= phi < -(front_threshold / 2):
        res = 1
    if phi < -180 + front_threshold / 2 or phi >= 180 - front_threshold / 2:
        res = 2
    if front_threshold / 2 <= phi < 180 - front_threshold / 2:
        res = 3
    if theta < -90 + overhead_threshold:
        res = 4
    if theta >= 90 - overhead_threshold:
        res = 5
    return ["front", "side", "back", "side", "overhead", "bottom", "zoom in"][res]


def assemble_text_embeddings(bank: dict, cameras) -> tuple[jnp.ndarray, list]:
    """[3B, L, D] = [per-view cond | per-view uncond | inverse x B]
    (reference get_text_embeddings, object_trainer.py:183-225)."""
    pos, unc, vds = [], [], []
    for cam in cameras:
        vd = get_dir_ind_lr(cam.delta_polar, cam.delta_azimuth, cam.delta_radius)
        vds.append(vd)
        pos.append(bank["text_embeddings_vd"][vd][0])
        unc.append(bank["uncond_text_embeddings_vd"][vd][0])
    b = len(cameras)
    inv = jnp.broadcast_to(bank["inverse_text"][0], (b,) + bank["inverse_text"][0].shape)
    return jnp.concatenate([jnp.stack(pos), jnp.stack(unc), inv], axis=0), vds


def scale_up_camera_ranges(pose_args, optim):
    """In-place progressive widening of the pose ranges (reference:
    object_trainer.py:246-286)."""
    pose_args.fovy_range[0] = max(
        pose_args.max_fovy_range[0],
        pose_args.fovy_range[0] * optim.fovy_scale_up_factor[0],
    )
    pose_args.fovy_range[1] = min(
        pose_args.max_fovy_range[1],
        pose_args.fovy_range[1] * optim.fovy_scale_up_factor[1],
    )
    pose_args.radius_range[1] = max(
        pose_args.max_radius_range[1],
        pose_args.radius_range[1] * optim.scale_up_factor,
    )
    pose_args.radius_range[0] = max(
        pose_args.max_radius_range[0],
        pose_args.radius_range[0] * optim.scale_up_factor,
    )
    pose_args.theta_range[1] = min(
        pose_args.max_theta_range[1],
        pose_args.theta_range[1] * optim.phi_scale_up_factor,
    )
    pose_args.theta_range[0] = max(
        pose_args.max_theta_range[0],
        pose_args.theta_range[0] / optim.phi_scale_up_factor,
    )
    pose_args.phi_range[0] = max(
        pose_args.max_phi_range[0],
        pose_args.phi_range[0] * optim.phi_scale_up_factor,
    )
    pose_args.phi_range[1] = min(
        pose_args.max_phi_range[1],
        pose_args.phi_range[1] * optim.phi_scale_up_factor,
    )


class ObjectTrainer:
    """Single-object text-to-3D trainer."""

    def __init__(self, cfg, guidance: mtsd.MTSD | None = None,
                 state: GaussianState | None = None, obj_id: str | None = None,
                 exp_root: str = "experiments", interpret: bool = False):
        self.cfg = cfg
        self.pose_args = cfg.generateCamParams
        self.guidance_opt = cfg.guidanceParams
        self.dataset_args = cfg.modelParams
        self.optim = cfg.optimizationParams
        self.recon_optim = cfg.reconOptimizationParams
        self.obj = cfg.objectParams
        self.id = obj_id or self.obj.id
        # Pallas runs compiled on TPU; interpreter elsewhere (CPU dev runs)
        self.interpret = interpret or jax.default_backend() == "cpu"

        exp_name = getattr(cfg.log, "exp_name", None) if isinstance(
            getattr(cfg, "log", None), object) and cfg.log else None
        if isinstance(cfg.log, dict):
            exp_name = cfg.log.get("exp_name", "default")
        exp_name = exp_name or "default"
        self.exp_path = Path(exp_root) / exp_name
        self.ckpt_path = self.exp_path / "checkpoints"
        self.vis_path = self.exp_path / "vis"
        self.ckpt_path.mkdir(parents=True, exist_ok=True)
        self.vis_path.mkdir(parents=True, exist_ok=True)
        setup_experiment_logging(self.exp_path, cfg)

        self.rng = np.random.default_rng(cfg.seed)
        self.cameras_extent = self.pose_args.default_radius
        self.step = 0
        self.rec_count = 0
        self.guidance = guidance
        self._jit_cache = {}
        # multi-chip mesh (parallelParams: dp cameras x tp tile-bands,
        # optionally splat-sharded) — None = single-device path
        par = getattr(cfg, "parallelParams", None)
        self.mesh = None
        self.shard_splats = False
        if par is not None and par.dp * par.tp > 1:
            from dreamscene_tpu.parallel.sharded_render import make_mesh

            self.mesh = make_mesh(par.dp, par.tp)
            self.shard_splats = bool(par.shard_splats)
        from dreamscene_tpu.training.capacity import CapacityController

        self.cap_ctrl = CapacityController()

        if state is not None:
            self.state = state
        else:
            pts, cols, sls = init_object_points(
                self.obj.init_guided, self.obj.init_prompt, str(self.exp_path),
                num_pts=self.obj.num_pts, radius=self.obj.radius,
                use_pointe_rgb=self.obj.use_pointe_rgb, seed=cfg.seed,
            )
            cap = min(
                max(int(pts.shape[0] * 4), 1 << 14), self.optim.max_point_number
            )
            self.state = create_from_points(
                pts, cols, sh_degree=self.obj.sh_degree, capacity=cap,
                spatial_lr_scale=sls,
            )

    # ------------------------------------------------------------------
    def _shard_state(self, state):
        """Persist the splat-major state SHARDED over the tp axis — the
        ZeRO-style params/Adam/aux memory scaling (1/n_tp per device)
        that the 1M-splat outdoor configs need (BASELINE.json config 5).
        The sharding matches make_fps_camera_render's splat in_specs
        (P("tp")), so the shard_map slices nothing, and every
        elementwise stage of the jitted step (activations, Adam) runs
        partition-local under GSPMD. device_put with an already-matching
        sharding is a no-op, so this is called once per step; after a
        densify/capacity-growth rebuild it re-lays the new host arrays.
        Non-divisible capacities fall back to replicated WITH a warning
        (same contract as SceneTrainer's splat_pad)."""
        if self.mesh is None or not self.shard_splats:
            return state
        from dreamscene_tpu.parallel.sharded_render import shard_splat_state

        return shard_splat_state(self.mesh, state, logger)

    def prepare_train(self):
        if self.guidance is None:
            self.guidance = mtsd.make_tiny_guidance(self.guidance_opt)
        self.embeddings = calc_text_embeddings(
            self.guidance, self.obj.text, self.obj.negative_text, self.optim
        )

    # ------------------------------------------------------------------
    def _bg_color(self):
        return (0.0, 0.0, 0.0)

    def _fps_step_fn(self, n_rungs: int, capacity: int, c_batch: int,
                     active_deg: int, use_cn: bool = False):
        key = ("fps", n_rungs, capacity, c_batch, active_deg, use_cn)
        if key in self._jit_cache:
            return self._jit_cache[key]

        g = self.guidance
        width = self.pose_args.image_w
        height = self.pose_args.image_h
        lambda_tv = self.optim.lambda_tv
        lambda_scale = self.optim.lambda_scale
        guidance_scale = self.guidance_opt.guidance_scale
        lambda_guidance = self.guidance_opt.lambda_guidance
        interpret = self.interpret

        mesh_render = None
        if self.mesh is not None:
            from dreamscene_tpu.parallel.sharded_render import (
                make_fps_camera_render,
            )

            mesh_render = make_fps_camera_render(
                self.mesh, width, height, sh_degree=active_deg,
                capacity=capacity, c_batch=c_batch,
                shard_splats=self.shard_splats, interpret=interpret,
            )

        @jax.jit
        def step(params, opt, aux, cam_stack, aug_arr, text_emb, ladder_ts,
                 noise, vae_key, flip, as_latent, lrs, mod_params):
            # SD weights arrive as ARGUMENTS (mtsd.mods_params) — closing
            # over `mods` would bake 3.4 GB of captured constants into
            # every re-jit at real-SD scale
            mods = mtsd.with_params(g.mods, mod_params)
            active = aux.active
            probes = jnp.zeros((c_batch, params.xyz.shape[0], 2), jnp.float32)

            def loss_fn_mesh(p, probes):
                state = dataclasses.replace(self.state, params=p, aux=aux)
                inputs = dict(
                    xyz=state.get_xyz,
                    features=state.get_features,
                    scaling=state.get_scaling,
                    rotation=state.get_rotation,
                    opacities=state.get_opacity[:, 0],
                    active=active,
                )
                (images, depths, alphas, radii, visible, scales_mean,
                 n_entries, n_dropped) = mesh_render(
                    inputs, cam_stack, aug_arr, probes, vae_key)
                return images, depths, alphas, {
                    "radii": radii, "visible": visible,
                    "scales_mean": scales_mean[0],
                    "n_entries": n_entries[0], "n_dropped": n_dropped[0],
                }

            def loss_fn_loop(p, probes):
                images, depths, alphas = [], [], []
                aux_out = {}
                state = dataclasses.replace(self.state, params=p, aux=aux)
                for i in range(c_batch):
                    cam = jax.tree.map(lambda x, i=i: x[i], cam_stack)
                    # traced per-camera aug: [bg(3), sh_drop, shs_n, scale_n, seed]
                    shs = state.get_features
                    rest_mask = 1.0 - aug_arr[i, 3]
                    shs = jnp.concatenate(
                        [shs[:, :1], shs[:, 1:] * rest_mask], axis=1
                    )
                    scales = state.get_scaling
                    k1, k2 = jax.random.split(
                        jax.random.fold_in(vae_key, i + 1)
                    )
                    shs = shs + aug_arr[i, 4] * jax.random.normal(
                        k1, shs.shape) * (0.2**0.5) * shs
                    scales = jnp.maximum(
                        scales + aug_arr[i, 5] * jax.random.normal(
                            k2, scales.shape) * (0.2**0.5) * scales / 4, 0.0,
                    )
                    from dreamscene_tpu.ops.rasterizer import render as rrender

                    out = rrender(
                        means3d=state.get_xyz, scales=scales,
                        quats=state.get_rotation,
                        opacities=state.get_opacity[:, 0], shs=shs,
                        viewmatrix=cam["view"], projmatrix=cam["proj"],
                        campos=cam["campos"], tanfovx=cam["tanfovx"],
                        tanfovy=cam["tanfovy"], width=width, height=height,
                        bg=aug_arr[i, :3], sh_degree=active_deg,
                        capacity=capacity, means2d_probe=probes[i],
                        valid_mask=active,   # inactive capacity rows must
                        interpret=interpret,  # not render (ghost splats)
                    )
                    focal = 1.0 / (2.0 * cam["tanfovx"])
                    disp = focal / (out["depth"] + out["alpha"] * 10.0 + 1e-5)
                    empty = out["alpha"] <= 0.1
                    min_d = jnp.where(
                        jnp.any(empty),
                        jnp.min(jnp.where(empty, disp, jnp.inf)),
                        jnp.min(disp),
                    )
                    disp = jnp.clip(
                        (disp - min_d)
                        / jnp.maximum(jnp.max(disp) - min_d, 1e-12),
                        0.0, 1.0,
                    )  # 0/0 guard: see rendering.py disparity note
                    images.append(out["image"])
                    depths.append(disp[None])
                    alphas.append(out["alpha"][None])
                    # capacity feedback must see the step's PEAK camera,
                    # not just the last one — a close-up that overflows
                    # while the final camera fits would otherwise never
                    # grow the table (and vice versa for shrink)
                    aux_out["n_entries"] = jnp.maximum(
                        aux_out.get("n_entries", 0), out["n_entries"])
                    aux_out["n_dropped"] = jnp.maximum(
                        aux_out.get("n_dropped", 0), out["n_dropped"])
                    if i == c_batch - 1:
                        aux_out["radii"] = out["radii"]
                        aux_out["visible"] = out["visibility_filter"]
                        aux_out["scales_mean"] = jnp.sum(
                            scales * active[:, None]
                        ) / (jnp.sum(active) * 3.0)

                return (jnp.stack(images), jnp.stack(depths),
                        jnp.stack(alphas), aux_out)   # [B,3,H,W] etc.

            def loss_fn(p, probes):
                images, depths, alphas, aux_out = (
                    loss_fn_mesh if mesh_render is not None else loss_fn_loop
                )(p, probes)

                images_f, depths_f, alphas_f = mtsd.horizontal_flip(
                    flip, images, depths, alphas
                )
                enc_in = jnp.where(
                    as_latent, jnp.repeat(depths_f, 3, axis=1), images_f
                )
                latents = mtsd.encode_images(mods, enc_in, vae_key)
                # depth-ControlNet hint: the rendered disparity maps
                # (reference gate: object_trainer.py:343-348; unlike the
                # reference, the residuals actually reach the UNet here)
                hint = None
                if use_cn:
                    hint = jax.lax.stop_gradient(jnp.repeat(
                        jnp.transpose(depths_f, (0, 2, 3, 1)), 3, axis=-1
                    ))
                scores = mtsd.ladder_scores(
                    mods, jax.lax.stop_gradient(latents), noise, ladder_ts,
                    text_emb, n_rungs=n_rungs, cond_image=hint,
                )
                grad = mtsd.csd_grad(mods, scores, guidance_scale,
                                     lambda_guidance)
                loss_g = mtsd.specify_gradient_loss(latents, grad)

                from dreamscene_tpu.ops.losses import tv_loss

                loss_tv = tv_loss(images) + tv_loss(depths)
                loss = (
                    loss_g + lambda_tv * loss_tv
                    + lambda_scale * aux_out["scales_mean"]
                )
                return loss, aux_out

            (loss, aux_out), (grads, probe_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, probes)

            new_params, new_opt = adam_update(params, grads, opt, active, lrs)
            # densification stats from the last camera (reference quirk)
            new_aux = D.update_max_radii(aux, aux_out["radii"], aux_out["visible"])
            new_aux = D.add_densification_stats(
                new_aux, probe_grads[c_batch - 1], aux_out["visible"]
            )
            return (new_params, new_opt, new_aux, loss,
                    aux_out["n_entries"], aux_out["n_dropped"])

        self._jit_cache[key] = step
        return step

    def _cam_stack(self, cameras):
        return {
            "view": jnp.stack(
                [jnp.asarray(c.world_view_transform) for c in cameras]
            ),
            "proj": jnp.stack(
                [jnp.asarray(c.full_proj_transform) for c in cameras]
            ),
            "campos": jnp.stack([jnp.asarray(c.camera_center) for c in cameras]),
            "tanfovx": jnp.asarray([c.tanfovx for c in cameras], jnp.float32),
            "tanfovy": jnp.asarray([c.tanfovy for c in cameras], jnp.float32),
        }

    def _aug_array(self, c_batch, test=False):
        rows = []
        for _ in range(c_batch):
            aug = sample_aug(self.rng, self.dataset_args, self._bg_color(), test)
            rows.append(
                list(aug.bg_color)
                + [1.0 if aug.sh_degree_drop else 0.0, aug.shs_noise,
                   aug.scale_noise]
            )
        return jnp.asarray(rows, jnp.float32)

    # ------------------------------------------------------------------
    def train_step(self):
        self.step += 1
        optim = self.optim
        iters = optim.iterations
        self.state = st = self._shard_state(self.state)

        if self.step % 500 == 0:
            self.state = st = st.one_up_sh_degree()

        if not optim.use_progressive:
            if (self.step >= optim.progressive_view_iter
                    and self.step % optim.scale_up_cameras_iter == 0):
                scale_up_camera_ranges(self.pose_args, optim)

        c_batch = self.guidance_opt.C_batch_size
        avoid_mf = bool(
            (self.cfg.mode_args or {}).get("avoid_multi_face")
            if isinstance(self.cfg.mode_args, dict) else False
        )
        if avoid_mf:
            cameras = S.load_random_cam_avoid_multiface(
                self.rng, self.pose_args, self.step / iters, ssaa=True,
                size=c_batch,
            )
        else:
            cameras = [
                S.load_random_cam(self.rng, self.pose_args, ssaa=True)
                for _ in range(c_batch)
            ]

        text_emb, vds = assemble_text_embeddings(self.embeddings, cameras)
        as_latent = (
            self.step < optim.geo_iter
            or self.rng.random() < optim.as_latent_ratio
        )
        stage_step_rate = min(self.step / iters, 1.0)
        ladder = self.guidance.sample_ladder(stage_step_rate)
        h, w = self.pose_args.image_h, self.pose_args.image_w
        noise = self.guidance.next_noise(
            self.guidance.latent_shape(c_batch, h, w)
        )
        lrs = {
            k: jnp.asarray(v, jnp.float32)
            for k, v in group_lrs(optim, st.spatial_lr_scale, self.step).items()
        }

        # entry capacity is PER TILE-BAND: each band bins only its own
        # tiles, so a mesh with n_tp bands sees ~1/n_tp of the entries —
        # the controller reasons about the per-band table it actually
        # feeds (floor keeps tiny tests off the degenerate 0 row count)
        n_band = (st.capacity // self.mesh.shape["tp"]
                  if self.mesh is not None else st.capacity)
        n_band = max(n_band, 4096)
        step_fn = self._fps_step_fn(
            len(ladder), self.cap_ctrl.capacity(n_band), c_batch,
            st.active_sh_degree,
            use_cn=self.guidance.use_controlnet(self.step, optim),
        )
        params, opt, aux, loss, n_entries, n_dropped = step_fn(
            st.params, st.opt, st.aux, self._cam_stack(cameras),
            self._aug_array(c_batch), text_emb,
            jnp.asarray(ladder, jnp.int32), noise, self.guidance.next_vae_key(),
            jnp.asarray(self.guidance.should_flip()),
            jnp.asarray(as_latent), lrs,
            mtsd.mods_params(self.guidance.mods),
        )
        self.state = dataclasses.replace(st, params=params, opt=opt, aux=aux)
        # ONE device->host transfer for all per-step scalars: each
        # separate int()/float() is its own round-trip (~1.5 ms over the
        # TPU tunnel), three of which were pure pipeline-stall latency
        loss, n_entries, n_dropped = jax.device_get(
            (loss, n_entries, n_dropped))
        if self.cap_ctrl.update(n_band, int(n_entries), int(n_dropped)):
            logger.info("entry capacity multiplier -> %.2fx (entries %d, "
                        "dropped %d)", self.cap_ctrl.mult, int(n_entries),
                        int(n_dropped))

        # ---- densify / prune cadence (object_trainer.py:385-459) --------
        if self.step < optim.densify_until_iter:
            if (self.step >= optim.densify_from_iter
                    and self.step % optim.densification_interval == 0):
                n0 = num_active(self.state)
                size_thr = 20 if self.step > optim.opacity_reset_interval else None
                key = jax.random.key(int(self.rng.integers(0, 2**31)))
                self.state = D.densify_and_prune(
                    self.state, key, optim.densify_grad_threshold, 0.005,
                    self.cameras_extent, size_thr, optim.percent_dense,
                )
                n1 = num_active(self.state)
                logger.debug("densify/prune: %d -> %d", n0, n1)
                if n1 > optim.max_point_number and self.step < 1500:
                    self.gaussian_filtering(self._mode_arg("prune_percent", 0.5))
                self._maybe_grow_capacity()
            if self.step % optim.opacity_reset_interval == 0:
                self.state = D.reset_opacity(self.state)

        if self.step == 1500:
            self.gaussian_filtering(0.3)

        if self.step % self.guidance_opt.vis_interval == 0:
            try:
                self.save_guidance_viz(cameras[0], vds)
            except Exception as e:  # viz must never kill training
                logger.debug("guidance viz failed: %s", e)
        return float(loss)

    def save_guidance_viz(self, camera, vds):
        """Per-interval guidance debug grid (reference:
        multitime_sd_utils.py:291-337)."""
        from dreamscene_tpu.utils.media import save_image_grid

        g = self.guidance
        out = object_render(self.state, camera, bg_color=self._bg_color(),
                            test=True, interpret=self.interpret)
        images = out["image"][None]
        latents = mtsd.encode_images(g.mods, images, g.next_vae_key())
        ladder = g.sample_ladder(min(self.step / self.optim.iterations, 1.0))
        noise = g.next_noise(latents.shape)
        text_emb, _ = assemble_text_embeddings(self.embeddings, [camera])
        scores = mtsd.ladder_scores(
            g.mods, latents, noise, jnp.asarray(ladder, jnp.int32), text_emb,
            n_rungs=len(ladder),
        )
        grad = mtsd.csd_grad(g.mods, scores, self.guidance_opt.guidance_scale)
        rows = mtsd.guidance_viz_grid(
            g.mods, images, out["depth"], out["alpha"], latents, grad, scores,
            self.guidance_opt.guidance_scale,
        )
        path = (self.vis_path /
                f"{self.id}_iter_{self.step}_vd_{'_'.join(vds)}.jpg")
        save_image_grid(str(path), rows)

    def _mode_arg(self, name, default):
        ma = self.cfg.mode_args or {}
        return ma.get(name, default) if isinstance(ma, dict) else default

    def _maybe_grow_capacity(self):
        st = self.state
        n = num_active(st)
        if n > 0.9 * st.capacity and st.capacity < self.optim.max_point_number:
            new_cap = min(st.capacity * 2, self.optim.max_point_number)
            logger.info("growing capacity %d -> %d", st.capacity, new_cap)
            self.state = resize(st, new_cap)

    # ------------------------------------------------------------------
    def gaussian_filtering(self, prune_percent):
        """Importance scoring over 48 sphere cameras + percentile prune
        (reference: scene_gaussian.py:1046-1103)."""
        from dreamscene_tpu.training.filtering import importance_filter

        self.state = importance_filter(
            self.state, self.rng, self.pose_args,
            bg_color=self._bg_color(), prune_percent=prune_percent,
            v_pow=self._mode_arg("v_pow", 0.1),
            prune_decay=self._mode_arg("prune_decay", 0.8),
            interpret=self.interpret,
        )

    # ------------------------------------------------------------------
    def refine_phase(self):
        """Reconstructive generation (reference refine_step + train() phase
        2, object_trainer.py:464-738): pseudo-GT from the 36-view reco rig
        once, then L2*100 per-view updates."""
        optim = self.recon_optim
        self.guidance.stage_range = (140, 200)
        self.guidance.jump_range = (75, 150)
        # fresh optimizer step count for the recon phase (the reference
        # re-runs training_setup, object_trainer.py:717)
        self.state = dataclasses.replace(
            self.state,
            opt=self.state.opt._replace(count=jnp.zeros((), jnp.int32)),
        )

        cams = S.load_reco_cam(
            self.pose_args, (4, 12, 14, 6), (100, 85, 75, 55), scale=0.9
        )
        gt_size = len(cams)
        # --- one-shot pseudo-GT generation ------------------------------
        gts = []
        step_size = 4
        for j in range(0, gt_size // 4 * 4, step_size):
            chunk = cams[j:j + step_size]
            imgs = []
            depths = []
            for cam in chunk:
                out = object_render(
                    self.state, cam, bg_color=self._bg_color(), test=True,
                    interpret=self.interpret,
                )
                imgs.append(out["image"])
                depths.append(out["depth"][None])
            imgs = jnp.stack(imgs)
            text_emb, vds = assemble_text_embeddings(self.embeddings, chunk)
            ladder = self.guidance.sample_ladder(0.0)
            h, w = self.pose_args.image_h, self.pose_args.image_w
            noise = self.guidance.next_noise(
                self.guidance.latent_shape(len(chunk), h, w)
            )
            latents = mtsd.encode_images(
                self.guidance.mods, imgs, self.guidance.next_vae_key()
            )
            scores = mtsd.ladder_scores(
                self.guidance.mods, latents, noise,
                jnp.asarray(ladder, jnp.int32), text_emb, n_rungs=len(ladder),
            )
            gt = mtsd.pseudo_gt_images(
                self.guidance.mods, scores, self.guidance_opt.guidance_scale
            )
            gts.extend(list(gt))
        self.gt_images = gts

        # --- recon loop --------------------------------------------------
        rec_batch = gt_size // 2
        densify_until = int(optim.iterations * rec_batch * 0.8)
        for it in range(optim.iterations):
            self.step += 1
            if self.step % 300 == 0:
                self.state = self.state.one_up_sh_degree()
            lrs = {
                k: jnp.asarray(v, jnp.float32)
                for k, v in group_lrs(
                    optim, self.state.spatial_lr_scale, self.step
                ).items()
            }
            for i in range(rec_batch):
                self.rec_count += 1
                st = self.state
                recon_fn = self._recon_step_fn(
                    self.cap_ctrl.capacity(st.capacity),
                    st.active_sh_degree)
                params, opt, aux, loss = recon_fn(
                    st.params, st.opt, st.aux,
                    self._cam_stack([cams[i]]),
                    jnp.asarray(self.gt_images[i]), lrs,
                )
                self.state = dataclasses.replace(
                    st, params=params, opt=opt, aux=aux
                )
                if self.rec_count % 100 == 0:
                    # recon-pair eval render (reference
                    # object_trainer.py:654-656 save_recon_img)
                    from dreamscene_tpu.utils.media import save_image_grid

                    out = object_render(
                        self.state, cams[i], bg_color=self._bg_color(),
                        test=True, interpret=self.interpret)
                    save_image_grid(
                        str(self.vis_path / f"recon_{self.rec_count}.jpg"),
                        [np.asarray(jnp.clip(out["image"], 0, 1)),
                         np.asarray(self.gt_images[i])],
                    )
                if self.rec_count < densify_until:
                    if self.rec_count % optim.densification_interval == 0:
                        size_thr = (
                            20 if self.rec_count > optim.opacity_reset_interval
                            else None
                        )
                        key = jax.random.key(int(self.rng.integers(0, 2**31)))
                        self.state = D.densify_and_prune(
                            self.state, key, optim.densify_grad_threshold,
                            0.005, self.cameras_extent, size_thr,
                            optim.percent_dense,
                        )
                        if (num_active(self.state) > optim.max_point_number
                                and it < 25):
                            self.gaussian_filtering(
                                self._mode_arg("prune_percent", 0.5)
                            )
                        self._maybe_grow_capacity()
                    if self.rec_count % optim.opacity_reset_interval == 0:
                        self.state = D.reset_opacity(self.state)

    def _recon_step_fn(self, capacity, active_deg):
        key = ("recon", capacity, active_deg)
        if key in self._jit_cache:
            return self._jit_cache[key]
        width = self.pose_args.image_w
        height = self.pose_args.image_h
        interpret = self.interpret

        @jax.jit
        def step(params, opt, aux, cam_stack, gt_image, lrs):
            active = aux.active
            probe = jnp.zeros((params.xyz.shape[0], 2), jnp.float32)

            def loss_fn(p, probe):
                state = dataclasses.replace(self.state, params=p, aux=aux)
                from dreamscene_tpu.ops.rasterizer import render as rrender

                cam = jax.tree.map(lambda x: x[0], cam_stack)
                out = rrender(
                    means3d=state.get_xyz, scales=state.get_scaling,
                    quats=state.get_rotation,
                    opacities=state.get_opacity[:, 0],
                    shs=state.get_features,
                    viewmatrix=cam["view"], projmatrix=cam["proj"],
                    campos=cam["campos"], tanfovx=cam["tanfovx"],
                    tanfovy=cam["tanfovy"], width=width, height=height,
                    bg=jnp.zeros((3,)), sh_degree=active_deg,
                    capacity=capacity, means2d_probe=probe,
                    valid_mask=aux.active,  # no ghost inactive rows
                    interpret=interpret,
                )
                loss = 100.0 * jnp.mean((out["image"] - gt_image) ** 2)
                return loss, {"radii": out["radii"],
                              "visible": out["visibility_filter"]}

            (loss, aux_out), (grads, probe_grad) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, probe)
            new_params, new_opt = adam_update(params, grads, opt, active, lrs)
            new_aux = D.update_max_radii(aux, aux_out["radii"], aux_out["visible"])
            new_aux = D.add_densification_stats(
                new_aux, probe_grad, aux_out["visible"]
            )
            return new_params, new_opt, new_aux, loss

        self._jit_cache[key] = step
        return step

    # ------------------------------------------------------------------
    def video_inference(self, tag: str):
        """Orbit rgb + depth videos (reference object_trainer.py:81-115
        saves video_rgb_*.mp4 and video_depth_*.mp4)."""
        cams = S.load_clip_cam(self.pose_args)
        frames, depths, alphas = [], [], []
        for cam in cams:
            out = object_render(self.state, cam, bg_color=(1, 1, 1), test=True,
                                interpret=self.interpret)
            img = np.asarray(jnp.clip(out["image"], 0, 1))
            frames.append((np.transpose(img, (1, 2, 0)) * 255).astype(np.uint8))
            # un-premultiply: "depth" is the alpha-weighted accumulation
            a = np.asarray(out["alpha"])
            depths.append(np.asarray(out["depth"]) / np.maximum(a, 1e-6))
            alphas.append(a)
        # one normalization window for the WHOLE orbit (per-frame windows
        # make static surfaces flicker between frames)
        fg = [d[a > 0.5] for d, a in zip(depths, alphas) if (a > 0.5).any()]
        lo = min((f.min() for f in fg), default=0.0)
        hi = max((f.max() for f in fg), default=1.0) + 1e-6
        dframes = []
        for d, a in zip(depths, alphas):
            dn = np.clip((d - lo) / (hi - lo), 0, 1) * (a > 0.1)
            dframes.append(
                np.repeat((dn * 255).astype(np.uint8)[..., None], 3, -1))
        write_video(
            str(self.vis_path / f"video_rgb_{self.id}_{tag}.mp4"), frames
        )
        write_video(
            str(self.vis_path / f"video_depth_{self.id}_{tag}.mp4"), dframes
        )

    def save_model(self, tag):
        path = self.ckpt_path / f"{self.id}_{tag}_model.ply"
        save_splat_ply(str(path), self.state)
        logger.info("saved %s", path)

    # ------------------------------------------------------------------
    def _resume_intermediate(self):
        """Restore the highest `<id>_<step>_model.ply` snapshot and
        fast-forward (reference ckpt_checker, scene_gaussian.py:53-80;
        object_trainer.py:709-711)."""
        best, best_path = 0, None
        for f in os.listdir(self.ckpt_path):
            parts = f.split("_")
            if (f.endswith("_model.ply") and parts[0] == self.id
                    and parts[1].isdigit() and int(parts[1]) > best):
                best, best_path = int(parts[1]), self.ckpt_path / f
        if best_path is not None:
            logger.info("resuming %s from step %d", self.id, best)
            cap = min(4 * self._loaded_count(best_path),
                      self.optim.max_point_number)
            self.state = load_splat_ply(str(best_path), capacity=cap)
            self.step = best

    @staticmethod
    def _loaded_count(path) -> int:
        from dreamscene_tpu.models.ply import _parse_ply

        _, data = _parse_ply(str(path))
        return max(data.shape[0], 1)

    def train(self, video_every: int = 500, make_videos: bool = False):
        final = self.ckpt_path / f"{self.id}_final_model.ply"
        if final.exists():
            logger.info("object %s already trained; skipping", self.id)
            self.state = load_splat_ply(str(final))
            return

        self.prepare_train()
        self._resume_intermediate()
        if not self.recon_optim.only_recon_stage:
            for _ in range(self.step, self.optim.iterations):
                self.train_step()
                if make_videos and self.step % video_every == 0:
                    self.video_inference(str(self.step))
            self.save_model(str(self.step))
        self.refine_phase()
        if make_videos:
            self.video_inference("final")
        self.save_model("final")
        if self._mode_arg("export_mesh", False):
            # beyond the reference (it stops at the occupancy grid,
            # gs_renderer.py:491-573): textured mesh out of the trained
            # splats via marching tetrahedra
            from dreamscene_tpu.models.mesh import export_mesh

            path = str(self.ckpt_path / f"{self.id}_mesh.ply")
            info = export_mesh(
                self.state, path,
                resolution=int(self._mode_arg("mesh_resolution", 128)),
                thresh=float(self._mode_arg("mesh_thresh", 1.0)),
            )
            logger.info("mesh export %s: %s", path, info)
