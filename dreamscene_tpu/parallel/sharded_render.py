"""Multi-chip sharded rendering + training step (SPMD over a Mesh).

The reference has NO distributed runtime — its only "distribution" is
placing the SD guidance on a second GPU (SURVEY.md §2 parallelism
inventory; training/scene_trainer.py:27-34). The TPU build defines the
parallelism itself (BASELINE.json north star): the scaling axes of 3DGS
are #splats (N) and #pixels/tiles (H*W), so we shard:

  * cameras over a data-parallel axis ("dp") — the C_batch=4 guidance
    batch renders and its UNet ladder are embarrassingly parallel;
  * image tile-rows over a tile axis ("tp") — each device projects the
    (replicated) splat set, shifts screen coordinates into its band,
    bins only its own tiles, and composites its band with the same Pallas
    kernels used single-chip;
  * parameter gradients are all-reduced over BOTH axes via the psum that
    shard_map's autodiff inserts for replicated inputs — riding ICI.

`make_sharded_render` returns a function whose forward and backward are
fully SPMD; `make_sharded_train_step` wraps it into a complete FPS
training step (render -> VAE encode -> UNet ladder -> CSD grad -> masked
Adam) for the multi-chip dry-run and pod-scale training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dreamscene_tpu.models.gaussians import GaussianParams, adam_update
from dreamscene_tpu.ops.projection import project_gaussians
from dreamscene_tpu.ops.rasterizer import (
    render as raster_render,
    render_from_splats,
)


def make_mesh(n_dp: int, n_tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_tp, (len(devices), n_dp, n_tp)
    import numpy as np

    dev = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(dev, ("dp", "tp"))


def _render_band(inputs, cam, width, band_h, y_offset, bg, sh_degree,
                 capacity, full_height, chunk=128, interpret=False):
    """Render one horizontal band of the image: shift projected y by the
    band offset and rasterize a height-band_h image. The shift happens in
    screen space *after* projection so per-splat math is identical across
    bands (no seams — verified by test_parallel)."""
    return raster_render(
        means3d=inputs["means3d"], scales=inputs["scales"],
        quats=inputs["quats"], opacities=inputs["opacities"],
        shs=inputs["shs"], viewmatrix=cam["view"], projmatrix=cam["proj"],
        campos=cam["campos"], tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
        width=width, height=band_h, bg=bg, sh_degree=sh_degree,
        capacity=capacity, valid_mask=inputs.get("valid_mask"),
        means2d_probe=inputs.get("means2d_probe"),
        pixel_offset_y=y_offset, full_height=full_height,
        chunk=chunk, interpret=interpret,
    )


def make_sharded_render(mesh: Mesh, width: int, height: int, sh_degree: int,
                        capacity: int, chunk: int = 256,
                        interpret: bool = False):
    """Returns render_fn(inputs, cam_stack, bg) -> images [B,3,H,W] with B
    sharded over "dp" and H over "tp"."""
    n_tp = mesh.shape["tp"]
    assert height % n_tp == 0, (height, n_tp)
    from dreamscene_tpu.ops.binning import DEFAULT_TILE_H

    band_h = height // n_tp
    # tile-aligned bands keep the per-tile rect-cull semantics identical
    # to the single-chip render (splat tails are cut at tile granularity)
    assert band_h % DEFAULT_TILE_H == 0, (band_h, "bands must be tile-aligned")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P("dp", None, "tp", None), P("dp", None, "tp", None)),
        check_vma=False,
    )
    def render_fn(inputs, cam_stack, bg):
        band = jax.lax.axis_index("tp") * band_h
        b_local = cam_stack["view"].shape[0]
        images, alphas = [], []
        for i in range(b_local):
            cam = jax.tree.map(lambda x, i=i: x[i], cam_stack)
            out = _render_band(inputs, cam, width, band_h, band, bg[i],
                               sh_degree, capacity, height, chunk, interpret)
            images.append(out["image"])
            alphas.append(out["alpha"][None])
        return jnp.stack(images), jnp.stack(alphas)

    return render_fn


def make_primitive_sharded_render(mesh: Mesh, width: int, height: int,
                                  sh_degree: int, capacity: int,
                                  chunk: int = 256, interpret: bool = False):
    """Splat-sharded + tile-band-sharded SPMD render (the BASELINE.json
    north star): device (d, t) holds splat shard t of the parameters
    (1/n_tp of N — parameters, Adam state, and the projection compute all
    scale with the mesh), projects ONLY its shard, `all_gather`s the
    compact projected records (means2d/conic/color/depth/opacity ≈ 11
    floats/splat — not the ≥59-float raw parameters) across "tp", and
    rasterizes its own tile band. The all_gather's transpose is
    `psum_scatter`, so the backward compositing pass reduces record
    gradients straight back to the owning shard over ICI — XLA's
    latency-hiding scheduler overlaps the scatter with the remaining
    per-band backward work.

    Returns render_fn(inputs, cam_stack, bg) -> (images [B,3,H,W],
    alphas [B,1,H,W]); inputs arrays lead with the GLOBAL splat axis
    (sharded over "tp" by the shard_map), cam_stack/bg lead with the
    dp-sharded camera batch. N must divide by mesh n_tp."""
    n_tp = mesh.shape["tp"]
    assert height % n_tp == 0, (height, n_tp)
    from dreamscene_tpu.ops.binning import DEFAULT_TILE_H

    band_h = height // n_tp
    assert band_h % DEFAULT_TILE_H == 0, (band_h, "bands must be tile-aligned")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("tp"), P("dp"), P("dp")),
        out_specs=(P("dp", None, "tp", None), P("dp", None, "tp", None)),
        check_vma=False,
    )
    def render_fn(inputs, cam_stack, bg):
        band = jax.lax.axis_index("tp") * band_h
        b_local = cam_stack["view"].shape[0]
        images, alphas = [], []
        for i in range(b_local):
            cam = jax.tree.map(lambda x, i=i: x[i], cam_stack)
            splats = project_gaussians(
                inputs["means3d"], inputs["scales"], inputs["quats"],
                inputs["opacities"], inputs["shs"],
                cam["view"], cam["proj"], cam["campos"],
                cam["tanfovx"], cam["tanfovy"], width, height,
                sh_degree=sh_degree,
                valid_mask=inputs.get("valid_mask"),
            )
            if inputs.get("means2d_probe") is not None:
                splats = splats._replace(
                    means2d=splats.means2d + inputs["means2d_probe"])
            splats = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "tp", axis=0, tiled=True),
                splats,
            )
            out = render_from_splats(
                splats, width, band_h, bg[i], capacity=capacity,
                chunk=chunk, pixel_offset_y=band, interpret=interpret,
            )
            images.append(out["image"])
            alphas.append(out["alpha"][None])
        return jnp.stack(images), jnp.stack(alphas)

    return render_fn


def shard_splat_state(mesh: Mesh, state, logger=None):
    """Lay a GaussianState's splat-major leaves out SHARDED over the tp
    axis (1/n_tp rows per device — the ZeRO-style params/Adam/aux memory
    scaling of BASELINE.json config 5). Matches the P("tp") splat
    in_specs of the shard_maps here, so the step slices nothing and
    GSPMD keeps every elementwise stage (activations, Adam) partition-
    local. device_put with an already-matching sharding is a no-op;
    non-divisible capacities fall back to replicated with a warning."""
    n_tp = mesh.shape["tp"]
    cap = state.capacity
    if cap % n_tp != 0:
        if logger is not None:
            logger.warning(
                "capacity %d %% tp %d != 0 — persistent state stays "
                "replicated (no ZeRO memory scaling)", cap, n_tp)
        return state

    # classify splat-major leaves by FIELD NAME, not by a shape
    # coincidence: a replicated leaf whose leading dim happens to equal a
    # tiny test capacity (e.g. background [3] at cap=3) must stay
    # replicated. Adam moments mirror the params tree, so the same final
    # attribute name appears on their paths.
    _REPLICATED_FIELDS = {"background", "count"}

    def put_path(path, x):
        name = None
        for p in reversed(path):
            key = getattr(p, "name", getattr(p, "key", None))
            if key is not None:
                name = key
                break
        splat_major = (
            hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap
            and name not in _REPLICATED_FIELDS
        )
        spec = P("tp", *([None] * (x.ndim - 1))) if splat_major else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put_path, state)


def make_fps_camera_render(mesh: Mesh, width: int, height: int,
                           sh_degree: int, capacity: int, c_batch: int,
                           chunk: int = 256, shard_splats: bool = False,
                           interpret: bool = False):
    """The TRAINER's per-camera render loop as one SPMD shard_map — the
    piece that makes `main.py ... parallelParams.tp=N` train on a mesh.

    Reproduces ObjectTrainer._fps_step_fn's loop semantics exactly
    (per-camera SH/scale noise aug, background, means2d probes, disparity
    normalization, reference-quirk last-camera densify stats — reference
    training/object_trainer.py:299-459) with cameras sharded over "dp"
    and tile bands over "tp"; `shard_splats=True` additionally splits the
    splat axis over "tp" (projection compute + records all_gathered, the
    ZeRO-style scaling of make_primitive_sharded_render).

    Cross-band reductions (disparity min/max, n_entries) ride pmax/pmin
    over "tp"; the last GLOBAL camera's per-splat stats are selected with
    a masked psum over "dp". `capacity` is PER BAND.

    Args:
      inputs: dict with xyz [N,3], features [N,K,3], scaling (activated),
        rotation (normalized), opacities (activated, [N]), active [N].
      cam_stack: dict of [B, ...] camera arrays; aug_arr [B, 6]
        (bg rgb, sh_drop, shs_noise, scale_noise); probes [B, N, 2];
        vae_key: base PRNG key (replicated).
    Returns: images [B,3,H,W], disps [B,1,H,W], alphas [B,1,H,W],
      radii [N], visible [N], scales_mean [1], n_entries [1], n_dropped [1].
    """
    from dreamscene_tpu.ops.binning import DEFAULT_TILE_H

    n_tp = mesh.shape["tp"]
    n_dp = mesh.shape["dp"]
    assert height % n_tp == 0 and (height // n_tp) % DEFAULT_TILE_H == 0, (
        height, n_tp)
    assert c_batch % n_dp == 0, (c_batch, n_dp)
    band_h = height // n_tp
    b_local = c_batch // n_dp
    splat_spec = P("tp") if shard_splats else P()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(splat_spec,                    # inputs (leading N axis)
                  P("dp"),                       # cam_stack
                  P("dp"),                       # aug_arr
                  P("dp", "tp") if shard_splats else P("dp"),  # probes
                  P()),                          # vae_key
        out_specs=(P("dp", None, "tp", None),    # images
                   P("dp", None, "tp", None),    # disps
                   P("dp", None, "tp", None),    # alphas
                   splat_spec, splat_spec,       # radii, visible
                   P(), P(), P()),               # scales_mean/n_entries/n_dropped
        check_vma=False,
    )
    def render_fn(inputs, cam_stack, aug_arr, probes, vae_key):
        band = jax.lax.axis_index("tp") * band_h
        dp_i = jax.lax.axis_index("dp")
        active = inputs["active"]
        images, disps, alphas = [], [], []
        radii_sel = None
        n_entries = jnp.int32(0)
        n_dropped = jnp.int32(0)
        for i in range(b_local):
            g = dp_i * b_local + i               # global camera index
            cam = jax.tree.map(lambda x, i=i: x[i], cam_stack)
            # --- per-camera aug (matches ObjectTrainer exactly) --------
            shs = inputs["features"]
            rest_mask = 1.0 - aug_arr[i, 3]
            shs = jnp.concatenate([shs[:, :1], shs[:, 1:] * rest_mask], axis=1)
            scales = inputs["scaling"]
            k1, k2 = jax.random.split(jax.random.fold_in(vae_key, g + 1))
            if shard_splats:
                # local-shard noise: per-shard fold keeps streams disjoint
                # (not bit-identical to the single-device draw — the
                # parity test compares trajectories, not bits)
                tpi = jax.lax.axis_index("tp")
                k1 = jax.random.fold_in(k1, tpi)
                k2 = jax.random.fold_in(k2, tpi)
            shs = shs + aug_arr[i, 4] * jax.random.normal(
                k1, shs.shape) * (0.2**0.5) * shs
            scales = jnp.maximum(
                scales + aug_arr[i, 5] * jax.random.normal(
                    k2, scales.shape) * (0.2**0.5) * scales / 4, 0.0,
            )
            # --- project (local shard) + band rasterize ----------------
            splats = project_gaussians(
                inputs["xyz"], scales, inputs["rotation"],
                inputs["opacities"], shs,
                cam["view"], cam["proj"], cam["campos"],
                cam["tanfovx"], cam["tanfovy"], width, height,
                sh_degree=sh_degree, valid_mask=active,
            )
            splats = splats._replace(means2d=splats.means2d + probes[i])
            if shard_splats:
                gathered = jax.tree.map(
                    lambda x: jax.lax.all_gather(x, "tp", axis=0, tiled=True),
                    splats,
                )
            else:
                gathered = splats
            out = render_from_splats(
                gathered, width, band_h, aug_arr[i, :3], capacity=capacity,
                chunk=chunk, pixel_offset_y=band, interpret=interpret,
            )
            # --- disparity normalize with cross-band reductions --------
            focal = 1.0 / (2.0 * cam["tanfovx"])
            disp = focal / (out["depth"] + out["alpha"] * 10.0 + 1e-5)
            empty = out["alpha"] <= 0.1
            # cross-band reductions via all_gather (differentiable —
            # pmin/pmax have no JVP rule; the gather's transpose routes
            # the normalization gradient to the owning band, matching
            # the single-device argmin/argmax subgradient)
            stats = jax.lax.all_gather(
                jnp.stack([
                    jnp.min(jnp.where(empty, disp, jnp.inf)),
                    jnp.min(disp),
                    -jnp.max(disp),
                    -jnp.any(empty).astype(jnp.float32),
                ]), "tp")                                 # [n_tp, 4]
            any_empty = jnp.min(stats[:, 3]) < -0.5
            min_d = jnp.where(any_empty, jnp.min(stats[:, 0]),
                              jnp.min(stats[:, 1]))
            max_disp = -jnp.min(stats[:, 2])
            disp = jnp.clip(
                (disp - min_d) / jnp.maximum(max_disp - min_d, 1e-12),
                0.0, 1.0)  # 0/0 guard: see rendering.py disparity note
            images.append(out["image"])
            disps.append(disp[None])
            alphas.append(out["alpha"][None])
            n_entries = jnp.maximum(n_entries, out["n_entries"])
            n_dropped = jnp.maximum(n_dropped, out["n_dropped"])
            if i == b_local - 1:
                # reference quirk: densify stats come from the LAST
                # camera only — select the dp rank owning camera B-1
                owns_last = (g == c_batch - 1).astype(jnp.float32)
                radii_sel = jax.lax.psum(
                    splats.radii.astype(jnp.float32) * owns_last, "dp")
                vis_sel = jax.lax.psum(
                    splats.visible.astype(jnp.float32) * owns_last, "dp")
                sm_local = jnp.sum(scales * active[:, None])
                sden = jnp.sum(active) * 3.0
                if shard_splats:
                    sm_local = jax.lax.psum(sm_local, "tp")
                    sden = jax.lax.psum(sden, "tp")
                scales_mean = jax.lax.psum(
                    sm_local * owns_last, "dp") / jnp.maximum(
                        jax.lax.psum(sden * owns_last, "dp"), 1.0)

        n_entries = jax.lax.pmax(jax.lax.pmax(n_entries, "tp"), "dp")
        n_dropped = jax.lax.pmax(jax.lax.pmax(n_dropped, "tp"), "dp")
        return (jnp.stack(images), jnp.stack(disps), jnp.stack(alphas),
                radii_sel.astype(jnp.int32), vis_sel > 0.5,
                scales_mean.reshape(1), n_entries.reshape(1),
                n_dropped.reshape(1))

    return render_fn


def make_sharded_train_step(mesh: Mesh, guidance, width: int, height: int,
                            sh_degree: int, capacity: int, n_rungs: int = 1,
                            guidance_scale: float = 7.5, chunk: int = 256,
                            shard_splats: bool = False,
                            interpret: bool = False):
    """Full multi-chip FPS training step: sharded render -> dp-sharded
    guidance ladder -> psum'd parameter grads -> masked Adam. The returned
    function is jittable over the mesh.

    shard_splats=True selects the primitive-sharded render (params,
    gradients, and Adam state split 1/n_tp per device — the
    ZeRO-style memory scaling needed for the 1M-splat outdoor configs);
    False replicates splats and shards only tiles+cameras."""
    from dreamscene_tpu.guidance import mtsd

    base_mods = guidance.mods
    mod_params = mtsd.mods_params(base_mods)
    factory = (make_primitive_sharded_render if shard_splats
               else make_sharded_render)
    render_fn = factory(mesh, width, height, sh_degree, capacity,
                        chunk, interpret)

    def ladder_grad_inner(mp, latents, noise, text_emb3, ts):
        # text_emb3: [3, B_local, L, D] -> [3*B_local, L, D] keeping the
        # cond | uncond | inverse block order the ladder expects
        mods = mtsd.with_params(base_mods, mp)
        t = text_emb3.reshape((-1,) + text_emb3.shape[2:])
        scores = mtsd.ladder_scores(mods, latents, noise, ts, t,
                                    n_rungs=n_rungs)
        return mtsd.csd_grad(mods, scores, guidance_scale)

    ladder_grad = jax.shard_map(
        ladder_grad_inner, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P(None, "dp"), P()),
        out_specs=P("dp"),
        check_vma=False,
    )

    @functools.partial(jax.jit, static_argnames=())
    def train_step_inner(mp, params: GaussianParams, opt, active, cam_stack,
                         bg, text_emb3, ladder_ts, noise, vae_key, lrs):
        # SD weights as arguments (replicated over the mesh), not closure
        # constants — see mtsd.mods_params
        mods = mtsd.with_params(base_mods, mp)
        def loss_fn(params):
            q = params.rotation
            inputs = dict(
                means3d=params.xyz,
                scales=jnp.exp(params.scaling),
                quats=q / jnp.linalg.norm(q, axis=-1, keepdims=True),
                opacities=jax.nn.sigmoid(params.opacity[:, 0]),
                shs=jnp.concatenate(
                    [params.features_dc, params.features_rest], axis=1
                ),
                valid_mask=active,
            )
            images, alphas = render_fn(inputs, cam_stack, bg)
            latents = mtsd.encode_images(mods, images, vae_key)
            grad = jax.lax.stop_gradient(
                ladder_grad(mp, jax.lax.stop_gradient(latents), noise,
                            text_emb3, ladder_ts)
            )
            return mtsd.specify_gradient_loss(latents, grad)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params, new_opt = adam_update(params, grads, opt, active, lrs)
        return new_params, new_opt, loss

    def train_step(params, opt, active, cam_stack, bg, text_emb3, ladder_ts,
                   noise, vae_key, lrs):
        return train_step_inner(mod_params, params, opt, active, cam_stack,
                                bg, text_emb3, ladder_ts, noise, vae_key, lrs)

    return train_step
