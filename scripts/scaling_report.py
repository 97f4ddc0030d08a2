"""Measured SPMD scaling of the primitive-sharded train step on a
virtual CPU mesh (1/2/4/8 devices).

CPU virtual devices share one socket, so absolute times mean little and
super-/sub-linear artifacts are expected — what this DOES validate, per
device count: the full jit (projection -> all_gather of projected
records to tile-band owners -> banded rasterize -> guidance ->
psum_scatter of record grads -> per-shard Adam) compiles, executes and
yields finite losses at every mesh shape; comm volume scales as
designed (records all_gathered once per step: N/n_tp * ~11 f32 per
device pair, gradients psum_scattered back — sharded_render.py). Strict
numeric invariance vs single-device is asserted in tests/test_parallel.

Run:  env PYTHONPATH= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_report.py
Writes PARALLELISM.md with the measured table.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def run(n_dp, n_tp, n=60_000, width=256, iters=3):
    from __graft_entry__ import _camera
    from dreamscene_tpu.guidance import mtsd
    from dreamscene_tpu.models.gaussians import create_from_points
    from dreamscene_tpu.parallel.sharded_render import (
        make_mesh, make_sharded_train_step,
    )
    from dreamscene_tpu.utils.config import GuidanceParams

    mesh = make_mesh(n_dp, n_tp)
    height = max(width // (16 * n_tp), 1) * 16 * n_tp
    b = n_dp
    rng = np.random.RandomState(0)
    state = create_from_points(
        rng.randn(n, 3).astype(np.float32) * 1.2,
        rng.rand(n, 3).astype(np.float32), sh_degree=1, capacity=n,
    )
    guidance = mtsd.make_tiny_guidance(GuidanceParams(), downscale=8)
    step = make_sharded_train_step(
        mesh, guidance, width, height, sh_degree=1,
        capacity=max(2 * n // max(n_tp, 1), 4096), n_rungs=1,
        shard_splats=True, interpret=True,
    )
    cams = [_camera(width, height) for _ in range(b)]
    cam_stack = {
        "view": jnp.stack([jnp.asarray(c.world_view_transform) for c in cams]),
        "proj": jnp.stack([jnp.asarray(c.full_proj_transform) for c in cams]),
        "campos": jnp.stack([jnp.asarray(c.camera_center) for c in cams]),
        "tanfovx": jnp.asarray([c.tanfovx for c in cams], jnp.float32),
        "tanfovy": jnp.asarray([c.tanfovy for c in cams], jnp.float32),
    }
    bg = jnp.zeros((b, 3), jnp.float32)
    text = guidance.get_text_embeds(["obj"] * b + ["neg"] * b + ["inv"] * b)
    l, d = text.shape[1], text.shape[2]
    text3 = text.reshape(3, b, l, d)
    ts = jnp.asarray([300], jnp.int32)
    noise = mtsd.make_ladder_noise(
        jax.random.key(0), guidance.latent_shape(b, height, width))
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in
           ["xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation",
            "background"]}
    args = (state.params, state.opt, state.aux.active, cam_stack, bg,
            text3, ts, noise, jax.random.key(1), lrs)
    t0 = time.perf_counter()
    p, o, loss = step(*args)
    jax.block_until_ready(p)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, loss = step(*args)
    jax.block_until_ready(p)
    step_s = (time.perf_counter() - t0) / iters
    return dict(mesh=f"{n_dp}x{n_tp}", devices=n_dp * n_tp,
                splats_per_device=n // n_tp, compile_s=round(compile_s, 1),
                step_s=round(step_s, 3), loss=float(loss))


def main():
    rows = [run(1, 1), run(1, 2), run(2, 2), run(2, 4)]
    print(json.dumps(rows, indent=1))
    base = rows[0]["step_s"]
    lines = [
        "# Parallelism: measured virtual-mesh scaling",
        "",
        "Primitive-sharded SPMD train step (parallel/sharded_render.py):",
        "params + Adam state sharded 1/n_tp per device, projected records",
        "all_gathered to tile-band owners, record gradients psum_scattered",
        "back, parameter grads psum'd over dp. Measured on a virtual CPU",
        "mesh (shared socket — wall-clock is NOT a chip-scaling claim; it",
        "validates compilation, execution, and loss-invariance of the",
        "sharded program at every mesh shape; real ICI scaling needs pod",
        "hardware, see ROADMAP).",
        "",
        "| mesh (dp x tp) | devices | splats/device | step (s) | vs 1x1 | loss |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['mesh']} | {r['devices']} | {r['splats_per_device']} "
            f"| {r['step_s']} | {base / r['step_s']:.2f}x | {r['loss']:.3f} |"
        )
    lines += [
        "",
        "Losses are NOT expected to match across mesh shapes here: dp",
        "changes the camera batch (loss = mean over dp cameras) and tp",
        "changes the per-band entry capacity (2N/n_tp), shifting the",
        "overflow drop set on this deliberately saturated scene. The",
        "strict invariance claims — band renders seam-free-equal to",
        "single-device at matched capacity, and primitive-sharded",
        "forward+gradients equal to replicated — are asserted in",
        "tests/test_parallel.py.",
        "",
        "60K splats at 256^2, tiny-guidance FPS step, interpret-mode",
        "kernels (CPU). Generated by scripts/scaling_report.py.",
        "",
    ]
    from comm_model import section_lines
    lines += section_lines()
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PARALLELISM.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PARALLELISM.md")


if __name__ == "__main__":
    main()
