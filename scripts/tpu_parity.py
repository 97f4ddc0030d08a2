"""Compiled-kernel parity on the REAL TPU (BASELINE.md correctness row).

Two checks the CPU-interpret CI cannot do:
  1. mid-size: compiled Mosaic kernels (TPU) vs the exact jnp golden
     renderer (CPU backend) — forward images atol 1e-4 AND parameter
     gradients.
  2. full-scale (300K splats, 512^2, the bench scene): compiled TPU vs
     the same Pallas path in interpret mode on CPU — catches Mosaic
     compilation differences invisible to interpret-only CI, at the
     scale the baseline demands.

Run: timeout 580 python scripts/tpu_parity.py            (TPU tunnel env)
Prints one JSON line {"ok": bool, ...metrics}. Exit 1 on failure.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _camera
from bench import build_scene
from dreamscene_tpu.ops.rasterizer import render
from dreamscene_tpu.ops.reference import render_reference

report = {"ok": True}


def fail(key, val):
    report["ok"] = False
    report[key] = val


def cam_kwargs(cam):
    return dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        width=cam.width, height=cam.height,
    )


# ---- 1. mid-size compiled-vs-golden (fwd + grads) ------------------------
scene = build_scene(3000, seed=3)
cam = _camera(96, 96)
kw = cam_kwargs(cam)
bg = jnp.zeros((3,), jnp.float32)


def loss_tpu(means3d):
    out = render(**{**scene, "means3d": means3d}, **kw, bg=bg, sh_degree=2,
                 capacity=16 * 3000, chunk=128)
    return jnp.sum(out["image"] ** 2), out


def loss_gold(means3d):
    out = render_reference(**{**scene, "means3d": means3d}, **kw, bg=bg,
                           sh_degree=2)
    return jnp.sum(out["image"] ** 2), out


(_, out_t), g_t = jax.jit(jax.value_and_grad(loss_tpu, has_aux=True))(
    scene["means3d"])
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    scene_c = jax.device_put(scene, cpu)
    (_, out_g), g_g = jax.jit(
        jax.value_and_grad(loss_gold, has_aux=True))(scene_c["means3d"])

img_err = float(np.abs(np.asarray(out_t["image"]) -
                       np.asarray(out_g["image"])).max())
alpha_err = float(np.abs(np.asarray(out_t["alpha"]) -
                         np.asarray(out_g["alpha"])).max())
gt, gg = np.asarray(g_t), np.asarray(g_g)
gs = float(np.abs(gg).max())
grad_err = float(np.abs(gt - gg).max()) / max(gs, 1e-12)
report["mid_img_atol"] = img_err
report["mid_alpha_atol"] = alpha_err
report["mid_grad_rel"] = grad_err
if img_err > 1e-4 or alpha_err > 1e-4:
    fail("mid_forward", "exceeds 1e-4")
if grad_err > 5e-3:
    fail("mid_grad", "exceeds 5e-3 relative")

# ---- 2. full-scale compiled-vs-interpret ---------------------------------
big = build_scene(300_000)
bcam = _camera(512, 512)
bkw = cam_kwargs(bcam)
cap = 4 * 300_000


def full(means3d, interpret):
    out = render(**{**big, "means3d": means3d}, **bkw, bg=bg, sh_degree=2,
                 capacity=cap, interpret=interpret)
    return out["image"], out["alpha"], out["n_dropped"]


img_tpu, alpha_tpu, nd_tpu = jax.jit(
    lambda m: full(m, False))(big["means3d"])
img_tpu = np.asarray(img_tpu)
with jax.default_device(cpu):
    big_c = jax.device_put(big, cpu)
    img_cpu, alpha_cpu, nd_cpu = jax.jit(
        lambda m: full(m, True))(big_c["means3d"])

full_img_err = float(np.abs(img_tpu - np.asarray(img_cpu)).max())
full_alpha_err = float(np.abs(np.asarray(alpha_tpu) -
                              np.asarray(alpha_cpu)).max())
report["full_img_atol"] = full_img_err
report["full_alpha_atol"] = full_alpha_err
report["n_dropped"] = [int(nd_tpu), int(nd_cpu)]
if int(nd_tpu) != int(nd_cpu):
    fail("full_ndropped", "mismatch")
if full_img_err > 1e-4:
    fail("full_forward", "exceeds 1e-4")

print(json.dumps(report))
sys.exit(0 if report["ok"] else 1)
