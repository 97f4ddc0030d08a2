"""Compiled-kernel parity on the REAL TPU (BASELINE.md correctness row).

Checks the CPU-interpret CI cannot do:
  1. mid-size, NON-overflowing capacity: compiled Mosaic kernels (TPU)
     vs the exact jnp golden renderer (CPU backend) — forward images
     AND parameter gradients. Capacity must cover every entry, because
     the golden has no drop semantics (overflow behavior is covered by
     tests/test_capacity_overflow.py on CPU).
  2. full-scale (300K splats, 512^2, bench scene, overflowing): compiled
     TPU vs the SAME Pallas path in interpret mode on the SAME TPU
     backend — forward images AND bench-loss parameter gradients (the
     full _bwd_kernel + VJP chain at bench scale) — identical projection
     floats and identical drop set, so a
     difference beyond small-rounding scale is a Mosaic compilation bug.
     NOT bit-exact by design: Mosaic's exp/log/matmul lowerings round
     differently from XLA's (measured per-op 3e-6..6e-5 on v5e), and the
     saturated scene amplifies isolated pixels through applied-threshold
     flips — so the gate is quantile-based: p999 tight (bulk must agree
     to rounding), max loose (a few flip pixels allowed). The int-key
     corruption class this exists to catch shifts EVERY pixel by >1e-2.
     (Cross-backend comparison is invalid here: CPU-vs-TPU projection
     rounding shifts radii at ceil() boundaries, changing the overflow
     drop set — measured n_dropped delta 0.06%, image max-diff 0.83.)

Run: timeout 580 python scripts/tpu_parity.py            (TPU tunnel env)
Prints one JSON line {"ok": bool, ...metrics}. Exit 1 on failure.
"""
import os as _os_cache
_os_cache.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os_cache.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "4")
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

from dreamscene_tpu.ops.binning import DEFAULT_TILE_H, DEFAULT_TILE_W

report = {"ok": True, "tile": [DEFAULT_TILE_W, DEFAULT_TILE_H]}


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


# ---- 1. mid-size compiled-vs-golden (fwd + grads), zero overflow ---------
N_MID = 3000
scene = build_scene(N_MID, seed=3)
cam = _camera(96, 96)
kw = cam_kwargs(cam)
bg = jnp.zeros((3,), jnp.float32)
CAP_MID = 160 * N_MID  # bench-scene splats are fat; must cover ALL entries


def loss_tpu(means3d):
    out = render(**{**scene, "means3d": means3d}, **kw, bg=bg, sh_degree=2,
                 capacity=CAP_MID, chunk=256)
    return jnp.sum(out["image"] ** 2), out


def loss_gold(means3d):
    out = render_reference(**{**scene, "means3d": means3d}, **kw, bg=bg,
                           sh_degree=2)
    return jnp.sum(out["image"] ** 2), out


(_, out_t), g_t = jax.jit(jax.value_and_grad(loss_tpu, has_aux=True))(
    scene["means3d"])
report["mid_n_dropped"] = int(out_t["n_dropped"])
if report["mid_n_dropped"] != 0:
    fail("mid_capacity", "overflowed - raise CAP_MID")
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
if img_err > 1e-3 or alpha_err > 1e-3:
    fail("mid_forward", "exceeds 1e-3")
if grad_err > 5e-3:
    # measured 3.7e-3 on v5e (bf16 split-dot rounding in the moment
    # matmuls vs the f64-free CPU golden); gate tightened from the
    # round-2 1e-2 to sit just above the measured floor
    fail("mid_grad", "exceeds 5e-3 relative")

# ---- 2. full-scale compiled-vs-interpret, same TPU backend ---------------
big = build_scene(300_000)
bcam = _camera(512, 512)
bkw = cam_kwargs(bcam)
cap = 4 * 300_000


def full(means3d, interpret):
    out = render(**{**big, "means3d": means3d}, **bkw, bg=bg, sh_degree=2,
                 capacity=cap, interpret=interpret)
    return out["image"], out["alpha"], out["n_dropped"]


def full_loss(params, interpret):
    # the bench step's loss — exercises _bwd_kernel + the full VJP chain
    # (grad gather, cumsum, boundary, moment matmuls) at bench scale
    out = render(**params, **bkw, bg=bg, sh_degree=2,
                 capacity=cap, interpret=interpret)
    return (jnp.mean(out["image"]) + 0.1 * jnp.mean(out["depth"])
            + 0.01 * jnp.mean(out["alpha"]))


img_c, alpha_c, nd_c = jax.jit(lambda m: full(m, False))(big["means3d"])
img_i, alpha_i, nd_i = jax.jit(lambda m: full(m, True))(big["means3d"])

# full-scale GRADIENTS, compiled vs interpret (same backend, same drop
# set): a Mosaic miscompile confined to _bwd_kernel's moment-matmul path
# would pass the forward gate — this catches it (VERDICT r2 item 4).
# Gates are quantile-based like the forward, but looser: per-SPLAT
# gradients amplify applied-threshold flips (an entry whose T*P crosses
# TRANSMITTANCE_EPS differently under Mosaic-vs-XLA rounding flips its
# ENTIRE contribution into that one splat's gradient, where the forward
# spreads it over a pixel among hundreds) — measured on this saturated
# scene: means3d p99 ~2e-4 / p999 ~1.6e-3, opacities/scales p999 up to
# ~1.3e-2 from eps-flips on near-transparent splats. The catastrophic
# class (int-key corruption) moves the p99 BULK by orders of magnitude.
g_c = jax.jit(jax.grad(lambda p: full_loss(p, False)))(big)
g_i = jax.jit(jax.grad(lambda p: full_loss(p, True)))(big)
# ALL differentiated params gate the kernel (VERDICT r3 item 3): `shs`
# exercises _bwd_kernel's gcd color rows + the SH chain, `quats` the
# conic-gradient moment rows (g_ca/g_cb/g_cc) through the covariance
# chain — each a distinct Mosaic matmul path a full-scale-only
# miscompile could corrupt alone.
for k in ("means3d", "opacities", "scales", "shs", "quats"):
    dc, di = np.asarray(g_c[k]).ravel(), np.asarray(g_i[k]).ravel()
    scale = max(float(np.abs(di).max()), 1e-12)
    rel = np.abs(dc - di) / scale
    report[f"full_grad_{k}_p99"] = float(np.quantile(rel, 0.99))
    report[f"full_grad_{k}_p999"] = float(np.quantile(rel, 0.999))
    report[f"full_grad_{k}_max"] = float(rel.max())
    if report[f"full_grad_{k}_p99"] > 2e-3:
        fail(f"full_grad_{k}_bulk_gate", "p99 exceeds rounding scale")
    if report[f"full_grad_{k}_p999"] > 3e-2:
        fail(f"full_grad_{k}_tail_gate", "p999 exceeds eps-flip scale")

d_img = np.abs(np.asarray(img_c) - np.asarray(img_i)).ravel()
d_alpha = np.abs(np.asarray(alpha_c) - np.asarray(alpha_i)).ravel()
report["full_img_atol"] = float(d_img.max())
report["full_img_p999"] = float(np.quantile(d_img, 0.999))
report["full_alpha_atol"] = float(d_alpha.max())
report["full_alpha_p999"] = float(np.quantile(d_alpha, 0.999))
report["n_dropped"] = [int(nd_c), int(nd_i)]
if int(nd_c) != int(nd_i):
    fail("full_ndropped", "mismatch")
# measured compounding on this adversarial scene (hundreds of live
# entries per pixel): Mosaic-vs-XLA log ulp ~4e-5/entry accumulates to
# p999 ~2e-3 in rgb (alpha stays ~2e-5); catastrophic miscompiles (the
# int-key class) shift every pixel by >1e-2.
if report["full_img_p999"] > 2.5e-3 or report["full_alpha_p999"] > 5e-4:
    fail("full_forward_bulk", "p999 exceeds compounded rounding scale")
if report["full_img_atol"] > 2e-2 or report["full_alpha_atol"] > 2e-2:
    fail("full_forward_max", "max diff exceeds 2e-2")

print(json.dumps(report))
sys.exit(0 if report["ok"] else 1)
