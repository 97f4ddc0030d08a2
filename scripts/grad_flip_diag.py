"""Diagnose the full-scale compiled-vs-interpret gradient tail
(scripts/tpu_parity.py): hypothesis — the large per-splat deltas are
applied-threshold flips (T*P crossing TRANSMITTANCE_EPS differently
under Mosaic-vs-XLA per-op rounding flips an entry's ENTIRE
contribution into one splat's gradient), concentrated on
low-opacity/deep splats, NOT a systematic bwd-kernel miscompile
(which would move the bulk, not a tail).

Evidence printed: for the top-K |grad delta| splats — their opacity
percentile and the fraction of all splats with deltas above tail
thresholds; a systematic miscompile shows a fat bulk, eps-flips a thin
tail of coherent whole-splat deltas.

MEASURED (2026-08-19, v5e): thin tail confirmed — 482/300000 splats
>1e-2 on opacities (242 on scales), p99 at 1e-4..5e-4 rounding scale,
and the top-delta splats are the SAME splats across opacities and
scales (whole-contribution flips move every parameter of one splat
coherently — per-op rounding would not correlate across params). One
correction to the hypothesis: flip splats sit at median opacity, not
low opacity — the flip horizon is T*P ~ eps (depth), not opacity.

Run on the TPU tunnel: timeout 580 python scripts/grad_flip_diag.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _camera
from bench import build_scene
from dreamscene_tpu.ops.rasterizer import render

big = build_scene(300_000)
cam = _camera(512, 512)
kw = dict(
    viewmatrix=jnp.asarray(cam.world_view_transform),
    projmatrix=jnp.asarray(cam.full_proj_transform),
    campos=jnp.asarray(cam.camera_center),
    tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
    width=cam.width, height=cam.height,
)
bg = jnp.zeros((3,), jnp.float32)


def loss(params, interpret):
    out = render(**params, **kw, bg=bg, sh_degree=2,
                 capacity=4 * 300_000, interpret=interpret)
    return (jnp.mean(out["image"]) + 0.1 * jnp.mean(out["depth"])
            + 0.01 * jnp.mean(out["alpha"]))


g_c = jax.jit(jax.grad(lambda p: loss(p, False)))(big)
g_i = jax.jit(jax.grad(lambda p: loss(p, True)))(big)

opa = 1.0 / (1.0 + np.exp(-np.asarray(big["opacities"])))  # activated
for k in ("opacities", "scales"):
    dc = np.asarray(g_c[k]).reshape(300_000, -1)
    di = np.asarray(g_i[k]).reshape(300_000, -1)
    delta = np.abs(dc - di).max(axis=1)
    scale = np.abs(di).max()
    rel = delta / scale
    order = np.argsort(-rel)
    top = order[:20]
    opa_pct = (opa[:, None] if opa.ndim == 1 else opa)
    print(f"== {k}: scale={scale:.3e}")
    print("  tail counts: >1e-2:", int((rel > 1e-2).sum()),
          " >1e-3:", int((rel > 1e-3).sum()),
          " >1e-4:", int((rel > 1e-4).sum()), "of 300000")
    med_opa = float(np.median(opa))
    top_opa = opa.ravel()[top]
    print(f"  median opacity (all splats): {med_opa:.4f}")
    print("  top-20 delta splats opacity:",
          np.array2string(top_opa, precision=4, separator=","))
    print("  top-20 rel deltas:",
          np.array2string(rel[top], precision=4, separator=","))
