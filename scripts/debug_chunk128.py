"""Isolate the mid-size TPU divergence: compiled chunk=128 vs chunk=256
vs interpret, all on the TPU backend, same inputs."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene
from __graft_entry__ import _camera
from dreamscene_tpu.ops.rasterizer import render

scene = build_scene(3000, seed=3)
cam = _camera(96, 96)
kw = dict(
    viewmatrix=jnp.asarray(cam.world_view_transform),
    projmatrix=jnp.asarray(cam.full_proj_transform),
    campos=jnp.asarray(cam.camera_center),
    tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, width=96, height=96,
)
bg = jnp.zeros((3,), jnp.float32)
CAP = 480_000

outs = {}
for name, chunk, interp in [("c128", 128, False), ("c256", 256, False)]:
    o = jax.jit(lambda c=chunk, it=interp: render(
        **scene, **kw, bg=bg, sh_degree=2, capacity=CAP, chunk=c,
        interpret=it))()
    img = np.asarray(o["image"])
    outs[name] = img
    print(f"{name}: mean {img.mean():.5f} max {img.max():.4f} "
          f"dropped {int(o['n_dropped'])}", flush=True)

for a, b in [("c128", "c256")]:
    d = np.abs(outs[a] - outs[b]).max()
    print(f"{a} vs {b}: max diff {d:.6f}", flush=True)
