"""Localize the compiled-vs-interpret divergence: tiny scene, stats per
output, tile-level diff map."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene
from __graft_entry__ import _camera
from dreamscene_tpu.ops.rasterizer import render
from dreamscene_tpu.ops.reference import render_reference

scene = build_scene(400, seed=3)
cam = _camera(64, 64)
kw = dict(
    viewmatrix=jnp.asarray(cam.world_view_transform),
    projmatrix=jnp.asarray(cam.full_proj_transform),
    campos=jnp.asarray(cam.camera_center),
    tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, width=64, height=64,
)
bg = jnp.zeros((3,), jnp.float32)


def run(interpret):
    out = render(**scene, **kw, bg=bg, sh_degree=2, capacity=4096,
                 chunk=128, interpret=interpret)
    return out


o_c = jax.jit(lambda: run(False))()
o_i = jax.jit(lambda: run(True))()
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    o_g = jax.jit(lambda s: render_reference(**s, **kw, bg=bg, sh_degree=2))(
        jax.device_put(scene, cpu))

for name, o in [("compiled", o_c), ("interp", o_i), ("golden", o_g)]:
    img = np.asarray(o["image"])
    al = np.asarray(o["alpha"])
    print(f"{name:9s} img mean {img.mean():.4f} max {img.max():.4f} "
          f"alpha mean {al.mean():.4f}", flush=True)

for a, b, n in [(o_c, o_i, "compiled-vs-interp"),
                (o_i, o_g, "interp-vs-golden")]:
    d = np.abs(np.asarray(a["image"]) - np.asarray(b["image"]))
    print(f"{n}: max {d.max():.5f} mean {d.mean():.6f}")
    # which 16x16 tiles differ?
    t = d.max(0).reshape(4, 16, 4, 16).max((1, 3))
    print((t > 1e-3).astype(int))
