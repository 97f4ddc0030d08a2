"""Find the splat class where the Pallas path diverges from the golden
renderer (bench-style scenes; CI's make_scene agrees). Pure CPU."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene
from __graft_entry__ import _camera
from dreamscene_tpu.ops.projection import project_gaussians
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


def diff_with_mask(mask):
    o_p = render(**scene, **kw, bg=bg, sh_degree=2, capacity=65536,
                 chunk=128, valid_mask=jnp.asarray(mask), interpret=True)
    o_g = render_reference(**scene, **kw, bg=bg, sh_degree=2,
                           valid_mask=jnp.asarray(mask))
    d = float(jnp.abs(o_p["image"] - o_g["image"]).max())
    return d, int(o_p["n_dropped"])


full = np.ones(400, bool)
d, nd = diff_with_mask(full)
print(f"all splats: maxdiff {d:.5f} dropped {nd}", flush=True)

# per-splat scan in blocks, then singles
bad = []
for lo in range(0, 400, 50):
    m = np.zeros(400, bool)
    m[lo:lo + 50] = True
    d, nd = diff_with_mask(m)
    if d > 1e-4:
        print(f"block {lo}:{lo+50} diff {d:.5f}", flush=True)
        for i in range(lo, lo + 50):
            m1 = np.zeros(400, bool)
            m1[i] = True
            d1, _ = diff_with_mask(m1)
            if d1 > 1e-4:
                bad.append((i, d1))
print("bad splats:", bad[:10], f"({len(bad)} total)", flush=True)

if bad:
    splats = project_gaussians(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"], kw["viewmatrix"],
        kw["projmatrix"], kw["campos"], kw["tanfovx"], kw["tanfovy"],
        64, 64, sh_degree=2)
    for i, d1 in bad[:6]:
        print(f"splat {i}: diff {d1:.4f} mean2d "
              f"{np.asarray(splats.means2d[i])} depth "
              f"{float(splats.depths[i]):.3f} radius "
              f"{int(splats.radii[i])} conic {np.asarray(splats.conics[i])} "
              f"opa {float(splats.opacities[i]):.3f} "
              f"vis {bool(splats.visible[i])}", flush=True)
