"""Dump the compiled HLO of the bench step and summarize named fusions."""
import os as _os_cache
_os_cache.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os_cache.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "4")
import re
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_scene, N_GAUSSIANS, WIDTH, HEIGHT
from __graft_entry__ import _camera
from dreamscene_tpu.ops.rasterizer import render

scene = build_scene(N_GAUSSIANS)
cam = _camera(WIDTH, HEIGHT)
cam_arrays = dict(
    viewmatrix=jnp.asarray(cam.world_view_transform),
    projmatrix=jnp.asarray(cam.full_proj_transform),
    campos=jnp.asarray(cam.camera_center),
)
import os
capacity = int(os.environ.get("TRACE_CAPACITY", 1_425_000))


def loss_fn(params):
    out = render(
        **params, **cam_arrays,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        width=WIDTH, height=HEIGHT,
        bg=jnp.zeros((3,), jnp.float32), sh_degree=2, capacity=capacity,
    )
    return (
        jnp.mean(out["image"]) + 0.1 * jnp.mean(out["depth"])
        + 0.01 * jnp.mean(out["alpha"])
    )


step = jax.jit(jax.value_and_grad(loss_fn))
txt = step.lower(scene).compile().as_text()
with open("/tmp/bench_hlo.txt", "w") as f:
    f.write(txt)
print("bytes:", len(txt))

# print the root line of each interesting fusion
want = sys.argv[1:] or ["fusion.10", "fusion.6", "fusion.5", "fusion.4",
                        "fusion.8", "fusion.9", "fusion.7", "fusion.2",
                        "sort.8", "sort.50", "reshape.23", "while.14"]
for name in want:
    pat = re.compile(rf'^\s*(?:ROOT )?%?{re.escape(name)} = .*$', re.M)
    m = pat.search(txt)
    print("----", name)
    if m:
        print(m.group(0)[:400])
