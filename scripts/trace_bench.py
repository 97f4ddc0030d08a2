"""Capture a jax.profiler trace of one bench step on the TPU tunnel."""
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

# default: the controller-tracked zero-drop capacity of the bench view at
# the default tile shape (the headline methodology); override to trace
# other capacities, e.g. TRACE_CAPACITY=1200000 for the CAP4 companion.
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
loss, grads = step(scene)
jax.block_until_ready((loss, grads))
print("compiled, loss:", float(loss))

jax.profiler.start_trace("/tmp/jtrace")
for _ in range(3):
    loss, grads = step(scene)
jax.block_until_ready((loss, grads))
jax.profiler.stop_trace()
print("trace done")
