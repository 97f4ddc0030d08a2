"""Sweep composite-kernel parameters on the real TPU: chunk size and
(optionally) a bf16-operand prefix matmul, timing one full fwd+bwd render
step each (bench scene). In-one-jit timing only — standalone op timings
lie through the tunnel."""
import sys
import time

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
capacity = 4 * N_GAUSSIANS
ITERS = 10

for chunk in (int(a) for a in (sys.argv[1:] or [256, 128, 512])):
    def loss_fn(params, chunk=chunk):
        out = render(
            **params, **cam_arrays,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            width=WIDTH, height=HEIGHT,
            bg=jnp.zeros((3,), jnp.float32), sh_degree=2,
            capacity=capacity, chunk=chunk,
        )
        return (jnp.mean(out["image"]) + 0.1 * jnp.mean(out["depth"])
                + 0.01 * jnp.mean(out["alpha"]))

    step = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.time()
    loss, grads = step(scene)
    jax.block_until_ready((loss, grads))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        loss, grads = step(scene)
    jax.block_until_ready((loss, grads))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"chunk={chunk:4d}: {dt:7.2f} ms/step "
          f"({WIDTH*HEIGHT/dt*1e3/1e6:.2f} Mpix/s)  [compile {compile_s:.0f}s]",
          flush=True)
