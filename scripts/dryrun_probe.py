"""Time compile vs execute of the primitive-sharded render at scale on
the virtual CPU mesh (feasibility probe for dryrun_multichip shapes)."""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _camera
from dreamscene_tpu.parallel.sharded_render import (
    make_mesh, make_primitive_sharded_render)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CAP = int(sys.argv[3]) if len(sys.argv) > 3 else N

rng = np.random.RandomState(0)
quats = rng.randn(N, 4).astype(np.float32)
quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
inputs = dict(
    means3d=jnp.asarray(rng.randn(N, 3).astype(np.float32) * 1.2),
    scales=jnp.asarray(np.exp(rng.randn(N, 3) * 0.3 - 3.4).astype(np.float32)),
    quats=jnp.asarray(quats),
    opacities=jnp.asarray(rng.rand(N).astype(np.float32)),
    shs=jnp.asarray(rng.randn(N, 4, 3).astype(np.float32) * 0.2),
)
mesh = make_mesh(2, 4)
cam = _camera(SIZE, SIZE)
cams = {
    "view": jnp.stack([jnp.asarray(cam.world_view_transform)] * 2),
    "proj": jnp.stack([jnp.asarray(cam.full_proj_transform)] * 2),
    "campos": jnp.stack([jnp.asarray(cam.camera_center)] * 2),
    "tanfovx": jnp.asarray([cam.tanfovx] * 2, jnp.float32),
    "tanfovy": jnp.asarray([cam.tanfovy] * 2, jnp.float32),
}
bg = jnp.zeros((2, 3), jnp.float32)

render_fn = make_primitive_sharded_render(
    mesh, width=SIZE, height=SIZE, sh_degree=1, capacity=CAP,
    chunk=256, interpret=True)


def loss(inputs):
    images, alphas = render_fn(inputs, cams, bg)
    return jnp.mean(images) + 0.01 * jnp.mean(alphas)


step = jax.jit(jax.value_and_grad(
    lambda m: loss({**inputs, "means3d": m})))

t0 = time.time()
lowered = step.lower(inputs["means3d"])
print(f"lower: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
print(f"compile: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
l, g = compiled(inputs["means3d"])
jax.block_until_ready((l, g))
print(f"execute: {time.time()-t0:.1f}s loss={float(l):.4f}", flush=True)
