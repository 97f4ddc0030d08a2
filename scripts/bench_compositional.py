"""Measurement config #3 of BASELINE.json: 5-object compositional render
at 800x800 (reference: the multi-object scene_render path,
scene_gaussian.py:673-893), forward+backward on the real TPU.

Builds five 60K-splat objects (300K total), places them via the scene
placement pipeline (affine T/R/S + SH rotation, models/scene.py), and
times a full differentiable scene_render step. Prints one JSON line.
"""
import os as _os_cache
_os_cache.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os_cache.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "4")
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _camera
from dreamscene_tpu.models.gaussians import create_from_points
from dreamscene_tpu.models.scene import place_object
from dreamscene_tpu.rendering import scene_render

N_OBJ = 5
N_PTS = 60_000
W = H = 800
ITERS = 10


def build_object(seed):
    rng = np.random.RandomState(seed)
    pts = rng.randn(N_PTS, 3).astype(np.float32) * 0.35
    cols = rng.rand(N_PTS, 3).astype(np.float32)
    return create_from_points(pts, cols, sh_degree=2, capacity=N_PTS)


def main():
    centers = [(-2.0, -1.5, 0.0), (2.0, -1.5, 0.0), (0.0, 0.5, 0.0),
               (-1.5, 2.0, 0.0), (1.8, 1.8, 0.0)]
    states = []
    for i in range(N_OBJ):
        st = build_object(i)
        placed, _, _ = place_object(
            st, centers[i], rotation=[0.0, 0.0, 36.0 * i], scale=1.0)
        states.append(placed)

    cam = _camera(W, H)

    def loss_fn(xyzs):
        sts = [dataclasses.replace(
            s, params=dataclasses.replace(s.params, xyz=x))
            for s, x in zip(states, xyzs)]
        out = scene_render(sts, cam, bg_color=(0.0, 0.0, 0.0), test=True,
                           interpret=jax.default_backend() == "cpu")
        return jnp.mean(out["image"]) + 0.1 * jnp.mean(out["depth"])

    xyzs = [s.params.xyz for s in states]
    step = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = step(xyzs)
    jax.block_until_ready((loss, grads))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        loss, grads = step(xyzs)
    jax.block_until_ready((loss, grads))
    dt = (time.perf_counter() - t0) / ITERS

    print(json.dumps({
        "metric": "compositional_5obj_800sq_fwd_bwd",
        "value": round(W * H / dt / 1e6, 3),
        "unit": "Mpix/s",
        "ms_per_step": round(dt * 1e3, 2),
        "n_splats": N_OBJ * N_PTS,
    }))


if __name__ == "__main__":
    main()
