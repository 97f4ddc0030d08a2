"""Fast CPU repro of the forward-parity failure (debug aid)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax.numpy as jnp

from test_rasterizer_parity import make_scene, make_camera, camera_kwargs, BG
from dreamscene_tpu.ops.reference import render_reference
from dreamscene_tpu.ops.rasterizer import render

scene = make_scene(300, seed=0)
cam = make_camera(64, 64)
kw = camera_kwargs(cam)
ref = render_reference(**scene, **kw, bg=BG, sh_degree=2)
got = render(**scene, **kw, bg=BG, sh_degree=2, interpret=True, chunk=128)
print("n_dropped", int(got["n_dropped"]))
img_d = np.abs(np.asarray(got["image"]) - np.asarray(ref["image"]))
print("image maxdiff", img_d.max())
# where does it differ? print tile coordinates of bad pixels
bad = np.argwhere(img_d.max(axis=0) > 1e-4)
print("bad pixels:", bad.shape[0], "of", 64 * 64)
if bad.shape[0]:
    tiles = set(map(tuple, bad // 16))
    print("bad tiles (ty,tx):", sorted(tiles))
    y, x = bad[0]
    print("sample pixel", y, x, "got", np.asarray(got["image"])[:, y, x],
          "ref", np.asarray(ref["image"])[:, y, x])
print("alpha maxdiff", np.abs(np.asarray(got["alpha"]) - np.asarray(ref["alpha"])).max())
