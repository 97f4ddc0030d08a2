"""Which pipeline stage diverges on TPU at the 96^2 mid config?
Compare projection and binning outputs TPU-vs-CPU, then the composite
input records."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene
from __graft_entry__ import _camera
from dreamscene_tpu.ops.binning import bin_splats
from dreamscene_tpu.ops.projection import project_gaussians

scene = build_scene(3000, seed=3)
cam = _camera(96, 96)
args = (scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"],
        jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform),
        jnp.asarray(cam.camera_center))
CAP = 480_000


def proj(*a):
    return project_gaussians(*a, cam.tanfovx, cam.tanfovy, 96, 96,
                             sh_degree=2)


def binned(interp, *a):
    s = proj(*a)
    b = bin_splats(s.means2d, s.depths, s.radii, s.visible, 96, 96,
                   capacity=CAP, chunk=128, interpret=interp)
    return b


sp_t = jax.jit(proj)(*args)
b_t = jax.jit(lambda *a: binned(False, *a))(*args)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    a_c = jax.device_put(args, cpu)
    sp_c = jax.jit(proj)(*a_c)
    b_c = jax.jit(lambda *a: binned(True, *a))(*a_c)

for f in ["means2d", "depths", "conics", "colors", "radii", "visible"]:
    t = np.asarray(getattr(sp_t, f)).astype(np.float64)
    c = np.asarray(getattr(sp_c, f)).astype(np.float64)
    print(f"proj {f:8s} maxdiff {np.abs(t - c).max():.3e}", flush=True)

for f in ["n_entries", "n_dropped"]:
    print(f"bin {f}: tpu {int(getattr(b_t, f))} cpu {int(getattr(b_c, f))}",
          flush=True)
for f in ["gid_sorted", "rank_sorted", "chunk_tile", "chunk_s0", "chunk_lo",
          "chunk_hi", "chunk_first", "perm", "inv_perm", "surv_counts",
          "seg_starts", "pos_of_entry"]:
    t = np.asarray(getattr(b_t, f)).astype(np.int64)
    c = np.asarray(getattr(b_c, f)).astype(np.int64)
    n_bad = int((t != c).sum())
    print(f"bin {f:12s} mismatches {n_bad}/{t.size}"
          + (f" first@{int(np.nonzero((t != c).reshape(-1))[0][0])}"
             if n_bad else ""), flush=True)
