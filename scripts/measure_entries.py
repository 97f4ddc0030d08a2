"""Measure actual binning entry counts for the bench scene (capacity sizing)."""
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from bench import build_scene, N_GAUSSIANS, WIDTH, HEIGHT
from __graft_entry__ import _camera
from dreamscene_tpu.ops.projection import project_gaussians
from dreamscene_tpu.ops.binning import bin_splats

scene = build_scene(N_GAUSSIANS)
cam = _camera(WIDTH, HEIGHT)

splats = project_gaussians(
    scene["means3d"], scene["scales"], scene["quats"], scene["opacities"],
    scene["shs"], jnp.asarray(cam.world_view_transform),
    jnp.asarray(cam.full_proj_transform), jnp.asarray(cam.camera_center),
    cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT, sh_degree=2,
)
binned = bin_splats(splats.means2d, splats.depths, splats.radii,
                    splats.visible, WIDTH, HEIGHT, capacity=4 * N_GAUSSIANS)
print("n_visible:", int(jnp.sum(splats.visible)))
print("n_entries:", int(binned.n_entries))
print("n_dropped:", int(binned.n_dropped))
print("capacity used:", 4 * N_GAUSSIANS)
print("mean radius of visible:",
      float(jnp.sum(jnp.where(splats.visible, splats.radii, 0)) /
            jnp.maximum(1, jnp.sum(splats.visible))))
