"""The one surviving env-gated path (DS_CAPS_VIA_SORT, default ON —
capsule channels carried as extra depth-sort payloads, measured 4.91 vs
4.70 Mpix/s solo on v5e) must be result-identical to the rank-order
gather it replaced. The default grad-gather path is an exact f32 row
gather (the lossy bf16 hi/lo pair and the packed dense-row variants
were removed after regressing on chip — ARCHITECTURE.md "Measured dead
ends"), so binning outputs must match bit-exactly across the gate."""

import numpy as np
import jax.numpy as jnp

import dreamscene_tpu.ops.binning as binning
from dreamscene_tpu.ops.binning import bin_splats
from dreamscene_tpu.ops.projection import project_gaussians

from tests.test_rasterizer_parity import (
    make_camera,
    make_scene,
)


def _binned(scene, cam, capacity):
    splats = project_gaussians(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"],
        jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform),
        jnp.asarray(cam.camera_center),
        cam.tanfovx, cam.tanfovy, cam.width, cam.height, sh_degree=2,
    )
    return bin_splats(
        splats.means2d, splats.depths, splats.radii, splats.visible,
        cam.width, cam.height, capacity=capacity,
        conics=splats.conics, opacities=splats.opacities, interpret=True,
    )


def test_caps_via_sort_identical(monkeypatch):
    scene = make_scene(n=500, seed=3)
    cam = make_camera(64, 64)

    monkeypatch.setattr(binning, "_CAPS_VIA_SORT", False)
    a = _binned(scene, cam, capacity=2048)
    monkeypatch.setattr(binning, "_CAPS_VIA_SORT", True)
    b = _binned(scene, cam, capacity=2048)
    # also through the UNPACKED 4-operand depth-sort branch (normally only
    # hit by huge images where basenx+count exceed one u32)
    monkeypatch.setattr(binning, "_SORT_PACK_BIT_BUDGET", 0)
    c = _binned(scene, cam, capacity=2048)

    for name, x, y, z in zip(a._fields, a, b, c):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(z), err_msg=name + " unpacked")

