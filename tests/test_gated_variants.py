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



def test_bwd_tcar_grads_match_default(monkeypatch):
    """DS_BWD_TCAR (forward-stored per-chunk transmittance, serial-free
    backward — composite.py) must reproduce the default backward: the
    stored T is bit-identical to the replayed one, so the only drift is
    the suffix-dot reassociation (sum-of-chunk-totals vs accumulated-rgbd
    dot) — measured <=4e-5 of the max-gradient scale on this scene
    (cancellation amplifies the ~2^-21 split-dot rounding class; the
    full-scale on-chip quantile gates in scripts/tpu_parity.py are the
    deciding check). Images must be bit-exact (forward math unchanged).
    Runs both tile shapes to cover the exact- and split-moment bwd
    paths."""
    import jax

    import dreamscene_tpu.ops.composite as composite
    from dreamscene_tpu.ops.rasterizer import render

    scene = make_scene(n=250, seed=5)
    cam = make_camera(64, 48)
    rng = np.random.RandomState(9)
    target = jnp.asarray(rng.rand(3, 48, 64).astype(np.float32))
    bg = jnp.zeros((3,), jnp.float32)

    kw = dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        width=cam.width, height=cam.height,
    )

    for tw, th in [(16, 16), (32, 16)]:
        def loss(s):
            out = render(**s, **kw, bg=bg, sh_degree=2, interpret=True,
                         tile_w=tw, tile_h=th)
            return (jnp.mean((out["image"] - target) ** 2)
                    + 0.1 * jnp.mean(out["depth"])
                    + 0.05 * jnp.mean(out["alpha"])), out["image"]

        monkeypatch.setattr(composite, "_BWD_TCAR", False)
        (l_a, img_a), g_a = jax.value_and_grad(loss, has_aux=True)(scene)
        monkeypatch.setattr(composite, "_BWD_TCAR", True)
        (l_b, img_b), g_b = jax.value_and_grad(loss, has_aux=True)(scene)

        np.testing.assert_array_equal(
            np.asarray(img_a), np.asarray(img_b),
            err_msg=f"image drift at {tw}x{th}")
        for key in ["means3d", "scales", "quats", "opacities", "shs"]:
            ref_g = np.asarray(g_a[key])
            got_g = np.asarray(g_b[key])
            scale = np.abs(ref_g).max() + 1e-8
            np.testing.assert_allclose(
                got_g / scale, ref_g / scale, atol=1e-4,
                err_msg=f"tcar gradient mismatch for {key} at {tw}x{th}")


def test_flat_vjp_cumsum_identical(monkeypatch):
    """DS_FLAT_VJP_CUMSUM (plain flat grad-row gather + two-level blocked
    cumsum) performs the SAME adds as the blocked-index gather
    formulation — same 128-blocking, zero pad rows vs gathered structural
    zero column — so parameter gradients must match bit-exactly."""
    import jax

    import dreamscene_tpu.ops.rasterizer as rasterizer
    from dreamscene_tpu.ops.rasterizer import render

    scene = make_scene(n=250, seed=7)
    cam = make_camera(48, 48)
    rng = np.random.RandomState(3)
    target = jnp.asarray(rng.rand(3, 48, 48).astype(np.float32))
    bg = jnp.zeros((3,), jnp.float32)

    kw = dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        width=cam.width, height=cam.height,
    )

    def loss(s):
        out = render(**s, **kw, bg=bg, sh_degree=2, interpret=True)
        return jnp.mean((out["image"] - target) ** 2)

    monkeypatch.setattr(rasterizer, "_FLAT_VJP_CUMSUM", False)
    g_a = jax.grad(loss)(scene)
    monkeypatch.setattr(rasterizer, "_FLAT_VJP_CUMSUM", True)
    g_b = jax.grad(loss)(scene)
    for key in ["means3d", "scales", "quats", "opacities", "shs"]:
        np.testing.assert_array_equal(
            np.asarray(g_a[key]), np.asarray(g_b[key]),
            err_msg=f"flat-cumsum gradient drift for {key}")
