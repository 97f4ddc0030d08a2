"""Env-gated perf-candidate paths must be result-identical to the
measured defaults (ROADMAP "Perf next"): packed dense-row gathers
(DS_PACKED_REC_GATHER / DS_PACKED_GRAD_GATHER) and capsule channels
carried through the depth sort (DS_CAPS_VIA_SORT). Each gate only changes
data movement, so outputs must match bit-exactly — except the grad-gather
gate, whose DEFAULT path is a lossy bf16 hi/lo pair (~2^-17 relative)
while the packed path is exact."""

import numpy as np
import jax
import jax.numpy as jnp

import dreamscene_tpu.ops.binning as binning
import dreamscene_tpu.ops.rasterizer as rasterizer
from dreamscene_tpu.ops.binning import bin_splats
from dreamscene_tpu.ops.projection import project_gaussians

from tests.test_rasterizer_parity import (
    camera_kwargs,
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


def _render_grads(scene, cam):
    def loss(params):
        out = rasterizer.render(
            **params, **camera_kwargs(cam),
            bg=jnp.zeros((3,), jnp.float32), sh_degree=2,
            capacity=2048, interpret=True,
        )
        return (jnp.mean(out["image"]) + 0.1 * jnp.mean(out["depth"])
                + 0.01 * jnp.mean(out["alpha"])), out["image"]

    (l, img), g = jax.value_and_grad(loss, has_aux=True)(scene)
    return np.asarray(img), jax.tree.map(np.asarray, g)


def test_packed_gathers_match_default(monkeypatch):
    # n=512 keeps N % 4 == 0 (the packed-row path's requirement)
    scene = make_scene(n=512, seed=5)
    cam = make_camera(64, 64)

    monkeypatch.setattr(rasterizer, "_PACKED_REC_GATHER", False)
    monkeypatch.setattr(rasterizer, "_PACKED_GRAD_GATHER", False)
    img0, g0 = _render_grads(scene, cam)

    monkeypatch.setattr(rasterizer, "_PACKED_REC_GATHER", True)
    monkeypatch.setattr(rasterizer, "_PACKED_GRAD_GATHER", True)
    img1, g1 = _render_grads(scene, cam)

    monkeypatch.setattr(rasterizer, "_DENSE_VJP", True)
    img2, g2 = _render_grads(scene, cam)

    # forward record gather is bit-exact
    np.testing.assert_array_equal(img0, img1)
    np.testing.assert_array_equal(img0, img2)
    # grad gather: default bf16 hi/lo pair is lossy (~2^-17 per gathered
    # row, amplified by segment-difference cancellation), packed/dense
    # are exact up to cumsum reassociation — all agree inside the
    # repo-wide 2e-4 grad-parity budget
    for k in g0:
        scale = np.maximum(np.abs(g0[k]).max(), 1e-12)
        np.testing.assert_allclose(
            g0[k], g1[k], atol=2e-4 * scale, err_msg=k)
        np.testing.assert_allclose(
            g1[k], g2[k], atol=2e-4 * scale, err_msg=k + " dense")


def test_dense_vjp_fallback_capacity_not_div8(monkeypatch):
    """capacity % 8 != 0 must silently fall back to the default grad
    gather under DS_DENSE_VJP (the dense chain needs 8-entry rows)."""
    scene = make_scene(n=300, seed=11)
    cam = make_camera(64, 64)

    def grads(cap):
        def loss(params):
            out = rasterizer.render(
                **params, **camera_kwargs(cam),
                bg=jnp.zeros((3,), jnp.float32), sh_degree=2,
                capacity=cap, interpret=True,
            )
            return jnp.mean(out["image"])
        return jax.tree.map(np.asarray, jax.grad(loss)(scene))

    monkeypatch.setattr(rasterizer, "_DENSE_VJP", False)
    g0 = grads(1924)    # not divisible by 8
    monkeypatch.setattr(rasterizer, "_DENSE_VJP", True)
    g1 = grads(1924)
    for k in g0:
        np.testing.assert_array_equal(g0[k], g1[k], err_msg=k)
