"""Real convergence tests (beyond plumbing smoke): recon-style
optimization against fixed rendered targets must actually drive the loss
down by an order of magnitude. Catches sign/scale bugs in the rasterizer
VJP + masked-Adam chain that 2-step smoke tests cannot (reference analog:
the recon refine phase, training/object_trainer.py:486-520 fits rendered
FPS outputs the same way)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from dreamscene_tpu.models.gaussians import (
    GaussianParams,
    adam_init,
    adam_update,
    create_from_points,
)
from dreamscene_tpu.ops.rasterizer import render
from tests.test_rasterizer_parity import make_camera


def _render_params(params: GaussianParams, active, cam, sh_degree, bg):
    q = params.rotation
    return render(
        means3d=params.xyz,
        scales=jnp.exp(params.scaling),
        quats=q / jnp.linalg.norm(q, axis=-1, keepdims=True),
        opacities=jax.nn.sigmoid(params.opacity[:, 0]),
        shs=jnp.concatenate([params.features_dc, params.features_rest], 1),
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        width=cam.width, height=cam.height,
        bg=bg, sh_degree=sh_degree, valid_mask=active,
        interpret=True,
    )


def test_recon_converges_10x():
    """Perturbed clone of a ground-truth splat set must recover it: L2
    against the GT renders drops >=10x within 100 Adam steps at 64^2."""
    sh_degree = 1
    rng = np.random.RandomState(3)
    n = 60
    pts = rng.randn(n, 3).astype(np.float32) * 0.6
    cols = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    gt = create_from_points(pts, cols, sh_degree=sh_degree, capacity=n)
    # make GT splats chunky + opaque so targets have structure
    gt_params = gt.params.replace(
        scaling=jnp.full_like(gt.params.scaling, math.log(0.22)),
        opacity=jnp.full_like(gt.params.opacity, 2.0),
    )
    active = gt.aux.active
    bg = jnp.zeros((3,), jnp.float32)

    cams = [make_camera(64, 64, azim=a, elev=e)
            for a, e in [(0.3, 0.2), (2.1, -0.1), (4.2, 0.5)]]
    targets = [
        jax.lax.stop_gradient(
            _render_params(gt_params, active, c, sh_degree, bg)["image"]
        )
        for c in cams
    ]

    # perturbed init: jittered positions, gray colors, smaller scales
    params = gt_params.replace(
        xyz=gt_params.xyz + rng.randn(n, 3).astype(np.float32) * 0.1,
        features_dc=jnp.zeros_like(gt_params.features_dc) + 0.3,
        features_rest=jnp.zeros_like(gt_params.features_rest),
        scaling=gt_params.scaling - 0.4,
        opacity=jnp.zeros_like(gt_params.opacity),
    )
    opt = adam_init(params)
    lrs = dict(xyz=2e-3, f_dc=2.5e-2, f_rest=1.25e-3, scaling=5e-3,
               rotation=1e-3, opacity=5e-2, background=0.0)

    def loss_fn(p):
        err = 0.0
        for c, t in zip(cams, targets):
            out = _render_params(p, active, c, sh_degree, bg)
            err = err + jnp.mean((out["image"] - t) ** 2)
        return err / len(cams)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(loss_fn)(p)
        p2, o2 = adam_update(p, g, o, active, lrs)
        return p2, o2, loss

    loss0 = float(loss_fn(params))
    losses = []
    for _ in range(100):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < loss0 / 10.0, (loss0, losses[-1])
    # monotone-ish: final quarter better than first quarter
    assert np.mean(losses[-25:]) < np.mean(losses[:25])
