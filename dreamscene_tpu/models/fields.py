"""3D occupancy-field extraction from a splat model.

TPU port of the reference's extract_fields (reference:
gs_renderer.py:491-573): evaluate the alpha-weighted sum of 3D Gaussian
densities on a regular grid, block by block, for mesh extraction /
occupancy queries. Pure jnp, jit-per-block; the Gaussian set is culled per
block by a loose AABB test like the reference's relax_ratio logic.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dreamscene_tpu.ops.covariance import build_covariance_3d, strip_symmetric


def gaussian_3d_coeff(xyzs: jnp.ndarray, covs: jnp.ndarray) -> jnp.ndarray:
    """Density of unit-amplitude gaussians at offsets xyzs [M,3] given
    packed covariances covs [M,6] (reference: gs_renderer.py:97-130)."""
    x, y, z = xyzs[:, 0], xyzs[:, 1], xyzs[:, 2]
    a, b, c, d, e, f = (covs[:, i] for i in range(6))
    inv_det = 1.0 / (
        a * d * f + 2 * e * c * b - e**2 * a - c**2 * d - b**2 * f + 1e-24
    )
    inv_a = (d * f - e**2) * inv_det
    inv_b = (e * c - b * f) * inv_det
    inv_c = (e * b - c * d) * inv_det
    inv_d = (a * f - c**2) * inv_det
    inv_e = (b * c - e * a) * inv_det
    inv_f = (a * d - b**2) * inv_det
    power = (
        -0.5 * (x * x * inv_a + y * y * inv_d + z * z * inv_f)
        - x * y * inv_b - x * z * inv_c - y * z * inv_e
    )
    power = jnp.where(power > 0, -1e10, power)
    return jnp.exp(power)


def extract_fields(
    state,
    resolution: int = 128,
    num_blocks: int = 16,
    relax_ratio: float = 1.5,
) -> np.ndarray:
    """Occupancy grid [R,R,R] over the [-1,1]^3 cube (reference semantics:
    occ = sum_g opacity_g * N(x; mu_g, Sigma_g), splats culled per block
    by center distance <= block_radius + relax_ratio * max_scale)."""
    block_size = 2.0 / num_blocks
    assert resolution % num_blocks == 0
    split = resolution // num_blocks

    opac = np.asarray(state.get_opacity[:, 0] * state.aux.active)
    xyz = np.asarray(state.get_xyz)
    cov6 = np.asarray(
        strip_symmetric(
            build_covariance_3d(state.get_scaling, state.params.rotation)
        )
    )
    max_scale = np.asarray(jnp.max(state.get_scaling, axis=-1))

    @jax.jit
    def block_occ(pts, sel_xyz, sel_cov, sel_opac):
        # pts [P,3]; splats [S,...]
        off = pts[:, None, :] - sel_xyz[None, :, :]        # [P,S,3]
        dens = gaussian_3d_coeff(
            off.reshape(-1, 3),
            jnp.broadcast_to(
                sel_cov[None], (pts.shape[0],) + sel_cov.shape
            ).reshape(-1, 6),
        ).reshape(pts.shape[0], -1)
        return jnp.sum(dens * sel_opac[None, :], axis=-1)

    occ = np.zeros((resolution,) * 3, np.float32)
    lin = np.linspace(-1, 1, resolution, dtype=np.float32)
    for xi in range(num_blocks):
        for yi in range(num_blocks):
            for zi in range(num_blocks):
                lo = np.array([xi, yi, zi]) * block_size - 1.0
                center = lo + block_size / 2
                # block cull (reference: dist to block center vs scales)
                d = np.linalg.norm(xyz - center, axis=-1)
                keep = (d <= block_size * 0.87 + relax_ratio * max_scale) & (
                    opac > 0
                )
                idx = np.nonzero(keep)[0]
                if idx.size == 0:
                    continue
                xs = lin[xi * split:(xi + 1) * split]
                ys = lin[yi * split:(yi + 1) * split]
                zs = lin[zi * split:(zi + 1) * split]
                gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
                pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
                vals = np.asarray(
                    block_occ(
                        jnp.asarray(pts), jnp.asarray(xyz[idx]),
                        jnp.asarray(cov6[idx]), jnp.asarray(opac[idx]),
                    )
                ).reshape(split, split, split)
                occ[xi * split:(xi + 1) * split,
                    yi * split:(yi + 1) * split,
                    zi * split:(zi + 1) * split] = vals
    return occ
