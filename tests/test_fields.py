"""Occupancy-field extraction tests (reference: gs_renderer.py:491-573)."""

import numpy as np

from dreamscene_tpu.models.fields import extract_fields, gaussian_3d_coeff
from dreamscene_tpu.models.gaussians import create_from_points


class TestFields:
    def test_gaussian_coeff_peak_at_center(self):
        import jax.numpy as jnp

        covs = jnp.asarray([[0.01, 0, 0, 0.01, 0, 0.01]], jnp.float32)
        at0 = gaussian_3d_coeff(jnp.zeros((1, 3)), covs)
        far = gaussian_3d_coeff(jnp.full((1, 3), 0.5), covs)
        assert float(at0[0]) == 1.0
        assert float(far[0]) < 1e-6

    def test_extract_fields_localizes_mass(self):
        rng = np.random.RandomState(0)
        pts = np.array([[0.5, 0.5, 0.5], [-0.5, -0.5, -0.5]], np.float32)
        pts = np.repeat(pts, 5, axis=0) + rng.randn(10, 3).astype(np.float32) * 0.02
        st = create_from_points(pts, np.ones((10, 3), np.float32) * 0.5,
                                sh_degree=1, capacity=10)
        occ = extract_fields(st, resolution=32, num_blocks=4)
        assert occ.shape == (32, 32, 32)
        # mass concentrated near the two clusters, empty in between corners
        hi = occ[24, 24, 24] + occ[8, 8, 8]
        lo = occ[8, 24, 8] + occ[24, 8, 24]
        assert hi > 10 * (lo + 1e-8)
