"""Tests for the fixed-capacity Gaussian state: construction, masked Adam,
densify/clone/split/prune semantics, opacity reset, importance prune,
PLY round-trip, initializers (SURVEY.md §4a + reference semantics from
gs_renderer.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dreamscene_tpu.models.gaussians import (
    GaussianState,
    adam_update,
    create_from_points,
    get_expon_lr_func,
    num_active,
    resize,
)
from dreamscene_tpu.models import densify as D
from dreamscene_tpu.models.ply import load_splat_ply, save_splat_ply
from dreamscene_tpu.models import init as I

RNG = np.random.RandomState(0)


def small_state(n=20, capacity=64, sh_degree=2):
    pts = RNG.randn(n, 3).astype(np.float32)
    cols = RNG.rand(n, 3).astype(np.float32)
    return create_from_points(pts, cols, sh_degree=sh_degree, capacity=capacity)


class TestConstruction:
    def test_create_from_points(self):
        st = small_state()
        assert st.capacity == 64
        assert num_active(st) == 20
        # opacity activation ~0.1
        np.testing.assert_allclose(
            np.asarray(st.get_opacity)[:20], 0.1, atol=1e-5
        )
        # isotropic scales
        s = np.asarray(st.get_scaling)[:20]
        np.testing.assert_allclose(s[:, 0], s[:, 1])

    def test_resize(self):
        st = small_state()
        st2 = resize(st, 128)
        assert st2.capacity == 128
        assert num_active(st2) == 20
        np.testing.assert_allclose(
            st2.params.xyz[:64], st.params.xyz
        )

    def test_sh_degree_step_up(self):
        st = small_state()
        assert st.active_sh_degree == 0
        st = st.one_up_sh_degree()
        assert st.active_sh_degree == 1


class TestAdam:
    def test_masked_update_matches_torch_adam(self):
        import torch

        st = small_state()
        g = jax.tree.map(jnp.ones_like, st.params)
        lrs = {k: 0.01 for k in
               ["xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation",
                "background"]}
        p1, opt1 = adam_update(st.params, g, st.opt, st.aux.active, lrs)
        p2, opt2 = adam_update(p1, g, opt1, st.aux.active, lrs)

        xt = torch.tensor(np.asarray(st.params.xyz[:20]), requires_grad=True)
        opt_t = torch.optim.Adam([xt], lr=0.01, eps=1e-15)
        for _ in range(2):
            opt_t.zero_grad()
            xt.grad = torch.ones_like(xt)
            opt_t.step()
        np.testing.assert_allclose(
            np.asarray(p2.xyz[:20]), xt.detach().numpy(), atol=1e-5
        )

    def test_inactive_rows_frozen(self):
        st = small_state()
        g = jax.tree.map(jnp.ones_like, st.params)
        lrs = {k: 0.1 for k in
               ["xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation",
                "background"]}
        p1, _ = adam_update(st.params, g, st.opt, st.aux.active, lrs)
        np.testing.assert_allclose(p1.xyz[20:], st.params.xyz[20:])
        assert not np.allclose(p1.xyz[:20], st.params.xyz[:20])

    def test_expon_lr_schedule(self):
        f = get_expon_lr_func(1e-2, 1e-4, max_steps=100)
        assert abs(f(0) - 1e-2) < 1e-9
        assert abs(f(100) - 1e-4) < 1e-9
        assert 1e-4 < f(50) < 1e-2


class TestDensify:
    def _with_stats(self, st, grads, denom=1.0):
        aux = dataclasses.replace(
            st.aux,
            xyz_gradient_accum=jnp.asarray(grads, jnp.float32),
            denom=jnp.full((st.capacity,), denom, jnp.float32),
        )
        return dataclasses.replace(st, aux=aux)

    def test_clone_small_high_grad(self):
        st = small_state()
        # make all scales tiny so the clone branch triggers
        st = dataclasses.replace(
            st, params=dataclasses.replace(
                st.params, scaling=jnp.full_like(st.params.scaling, -8.0)
            )
        )
        grads = np.zeros(st.capacity)
        grads[:5] = 10.0
        st = self._with_stats(st, grads)
        n0 = num_active(st)
        st2 = D.densify_and_prune(
            st, jax.random.key(0), max_grad=1.0, min_opacity=0.01,
            extent=4.0, max_screen_size=None, percent_dense=0.01,
        )
        assert num_active(st2) == n0 + 5

    def test_split_big_high_grad(self):
        st = small_state()
        st = dataclasses.replace(
            st, params=dataclasses.replace(
                st.params, scaling=jnp.full_like(st.params.scaling, 2.0)
            )
        )
        grads = np.zeros(st.capacity)
        grads[:4] = 10.0
        st = self._with_stats(st, grads)
        n0 = num_active(st)
        st2 = D.densify_and_prune(
            st, jax.random.key(0), max_grad=1.0, min_opacity=0.01,
            extent=0.1, max_screen_size=None, percent_dense=0.01,
        )
        # split: parent replaced by child A + child B in a free slot
        assert num_active(st2) == n0 + 4
        # children have shrunk scales: exp(2)/1.6
        child_scale = np.exp(np.asarray(st2.params.scaling[:4]))
        np.testing.assert_allclose(child_scale, np.exp(2.0) / 1.6, rtol=1e-5)

    def test_prune_low_opacity(self):
        st = small_state()
        op = np.full((st.capacity, 1), 5.0, np.float32)   # sigmoid ~1
        op[:7] = -10.0                                    # sigmoid ~0
        st = dataclasses.replace(
            st, params=dataclasses.replace(st.params, opacity=jnp.asarray(op))
        )
        st = self._with_stats(st, np.zeros(st.capacity))
        st2 = D.densify_and_prune(
            st, jax.random.key(0), max_grad=1e9, min_opacity=0.5,
            extent=100.0, max_screen_size=None, percent_dense=0.01,
        )
        assert num_active(st2) == 20 - 7

    def test_capacity_overflow_drops(self):
        st = small_state(n=20, capacity=22)
        st = dataclasses.replace(
            st, params=dataclasses.replace(
                st.params, scaling=jnp.full_like(st.params.scaling, -8.0)
            )
        )
        grads = np.zeros(22)
        grads[:10] = 10.0
        st = self._with_stats(st, grads)
        st2 = D.densify_and_prune(
            st, jax.random.key(0), max_grad=1.0, min_opacity=0.01,
            extent=4.0, max_screen_size=None, percent_dense=0.01,
        )
        assert num_active(st2) == 22  # only 2 free slots existed

    def test_reset_opacity(self):
        st = small_state()
        st2 = D.reset_opacity(st)
        assert np.asarray(st2.get_opacity).max() <= 0.0101
        assert np.asarray(st2.opt.mu.opacity).max() == 0

    def test_prune_by_importance(self):
        st = small_state()
        scores = jnp.asarray(np.arange(st.capacity, dtype=np.float32))
        st2 = D.prune_by_importance(st, 0.5, scores)
        # bottom half of the 20 active (scores 0..9 plus the boundary) pruned
        assert num_active(st2) < 20
        assert num_active(st2) >= 9

    def test_add_densification_stats(self):
        st = small_state()
        g2d = jnp.ones((st.capacity, 2))
        vis = jnp.arange(st.capacity) < 10
        aux = D.add_densification_stats(st.aux, g2d, vis)
        np.testing.assert_allclose(aux.xyz_gradient_accum[:10], np.sqrt(2.0), rtol=1e-6)
        assert float(aux.denom[10]) == 0


class TestPly:
    def test_roundtrip(self, tmp_path):
        st = small_state(sh_degree=2)
        p = str(tmp_path / "model.ply")
        save_splat_ply(p, st)
        st2 = load_splat_ply(p)
        assert num_active(st2) == 20
        np.testing.assert_allclose(st2.params.xyz[:20], st.params.xyz[:20], atol=1e-6)
        np.testing.assert_allclose(
            st2.params.features_rest[:20], st.params.features_rest[:20], atol=1e-6
        )
        np.testing.assert_allclose(
            st2.params.rotation[:20], st.params.rotation[:20], atol=1e-6
        )
        assert st2.sh_degree == 2


class TestInitializers:
    def test_ball_init_cached(self, tmp_path):
        pts, rgb, sls = I.init_object_points(
            "default", "", str(tmp_path), num_pts=500, radius=0.5
        )
        assert pts.shape == (500, 3)
        assert np.linalg.norm(pts, axis=1).max() <= 0.5 + 1e-5
        assert sls == 10.0
        # second call hits the cache
        pts2, _, _ = I.init_object_points(
            "default", "", str(tmp_path), num_pts=500, radius=0.5
        )
        np.testing.assert_allclose(pts2, pts, atol=1e-6)

    def test_env_indoor_shell(self):
        box = np.array([-1, -2, -0.5, 1, 2, 0.5])
        pts, cols = I.init_env_points("indoor", box, density=0.01)
        assert pts.shape[0] == 5 * 4000
        # no points below the floor plane by more than the jitter
        assert pts[:, 2].min() > box[2] - 0.05

    def test_env_outdoor_hemisphere(self):
        box = np.array([-2, -2, -1, 2, 2, 1])
        pts, cols = I.init_env_points(
            "outdoor", box, zero_ground=True, density=0.01
        )
        assert pts[:, 2].min() >= -1e-6

    def test_floor_indoor(self):
        box = np.array([-1, -1, 0, 1, 1, 2])
        pts, cols = I.init_floor_points("indoor", box, density=0.01)
        assert abs(pts[:, 2].mean() - 0.0) < 0.05


