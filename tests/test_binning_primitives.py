"""Unit tests for binning's exact vectorized primitives.

These replaced slower XLA lowerings and must stay BIT-exact:
  * _counts_below_sorted — the strided-sample searchsorted replacement
    (jnp.searchsorted lowers to per-query while-loops on TPU);
  * u16_row_gather / u16_row_gather_i32 — f32/i32 row gathers through a
    u16-halves bitcast (XLA's sub-32-bit gather path is ~5x faster).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dreamscene_tpu.ops.binning import _SS_STRIDE, _counts_below_sorted
from dreamscene_tpu.ops.gather import u16_row_gather, u16_row_gather_i32


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("m", [1, 7, _SS_STRIDE - 1, _SS_STRIDE,
                               _SS_STRIDE + 1, 3 * _SS_STRIDE + 17])
def test_counts_below_sorted_matches_searchsorted(seed, m):
    rng = np.random.RandomState(seed)
    n_vals = 40
    sorted_vals = np.sort(rng.randint(0, n_vals, m)).astype(np.int32)
    t = np.arange(n_vals + 1, dtype=np.int32)
    got = np.asarray(_counts_below_sorted(
        jnp.asarray(sorted_vals), jnp.asarray(t), pad_val=n_vals))
    want = np.searchsorted(sorted_vals, t, side="left")
    np.testing.assert_array_equal(got, want)


def test_counts_below_sorted_degenerate():
    # all-equal values, queries below/at/above
    sv = jnp.full((2 * _SS_STRIDE,), 5, jnp.int32)
    t = jnp.asarray([0, 5, 6, 7], jnp.int32)
    got = np.asarray(_counts_below_sorted(sv, t, pad_val=7))
    np.testing.assert_array_equal(got, [0, 0, 2 * _SS_STRIDE, 2 * _SS_STRIDE])


def test_u16_row_gather_bit_exact():
    rng = np.random.RandomState(3)
    # adversarial f32 bit patterns: denormals, infs, nans, negative zero
    raw = rng.randint(0, 2 ** 32, (257, 9), dtype=np.uint64).astype(np.uint32)
    src = raw.view(np.float32)
    idx = rng.randint(0, 257, 1003).astype(np.int32)
    got = np.asarray(u16_row_gather(jnp.asarray(src), jnp.asarray(idx)))
    assert (got.view(np.uint32) == src.view(np.uint32)[idx]).all()


def test_u16_row_gather_i32_bit_exact():
    rng = np.random.RandomState(4)
    src = rng.randint(-2 ** 63, 2 ** 63 - 1, (64, 5)).astype(np.int64)
    src = (src % (2 ** 32) - 2 ** 31).astype(np.int32)
    idx = rng.randint(0, 64, 200).astype(np.int32)
    got = np.asarray(u16_row_gather_i32(jnp.asarray(src), jnp.asarray(idx)))
    np.testing.assert_array_equal(got, src[idx])
