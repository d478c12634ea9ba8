"""Native C++ host kernels vs their JAX counterparts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particles_tpu import native

pytestmark = pytest.mark.skipif(
    not native.AVAILABLE, reason="no C++ toolchain"
)


def test_inverse_cdf_matches_jax():
    from particles_tpu import resampling as rs

    rng = np.random.default_rng(0)
    W = rng.dirichlet(np.ones(200))
    su = np.sort(rng.uniform(size=150))
    got = native.inverse_cdf(su, W)
    ref = rs.inverse_cdf(jnp.asarray(su, jnp.float32), jnp.asarray(W, jnp.float32))
    # float32 vs float64 cumsum can differ at knots; require near-total match
    assert np.mean(got == np.asarray(ref)) > 0.99


def test_systematic_counts_matches_jax():
    from particles_tpu import resampling as rs

    rng = np.random.default_rng(1)
    W = rng.dirichlet(np.ones(300) * 0.3)
    u = 0.417
    got = native.systematic_counts(W, 300, u)
    assert got.sum() == 300
    # JAX version with the same uniform
    import particles_tpu.resampling as r

    cs = np.cumsum(W / W.sum())
    z = np.clip(np.floor(300 * cs - u).astype(np.int64) + 1, 0, 300)
    z[-1] = 300
    expect = np.diff(z, prepend=0)
    np.testing.assert_array_equal(got, expect)


def test_ssp_counts_properties():
    rng = np.random.default_rng(2)
    for trial in range(20):
        N = 128
        W = rng.dirichlet(np.ones(N) * 0.5)
        u = rng.uniform(size=N - 1)
        counts = native.ssp_counts(W, N, u)
        assert counts.sum() == N
        floor = np.floor(N * W)
        assert np.all(counts >= floor)
        assert np.all(counts <= floor + 1)


def test_ssp_unbiased():
    rng = np.random.default_rng(3)
    N = 32
    W = rng.dirichlet(np.ones(N))
    acc = np.zeros(N)
    reps = 800
    for r in range(reps):
        u = rng.uniform(size=N - 1)
        acc += native.ssp_counts(W, N, u)
    mean = acc / reps
    se = np.sqrt(np.maximum(N * W, 0.05)) / np.sqrt(reps)
    assert np.all(np.abs(mean - N * W) < 6 * se + 0.05)


def test_hilbert_matches_jax():
    from particles_tpu import hilbert

    rng = np.random.default_rng(4)
    coords = rng.integers(0, 16, size=(500, 2)).astype(np.uint32)
    got = native.hilbert_index(coords, 4)
    hi, lo = hilbert.hilbert_index(jnp.asarray(coords), 4)
    ref = np.asarray(hi, np.uint64) * (1 << 32) + np.asarray(lo, np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_hilbert_3d_matches_jax():
    from particles_tpu import hilbert

    rng = np.random.default_rng(5)
    coords = rng.integers(0, 8, size=(200, 3)).astype(np.uint32)
    got = native.hilbert_index(coords, 3)
    hi, lo = hilbert.hilbert_index(jnp.asarray(coords), 3)
    ref = np.asarray(hi, np.uint64) * (1 << 32) + np.asarray(lo, np.uint64)
    np.testing.assert_array_equal(got, ref)
