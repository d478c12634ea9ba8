"""Tests for RQMC sequences, Hilbert curve, and the SQMC algorithm."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import hilbert
from particles_tpu import kalman
from particles_tpu import rqmc
from particles_tpu import state_space_models as ssms


class TestRQMC:
    def test_sobol_matches_scipy(self):
        from scipy.stats import qmc as sq

        # past d=21 exercises the bundled Joe-Kuo table expansion
        for d in (1, 2, 5, 13, 21, 22, 64, 1111):
            ours = np.asarray(rqmc.sobol_unscrambled(128, d))
            ref = sq.Sobol(d, scramble=False).random(128)
            np.testing.assert_allclose(ours, ref, atol=1e-7)

    def test_sobol_no_scipy_needed(self):
        """Native Sobol must not import scipy (the reference's rqmc.py:14
        delegates to scipy; ours bundles the Joe-Kuo table)."""
        import subprocess, sys

        code = (
            "import sys\n"
            "sys.modules['scipy'] = None\n"  # any scipy import raises
            "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
            "import jax; jax.config.update('jax_platforms','cpu')\n"
            "from particles_tpu import rqmc\n"
            "u = rqmc.sobol(jax.random.key(0), 64, 30)\n"
            "assert u.shape == (64, 30) and float(u.min()) > 0.0\n"
            "print('ok')\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
        )
        assert out.returncode == 0, out.stderr
        assert "ok" in out.stdout

    def test_sobol_dim_cap(self):
        with pytest.raises(ValueError, match="21201"):
            rqmc._direction_numbers(30000)

    def test_scrambled_sobol_uniform(self):
        u = np.asarray(rqmc.sobol(jax.random.key(0), 4096, 3))
        assert u.shape == (4096, 3)
        assert (u > 0).all() and (u < 1).all()
        np.testing.assert_allclose(u.mean(axis=0), 0.5, atol=0.02)
        # QMC equidistribution beats MC: max CDF deviation small
        for j in range(3):
            s = np.sort(u[:, j])
            disc = np.abs(s - np.arange(1, 4097) / 4096).max()
            assert disc < 0.01, disc

    def test_lms_scramble_preserves_net(self):
        """LMS + shift keeps the digital-net stratification exactly:
        the first 2^m points hit every dyadic cell once, per 1-D and 2-D
        projection (exactness relies on the top-24-bit float conversion)."""
        N, d = 1024, 8
        for scramble in ("lms_shift", "shift"):
            for seed in (0, 1, 2):
                u = np.asarray(
                    rqmc.sobol(jax.random.key(seed), N, d, scramble=scramble)
                )
                for j in range(d):
                    cells = np.sort(np.floor(N * u[:, j]).astype(int))
                    assert np.array_equal(cells, np.arange(N)), (
                        scramble, seed, j)
                c = np.floor(32 * u[:, :2]).astype(int)
                cnt = np.zeros((32, 32), int)
                np.add.at(cnt, (c[:, 0], c[:, 1]), 1)
                assert cnt.min() == cnt.max() == 1, (scramble, seed)

    def test_lms_lower_variance_than_shift(self):
        """On a smooth product integrand the LMS scramble dominates the
        plain digital shift (the reason the reference's scipy backend
        uses it)."""

        def f(u):
            return float(jnp.prod(1.0 + 0.5 * (u - 0.5), axis=1).mean())

        stds = {}
        for scramble in ("lms_shift", "shift"):
            vals = [
                f(rqmc.sobol(jax.random.key(i), 256, 4, scramble=scramble))
                for i in range(150)
            ]
            assert abs(np.mean(vals) - 1.0) < 1e-3  # unbiased
            stds[scramble] = np.std(vals)
        assert stds["lms_shift"] < 0.5 * stds["shift"], stds

    def test_unknown_scramble_raises(self):
        with pytest.raises(ValueError):
            rqmc.sobol(jax.random.key(0), 64, 2, scramble="owen_nested")

    def test_different_keys_different_points(self):
        u1 = rqmc.sobol(jax.random.key(1), 64, 2)
        u2 = rqmc.sobol(jax.random.key(2), 64, 2)
        assert float(jnp.max(jnp.abs(u1 - u2))) > 0.01

    def test_halton_and_latin(self):
        h = np.asarray(rqmc.halton(jax.random.key(0), 1000, 4))
        assert h.shape == (1000, 4)
        np.testing.assert_allclose(h.mean(axis=0), 0.5, atol=0.05)
        l = np.asarray(rqmc.latin(jax.random.key(1), 500, 3))
        assert l.shape == (500, 3)
        # LHS: exactly one point per stratum per dim
        for j in range(3):
            counts = np.bincount((l[:, j] * 500).astype(int), minlength=500)
            assert counts.max() == 1


class TestHilbert:
    def test_2x2(self):
        coords = jnp.array([[0, 0], [0, 1], [1, 1], [1, 0]], jnp.uint32)
        hi, lo = hilbert.hilbert_index(coords, 1)
        idx = np.asarray(lo)
        assert sorted(idx) == [0, 1, 2, 3]
        # the 2x2 curve visits these points in exactly this order
        assert list(idx) == [0, 1, 2, 3]

    def test_bijective_and_unit_steps(self):
        """Defining property: the curve visits every cell once and each
        consecutive pair of cells is Manhattan-adjacent."""
        n = 8
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        coords = jnp.asarray(
            np.stack([xs.ravel(), ys.ravel()], axis=1), jnp.uint32
        )
        hi, lo = hilbert.hilbert_index(coords, 3)
        idx = np.asarray(lo)
        assert len(np.unique(idx)) == n * n
        order = np.argsort(idx)
        path = np.asarray(coords)[order]
        dists = np.abs(np.diff(path.astype(int), axis=0)).sum(axis=1)
        assert (dists == 1).all()

    def test_3d_bijective(self):
        n = 4
        g = np.arange(n)
        coords = jnp.asarray(
            np.stack(np.meshgrid(g, g, g), axis=-1).reshape(-1, 3), jnp.uint32
        )
        hi, lo = hilbert.hilbert_index(coords, 2)
        idx = np.asarray(lo)
        assert len(np.unique(idx)) == n**3
        order = np.argsort(idx)
        path = np.asarray(coords)[order].astype(int)
        assert (np.abs(np.diff(path, axis=0)).sum(axis=1) == 1).all()

    def test_sort_1d_is_argsort(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=100))
        np.testing.assert_array_equal(
            np.asarray(hilbert.hilbert_sort(x)), np.argsort(np.asarray(x))
        )

    def test_sort_locality(self):
        """Hilbert-sorted 2-d points: consecutive points are close."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2000, 2)), jnp.float32)
        order = hilbert.hilbert_sort(x)
        sorted_x = np.asarray(x)[np.asarray(order)]
        mean_gap = np.linalg.norm(np.diff(sorted_x, axis=0), axis=1).mean()
        rand_gap = np.linalg.norm(
            np.diff(np.asarray(x), axis=0), axis=1
        ).mean()
        assert mean_gap < 0.25 * rand_gap


class TestSQMC:
    @pytest.fixture(scope="class")
    def lg(self):
        ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
        x, y = ssm.simulate(jax.random.key(42), 30)
        kf = kalman.Kalman(ssm=ssm, data=y)
        kf.filter()
        return ssm, y, float(kf.logLt)

    def test_unbiased(self, lg):
        ssm, y, exact = lg
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        lls = []
        for s in range(8):
            pf = particles.SMC(fk=fk, N=500, qmc=True, key=jax.random.key(s))
            pf.run()
            lls.append(float(pf.logLt))
        assert abs(np.mean(lls) - exact) < 0.25, (np.mean(lls), exact)

    def test_beats_smc_variance(self, lg):
        """SQMC logLt estimates should have (much) lower variance than SMC
        at the same N."""
        ssm, y, exact = lg
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        smc_lls, sqmc_lls = [], []
        for s in range(12):
            pf = particles.SMC(fk=fk, N=300, key=jax.random.key(100 + s))
            pf.run()
            smc_lls.append(float(pf.logLt))
            pfq = particles.SMC(
                fk=fk, N=300, qmc=True, key=jax.random.key(200 + s)
            )
            pfq.run()
            sqmc_lls.append(float(pfq.logLt))
        assert np.var(sqmc_lls) < np.var(smc_lls), (
            np.var(sqmc_lls), np.var(smc_lls),
        )

    def test_guided_sqmc(self, lg):
        ssm, y, exact = lg
        fk = ssms.GuidedPF(ssm=ssm, data=y)
        pf = particles.SMC(fk=fk, N=500, qmc=True, key=jax.random.key(3))
        pf.run()
        assert abs(float(pf.logLt) - exact) < 0.3

    def test_multivariate_sqmc(self):
        """d=3 states: the two-limb Hilbert key co-sort path.  SQMC must be
        unbiased (vs exact Kalman) and dominate SMC in variance."""
        mv = kalman.MVLinearGauss_Guarniero_etal(alpha=0.4, dx=3)
        _, y = mv.simulate(jax.random.key(7), 20)
        kf = kalman.Kalman(ssm=mv, data=y)
        kf.filter()
        fk = ssms.Bootstrap(ssm=mv, data=y)
        lls_s, lls_q = [], []
        for s in range(10):
            p = particles.SMC(fk=fk, N=1000, key=jax.random.key(100 + s))
            p.run()
            lls_s.append(float(p.logLt))
            q = particles.SQMC(fk=fk, N=1000, key=jax.random.key(100 + s))
            q.run()
            lls_q.append(float(q.logLt))
        assert abs(np.mean(lls_q) - float(kf.logLt)) < 0.3
        assert np.var(lls_q) < np.var(lls_s)

    def test_qmc_ffbs(self, lg):
        ssm, y, _ = lg
        kf = kalman.Kalman(ssm=ssm, data=y)
        kf.smoother()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf = particles.SMC(
            fk=fk, N=1000, qmc=True, store_history=True,
            key=jax.random.key(4),
        )
        pf.run()
        assert pf.hist.hilbert_ordered
        paths = pf.hist.backward_sampling_qmc(jax.random.key(5), 500)
        means = np.asarray(jnp.mean(paths, axis=1))
        exact = np.asarray(kf.smth.mean)[:, 0]
        np.testing.assert_allclose(means, exact, atol=0.15)


class TestOwenScramble:
    """Round 3: nested-uniform Owen scrambling (scramble='owen'), the
    hash-based construction (Laine-Karras / Burley).  Reference parity:
    scipy's backend (which the reference delegates to, rqmc.py:14) uses
    LMS; Owen is the stronger randomisation CLAUDE.md flagged."""

    def test_owen_preserves_net(self):
        """Owen scrambling preserves the one-point-per-dyadic-cell
        property (it permutes within the nested dyadic tree)."""
        N, d = 1024, 8
        for seed in (0, 1, 2):
            u = np.asarray(
                rqmc.sobol(jax.random.key(seed), N, d, scramble="owen"))
            for j in range(d):
                cells = np.sort(np.floor(N * u[:, j]).astype(int))
                assert np.array_equal(cells, np.arange(N)), (seed, j)
            c = np.floor(32 * u[:, :2]).astype(int)
            cnt = np.zeros((32, 32), int)
            np.add.at(cnt, (c[:, 0], c[:, 1]), 1)
            assert cnt.min() == cnt.max() == 1, seed

    def test_owen_unbiased_and_beats_iid(self):
        """RQMC with Owen scrambling: unbiased for the integral and far
        below the IID Monte-Carlo variance; no worse than LMS on a
        smooth product integrand (the round-2 verdict's validation)."""

        def f(u):
            return float(jnp.prod(1.0 + 0.5 * (u - 0.5), axis=1).mean())

        N, d, R = 256, 4, 150
        vals_owen = [
            f(rqmc.sobol(jax.random.key(i), N, d, scramble="owen"))
            for i in range(R)
        ]
        vals_lms = [
            f(rqmc.sobol(jax.random.key(i), N, d, scramble="lms_shift"))
            for i in range(R)
        ]
        vals_iid = [
            f(jax.random.uniform(jax.random.key(i), (N, d)))
            for i in range(R)
        ]
        assert abs(np.mean(vals_owen) - 1.0) < 1e-3
        assert np.std(vals_owen) < 0.1 * np.std(vals_iid), (
            np.std(vals_owen), np.std(vals_iid))
        assert np.std(vals_owen) < 2.0 * np.std(vals_lms), (
            np.std(vals_owen), np.std(vals_lms))

    def test_owen_distinct_per_key_and_dimension(self):
        u1 = np.asarray(rqmc.sobol(jax.random.key(0), 64, 3,
                                   scramble="owen"))
        u2 = np.asarray(rqmc.sobol(jax.random.key(1), 64, 3,
                                   scramble="owen"))
        assert not np.allclose(u1, u2)
        # dimensions get independent scrambles (seeds differ)
        assert not np.allclose(u1[:, 0], u1[:, 1])


class TestSobolSorted0:
    """Round 3: closed-form first-coordinate-sorted Sobol generation
    (no lax.sort) — the SQMC engine's u-sort replacement."""

    def test_bit_exact_vs_sort(self):
        for N, d, seed in ((256, 5, 2), (1024, 3, 0), (4096, 2, 1)):
            key = jax.random.key(seed)
            u = np.asarray(rqmc.sobol(key, N, d))
            want = u[np.argsort(u[:, 0])]
            got = np.asarray(rqmc.sobol_sorted0(key, N, d))
            assert (got == want).all(), (N, d, seed)

    def test_non_power_of_two_raises(self):
        with pytest.raises(ValueError):
            rqmc.sobol_sorted0(jax.random.key(0), 1000, 2)

    def test_slice_consistency(self):
        """start/count select rows of the SAME point set (the sharded
        generation contract: each shard's slice concatenates to the
        full-N matrix, bit-exactly)."""
        key = jax.random.key(3)
        N, d = 1024, 4
        full_sorted = np.asarray(rqmc.sobol_sorted0(key, N, d))
        for scr in ("lms_shift", "owen", "shift"):
            full = np.asarray(rqmc.sobol(key, N, d, scramble=scr))
            for start, count in ((0, 128), (128, 128), (896, 128),
                                 (300, 57)):
                got = np.asarray(rqmc.sobol(key, N, d, scramble=scr,
                                            start=start, count=count))
                assert (got == full[start:start + count]).all(), (
                    scr, start, count)
        for start, count in ((0, 128), (512, 128), (896, 128)):
            got = np.asarray(rqmc.sobol_sorted0(key, N, d, start=start,
                                                count=count))
            assert (got == full_sorted[start:start + count]).all(), (
                start, count)

    def test_slice_traced_start(self):
        """``start`` may be a traced scalar (shard_map usage)."""
        key = jax.random.key(5)
        full = np.asarray(rqmc.sobol_sorted0(key, 512, 3))
        f = jax.jit(lambda s: rqmc.sobol_sorted0(key, 512, 3, start=s,
                                                 count=64))
        got = np.asarray(f(jnp.uint32(192)))
        assert (got == full[192:256]).all()

    def test_sqmc_engine_still_exact(self):
        """SQMC with the sort-free path matches the Kalman oracle."""
        from particles_tpu import kalman
        from particles_tpu import state_space_models as ssms
        import particles_tpu as particles

        ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
        x, y = ssm.simulate(jax.random.key(42), 25)
        kf = kalman.Kalman(ssm=ssm, data=y)
        kf.filter()
        pf = particles.SQMC(fk=ssms.GuidedPF(ssm=ssm, data=y), N=1024,
                            key=jax.random.key(1))
        pf.run()
        assert abs(float(pf.logLt) - float(kf.logLt)) < 0.2


class TestHilbertSortExactness:
    """Regression: hilbert_sort must order by the EXACT (hi, lo) key limbs.
    (A float64-packed key loses the bottom bits of the up-to-62-bit index:
    measured inverted adjacent pairs at d=4 on clustered clouds.)"""

    def test_order_is_lexicographic_in_exact_limbs(self):
        from particles_tpu import hilbert

        rng = np.random.default_rng(1)
        centers = rng.normal(size=(256, 4))
        x = np.repeat(centers, 16, axis=0) + 1e-7 * rng.normal(
            size=(4096, 4))
        xj = jnp.asarray(x, jnp.float32)
        # explicit full-width keys exercise the two-limb path (the
        # round-4 default is the reduced single-limb sort_nbits width)
        nbits = max(1, min(62 // 4, 16))
        order = np.asarray(hilbert.hilbert_sort(xj, nbits=nbits))
        assert sorted(order.tolist()) == list(range(4096))
        xint = hilbert._standardise_and_integerise(xj, nbits)
        hi, lo = (np.asarray(a).astype(np.uint64)
                  for a in hilbert.hilbert_index(xint, nbits))
        keys = (hi[order] << np.uint64(32)) | lo[order]
        assert (np.diff(keys.astype(object)) >= 0).all()

    def test_default_reduced_width_is_consistent(self):
        """The round-4 default sort width (hilbert.sort_nbits: ~log2(N)+4
        total bits, single uint32 limb) orders by exactly those keys, and
        hilbert_sort_with agrees with hilbert_sort + gather."""
        from particles_tpu import hilbert

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4096, 3)), jnp.float32)
        nbits = hilbert.sort_nbits(4096, 3)
        assert 3 * nbits <= 32
        order = np.asarray(hilbert.hilbert_sort(x))
        xint = hilbert._standardise_and_integerise(x, nbits)
        _, lo = hilbert.hilbert_index(xint, nbits)
        lo = np.asarray(lo)
        assert (np.diff(lo[order].astype(np.int64)) >= 0).all()
        p = jnp.asarray(rng.normal(size=4096), jnp.float32)
        (p_sorted,) = hilbert.hilbert_sort_with(x, (p,))
        # ties within a cell: both paths are stable sorts on equal keys
        np.testing.assert_array_equal(np.asarray(p_sorted),
                                      np.asarray(p)[order])
