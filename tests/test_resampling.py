"""Unit tests for particles_tpu.resampling.

Follows the reference's verification philosophy (SURVEY.md §4): exact
identities where they exist (log-sum-exp, weighted moments), and
distributional properties for the random schemes — unbiasedness
E[#offspring(n)] = M*W[n], and the floor/ceil support property for
systematic/ssp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import particles_tpu.resampling as rs


def random_weights(seed, N, concentrated=False):
    rng = np.random.default_rng(seed)
    lw = rng.normal(size=N) * (8.0 if concentrated else 1.0)
    W = np.exp(lw - lw.max())
    return jnp.asarray(W / W.sum(), dtype=jnp.float32)


class TestLogSpace:
    def test_log_sum_exp(self):
        v = jnp.array([-1.0, 2.0, 0.5])
        np.testing.assert_allclose(
            rs.log_sum_exp(v), np.log(np.sum(np.exp(np.asarray(v)))), rtol=1e-5
        )

    def test_log_sum_exp_stability(self):
        v = jnp.array([-1000.0, -1000.0])
        np.testing.assert_allclose(rs.log_sum_exp(v), -1000.0 + np.log(2), rtol=1e-5)

    def test_log_sum_exp_ab(self):
        np.testing.assert_allclose(
            rs.log_sum_exp_ab(jnp.float32(-1.0), jnp.float32(2.0)),
            np.log(np.exp(-1.0) + np.exp(2.0)),
            rtol=1e-5,
        )

    def test_log_mean_exp_weighted(self):
        v = jnp.array([0.0, 1.0, 2.0])
        W = jnp.array([0.5, 0.3, 0.2])
        np.testing.assert_allclose(
            rs.log_mean_exp(v, W=W),
            np.log(np.sum(np.asarray(W) * np.exp(np.asarray(v)))),
            rtol=1e-5,
        )

    def test_log_mean_exp_weighted_anticorrelated(self):
        # f32 regression: the max-v element carries ~zero weight (the APF
        # logeta pattern).  Stabilising by max(v) alone underflows every
        # W*exp(v - max) term and returns -inf; the correct answer is
        # dominated by the bulk at v=0 with W ~ 1.
        v = jnp.concatenate([jnp.zeros(999), jnp.array([105.0])])
        W = jnp.concatenate(
            [jnp.full(999, 1.0 / 999.0), jnp.array([0.0])])
        out = float(rs.log_mean_exp(v, W=W))
        np.testing.assert_allclose(out, 0.0, atol=1e-3)

    def test_log_mean_exp_lw_variant(self):
        # lw= is exact even when the normalised W would underflow to 0:
        # the spike at v=200 carries lw=-150, so W=exp(-150)/Z == 0 in f32
        # but v+lw=50 dominates the true weighted mean.
        v = jnp.concatenate([jnp.zeros(999), jnp.array([200.0])])
        lw = jnp.concatenate([jnp.zeros(999), jnp.array([-150.0])])
        out = float(rs.log_mean_exp(v, lw=lw))
        oracle = np.log((999.0 + np.exp(50.0)) / 999.0)
        np.testing.assert_allclose(out, oracle, rtol=1e-5)
        # and it agrees with the W= form where both are representable
        v = jnp.array([0.0, 1.0, 2.0])
        W = jnp.array([0.5, 0.3, 0.2])
        np.testing.assert_allclose(
            float(rs.log_mean_exp(v, lw=jnp.log(W))),
            float(rs.log_mean_exp(v, W=W)), rtol=1e-5)

    def test_exp_and_normalise(self):
        lw = jnp.array([-500.0, -501.0, -499.0])
        W = rs.exp_and_normalise(lw)
        assert jnp.all(W > 0)
        np.testing.assert_allclose(jnp.sum(W), 1.0, rtol=1e-5)

    def test_essl_uniform(self):
        lw = jnp.zeros(100)
        np.testing.assert_allclose(rs.essl(lw), 100.0, rtol=1e-5)

    def test_essl_degenerate(self):
        lw = jnp.concatenate([jnp.zeros(1), jnp.full((99,), -jnp.inf)])
        np.testing.assert_allclose(rs.essl(lw), 1.0, rtol=1e-5)


class TestWeights:
    def test_basic(self):
        lw = jnp.array([0.0, 1.0, -1.0])
        w = rs.Weights(lw)
        np.testing.assert_allclose(jnp.sum(w.W), 1.0, rtol=1e-5)
        np.testing.assert_allclose(
            w.log_mean, np.log(np.mean(np.exp(np.asarray(lw)))), rtol=1e-5
        )

    def test_nan_maps_to_neginf(self):
        lw = jnp.array([0.0, jnp.nan, 1.0])
        w = rs.Weights(lw)
        assert w.lw[1] == -jnp.inf
        assert w.W[1] == 0.0

    def test_add(self):
        w0 = rs.Weights()
        assert w0.N == 0
        w1 = w0.add(jnp.array([0.0, 1.0]))
        assert w1.N == 2
        w2 = w1.add(jnp.array([1.0, 0.0]))
        np.testing.assert_allclose(w2.lw, jnp.array([1.0, 1.0]))

    def test_pytree_roundtrip(self):
        w = rs.Weights(jnp.array([0.0, 1.0]))
        leaves, treedef = jax.tree_util.tree_flatten(w)
        w2 = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_allclose(w2.ESS, w.ESS)


class TestMoments:
    def test_wmean_and_var(self):
        x = jnp.array([1.0, 2.0, 3.0])
        W = jnp.array([0.2, 0.3, 0.5])
        out = rs.wmean_and_var(W, x)
        m = 0.2 + 0.6 + 1.5
        np.testing.assert_allclose(out["mean"], m, rtol=1e-5)
        np.testing.assert_allclose(
            out["var"], np.sum(np.asarray(W) * np.asarray(x) ** 2) - m * m, rtol=1e-5
        )

    def test_wmean_and_cov(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(500, 3)), dtype=jnp.float32)
        W = jnp.full((500,), 1.0 / 500)
        m, cov = rs.wmean_and_cov(W, x)
        np.testing.assert_allclose(m, np.mean(np.asarray(x), axis=0), atol=1e-5)
        np.testing.assert_allclose(
            cov, np.cov(np.asarray(x).T, bias=True), atol=1e-4
        )

    def test_wquantiles_median(self):
        x = jnp.arange(101, dtype=jnp.float32)
        W = jnp.full((101,), 1.0 / 101)
        q = rs.wquantiles(W, x, alphas=(0.5,))
        assert abs(float(q[0]) - 50.0) <= 1.0

    def test_str_array_variants(self):
        W = jnp.array([0.5, 0.5])
        theta = {"mu": jnp.array([0.0, 2.0]), "sigma": jnp.array([1.0, 3.0])}
        out = rs.wmean_and_var_str_array(W, theta)
        np.testing.assert_allclose(out["mean"]["mu"], 1.0)
        np.testing.assert_allclose(out["mean"]["sigma"], 2.0)
        q = rs.wquantiles_str_array(W, theta, alphas=(0.5,))
        assert "mu" in q


SCHEMES = ["multinomial", "residual", "stratified", "systematic", "ssp", "killing"]


class TestSchemes:
    @pytest.mark.parametrize("scheme", SCHEMES)
    def test_output_range_and_shape(self, scheme):
        W = random_weights(1, 64)
        A = rs.resampling(scheme, jax.random.key(0), W)
        assert A.shape == (64,)
        assert A.dtype == jnp.int32
        assert int(jnp.min(A)) >= 0 and int(jnp.max(A)) < 64

    @pytest.mark.parametrize("scheme", ["multinomial", "stratified", "systematic", "residual"])
    def test_M_not_N(self, scheme):
        W = random_weights(2, 50)
        A = rs.resampling(scheme, jax.random.key(1), W, M=120)
        assert A.shape == (120,)
        assert int(jnp.max(A)) < 50

    @pytest.mark.parametrize("scheme", SCHEMES)
    def test_unbiasedness(self, scheme):
        """E[#offspring(n)] == M * W[n] for every scheme."""
        N, reps = 32, 600
        W = random_weights(3, N, concentrated=True)

        def counts(key):
            A = rs.resampling(scheme, key, W)
            return jnp.bincount(A, length=N)

        keys = jax.random.split(jax.random.key(42), reps)
        all_counts = jax.jit(jax.vmap(counts))(keys)
        mean_counts = np.asarray(jnp.mean(all_counts.astype(jnp.float32), axis=0))
        expected = N * np.asarray(W)
        # MC error: std of counts <= sqrt(N W (1+N W)) / sqrt(reps); be generous
        se = np.sqrt(np.maximum(expected, 0.05)) / np.sqrt(reps)
        assert np.all(np.abs(mean_counts - expected) < 6 * se + 0.05), (
            scheme,
            np.max(np.abs(mean_counts - expected) / (6 * se + 0.05)),
        )

    @pytest.mark.parametrize("scheme", ["systematic", "stratified", "ssp"])
    def test_offspring_floor_ceil(self, scheme):
        """systematic/stratified/ssp: #offspring(n) in {floor(MW), floor(MW)+1}."""
        N = 40
        W = random_weights(4, N, concentrated=True)
        for s in range(20):
            A = rs.resampling(scheme, jax.random.key(s), W)
            counts = np.asarray(jnp.bincount(A, length=N))
            floor = np.floor(N * np.asarray(W))
            assert np.all(counts >= floor), scheme
            assert np.all(counts <= floor + 1), scheme

    @pytest.mark.parametrize("scheme", SCHEMES)
    def test_exact_count(self, scheme):
        """Total offspring is exactly M (exercises ssp fix-up path too)."""
        for seed in range(10):
            W = random_weights(seed, 77)
            A = rs.resampling(scheme, jax.random.key(seed + 100), W)
            assert A.shape == (77,)

    def test_systematic_sorted(self):
        W = random_weights(5, 100)
        A = rs.resampling("systematic", jax.random.key(0), W)
        assert np.all(np.diff(np.asarray(A)) >= 0)

    def test_killing_requires_M_eq_N(self):
        W = random_weights(6, 10)
        with pytest.raises(ValueError):
            rs.killing(jax.random.key(0), W, M=5)

    def test_idiotic_constant(self):
        W = random_weights(7, 10)
        A = rs.idiotic(jax.random.key(0), W, 10)
        assert len(np.unique(np.asarray(A))) == 1

    def test_unknown_scheme_raises(self):
        with pytest.raises(ValueError):
            rs.resampling("nope", jax.random.key(0), jnp.ones(3) / 3)

    def test_jit_and_degenerate_weights(self):
        """Degenerate (one-hot) weights resolve to the single alive particle."""
        W = jnp.zeros(16).at[5].set(1.0)
        for scheme in ["multinomial", "stratified", "systematic", "residual", "ssp"]:
            A = jax.jit(lambda k, W: rs.resampling(scheme, k, W))(
                jax.random.key(0), W
            )
            assert np.all(np.asarray(A) == 5), scheme


class TestInverseCdf:
    def test_matches_two_pointer(self):
        """Cross-check vectorised inverse_cdf against a literal sequential oracle."""
        rng = np.random.default_rng(0)
        W = rng.dirichlet(np.ones(30)).astype(np.float32)
        su = np.sort(rng.uniform(size=25)).astype(np.float32)
        # sequential oracle (same contract as reference resampling.py:484-509)
        j, s = 0, W[0]
        expected = np.empty(25, dtype=np.int64)
        for n in range(25):
            while su[n] > s:
                j += 1
                s += W[j]
            expected[n] = j
        got = rs.inverse_cdf(jnp.asarray(su), jnp.asarray(W))
        np.testing.assert_array_equal(np.asarray(got), expected)

    def test_uniform_spacings_sorted(self):
        su = rs.uniform_spacings(jax.random.key(0), 1000)
        su = np.asarray(su)
        assert np.all(np.diff(su) > 0)
        assert su[0] > 0 and su[-1] < 1
        # roughly uniform
        assert abs(su.mean() - 0.5) < 0.05


class TestMultinomialQueue:
    def test_dequeue(self):
        W = random_weights(8, 20)
        q = rs.MultinomialQueue(jax.random.key(0), W)
        a = q.dequeue(7)
        b = q.dequeue(15)  # triggers re-enqueue
        assert a.shape == (7,) and b.shape == (15,)
        assert int(jnp.max(b)) < 20
        with pytest.raises(ValueError):
            q.dequeue(25)


class TestRepeatKernels:
    @pytest.mark.parametrize("N", [2048, 8192])
    def test_v1_matches_jnp_repeat(self, N):
        """The production kernel's routing (1-D, (N,d<=3) column-wise,
        padding, int round-trip) agrees with jnp.repeat (interpret mode)."""
        from jax.experimental import pallas as pl
        import particles_tpu.ops.repeat_kernel as rk

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        rk.pl.pallas_call = patched
        orig_on_tpu = rk._on_tpu
        rk._on_tpu = lambda: True
        try:
            rng = np.random.default_rng(N)
            W = rng.dirichlet(np.ones(N) * 0.2).astype(np.float32)
            cs = np.cumsum(W)
            cs /= cs[-1]
            z = np.clip(np.floor(N * cs - 0.37).astype(np.int32) + 1, 0, N)
            z[-1] = N
            counts = jnp.asarray(np.diff(z, prepend=0).astype(np.int32))
            # 1-D float and int
            x = jnp.asarray(rng.normal(size=N), jnp.float32)
            ref = jnp.repeat(x, counts, total_repeat_length=N)
            assert bool(jnp.all(ref == rk.repeat_by_counts(x, counts, N)))
            xi = jnp.asarray(rng.integers(0, 1 << 20, size=N), jnp.int32)
            gi = rk.repeat_by_counts(xi, counts, N)
            assert gi.dtype == jnp.int32
            assert bool(jnp.all(
                jnp.repeat(xi, counts, total_repeat_length=N) == gi))
            # (N, d) column-wise routing for d <= 3
            for d in (1, 2, 3):
                x2 = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
                ref2 = jnp.repeat(x2, counts, axis=0, total_repeat_length=N)
                assert bool(jnp.all(
                    ref2 == rk.repeat_by_counts(x2, counts, N))), d
            # unaligned N: padding path
            No = N - 513
            xo = x[:No]
            cso = np.cumsum(W[:No])
            cso /= cso[-1]
            zo = np.clip(np.floor(No * cso - 0.37).astype(np.int32) + 1,
                         0, No)
            zo[-1] = No
            co = jnp.asarray(np.diff(zo, prepend=0).astype(np.int32))
            assert bool(jnp.all(
                jnp.repeat(xo, co, total_repeat_length=No)
                == rk.repeat_by_counts(xo, co, No)))
        finally:
            rk.pl.pallas_call = orig
            rk._on_tpu = orig_on_tpu
            rk._repeat_pallas_n.clear_cache()

    @pytest.mark.parametrize("N", [1024, 4096])
    def test_merge_rank_kernel_matches_sort(self, N):
        """The Pallas merge-rank kernel is bit-equal to the sort-based
        formulation, including value ties (interpret mode)."""
        from jax.experimental import pallas as pl
        import particles_tpu.ops.merge_rank_kernel as mk

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        mk.pl.pallas_call = patched
        orig_on_tpu = mk._on_tpu
        mk._on_tpu = lambda: True
        try:
            rng = np.random.default_rng(N)
            W = rng.dirichlet(np.ones(N) * 0.3).astype(np.float32)
            cs = np.cumsum(W)
            cs = (cs / cs[-1]).astype(np.float32)
            su = np.sort(rng.uniform(size=N)).astype(np.float32)
            ref = rs._merge_rank_counts(jnp.asarray(su), jnp.asarray(cs), N)
            got = mk.merge_rank_counts(jnp.asarray(su), jnp.asarray(cs), N)
            assert got is not None
            assert bool(jnp.all(ref == got))
            # ties: su containing exact cs values must follow the
            # side='left' convention (tied su counts)
            su2 = np.sort(
                np.concatenate([cs[: N // 2], rng.uniform(size=N - N // 2)])
            ).astype(np.float32)
            ref2 = rs._merge_rank_counts(jnp.asarray(su2), jnp.asarray(cs), N)
            got2 = mk.merge_rank_counts(jnp.asarray(su2), jnp.asarray(cs), N)
            assert bool(jnp.all(ref2 == got2))
            # M != N returns None (caller falls back)
            assert mk.merge_rank_counts(
                jnp.asarray(su[: N // 2]), jnp.asarray(cs), N // 2) is None
        finally:
            mk.pl.pallas_call = orig
            mk._on_tpu = orig_on_tpu
            mk._merge_pallas.clear_cache()

    @pytest.mark.parametrize("N", [2048, 8192])
    def test_fused_ancestors(self, N):
        """repeat_with_plan_anc serves the payload bit-equal to
        repeat_with_plan AND the ancestor vector A[j] = #{k: z_k <= j}
        in the same kernel call (interpret mode)."""
        from jax.experimental import pallas as pl
        import particles_tpu.ops.repeat_kernel as rk

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        rk.pl.pallas_call = patched
        orig_on_tpu = rk._on_tpu
        rk._on_tpu = lambda: True
        try:
            rng = np.random.default_rng(N)
            W = rng.dirichlet(np.ones(N) * 0.2).astype(np.float32)
            cs = np.cumsum(W)
            cs /= cs[-1]
            z = np.clip(np.floor(N * cs - 0.37).astype(np.int32) + 1, 0, N)
            z = np.maximum.accumulate(z)
            z[-1] = N
            zj = jnp.asarray(z)
            counts = jnp.asarray(np.diff(z, prepend=0).astype(np.int32))
            plan = rk.make_repeat_plan(zj, N)
            assert plan is not None
            iota = jnp.arange(N, dtype=jnp.int32)
            A_ref = jnp.repeat(iota, counts, total_repeat_length=N)
            x = jnp.asarray(rng.normal(size=N), jnp.float32)
            y, A = rk.repeat_with_plan_anc(plan, x)
            assert bool(jnp.all(y == rk.repeat_with_plan(plan, x)))
            assert A.dtype == jnp.int32
            assert bool(jnp.all(A == A_ref))
            # extreme counts: one source serves everything
            for pos in (0, N // 2, N - 1):
                c2 = jnp.zeros(N, jnp.int32).at[pos].set(N)
                z2 = jnp.cumsum(c2)
                p2 = rk.make_repeat_plan(z2, N)
                y2, A2 = rk.repeat_with_plan_anc(p2, x)
                assert bool(jnp.all(A2 == pos)), pos
                assert bool(jnp.all(y2 == x[pos])), pos
            # unaligned N: padding path
            No = N - 513
            zo = np.clip(z[:No], 0, No)
            zo = np.maximum.accumulate(zo)
            zo[-1] = No
            zoj = jnp.asarray(zo)
            co = jnp.asarray(np.diff(zo, prepend=0).astype(np.int32))
            po = rk.make_repeat_plan(zoj, No)
            yo, Ao = rk.repeat_with_plan_anc(po, x[:No])
            assert bool(jnp.all(
                Ao == jnp.repeat(jnp.arange(No, dtype=jnp.int32), co,
                                 total_repeat_length=No)))
            assert bool(jnp.all(
                yo == jnp.repeat(x[:No], co, total_repeat_length=No)))
            # non-routable payload falls back but still returns ancestors
            x2 = jnp.asarray(rng.normal(size=(N, 5)), jnp.float32)
            y5, A5 = rk.repeat_with_plan_anc(plan, x2)
            assert bool(jnp.all(A5 == A_ref))
            assert bool(jnp.all(
                y5 == jnp.repeat(x2, counts, axis=0, total_repeat_length=N)))
            # P=0 anc-only instantiation (no payload at all)
            served0, A0 = rk.repeat_with_plan_cols(plan, [], want_anc=True)
            assert served0 == []
            assert bool(jnp.all(A0 == A_ref))
            assert bool(jnp.all(rk.ancestors_by_z(zj, N) == A_ref))
            # P=0 anc-only on the UNALIGNED (padded) plan: padded sources
            # absorb padded output slots, A sliced back to No
            _, Ao0 = rk.repeat_with_plan_cols(po, [], want_anc=True)
            assert bool(jnp.all(
                Ao0 == jnp.repeat(jnp.arange(No, dtype=jnp.int32), co,
                                  total_repeat_length=No)))
        finally:
            rk.pl.pallas_call = orig
            rk._on_tpu = orig_on_tpu
            rk._repeat_pallas_n.clear_cache()

    def test_v1_fallback_cases(self):
        """d > 3, M != N, and tiny N fall back to jnp.repeat (still exact)."""
        import particles_tpu.ops.repeat_kernel as rk

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(256, 5)), jnp.float32)
        counts = jnp.zeros(256, jnp.int32).at[3].set(256)
        got = rk.repeat_by_counts(x, counts, 256)
        assert bool(jnp.all(
            got == jnp.repeat(x, counts, axis=0, total_repeat_length=256)))

    @pytest.mark.parametrize("N", [2048, 8192])
    def test_plan_api_and_z_forms(self, N):
        """make_repeat_plan/repeat_with_plan share one plan across payloads
        and match jnp.repeat; scheme z-forms are consistent with counts
        (interpret mode on CPU)."""
        from jax.experimental import pallas as pl
        import particles_tpu.ops.repeat_kernel as rk
        from particles_tpu import resampling as rs

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        rk.pl.pallas_call = patched
        orig_on_tpu = rk._on_tpu
        rk._on_tpu = lambda: True
        try:
            rng = np.random.default_rng(N)
            W = jnp.asarray(rng.dirichlet(np.ones(N) * 0.2), jnp.float32)
            key = jax.random.key(3)
            for scheme in ("systematic", "stratified", "multinomial"):
                z = rs.resampling_z(scheme, key, W, M=N)
                counts = rs.resampling_counts(scheme, key, W, M=N)
                # z-form is exactly cumsum(counts)
                assert bool(jnp.all(z == jnp.cumsum(counts)))
            z = rs.resampling_z("systematic", key, W, M=N)
            counts = jnp.diff(z, prepend=jnp.zeros(1, jnp.int32))
            plan = rk.make_repeat_plan(z, N)
            assert plan is not None
            x = jnp.asarray(rng.normal(size=N), jnp.float32)
            x2 = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
            iota = jnp.arange(N, dtype=jnp.int32)
            for payload in (x, x2, iota):
                ref = jnp.repeat(payload, counts, axis=0,
                                 total_repeat_length=N)
                got = rk.repeat_with_plan(plan, payload)
                assert got.dtype == payload.dtype
                assert bool(jnp.all(ref == got)), payload.shape
            # extreme counts through repeat_by_z
            for pos in (0, 5, N // 2, N - 1):
                c2 = jnp.zeros(N, jnp.int32).at[pos].set(N)
                z2 = jnp.cumsum(c2)
                assert bool(jnp.all(
                    jnp.repeat(x, c2, total_repeat_length=N)
                    == rk.repeat_by_z(x, z2, N))), pos
        finally:
            rk.pl.pallas_call = orig
            rk._on_tpu = orig_on_tpu
            rk._repeat_pallas_n.clear_cache()

    @pytest.mark.parametrize(
        "N,seed,ties,extreme",
        [(2048, 0, 0.0, None), (2048, 1, 0.3, None), (4096, 3, 0.0, 0),
         (4096, 4, 0.0, -1), (2559, 6, 0.0, None), (3071, 7, 0.2, None)])
    def test_su_mode_fused_inverse_cdf(self, N, seed, ties, extreme):
        """make_repeat_plan_su serves Y[j] = X[i], cs_{i-1} < su_j <= cs_i
        directly from (sorted uniforms, cumulative weights) — bit-equal to
        the searchsorted oracle including exact-value ties, degenerate
        weights, padding (unaligned N), multi-payload fusion, the P=0
        ancestor-only instantiation and the non-routable fallback
        (interpret mode)."""
        from jax.experimental import pallas as pl
        import particles_tpu.ops.repeat_kernel as rk

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        rk.pl.pallas_call = patched
        orig_on_tpu = rk._on_tpu
        rk._on_tpu = lambda: True
        try:
            rng = np.random.default_rng(seed)
            W = rng.dirichlet(np.ones(N) * 0.25)
            if extreme is not None:
                W = np.zeros(N)
                W[extreme] = 1.0
            cs = np.cumsum(W)
            cs = np.maximum.accumulate((cs / cs[-1]).astype(np.float32))
            cs[-1] = 1.0
            su = rng.uniform(size=N)
            if ties:
                k = int(N * ties)
                su[:k] = cs[rng.integers(0, N - 1, size=k)]
            su = np.sort(np.clip(
                su, 0.0, np.float32(1.0) - np.float32(2**-24))
            ).astype(np.float32)
            A_ref = np.searchsorted(cs, su, side="left").astype(np.int32)
            x = rng.normal(size=N).astype(np.float32)
            x2 = rng.normal(size=N).astype(np.float32)

            plan = rk.make_repeat_plan_su(jnp.asarray(su), jnp.asarray(cs),
                                          N)
            assert plan is not None
            (ya, yb), A = rk.repeat_with_plan_cols(
                plan, [jnp.asarray(x), jnp.asarray(x2)], want_anc=True)
            assert np.array_equal(np.asarray(A), A_ref)
            assert np.array_equal(np.asarray(ya), x[A_ref])
            assert np.array_equal(np.asarray(yb), x2[A_ref])
            s0, A0 = rk.repeat_with_plan_cols(plan, [], want_anc=True)
            assert s0 == [] and np.array_equal(np.asarray(A0), A_ref)
            # non-routable (N, 5) leaf: searchsorted + take fallback
            x5 = rng.normal(size=(N, 5)).astype(np.float32)
            y5 = rk.repeat_with_plan(plan, jnp.asarray(x5))
            assert np.array_equal(np.asarray(y5), x5[A_ref])
        finally:
            rk.pl.pallas_call = orig
            rk._on_tpu = orig_on_tpu
            rk._repeat_pallas_n.clear_cache()


class TestFusedZKernel:
    """Round 3: ops/z_kernel.py computes the systematic z-form in one
    streaming Pallas pass over int32 fixed-point weights — exact int
    cumsum, so monotone BY CONSTRUCTION (no cummax wave needed)."""

    @pytest.mark.parametrize("conc", [1.0, 0.01, 8.0])
    def test_matches_float64_oracle(self, conc):
        from jax.experimental import pallas as pl

        import particles_tpu.ops.z_kernel as zk

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        zk.pl.pallas_call = patched
        orig_on_tpu = zk._on_tpu
        zk._on_tpu = lambda: True
        try:
            N = 8192
            rng = np.random.default_rng(int(conc * 100))
            lw = conc * rng.normal(size=N)
            W = rs.exp_and_normalise(jnp.asarray(lw, jnp.float32))
            u = 0.37
            z = zk.systematic_z_fused(W, u, N)
            assert z is not None
            z = np.asarray(z)
            W64 = np.asarray(W, np.float64)
            W64 /= W64.sum()
            z64 = np.clip(
                np.floor(N * np.cumsum(W64) - u).astype(np.int64) + 1, 0, N)
            z64[-1] = N
            # fixed-point quantisation keeps z within +-1 of exact
            assert np.abs(z - z64).max() <= 1
            assert (np.diff(z) >= 0).all()
            assert z[-1] == N
            # unaligned N is not routable: caller falls back
            assert zk.systematic_z_fused(W[:1000], u, 1000) is None
        finally:
            zk.pl.pallas_call = orig
            zk._on_tpu = orig_on_tpu
            zk._z_pallas.clear_cache()

    @pytest.mark.parametrize("conc", [1.0, 8.0])
    def test_normalised_cumsum_exact(self, conc):
        """The streaming fixed-point cs kernel is monotone by
        construction and within quantisation error of the float64 CDF."""
        from jax.experimental import pallas as pl

        import particles_tpu.ops.z_kernel as zk

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        zk.pl.pallas_call = patched
        orig_on_tpu = zk._on_tpu
        zk._on_tpu = lambda: True
        try:
            N = 8192
            rng = np.random.default_rng(int(conc))
            lw = conc * rng.normal(size=N)
            W = rs.exp_and_normalise(jnp.asarray(lw, jnp.float32))
            cs = zk.normalised_cumsum_exact(W)
            assert cs is not None
            cs = np.asarray(cs)
            W64 = np.asarray(W, np.float64)
            cs64 = np.cumsum(W64 / W64.sum())
            assert (np.diff(cs) >= 0).all()
            assert np.abs(cs - cs64).max() < N * 2**-31 + 1e-6
            assert abs(cs[-1] - 1.0) < 1e-6
            # the resampling-layer helper routes + reports monotonicity
            cs2, mono = rs._normalised_cumsum_mono(W)
            assert mono and bool(jnp.all(cs2 == jnp.asarray(cs)))
            assert zk.normalised_cumsum_exact(W[:1000]) is None
        finally:
            zk.pl.pallas_call = orig
            zk._on_tpu = orig_on_tpu
            zk._cs_pallas.clear_cache()

    def test_no_pallas_guard(self):
        """The trace-time guard flips pallas_allowed and disables every
        kernel router (GSPMD cannot partition a pallas_call)."""
        from particles_tpu import ops
        import particles_tpu.ops.z_kernel as zk

        assert ops.pallas_allowed()
        with ops.no_pallas():
            assert not ops.pallas_allowed()
            with ops.no_pallas():  # re-entrant
                assert not ops.pallas_allowed()
            assert not ops.pallas_allowed()
        assert ops.pallas_allowed()

        # a router whose backend gate passes still refuses under the guard
        orig_on_tpu = zk._on_tpu
        zk._on_tpu = lambda: ops.pallas_allowed()
        try:
            W = jnp.full((8192,), 1.0 / 8192, jnp.float32)
            with ops.no_pallas():
                assert zk.systematic_z_fused(W, 0.5, 8192) is None
        finally:
            zk._on_tpu = orig_on_tpu


class TestZFormMonotonicity:
    """Round 3: resampling_z documents a NONDECREASING z, but XLA's
    parallel f32 cumsum is not association-monotone — at N~1e6 the raw
    analytic systematic z dips by 1 at a handful of indices (a nonsense
    -1 offspring count, and a latent wrong-output hole in the Pallas
    visit plan when a dip lands on a block boundary).  All z-forms must
    monotonise."""

    def test_systematic_z_nondecreasing_large(self):
        import jax
        import jax.numpy as jnp

        from particles_tpu import resampling as rs

        N = 2**20
        rng = np.random.default_rng(0)
        x = rng.normal(size=N).astype(np.float32)
        lw = -0.5 * (0.3 - 0.9 * x) ** 2 / 0.04
        W = rs.exp_and_normalise(jnp.asarray(lw))
        for scheme in ("systematic", "stratified"):
            z = np.asarray(rs.resampling_z(scheme, jax.random.key(0), W,
                                           M=N))
            assert (np.diff(z) >= 0).all(), scheme
            assert z[-1] == N


class TestRepeatKernelLeafRouting:
    """Regression: extended dtypes (typed PRNG keys — SMC2 carries a
    per-particle pf_key field) must never route into the f32 Pallas
    select; the jnp.repeat fallback handles them."""

    def test_key_leaves_not_routable(self):
        import jax

        from particles_tpu.ops import repeat_kernel as rk

        keys = jax.random.split(jax.random.key(0), 16)
        assert not rk._leaf_routable(keys, 16)
        assert rk._leaf_routable(jnp.zeros(16, jnp.float32), 16)
        assert rk._leaf_routable(jnp.zeros(16, jnp.bool_), 16)
        assert not rk._leaf_routable(jnp.zeros(16, jnp.complex64), 16)
        # and the fallback actually serves typed keys
        counts = jnp.array([2] * 8 + [0] * 8, jnp.int32)
        out = jnp.repeat(keys, counts, axis=0, total_repeat_length=16)
        assert out.shape == (16,)


class TestCountsAncestorEquivalence:
    """The documented counts <-> sorted-ancestors contract: bit-exact for
    the same key for every scheme except residual (whose two forms consume
    the key through different machinery — both unbiased)."""

    def test_bit_match_per_scheme(self):
        import jax

        from particles_tpu import resampling as rs

        N = 4096
        rng = np.random.default_rng(0)
        W = rs.exp_and_normalise(
            jnp.asarray(rng.normal(size=N), jnp.float32))
        for scheme in sorted(rs.rs_counts_funcs):
            k = jax.random.fold_in(jax.random.key(0), 13)
            A = np.sort(np.asarray(rs.resampling(scheme, k, W, M=N)))
            c = np.asarray(rs.resampling_counts(scheme, k, W, M=N))
            assert c.sum() == N, scheme
            A2 = np.repeat(np.arange(N), c)
            if scheme == "residual":
                assert not np.array_equal(A, A2)  # documented exception
            else:
                np.testing.assert_array_equal(A, A2, err_msg=scheme)

    def test_ancestors_by_z_fallback(self):
        from particles_tpu import ops

        counts = jnp.asarray([0, 3, 1, 0, 2, 0, 1, 1], jnp.int32)
        A = np.asarray(ops.ancestors_by_z(jnp.cumsum(counts), 8))
        np.testing.assert_array_equal(
            A, np.repeat(np.arange(8), np.asarray(counts)))

    def test_int32_user_leaves_not_routed(self):
        """int32 user values can exceed 2^24 (silently rounded by the f32
        round-trip) — they must never take the kernel route."""
        from particles_tpu.ops import repeat_kernel as rk

        assert not rk._leaf_routable(jnp.zeros(16, jnp.int32), 16)
        assert rk._leaf_routable(jnp.zeros(16, jnp.int16), 16)


class TestMultinomialIIDFastPath:
    """Round 4b: on TPU ``multinomial_iid`` re-phrases the M-point binary
    search (the ~20 ms/1e5 primitive) as sort + sorted inverse-CDF serve +
    unsort — realisation-equivalent to ``searchsorted(cs, u, 'left')`` on
    the SAME cumulative weights (measured 1.16 vs 17.6 ms/iter at
    M = 2^17 on v5e)."""

    def _patched(self):
        from jax.experimental import pallas as pl

        import particles_tpu.ops.merge_rank_kernel as mk
        import particles_tpu.ops.repeat_kernel as rk
        import particles_tpu.ops.z_kernel as zk

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        mods = (rk, mk, zk)
        origs = [(m, m.pl.pallas_call, m._on_tpu) for m in mods]
        for m in mods:
            m.pl.pallas_call = patched
            m._on_tpu = lambda: True
        return origs

    @staticmethod
    def _restore(origs):
        import particles_tpu.ops.merge_rank_kernel as mk
        import particles_tpu.ops.repeat_kernel as rk
        import particles_tpu.ops.z_kernel as zk

        for m, call, on_tpu in origs:
            m.pl.pallas_call = call
            m._on_tpu = on_tpu
        rk._repeat_pallas_n.clear_cache()
        zk._z_pallas.clear_cache()
        # the N=2048 case routes through the merge-rank kernel: clear its
        # jit cache too or an interpret-compiled executable could serve
        # later same-process TPU-backend tests
        mk._merge_pallas.clear_cache()

    @pytest.mark.parametrize("N", [2048, 8192])
    def test_matches_searchsorted_realisation(self, N):
        import jax

        origs = self._patched()
        try:
            rng = np.random.default_rng(N)
            W = rs.exp_and_normalise(
                jnp.asarray(2.0 * rng.normal(size=N), jnp.float32))
            key = jax.random.key(7)
            out = np.asarray(rs.multinomial_iid(key, W))
            # the oracle uses the SAME cs the fast route consumed
            # (quantised-exact at N % 8192 == 0, XLA cumsum otherwise)
            cs, mono = rs._normalised_cumsum_mono(W)
            cs_np = np.asarray(cs if not mono
                               else cs.at[-1].set(jnp.float32(1.0)))
            u = np.asarray(jax.random.uniform(key, (N,)))
            expected = np.clip(
                np.searchsorted(cs_np, u, side="left"), 0, N - 1)
            np.testing.assert_array_equal(out, expected)
            # N = 8192 exercises the su-plan kernel serve; assert the
            # fixed-point cs actually routed (guards silent fallback)
            if N % 8192 == 0:
                assert mono
        finally:
            self._restore(origs)

    @pytest.mark.parametrize("k", [2, 4])
    def test_m_multiple_of_n_chunked_route(self, k):
        """Round 5: M = k*N routes through k chunked su-mode kernel calls
        (one per N-sized slice of the sorted query stream) — the PaRIS
        per-trial draw shape.  Realisation must match searchsorted on the
        same (pinned) cumulative weights, for indices AND served values."""
        import jax

        origs = self._patched()
        try:
            N = 2048
            M = k * N
            rng = np.random.default_rng(17 + k)
            W = rs.exp_and_normalise(
                jnp.asarray(rng.normal(size=N), jnp.float32))
            x = jnp.asarray(rng.normal(size=N), jnp.float32)
            key = jax.random.key(23)
            out = np.asarray(rs.multinomial_iid(key, W, M=M))
            cs, mono = rs._normalised_cumsum_mono(W)
            cs_np = np.asarray(cs if not mono
                               else cs.at[-1].set(jnp.float32(1.0)))
            u = np.asarray(jax.random.uniform(key, (M,)))
            expected = np.clip(
                np.searchsorted(cs_np, u, side="left"), 0, N - 1)
            np.testing.assert_array_equal(out, expected)
            A, vals = rs.multinomial_iid_values(key, W, [x], M=M)
            np.testing.assert_array_equal(np.asarray(A), expected)
            np.testing.assert_array_equal(
                np.asarray(vals[0]), np.asarray(x)[expected])
        finally:
            self._restore(origs)

    def test_m_not_n_route(self):
        import jax

        origs = self._patched()
        try:
            N, M = 4096, 2048
            rng = np.random.default_rng(5)
            W = rs.exp_and_normalise(
                jnp.asarray(rng.normal(size=N), jnp.float32))
            key = jax.random.key(11)
            out = np.asarray(rs.multinomial_iid(key, W, M=M))
            cs, mono = rs._normalised_cumsum_mono(W)
            u = np.asarray(jax.random.uniform(key, (M,)))
            expected = np.clip(
                np.searchsorted(np.asarray(cs), u, side="left"), 0, N - 1)
            np.testing.assert_array_equal(out, expected)
        finally:
            self._restore(origs)


class TestDenseServe:
    """Round 5 (VERDICT r4 task 2): below _DENSE_SERVE_MAX the fallback
    serve is a compare-count ancestor + take instead of counts+repeat
    (jnp.repeat batches catastrophically under vmap — the multichain-PMMH
    / SMC² inner-filter pattern).  Must be bit-identical to repeat."""

    def _z(self, rng, N, M):
        counts = rng.multinomial(M, rng.dirichlet(np.ones(N) * 0.2))
        return jnp.asarray(np.cumsum(counts), jnp.int32)

    def test_matches_repeat(self):
        from particles_tpu.ops import repeat_kernel as rk

        rng = np.random.default_rng(0)
        for N, M in [(100, 100), (7, 13), (256, 64), (1024, 2048)]:
            z = self._z(rng, N, M)
            counts = jnp.diff(z, prepend=jnp.zeros(1, jnp.int32))
            A = rk.dense_ancestors_by_z(z, M)
            np.testing.assert_array_equal(
                np.asarray(A),
                np.repeat(np.arange(N), np.asarray(counts))[:M])
            for leaf in (
                jnp.asarray(rng.normal(size=N), jnp.float32),
                jnp.asarray(rng.integers(0, 2**30, N), jnp.int32),
                jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
                jnp.asarray(rng.integers(0, 2, N), bool),
            ):
                from particles_tpu import ops
                served = ops.serve_by_z(z, M, use_pallas=False)(leaf)
                expected = jnp.repeat(leaf, counts, axis=0,
                                      total_repeat_length=M)
                np.testing.assert_array_equal(np.asarray(served),
                                              np.asarray(expected))

    def test_infinity_safe(self):
        # sampler leaves (lpost) are legitimately -inf; the dense serve
        # must propagate non-finite values exactly (this is why it is a
        # take, NOT a one-hot MXU dot — 0*inf = NaN)
        from particles_tpu import ops

        z = jnp.asarray([2, 2, 5, 8], jnp.int32)
        x = jnp.asarray([1.0, -jnp.inf, jnp.nan, 4.0], jnp.float32)
        out = np.asarray(ops.serve_by_z(z, 8, use_pallas=False)(x))
        expected = np.repeat(np.asarray(x), [2, 0, 3, 3])
        np.testing.assert_array_equal(out, expected)

    def test_vmapped_route(self):
        # the motivating pattern: batched serves under vmap
        from particles_tpu import ops

        rng = np.random.default_rng(3)
        N = 64
        zs = jnp.stack([self._z(rng, N, N) for _ in range(5)])
        xs = jnp.asarray(rng.normal(size=(5, N)), jnp.float32)
        f = jax.jit(jax.vmap(
            lambda z, x: ops.serve_by_z(z, N, use_pallas=False)(x)))
        out = np.asarray(f(zs, xs))
        for b in range(5):
            counts = np.diff(np.asarray(zs[b]), prepend=0)
            np.testing.assert_array_equal(
                out[b], np.repeat(np.asarray(xs[b]), counts)[:N])


class TestBlockedSSP:
    """Round 4: ssp_counts routes to the hierarchical (tree) pairing at
    N >= _SSP_BLOCKED_MIN — a different valid SSP (any adapted pairing
    preserves unbiasedness, the floor/ceil support and the exact sum),
    O(K log N) sequential steps instead of N-1."""

    def test_sum_support_unbiasedness(self):
        N = 10_000  # above the routing threshold
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.dirichlet(np.ones(N) * 0.3), jnp.float32)
        MW = np.asarray(N * W, np.float64)
        f = jax.jit(lambda k: rs.resampling_counts("ssp", k, W, M=N))
        tot = np.zeros(N)
        R = 40
        for s in range(R):
            c = np.asarray(f(jax.random.key(s)))
            assert c.sum() == N
            assert ((c >= np.floor(MW) - 1e-6)
                    & (c <= np.ceil(MW) + 1e-6)).all()
            tot += c
        p = MW - np.floor(MW)
        sd = np.sqrt(np.maximum(p * (1 - p), 1e-12) / R)
        z = (tot / R - MW) / sd
        # per-coordinate marginal is Bernoulli(p): mean z^2 ~ 1
        assert (z ** 2).mean() < 1.6, (z ** 2).mean()

    def test_tree_tv_matches_sequential(self):
        """Mean TV(W, counts/N) of the tree pairing equals the sequential
        pairing's (identical marginals) on peaked weights at small N —
        to THREE decimal places (round-5 calibration at R=400:
        diff -1.1e-4, MC se(diff) 1.0e-4)."""
        N, R = 1024, 400
        rng = np.random.default_rng(1)
        lw = 3.0 * rng.standard_normal(N)
        W = jnp.asarray(np.exp(lw - lw.max()) / np.exp(lw - lw.max()).sum(),
                        jnp.float32)
        keys = jax.random.split(jax.random.key(5), R)

        def tv(counts_fn):
            def one(key):
                c = counts_fn(key)
                return 0.5 * jnp.sum(jnp.abs(c / N - W))
            return float(jax.jit(jax.vmap(one))(keys).mean())

        tv_seq = tv(lambda k: rs.resampling_counts("ssp", k, W, M=N))
        tv_tree = tv(lambda k: rs._ssp_counts_blocked(k, W, N))
        assert abs(tv_tree - tv_seq) < 5e-4, (tv_tree, tv_seq)

    def test_tree_vs_sequential_joint_law(self):
        """Adversarial (geometric) weights: the two pairings share every
        MARGINAL (count_i ~ floor(Nw_i) + Bernoulli(frac)) but differ in
        the JOINT law, by design — sequential SSP couples adjacent
        indices (adjacent-pair covariance strongly negative, so
        window sums are near-deterministic), while the tree pairing
        couples strided block partners (adjacent covariance ~0, window
        sums much noisier).  Round-5 calibration (Rg=2000): cov_adj
        -0.042 vs -0.0001, var(win64-sum) 0.156 vs 5.56."""
        N, Rg = 1024, 800
        q = 0.99
        Wg = q ** np.arange(N)
        Wg = jnp.asarray(Wg / Wg.sum(), jnp.float32)
        MW = np.asarray(N * np.asarray(Wg, np.float64))
        p = MW - np.floor(MW)
        keys = jax.random.split(jax.random.key(7), Rg)

        def draw(counts_fn):
            return np.asarray(jax.jit(jax.vmap(counts_fn))(keys),
                              np.float64)

        cs_seq = draw(lambda k: rs.resampling_counts("ssp", k, Wg, M=N))
        cs_tree = draw(lambda k: rs._ssp_counts_blocked(k, Wg, N))
        stats = {}
        well = (p > 0.1) & (p < 0.9)
        for name, cs in (("seq", cs_seq), ("tree", cs_tree)):
            v = cs.var(axis=0, ddof=1)
            rel = np.abs(v[well] - (p * (1 - p))[well]) / (p * (1 - p))[well]
            # identical marginals: variance = p(1-p) for BOTH pairings
            assert rel.mean() < 0.10, (name, rel.mean())
            assert rel.max() < 0.50, (name, rel.max())
            cov_adj = np.mean([np.cov(cs[:, i], cs[:, i + 1])[0, 1]
                               for i in range(256)])
            stats[name] = (cov_adj, cs[:, :64].sum(axis=1).var(ddof=1))
        # the documented joint-law deviation
        assert stats["seq"][0] < -0.02, stats
        assert abs(stats["tree"][0]) < 0.01, stats
        assert stats["tree"][1] > 5 * stats["seq"][1], stats

    def test_unaligned_and_degenerate(self):
        # N not a multiple of the block width at every level
        for N in (8192 + 37, 9999):
            rng = np.random.default_rng(N)
            W = jnp.asarray(rng.dirichlet(np.ones(N)), jnp.float32)
            c = np.asarray(rs.resampling_counts(
                "ssp", jax.random.key(0), W, M=N))
            assert c.sum() == N, (N, c.sum())
            assert (c >= 0).all()
        # one-hot weights: all mass on one index
        N = 8192
        W = jnp.zeros(N, jnp.float32).at[1234].set(1.0)
        c = np.asarray(rs.resampling_counts("ssp", jax.random.key(2), W,
                                            M=N))
        assert c[1234] == N and c.sum() == N


class TestSortedGatherServes(TestMultinomialIIDFastPath):
    """Round 5 (VERDICT r4 task 3): the gather-elimination helpers behind
    the FFBS backward pass — ``take_sorted`` (sorted-index gather as an
    inverse-CDF serve), ``take_by_sort`` (sort-serve-unsort for arbitrary
    indices) and ``multinomial_iid_values`` (proposal indices + served
    values in one kernel call).  Interpret-mode kernels vs jnp.take
    oracles.  Inherits the patch/restore machinery."""

    def test_take_sorted_exact(self):
        import jax

        origs = self._patched()
        try:
            N = 2048
            rng = np.random.default_rng(0)
            idx = np.sort(rng.integers(0, N, size=N)).astype(np.int32)
            x = jnp.asarray(rng.normal(size=N), jnp.float32)
            a = jnp.asarray(rng.integers(0, N, size=N), jnp.int32)
            got = rs.take_sorted(jnp.asarray(idx), [x, a])
            np.testing.assert_array_equal(np.asarray(got[0]),
                                          np.asarray(x)[idx])
            np.testing.assert_array_equal(np.asarray(got[1]),
                                          np.asarray(a)[idx])
            assert got[1].dtype == jnp.int32
        finally:
            self._restore(origs)

    def test_take_by_sort_exact(self):
        origs = self._patched()
        try:
            N = 2048
            rng = np.random.default_rng(1)
            idx = rng.integers(0, N, size=N).astype(np.int32)  # unsorted
            x = jnp.asarray(rng.normal(size=N), jnp.float32)
            a = jnp.asarray(rng.integers(0, N, size=N), jnp.int32)
            got = rs.take_by_sort(jnp.asarray(idx), [x, a])
            np.testing.assert_array_equal(np.asarray(got[0]),
                                          np.asarray(x)[idx])
            np.testing.assert_array_equal(np.asarray(got[1]),
                                          np.asarray(a)[idx])
        finally:
            self._restore(origs)

    def test_multinomial_iid_values_matches_indices(self):
        import jax

        origs = self._patched()
        try:
            N = 2048
            rng = np.random.default_rng(2)
            W = rs.exp_and_normalise(
                jnp.asarray(2.0 * rng.normal(size=N), jnp.float32))
            x = jnp.asarray(rng.normal(size=N), jnp.float32)
            key = jax.random.key(5)
            A_plain = np.asarray(rs.multinomial_iid(key, W))
            A, vals = rs.multinomial_iid_values(key, W, [x])
            np.testing.assert_array_equal(np.asarray(A), A_plain)
            np.testing.assert_array_equal(np.asarray(vals[0]),
                                          np.asarray(x)[A_plain])
        finally:
            self._restore(origs)

    def test_su_idx_gate_above_2_23(self):
        """Above ``_SU_IDX_MAX`` (2^23) the integer-stream su trick is
        inexact (``idx + 0.5`` has no f32 representation — an odd idx
        rounds onto ``cs_idx`` and mis-serves by one), so ``take_sorted``
        must NOT attempt the kernel route even when TPU is available."""
        from particles_tpu import ops

        # the inexactness the gate protects against, stated as a fact
        bad = np.float32(rs._SU_IDX_MAX + 1) + np.float32(0.5)
        assert bad == np.float32(rs._SU_IDX_MAX + 2)  # rounded, not x.5

        origs = self._patched()
        orig_plan = ops.make_repeat_plan_su
        calls = []
        ops.make_repeat_plan_su = (
            lambda *a, **k: calls.append(1) or orig_plan(*a, **k))
        try:
            N = rs._SU_IDX_MAX + 1024  # 1024-multiple: only the gate trips
            idx = np.sort(np.random.default_rng(7).integers(
                0, N, size=N)).astype(np.int32)
            x = jnp.arange(N, dtype=jnp.float32)
            got = rs.take_sorted(jnp.asarray(idx), [x])
            assert not calls, "su route attempted above _SU_IDX_MAX"
            np.testing.assert_array_equal(np.asarray(got[0]),
                                          idx.astype(np.float32))
        finally:
            ops.make_repeat_plan_su = orig_plan
            self._restore(origs)

    def test_fallbacks_off_tpu(self):
        """Without the TPU route the helpers are plain gathers."""
        N = 300  # not a 1024-multiple: never routes
        rng = np.random.default_rng(3)
        idx = rng.integers(0, N, size=N).astype(np.int32)
        x = jnp.asarray(rng.normal(size=N), jnp.float32)
        got = rs.take_by_sort(jnp.asarray(idx), [x])
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(x)[idx])
        key = jax.random.key(1)
        W = rs.exp_and_normalise(jnp.asarray(rng.normal(size=N),
                                             jnp.float32))
        A, vals = rs.multinomial_iid_values(key, W, [x], M=128)
        np.testing.assert_array_equal(
            np.asarray(A), np.asarray(rs.multinomial_iid(key, W, 128)))
        np.testing.assert_array_equal(np.asarray(vals[0]),
                                      np.asarray(x)[np.asarray(A)])
