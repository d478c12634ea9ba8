"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4d):
sharded execution must match single-device execution statistically (same
algorithm, different layout)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import kalman
from particles_tpu import parallel
from particles_tpu import state_space_models as ssms


def setup_lg(T=25):
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    x, y = ssm.simulate(jax.random.key(42), T)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    return ssm, y, float(kf.logLt)


class TestShardedSMC:
    def test_eight_device_particle_sharding(self):
        assert len(jax.devices()) == 8
        ssm, y, exact = setup_lg()
        mesh = parallel.make_mesh(8, ("particles",))
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        res, _ = parallel.run_sharded_smc(
            fk, N=4096, key=jax.random.key(0), mesh=mesh
        )
        assert abs(float(res.logLt) - exact) < 0.5
        # particles and weights keep full global shape
        assert res.lw.shape == (4096,)

    def test_sharded_matches_unsharded_bitwise(self):
        """Same key: sharded result == single-device result (layout only)."""
        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = parallel.make_mesh(8, ("particles",))
        res, _ = parallel.run_sharded_smc(
            fk, N=1024, key=jax.random.key(3), mesh=mesh
        )
        pf = particles.SMC(fk=fk, N=1024, key=jax.random.key(3))
        pf.run()
        np.testing.assert_allclose(
            float(res.logLt), float(pf.logLt), rtol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(res.lw), np.asarray(pf.wgts.lw), rtol=1e-4, atol=1e-5
        )

    def test_2d_mesh_runs_by_particles(self):
        ssm, y, exact = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = parallel.make_mesh(8, ("runs", "particles"), (2, 4))
        logLts, lws = parallel.run_sharded_multismc(
            fk, N=512, nruns=4, key=jax.random.key(0), mesh=mesh
        )
        assert logLts.shape == (4,)
        assert lws.shape == (4, 512)
        assert abs(float(jnp.mean(logLts)) - exact) < 1.0
        assert float(jnp.std(logLts)) > 0


class TestRingResampling:
    """shard_map ring redistribution (parallel/distributed.py): the
    TPU-native distributed resampling deliverable of SURVEY §2b."""

    def _mesh(self):
        return parallel.make_mesh(8, ("particles",))

    def test_ring_matches_single_device_z_path(self):
        """Given identical (lw, x, u), the distributed ring resample is
        EXACTLY the single-device z-form counts path (sorted ancestors)."""
        from jax.sharding import PartitionSpec as P
        from particles_tpu.parallel import distributed as dist
        from particles_tpu import resampling as rs
        from particles_tpu.ops import repeat_by_z

        mesh = self._mesh()
        N, D = 4096, 8
        rng = np.random.default_rng(0)
        lw = jnp.asarray(rng.normal(size=N), jnp.float32)
        x = jnp.asarray(rng.normal(size=N), jnp.float32)
        x2 = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
        u = jnp.float32(0.37)

        def local(xloc, x2loc, lwloc):
            y = dist.ring_systematic_resample(
                {"a": xloc, "b": x2loc}, lwloc, u, N, "particles", D)
            return y["a"], y["b"]

        f = dist._shard_map(
            local, mesh,
            in_specs=(P("particles"), P("particles"), P("particles")),
            out_specs=(P("particles"), P("particles")),
        )
        with mesh:
            got, got2 = jax.jit(f)(x, x2, lw)

        # single-device z-form with the SAME u (bit-match construction:
        # same normalised cumsum association up to the boundary pinning)
        W = rs.exp_and_normalise(lw)
        cs = jnp.cumsum(W)
        cs = cs / cs[-1]
        z = jnp.clip(jnp.floor(N * cs - u).astype(jnp.int32) + 1, 0, N)
        z = z.at[-1].set(N)
        z = jax.lax.associative_scan(jnp.maximum, z)
        want = repeat_by_z(x, z, N)
        want2 = repeat_by_z(x2, z, N)
        assert int(jnp.sum(got != want)) == 0
        assert int(jnp.sum(got2 != want2)) == 0

    def test_ring_extreme_concentration(self):
        """All weight on one source (worst-case imbalance): every output
        must be that source, across all shards."""
        from jax.sharding import PartitionSpec as P
        from particles_tpu.parallel import distributed as dist

        mesh = self._mesh()
        N, D = 1024, 8
        for pos in (0, 700, N - 1):
            lw = jnp.full(N, -jnp.inf).at[pos].set(0.0)
            lw = jnp.where(jnp.isinf(lw), -100.0, lw)  # keep exp finite
            x = jnp.arange(N, dtype=jnp.float32)

            def local(xloc, lwloc):
                return dist.ring_systematic_resample(
                    xloc, lwloc, jnp.float32(0.5), N, "particles", D)

            f = dist._shard_map(
                local, mesh,
                in_specs=(P("particles"), P("particles")),
                out_specs=P("particles"),
            )
            with mesh:
                got = jax.jit(f)(x, lw)
            frac = float(jnp.mean(got == pos))
            assert frac > 0.99, (pos, frac)

    def test_shardmap_filter_matches_kalman(self):
        """Full shard_map filter: logLt unbiased for the exact evidence."""
        ssm, y, exact = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = self._mesh()
        vals = []
        for s in range(3):
            res = parallel.run_shardmap_smc(
                fk, N=4096, key=jax.random.key(s), mesh=mesh)
            vals.append(float(res.logLt))
            assert res.lw.shape == (4096,)
            # unified engine: summaries include step 0 (same as SMC.run)
            assert res.ESSs.shape[0] == int(fk.T)
        assert abs(np.mean(vals) - exact) < 0.6, (vals, exact)

    def test_shardmap_filter_guided(self):
        """The shard_map filter is FK-generic: a guided filter (optimal
        proposal, shard-local) gives the same evidence with lower
        variance than bootstrap at equal N."""
        ssm, y, exact = setup_lg()
        fk = ssms.GuidedPF(ssm=ssm, data=y)
        mesh = self._mesh()
        vals = []
        for s in range(3):
            res = parallel.run_shardmap_smc(
                fk, N=2048, key=jax.random.key(40 + s), mesh=mesh)
            vals.append(float(res.logLt))
        assert abs(np.mean(vals) - exact) < 0.5, (vals, exact)


class TestUnifiedShardmapEngine:
    """Round 3: run_shardmap_smc executes the FULL core engine inside
    shard_map (one engine, shardable).  Same Kalman-oracle tests as the
    single-device engine for bootstrap/guided/APF; collectors, history
    and the documented raises."""

    def _mesh(self):
        return parallel.make_mesh(8, ("particles",))

    def test_apf_matches_kalman(self):
        """APF auxiliary weights (reference core.py:307-313) under
        sharding: previously this silently ran as a guided filter."""
        ssm, y, exact = setup_lg()
        mesh = self._mesh()
        for fkc in (ssms.AuxiliaryPF, ssms.AuxiliaryBootstrap):
            fk = fkc(ssm=ssm, data=y)
            assert fk.isAPF
            vals = []
            for s in range(3):
                res = parallel.run_shardmap_smc(
                    fk, N=2048, key=jax.random.key(60 + s), mesh=mesh)
                vals.append(float(res.logLt))
            assert abs(np.mean(vals) - exact) < 0.6, (fkc.__name__, vals)

    def test_moments_collector_matches_single_device(self):
        from particles_tpu import collectors as col

        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = self._mesh()
        res = parallel.run_shardmap_smc(
            fk, N=1024, key=jax.random.key(7), mesh=mesh,
            collect=[col.Moments()])
        pf = particles.SMC(fk=fk, N=1024, key=jax.random.key(3),
                           collect=[col.Moments()])
        pf.run()
        dm = np.asarray(res.moments["mean"])
        sm = np.asarray(pf.summaries.moments["mean"])
        assert dm.shape == sm.shape
        # different keys: agreement within Monte-Carlo error
        assert np.abs(dm - sm).max() < 0.25

    def test_history_full_with_global_genealogy(self):
        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        res = parallel.run_shardmap_smc(
            fk, N=1024, key=jax.random.key(9), mesh=self._mesh(),
            store_history=True)
        T = int(fk.T)
        assert res.hist.X.shape == (T, 1024)
        A = np.asarray(res.hist.A)
        assert A.shape == (T, 1024) and A.min() >= 0 and A.max() < 1024
        # the history is consumable by the smoothing layer (global indices)
        traj = res.hist.backward_sampling_mcmc(jax.random.key(0), 4)
        assert traj.shape == (T, 4)
        assert np.isfinite(np.asarray(traj)).all()

    def test_history_rolling_and_partial(self):
        from particles_tpu import smoothing

        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = self._mesh()
        res = parallel.run_shardmap_smc(
            fk, N=512, key=jax.random.key(1), mesh=mesh, store_history=4)
        assert isinstance(res.hist, smoothing.RollingParticleHistory)
        assert res.hist.T == 4 and res.hist.X[0].shape == (512,)
        res2 = parallel.run_shardmap_smc(
            fk, N=512, key=jax.random.key(1), mesh=mesh,
            store_history=lambda t: t % 5 == 0)
        assert isinstance(res2.hist, smoothing.PartialParticleHistory)
        assert sorted(res2.hist.X) == [t for t in range(int(fk.T))
                                       if t % 5 == 0]

    def test_documented_raises(self):
        from particles_tpu import collectors as col

        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = self._mesh()
        with pytest.raises(NotImplementedError, match="power of two"):
            parallel.run_shardmap_smc(fk, N=768, mesh=mesh, qmc=True)
        with pytest.raises(NotImplementedError, match="resampling"):
            parallel.run_shardmap_smc(fk, N=512, mesh=mesh,
                                      resampling="ssp")
        with pytest.raises(NotImplementedError, match="collector"):
            parallel.run_shardmap_smc(
                fk, N=512, mesh=mesh,
                collect=[col.Online_smooth_naive(phi=lambda x: x)])

    def test_single_device_engine_unchanged(self):
        """No ambient context: the dist-aware numerics reduce locally, so
        the single-device engine is bit-identical to a plain run."""
        from particles_tpu import distctx

        assert distctx.current() is None
        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf1 = particles.SMC(fk=fk, N=256, key=jax.random.key(5))
        pf1.run()
        pf2 = particles.SMC(fk=fk, N=256, key=jax.random.key(5))
        pf2.run()
        assert float(pf1.logLt) == float(pf2.logLt)


class TestDistributedSQMC:
    """Round 3: SQMC under particle sharding (parallel/dqmc.py) — sharded
    sorted-Sobol generation, ring merge-rank resampling, distributed
    odd-even Hilbert merge.  The distributed run must match the
    single-device SQMC engine (same key, same global point set) to float
    reduction-order tolerance."""

    def _mesh(self):
        return parallel.make_mesh(8, ("particles",))

    def test_dist_sort_with_matches_global_sort(self):
        """Primitive: odd-even block transposition == one global sort."""
        from jax.sharding import PartitionSpec as P
        from particles_tpu.parallel import dqmc
        from particles_tpu.parallel import distributed as dist

        mesh = self._mesh()
        keys = jax.random.normal(jax.random.key(0), (1024,))
        # duplicate keys exercise the canonical-order tie handling
        keys = jnp.round(keys * 10) / 10
        payload = jnp.arange(1024, dtype=jnp.float32)

        def local(k, p):
            (ks,), (ps,) = dqmc.dist_sort_with((k,), (p,), "particles", 8)
            return ks, ps

        f = jax.jit(
            dist._shard_map(
                local, mesh,
                in_specs=(P("particles"), P("particles")),
                out_specs=(P("particles"), P("particles")),
            )
        )
        with mesh:
            ks, ps = f(keys, payload)
        order = np.argsort(np.asarray(keys), kind="stable")
        np.testing.assert_array_equal(np.asarray(ks),
                                      np.asarray(keys)[order])
        np.testing.assert_array_equal(np.asarray(ps),
                                      np.asarray(payload)[order])

    def test_sqmc_matches_single_device(self):
        """Same key: the distributed SQMC filter reproduces the
        single-device SQMC filter (layout/reduction-order only)."""
        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf = particles.SMC(fk=fk, N=1024, qmc=True, key=jax.random.key(11))
        pf.run()
        res = parallel.run_shardmap_smc(
            fk, N=1024, key=jax.random.key(11), mesh=self._mesh(),
            qmc=True)
        assert abs(float(res.logLt) - float(pf.logLt)) < 1e-3, (
            float(res.logLt), float(pf.logLt))
        np.testing.assert_allclose(
            np.asarray(res.ESSs), np.asarray(pf.summaries.ESSs),
            rtol=1e-3)

    def test_sqmc_matches_kalman(self):
        ssm, y, exact = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        res = parallel.run_shardmap_smc(
            fk, N=512, key=jax.random.key(4), mesh=self._mesh(), qmc=True)
        assert abs(float(res.logLt) - exact) < 0.3, (float(res.logLt),
                                                     exact)

    def test_sqmc_guided_and_apf(self):
        """FK-generic: guided + APF (the logeta payload rides the ring)."""
        ssm, y, exact = setup_lg()
        mesh = self._mesh()
        for fkc in (ssms.GuidedPF, ssms.AuxiliaryPF):
            fk = fkc(ssm=ssm, data=y)
            res = parallel.run_shardmap_smc(
                fk, N=512, key=jax.random.key(21), mesh=mesh, qmc=True)
            assert abs(float(res.logLt) - exact) < 0.35, (
                fkc.__name__, float(res.logLt), exact)

    def test_sqmc_multivariate(self):
        """d=3 state: the distributed Hilbert keys (psum standardisation
        + odd-even merge) against the exact Kalman evidence."""
        mv = kalman.MVLinearGauss_Guarniero_etal(alpha=0.4, dx=3)
        _, y = mv.simulate(jax.random.key(7), 15)
        kf = kalman.Kalman(ssm=mv, data=y)
        kf.filter()
        fk = ssms.Bootstrap(ssm=mv, data=y)
        res = parallel.run_shardmap_smc(
            fk, N=1024, key=jax.random.key(8), mesh=self._mesh(), qmc=True)
        assert abs(float(res.logLt) - float(kf.logLt)) < 0.5

    def test_sqmc_history_global_genealogy(self):
        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        res = parallel.run_shardmap_smc(
            fk, N=512, key=jax.random.key(9), mesh=self._mesh(), qmc=True,
            store_history=True)
        T = int(fk.T)
        assert res.hist.X.shape == (T, 512)
        A = np.asarray(res.hist.A)
        assert A.shape == (T, 512) and A.min() >= 0 and A.max() < 512
        traj = res.hist.backward_sampling_mcmc(jax.random.key(0), 4)
        assert np.isfinite(np.asarray(traj)).all()
        # regression: the distributed-SQMC history stores frames in global
        # Hilbert order and must say so, or QMC FFBS rejects a valid input
        assert res.hist.hilbert_ordered is True
        tq = res.hist.backward_sampling_qmc(jax.random.key(1), 4)
        assert np.isfinite(np.asarray(tq)).all()


class TestPallasNeverUnderGSPMD:
    """Guardrail (VERDICT r2 #7): the GSPMD path must never trace a
    pallas_call into a partitioned program — GSPMD cannot partition
    custom-calls, so this would be a multichip crash."""

    def test_sharded_run_never_builds_repeat_plan(self, monkeypatch):
        from particles_tpu import ops

        def boom(*a, **k):
            raise AssertionError(
                "make_repeat_plan traced under GSPMD sharding")

        monkeypatch.setattr(ops, "make_repeat_plan", boom)
        ssm, y, exact = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = parallel.make_mesh(8, ("particles",))
        res, _ = parallel.run_sharded_smc(
            fk, N=1024, key=jax.random.key(0), mesh=mesh)
        assert abs(float(res.logLt) - exact) < 1.0


class TestShardedHistoryObjects:
    """Round 3: the GSPMD driver returns ready-to-use history objects
    (parity with the shard_map driver and the single-device engine)."""

    def test_full_history_object(self):
        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = parallel.make_mesh(8, ("particles",))
        res, raw = parallel.run_sharded_smc(
            fk, N=512, key=jax.random.key(2), mesh=mesh,
            store_history=True)
        T = int(fk.T)
        assert res.hist.X.shape == (T, 512)
        traj = res.hist.backward_sampling_mcmc(jax.random.key(0), 4)
        assert np.isfinite(np.asarray(traj)).all()
        assert raw is not None  # back-compat raw frames

    def test_rolling_history_object(self):
        from particles_tpu import smoothing

        ssm, y, _ = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = parallel.make_mesh(8, ("particles",))
        res, raw = parallel.run_sharded_smc(
            fk, N=512, key=jax.random.key(2), mesh=mesh, store_history=3)
        assert isinstance(res.hist, smoothing.RollingParticleHistory)
        assert res.hist.T == 3
        assert raw is None


class TestRingSchemes:
    """Round 4: stratified and multinomial rings (VERDICT r3 task 8).

    Stratified's per-output uniforms become counter-based (a pure
    function of the global output index, identical on every shard);
    multinomial's shared sorted-uniform set is generated with zero
    communication by the order-statistics decomposition (replicated Beta
    chain for the (D-1) boundary order stats + shard-local scaled
    spacings) and served by the SQMC merge ring.
    """

    def _mesh(self):
        return parallel.make_mesh(8, ("particles",))

    def test_stratified_ring_matches_counter_oracle(self):
        """The ring's served output equals a single-device serve by the
        SAME z formula (counter-based uniforms, global cumsum)."""
        from jax.sharding import PartitionSpec as P
        from particles_tpu.parallel import distributed as dist
        from particles_tpu.ops import repeat_by_z

        mesh = self._mesh()
        N, D = 4096, 8
        rng = np.random.default_rng(1)
        lw = jnp.asarray(rng.normal(size=N), jnp.float32)
        x = jnp.asarray(rng.normal(size=N), jnp.float32)
        key = jax.random.key(7)

        def local(lw_loc, x_loc):
            y, A = dist.ring_stratified_resample(
                {"x": x_loc}, lw_loc, key, N, "particles", D,
                return_ancestors=True)
            return y["x"], A

        f = dist._shard_map(local, mesh,
                            in_specs=(P("particles"), P("particles")),
                            out_specs=(P("particles"), P("particles")))
        y, A = jax.jit(f)(lw, x)

        # single-device oracle replicating the ring's math in f32 (shard
        # association of the normaliser, counter-based uniforms)
        w = jnp.exp(lw - jnp.max(lw))
        wD = w.reshape(D, -1)
        cum = jnp.cumsum(wD, axis=1)
        shard_sums = cum[:, -1]
        S = jnp.sum(shard_sums)
        prefix = jnp.cumsum(shard_sums) - shard_sums
        cs = (cum + prefix[:, None]).reshape(-1)
        g = jnp.float32(N) * cs / S
        k = jnp.floor(g).astype(jnp.int32)
        uk = dist._counter_uniforms(key, jnp.clip(k, 0, N - 1))
        z = jnp.where(k >= N, N, k + (uk <= g - k).astype(jnp.int32))
        z = jax.lax.associative_scan(jnp.maximum, jnp.clip(z, 0, N))
        z = z.at[-1].set(N)
        y_ref = np.asarray(repeat_by_z(x, z, N))
        A_ref = np.repeat(np.arange(N), np.diff(np.asarray(z), prepend=0))
        assert np.array_equal(np.asarray(A), A_ref)
        assert np.array_equal(np.asarray(y), y_ref)

    def test_multinomial_ring_distribution(self):
        """Unbiasedness of the ring multinomial counts: mean offspring of
        each particle ~ M * W over replicates."""
        from jax.sharding import PartitionSpec as P
        from particles_tpu.parallel import distributed as dist

        mesh = self._mesh()
        N, D, R = 512, 8, 200
        rng = np.random.default_rng(2)
        lw = jnp.asarray(rng.normal(size=N) * 1.5, jnp.float32)

        def local(lw_loc, key):
            _, A = dist.ring_multinomial_resample(
                {"x": jnp.zeros(N // D)}, lw_loc, key, N, "particles", D,
                return_ancestors=True)
            return A

        f = dist._shard_map(
            local, mesh, in_specs=(P("particles"), P()),
            out_specs=P("particles"))
        fj = jax.jit(lambda lw, keys: jax.vmap(
            lambda k: f(lw, k))(keys))
        A_all = np.asarray(fj(lw, jax.random.split(jax.random.key(0), R)))
        # ancestors sorted (sorted-uniform merge) and in range
        assert (np.diff(A_all, axis=1) >= 0).all()
        counts = np.zeros((R, N), np.int64)
        for r in range(R):
            counts[r] = np.bincount(A_all[r], minlength=N)
        W = np.exp(np.asarray(lw) - np.asarray(lw).max())
        W /= W.sum()
        mean = counts.mean(axis=0)
        se = np.sqrt(np.maximum(N * W, 0.05) / R)
        assert np.all(np.abs(mean - N * W) < 6 * se + 0.1), np.abs(
            mean - N * W).max()

    def test_shardmap_smc_stratified_and_multinomial(self):
        """End-to-end sharded filters under the new rings match the
        Kalman oracle within MC tolerance."""
        ssm, y, exact = setup_lg()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        mesh = self._mesh()
        for scheme in ("stratified", "multinomial"):
            res = parallel.run_shardmap_smc(
                fk, N=4096, key=jax.random.key(11), mesh=mesh,
                resampling=scheme)
            assert abs(float(res.logLt) - exact) < 0.6, (
                scheme, float(res.logLt), exact)


class TestShardedSamplers:
    """Round 5 (VERDICT r4 task 1): the SMC-sampler stack on the mesh —
    ``run_shardmap_smc`` routes ``is_sampler`` FKs through the sharded
    stepping engine (waste-free M*P -> M ring resample, particle-parallel
    chain moves, gathered adaptive-tempering solve)."""

    def _mesh(self):
        return parallel.make_mesh(8, ("particles",))

    @staticmethod
    def _conjugate_model(T=40):
        """Gaussian location target with closed-form evidence."""
        from particles_tpu import distributions as dists
        from particles_tpu import smc_samplers as ssp

        class GaussTarget(ssp.StaticModel):
            def logpyt(self, theta, t):
                return (-0.5 * jnp.log(2 * jnp.pi)
                        - 0.5 * (self.data[t] - theta["m"]) ** 2)

        rng = np.random.default_rng(0)
        dat = jnp.asarray(rng.normal(loc=0.7, size=T), jnp.float32)
        prior = dists.StructDist({"m": dists.Normal(scale=2.0)})
        model = GaussTarget(data=dat, prior=prior)
        tau2 = 4.0
        C = np.eye(T) + tau2 * np.ones((T, T))
        _, ld = np.linalg.slogdet(C)
        yv = np.asarray(dat, np.float64)
        exact = (-0.5 * T * np.log(2 * np.pi) - 0.5 * ld
                 - 0.5 * yv @ np.linalg.inv(C) @ yv)
        return model, float(exact)

    def test_ring_waste_free_shape_change_exact(self):
        """M != N ring serve (the waste-free resample): bit-matches the
        single-device z-form with the same uniform."""
        from jax.sharding import PartitionSpec as P
        from particles_tpu.parallel import distributed as dist
        from particles_tpu import resampling as rs
        from particles_tpu.ops import repeat_by_z

        mesh = self._mesh()
        N0, M, D = 4096, 512, 8
        rng = np.random.default_rng(5)
        lw = jnp.asarray(rng.normal(size=N0), jnp.float32)
        x = jnp.asarray(rng.normal(size=N0), jnp.float32)
        u = jnp.float32(0.61)

        def local(xloc, lwloc):
            return dist.ring_systematic_resample(
                {"a": xloc}, lwloc, u, M, "particles", D)["a"]

        f = dist._shard_map(
            local, mesh, in_specs=(P("particles"), P("particles")),
            out_specs=P("particles"))
        with mesh:
            got = jax.jit(f)(x, lw)
        assert got.shape == (M,)
        W = rs.exp_and_normalise(lw)
        cs = jnp.cumsum(W)
        cs = cs / cs[-1]
        z = jnp.clip(jnp.floor(M * cs - u).astype(jnp.int32) + 1, 0, M)
        z = z.at[-1].set(M)
        z = jax.lax.associative_scan(jnp.maximum, z)
        want = repeat_by_z(x, z, M)
        assert int(jnp.sum(got != want)) == 0

    def test_adaptive_tempering_matches_exact_evidence(self):
        from particles_tpu import smc_samplers as ssp

        model, exact = self._conjugate_model()
        mesh = self._mesh()
        vals, nsteps = [], []
        for s in range(3):
            fk = ssp.AdaptiveTempering(model=model, len_chain=10)
            res = parallel.run_shardmap_smc(
                fk, N=128, key=jax.random.key(s), mesh=mesh)
            vals.append(float(res.logLt))
            nsteps.append(res.t)
            assert float(res.X.shared["exponent"]) >= 1.0
        assert abs(np.mean(vals) - exact) < 0.8, (vals, exact)
        # the adaptive path matches the single-device engine's step count
        pf = particles.SMC(
            fk=ssp.AdaptiveTempering(model=model, len_chain=10),
            N=128, key=jax.random.key(0))
        pf.run()
        assert pf.t in nsteps or abs(pf.t - nsteps[0]) <= 1

    def test_ibis_matches_exact_evidence_and_collectors(self):
        from particles_tpu import collectors as col
        from particles_tpu import smc_samplers as ssp

        model, exact = self._conjugate_model()
        mesh = self._mesh()
        fk = ssp.IBIS(model=model, len_chain=10)
        res = parallel.run_shardmap_smc(
            fk, N=128, key=jax.random.key(1), mesh=mesh,
            collect=[col.Moments()], store_history=True)
        assert abs(float(res.logLt) - exact) < 1.0
        T = model.T
        assert len(res.summaries.ESSs) == T
        assert len(res.summaries.moments) == T
        post_mean = float(res.summaries.moments[-1]["mean"]["m"])
        # exact posterior mean of m: tau2/(T*tau2+1) * sum(y)
        want = 4.0 * float(np.sum(np.asarray(model.data))) / (T * 4.0 + 1.0)
        assert abs(post_mean - want) < 0.2, (post_mean, want)
        assert res.hist.T == T

    def test_sampler_resampling_schemes(self):
        from particles_tpu import smc_samplers as ssp

        model, exact = self._conjugate_model()
        mesh = self._mesh()
        for scheme in ("stratified", "multinomial"):
            fk = ssp.AdaptiveTempering(model=model, len_chain=10)
            res = parallel.run_shardmap_smc(
                fk, N=128, key=jax.random.key(4), mesh=mesh,
                resampling=scheme)
            assert abs(float(res.logLt) - exact) < 1.2, (
                scheme, float(res.logLt), exact)

    def test_ns_smc_matches_exact_evidence(self):
        """Round 5: NS-SMC on the mesh — its percentile level, evidence
        reductions and shrinkage count run on ONE gathered (N0,) llik
        (a shard-local percentile would be silently wrong)."""
        from particles_tpu import nested

        model, exact = self._conjugate_model()
        mesh = self._mesh()
        vals, steps = [], []
        for s in range(3):
            fk = nested.NestedSamplingSMC(model=model, len_chain=5,
                                          ESSrmin=0.3, eps=0.01)
            res = parallel.run_shardmap_smc(
                fk, N=128, key=jax.random.key(s), mesh=mesh)
            vals.append(float(res.X.shared["log_evid"]))
            steps.append(res.t)
            assert np.isinf(float(res.X.shared["lt"]))
        assert abs(np.mean(vals) - exact) < 1.0, (vals, exact)
        # single-device runs terminate at a comparable level count
        pf = particles.SMC(
            fk=nested.NestedSamplingSMC(model=model, len_chain=5,
                                        ESSrmin=0.3, eps=0.01),
            N=128, key=jax.random.key(0))
        pf.run()
        assert abs(pf.t - np.mean(steps)) <= max(3, 0.3 * pf.t), \
            (pf.t, steps)

    def test_sampler_documented_raises(self):
        from particles_tpu import smc_samplers as ssp

        model, _ = self._conjugate_model()
        mesh = self._mesh()
        fk = ssp.AdaptiveTempering(model=model, len_chain=10)
        with pytest.raises(NotImplementedError, match="resampling"):
            parallel.run_shardmap_smc(fk, N=128, mesh=mesh,
                                      resampling="ssp")
        with pytest.raises(NotImplementedError, match="qmc"):
            parallel.run_shardmap_smc(fk, N=128, mesh=mesh, qmc=True)


class TestShardedSMC2:
    """Round 5 (final): SMC² with the THETA-particle axis sharded over
    the mesh — the reference's heaviest published workload
    (smc_samplers.py:1038-1167, the "~2 h" study class) on the same
    sharded stepping engine as IBIS/tempering.  Each shard advances its
    slice of the vmapped inner bootstrap filters (their (Nx,) weight
    reductions stay theta-local via distctx.local_context); the
    theta-resample ring-serves whole inner-filter pytrees (xs, lws and
    the uint32-bitcast pf_key ride the ppermute ring); the host-side
    exchange step (Nx doubling) replays sharded inner filters through
    GSPMD."""

    def _mesh(self):
        return parallel.make_mesh(8, ("particles",))

    @staticmethod
    def _lg_setup(T=12):
        from particles_tpu import distributions as dists
        from particles_tpu import kalman

        true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
        _, y = true.simulate(jax.random.key(0), T)

        class LGfixed(kalman.LinearGauss):
            default_params = {
                "sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0, "sigma0": None
            }

        prior = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
        # oracle: marginal evidence + posterior mean by grid quadrature
        grid = np.linspace(-0.985, 0.985, 80)
        lls = []
        for r in grid:
            kf = kalman.Kalman(ssm=LGfixed(rho=float(r)), data=y)
            kf.filter()
            lls.append(float(kf.logLt))
        lls = np.array(lls)
        from scipy.special import logsumexp

        prior_dens = 1.0 / (2 * 0.99)
        exact_ev = logsumexp(lls) + np.log(prior_dens * (grid[1] - grid[0]))
        post = np.exp(lls - lls.max())
        post /= post.sum()
        exact_pmean = float(np.sum(post * grid))
        return LGfixed, prior, y, float(exact_ev), exact_pmean

    def test_evidence_and_posterior_match_oracle(self):
        from particles_tpu import smc_samplers as ssp

        LGfixed, prior, y, exact_ev, exact_pmean = self._lg_setup()
        mesh = self._mesh()
        logLts, means = [], []
        for s in range(4):
            fk = ssp.SMC2(ssm_cls=LGfixed, prior=prior, data=y,
                          init_Nx=150, len_chain=4)
            res = parallel.run_shardmap_smc(
                fk, N=152, key=jax.random.key(s), mesh=mesh)
            assert res.t == y.shape[0]
            logLts.append(float(res.logLt))
            W = np.asarray(res.W)
            means.append(float(np.sum(W * np.asarray(res.X.theta["rho"]))))
        assert abs(np.mean(logLts) - exact_ev) < 0.4, (logLts, exact_ev)
        assert abs(np.mean(means) - exact_pmean) < 0.25, (means, exact_pmean)

    def test_exchange_doubles_nx_and_stays_sane(self):
        from particles_tpu import smc_samplers as ssp

        LGfixed, prior, y, _, _ = self._lg_setup(T=10)
        mesh = self._mesh()
        # absurd threshold forces an exchange at every resample-move step
        fk = ssp.SMC2(ssm_cls=LGfixed, prior=prior, data=y, init_Nx=16,
                      len_chain=3, ar_to_increase_Nx=0.95)
        res = parallel.run_shardmap_smc(
            fk, N=64, key=jax.random.key(3), mesh=mesh)
        assert res.X.xs.shape[-1] > 16  # Nx was doubled at least once
        assert np.isfinite(float(res.logLt))
        assert float(res.wgts.ESS) > 1.0

    def test_waste_free_smc2(self):
        """Waste-free SMC² (M*P theta particles): the ring's M != N0
        shape change serves whole inner-filter pytrees."""
        from particles_tpu import smc_samplers as ssp

        LGfixed, prior, y, exact_ev, _ = self._lg_setup()
        mesh = self._mesh()
        vals = []
        for s in range(3):
            fk = ssp.SMC2(ssm_cls=LGfixed, prior=prior, data=y,
                          init_Nx=100, wastefree=True, len_chain=4)
            res = parallel.run_shardmap_smc(
                fk, N=64, key=jax.random.key(s), mesh=mesh)
            assert res.X.N == 64 * 4  # N0 = M * len_chain
            vals.append(float(res.logLt))
        assert abs(np.mean(vals) - exact_ev) < 0.6, (vals, exact_ev)


class TestChainsTimesDevices:
    """Round 5 (VERDICT r4 task 4): nchains sharded over the mesh's
    chain axis — per-chain results must match the vmapped single-device
    path to ulp-level tolerance (chains are independent and consume the
    identical key streams; GSPMD only changes placement, but XLA's
    per-partition codegen may reassociate within-chain reductions by an
    ulp)."""

    def test_multichain_pmmh_sharded_matches_vmapped(self):
        from particles_tpu import distributions as dists
        from particles_tpu import mcmc
        from particles_tpu import state_space_models as ssms

        true = ssms.StochVol(mu=-1.0, rho=0.9, sigma=0.3)
        _, y = true.simulate(jax.random.key(0), 20)
        prior = dists.StructDist({
            "mu": dists.Normal(scale=2.0),
            "rho": dists.Uniform(a=-0.99, b=0.99),
            "sigma": dists.Gamma(a=2.0, b=4.0),
        })
        kw = dict(ssm_cls=ssms.StochVol, prior=prior, data=y, Nx=24,
                  niter=30, nchains=8, key=jax.random.key(1))
        m_ref = mcmc.PMMH(**kw)
        m_ref.run()
        mesh = parallel.make_mesh(8, ("chains",))
        m_sh = mcmc.PMMH(mesh=mesh, **kw)
        m_sh.run()
        for p in m_ref.chain.theta:
            np.testing.assert_allclose(
                np.asarray(m_ref.chain.theta[p]),
                np.asarray(m_sh.chain.theta[p]), rtol=2e-5, atol=2e-5,
                err_msg=p)
        # same accept/reject path (an ulp flip would diverge the chains)
        np.testing.assert_array_equal(np.asarray(m_ref.nacc),
                                      np.asarray(m_sh.nacc))

    def test_multichain_rwhm_sharded(self):
        from particles_tpu import distributions as dists
        from particles_tpu import smc_samplers as ssp
        from particles_tpu import mcmc

        class GaussTarget(ssp.StaticModel):
            def logpyt(self, theta, t):
                return (-0.5 * jnp.log(2 * jnp.pi)
                        - 0.5 * (self.data[t] - theta["m"]) ** 2)

        rng = np.random.default_rng(3)
        dat = jnp.asarray(rng.normal(size=30), jnp.float32)
        prior = dists.StructDist({"m": dists.Normal(scale=2.0)})
        model = GaussTarget(data=dat, prior=prior)
        mesh = parallel.make_mesh(8, ("chains",))
        m = mcmc.BasicRWHM(model=model, niter=200, nchains=8, mesh=mesh,
                           key=jax.random.key(2))
        m.run()
        dg = m.diagnostics()
        assert np.isfinite(dg["m"]["ess"])
        # posterior mean sanity vs the conjugate posterior
        T = 30
        want = 4.0 * float(np.sum(np.asarray(dat))) / (T * 4.0 + 1.0)
        got = float(np.mean(np.asarray(m.chain.theta["m"])[50:]))
        assert abs(got - want) < 0.2, (got, want)

    def test_nchains_not_divisible_raises(self):
        from particles_tpu import distributions as dists
        from particles_tpu import smc_samplers as ssp
        from particles_tpu import mcmc

        class GaussTarget(ssp.StaticModel):
            def logpyt(self, theta, t):
                return -0.5 * (self.data[t] - theta["m"]) ** 2

        dat = jnp.zeros(5, jnp.float32)
        prior = dists.StructDist({"m": dists.Normal(scale=2.0)})
        model = GaussTarget(data=dat, prior=prior)
        mesh = parallel.make_mesh(8, ("chains",))
        m = mcmc.BasicRWHM(model=model, niter=10, nchains=3, mesh=mesh,
                           key=jax.random.key(2))
        with pytest.raises(ValueError, match="divisible"):
            m.run()


class TestShardedFFBS:
    """Round 5 (VERDICT r4 task 6): FFBS-MCMC with the history sharded
    over the particle axis — the memory-motivated path (a full history at
    N=2^20, T=10^3 is ~4 GB/column, near single-chip HBM).  The sharded
    pass targets the same smoothing law (iid proposals are exchangeable
    across shards); parity is statistical, vs the exact Kalman smoother
    AND the single-device pass."""

    def test_matches_kalman_and_single_device(self):
        ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.3)
        _, y = ssm.simulate(jax.random.key(7), 20)
        kf = kalman.Kalman(ssm=ssm, data=y)
        kf.smoother()
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf = particles.SMC(fk=fk, N=2048, key=jax.random.key(1),
                           store_history=True)
        pf.run()
        mesh = parallel.make_mesh(8, ("particles",))
        M = 1600
        paths = parallel.sharded_backward_mcmc(
            pf.hist, jax.random.key(3), M, mesh, nsteps=2)
        assert paths.shape == (20, M)
        means = np.asarray(jnp.mean(paths, axis=1))
        exact = np.asarray(kf.smth.mean)[:, 0]
        np.testing.assert_allclose(means, exact, atol=0.12)
        stds = np.asarray(jnp.std(paths, axis=1))
        exact_std = np.sqrt(np.asarray(kf.smth.cov)[:, 0, 0])
        np.testing.assert_allclose(stds, exact_std, atol=0.12)
        # same history, single-device pass: same law
        single = pf.hist.backward_sampling_mcmc(
            jax.random.key(3), M, nsteps=2)
        np.testing.assert_allclose(
            means, np.asarray(jnp.mean(single, axis=1)), atol=0.15)

    def test_multivariate_state(self):
        # (N, d) leaves: gathers/serves along axis 0 only
        ssm = kalman.MVLinearGauss(
            F=np.eye(2) * 0.8, G=np.eye(2), covX=np.eye(2),
            covY=np.eye(2) * 0.25)
        _, y = ssm.simulate(jax.random.key(2), 8)
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf = particles.SMC(fk=fk, N=1024, key=jax.random.key(4),
                           store_history=True)
        pf.run()
        mesh = parallel.make_mesh(8, ("particles",))
        paths = parallel.sharded_backward_mcmc(
            pf.hist, jax.random.key(5), 800, mesh)
        assert paths.shape == (8, 800, 2)
        kf = kalman.Kalman(ssm=ssm, data=y)
        kf.smoother()
        np.testing.assert_allclose(
            np.asarray(jnp.mean(paths, axis=1)),
            np.asarray(kf.smth.mean), atol=0.2)

    def test_m_not_divisible_raises(self):
        ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.3)
        _, y = ssm.simulate(jax.random.key(7), 5)
        fk = ssms.Bootstrap(ssm=ssm, data=y)
        pf = particles.SMC(fk=fk, N=256, key=jax.random.key(1),
                           store_history=True)
        pf.run()
        mesh = parallel.make_mesh(8, ("particles",))
        with pytest.raises(ValueError, match="divisible"):
            parallel.sharded_backward_mcmc(
                pf.hist, jax.random.key(3), 100, mesh)
