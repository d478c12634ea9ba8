"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4d):
sharded execution must match single-device execution statistically (same
algorithm, different layout)."""

import numpy as np

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
