"""Multi-chip SMC: one engine, particle-sharded over a device mesh.

No reference counterpart (nchopin/particles parallelises with a
communication-free joblib pool, utils.py:158-186).  This example runs
the SAME algorithms as the single-device scripts with their particle
axis sharded over an 8-device `jax.sharding.Mesh` via
`parallel.run_shardmap_smc` — on this machine a *virtual* 8-device CPU
mesh (the code is identical on 8 real TPU chips; the collective budget
per step is pinned by `tests/test_collective_budget.py`):

1. a bootstrap filter, checked against the exact Kalman log-likelihood,
2. adaptive tempering (waste-free), checked against the closed-form
   conjugate evidence,
3. SMC² with the theta axis sharded — every shard advances its slice of
   the inner particle filters; theta-resampling ring-serves whole
   inner-filter states — checked against grid-quadrature evidence.
"""

# allow running directly from a source checkout; force a virtual
# 8-device CPU mesh BEFORE jax initialises (no-op under pytest, whose
# conftest already did this)
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)
if "xla_force_host_platform_device_count" not in _os.environ.get(
        "XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (_os.environ.get("XLA_FLAGS", "")
                                + " --xla_force_host_platform_device_count=8"
                                ).strip()

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import particles_tpu as particles  # noqa: E402
from particles_tpu import distributions as dists  # noqa: E402
from particles_tpu import kalman, parallel  # noqa: E402
from particles_tpu import smc_samplers as ssp  # noqa: E402
from particles_tpu import state_space_models as ssms  # noqa: E402


def main(small=False):
    D = 8
    if len(jax.devices()) < D:
        print(f"needs {D} devices (got {len(jax.devices())}); skipping")
        return
    mesh = parallel.make_mesh(D, ("particles",))
    T = 20 if small else 100
    N = 256 if small else 4096

    # --- 1. sharded bootstrap filter vs the Kalman oracle -------------
    ssm = kalman.LinearGauss(rho=0.9, sigmaX=1.0, sigmaY=0.2)
    _, y = ssm.simulate(jax.random.key(0), T)
    kf = kalman.Kalman(ssm=ssm, data=y)
    kf.filter()
    exact = float(kf.logLt)
    fk = ssms.Bootstrap(ssm=ssm, data=y)
    res = parallel.run_shardmap_smc(fk, N=N, key=jax.random.key(1),
                                    mesh=mesh)
    err = float(res.logLt) - exact
    print(f"sharded bootstrap filter: logLt {float(res.logLt):.3f} "
          f"(Kalman {exact:.3f}, err {err:+.3f})")
    assert abs(err) < 20.0 / np.sqrt(N), (err, N)

    # --- 2. sharded adaptive tempering vs conjugate evidence ----------
    class GaussTarget(ssp.StaticModel):
        def logpyt(self, theta, t):
            return (-0.5 * np.log(2 * np.pi)
                    - 0.5 * (self.data[t] - theta["m"]) ** 2)

    Td = 30
    rng = np.random.default_rng(0)
    dat = np.asarray(rng.normal(loc=0.7, size=Td), np.float32)
    prior = dists.StructDist({"m": dists.Normal(scale=2.0)})
    model = GaussTarget(data=dat, prior=prior)
    tau2 = 4.0
    C = np.eye(Td) + tau2 * np.ones((Td, Td))
    _, ld = np.linalg.slogdet(C)
    yv = np.asarray(dat, np.float64)
    exact_ev = float(-0.5 * Td * np.log(2 * np.pi) - 0.5 * ld
                     - 0.5 * yv @ np.linalg.inv(C) @ yv)
    fk_t = ssp.AdaptiveTempering(model=model, len_chain=8)
    res_t = parallel.run_shardmap_smc(
        fk_t, N=128 if small else 512, key=jax.random.key(2), mesh=mesh)
    print(f"sharded adaptive tempering: log-evidence "
          f"{float(res_t.logLt):.3f} (exact {exact_ev:.3f}), "
          f"{res_t.t} tempering steps")
    assert abs(float(res_t.logLt) - exact_ev) < 1.5

    # --- 3. sharded SMC² vs grid-quadrature evidence -------------------
    true = kalman.LinearGauss(rho=0.8, sigmaX=1.0, sigmaY=0.5)
    _, y2 = true.simulate(jax.random.key(3), 10 if small else 30)

    class LGfixed(kalman.LinearGauss):
        default_params = {"sigmaY": 0.5, "rho": 0.9, "sigmaX": 1.0,
                          "sigma0": None}

    prior2 = dists.StructDist({"rho": dists.Uniform(a=-0.99, b=0.99)})
    grid = np.linspace(-0.985, 0.985, 60)
    lls = []
    for r in grid:
        kf2 = kalman.Kalman(ssm=LGfixed(rho=float(r)), data=y2)
        kf2.filter()
        lls.append(float(kf2.logLt))
    lls = np.asarray(lls)
    from scipy.special import logsumexp

    exact_ev2 = float(logsumexp(lls)
                      + np.log((1 / 1.98) * (grid[1] - grid[0])))
    post = np.exp(lls - lls.max())
    post /= post.sum()
    exact_pm = float(np.sum(post * grid))
    fk_s2 = ssp.SMC2(ssm_cls=LGfixed, prior=prior2, data=y2,
                     init_Nx=64 if small else 128, len_chain=4)
    res_s2 = parallel.run_shardmap_smc(
        fk_s2, N=96 if small else 400, key=jax.random.key(4), mesh=mesh)
    W = np.asarray(res_s2.W)
    pmean = float(np.sum(W * np.asarray(res_s2.X.theta["rho"])))
    print(f"sharded SMC2: log-evidence {float(res_s2.logLt):.3f} "
          f"(quadrature {exact_ev2:.3f}), posterior mean rho {pmean:.3f} "
          f"(quadrature {exact_pm:.3f})")
    assert abs(float(res_s2.logLt) - exact_ev2) < 1.0
    assert abs(pmean - exact_pm) < 0.35, (pmean, exact_pm)

    print("multichip_smc: all sharded runs match their oracles")


if __name__ == "__main__":
    main(small="--small" in _sys.argv)
