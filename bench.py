"""Headline benchmark: bootstrap particle filter throughput.

Config (BASELINE.json north star): linear-Gaussian SSM, bootstrap filter,
N = 1e6 particles, T = 1000 steps, systematic resampling with adaptive-ESS
triggering.  Metric: particle-steps per second (N*T / wall-clock) on the
available accelerator.

Baseline: the reference (nchopin/particles) cannot run in this image (numba
is not installed), so the baseline is a faithful NumPy reimplementation of
its vectorised hot loop — numpy array ops for M/logG/weights exactly as the
reference executes them, cumsum+searchsorted for the numba ``inverse_cdf``
kernel (same O(N)-class cost) — measured on this machine's CPU and cached in
``BASELINE_MEASURED.json``.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import time

N = 1_000_000
T = 1_000
RHO, SIGX, SIGY = 0.9, 1.0, 0.2
ESSRMIN = 0.5


def measure_cpu_baseline(n=N, t_steps=50):
    """Reference-equivalent bootstrap PF in NumPy (single core, like the
    reference's default execution mode)."""
    import numpy as np

    rng = np.random.default_rng(0)
    sig0 = SIGX / np.sqrt(1 - RHO**2)
    y = rng.normal(size=t_steps).astype(np.float64)

    start = time.perf_counter()
    x = sig0 * rng.standard_normal(n)
    lw = -0.5 * np.log(2 * np.pi * SIGY**2) - 0.5 * (y[0] - x) ** 2 / SIGY**2
    for t in range(1, t_steps):
        m = lw.max()
        w = np.exp(lw - m)
        W = w / w.sum()
        ess = 1.0 / np.sum(W**2)
        if ess < ESSRMIN * n:
            su = (rng.random() + np.arange(n)) / n
            A = np.searchsorted(np.cumsum(W), su)
            np.clip(A, 0, n - 1, out=A)
            x = x[A]
            lw = np.zeros(n)
        x = RHO * x + SIGX * rng.standard_normal(n)
        lw = lw - 0.5 * np.log(2 * np.pi * SIGY**2) - 0.5 * (y[t] - x) ** 2 / SIGY**2
    elapsed = time.perf_counter() - start
    return n * t_steps / elapsed


def get_cpu_baseline():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_MEASURED.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["cpu_particle_steps_per_sec"]
    val = measure_cpu_baseline()
    with open(cache, "w") as f:
        json.dump(
            {
                "cpu_particle_steps_per_sec": val,
                "config": f"numpy bootstrap PF N={N} (reference-equivalent "
                          "vectorised loop; reference itself needs numba, "
                          "absent from this image)",
            },
            f,
            indent=1,
        )
    return val


def measure_device():
    import jax
    import jax.numpy as jnp

    from particles_tpu import core, kalman
    from particles_tpu import state_space_models as ssms

    ssm = kalman.LinearGauss(rho=RHO, sigmaX=SIGX, sigmaY=SIGY)
    # simulate data cheaply on host
    import numpy as np

    rng = np.random.default_rng(1)
    xs = np.empty(T)
    xs[0] = rng.normal() * float(SIGX / np.sqrt(1 - RHO**2))
    for t in range(1, T):
        xs[t] = RHO * xs[t - 1] + SIGX * rng.normal()
    y = jnp.asarray(xs + SIGY * rng.normal(size=T), jnp.float32)

    fk = ssms.Bootstrap(ssm=ssm, data=y)

    @jax.jit
    def run(fk, key):
        carry, _, _ = core._run_full(
            fk, key, N, T, False, "systematic", ESSRMIN, None, False
        )
        return carry.logLt

    # compile + warmup; force the value to host (the axon tunnel's
    # block_until_ready can return before execution completes)
    logLt = float(run(fk, jax.random.key(0)))
    # timed (best of 2)
    elapsed = float("inf")
    for r in (1, 2):
        start = time.perf_counter()
        logLt = float(run(fk, jax.random.key(r)))
        elapsed = min(elapsed, time.perf_counter() - start)
    assert np.isfinite(logLt)
    return N * T / elapsed, elapsed


def main():
    baseline = get_cpu_baseline()
    value, elapsed = measure_device()
    print(
        json.dumps(
            {
                "metric": "bootstrap_pf_particle_steps_per_sec_N1e6_T1e3",
                "value": round(value, 1),
                "unit": "particle-steps/s",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
