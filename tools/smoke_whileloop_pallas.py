"""On-chip smoke test: Pallas kernels inside ``lax.while_loop`` bodies.

Round-4 advisor finding (ADVICE.md, medium): ``multinomial_iid``'s
sort-serve-unsort fast path embeds the merge-rank / repeat Pallas kernels
in the ``while_loop`` bodies of ``backward_sampling_reject``
(smoothing.py) and the PaRIS collector (collectors.py) — a route never
validated on real TPU hardware (Mosaic has hung on while loops with DMAs
*inside kernels*; an XLA-level while_loop whose body contains a
pallas_call is a different shape, but unproven).  Both call sites were
gated with ``guard.no_pallas()`` in round 4.

This script exercises the UNGATED route on the real chip at
kernel-routable sizes and compares against the gated (searchsorted)
route.  The two routes consume the same uniform stream against
ulp-different cumsums (float vs fixed-point-quantised), so a few
boundary flips occur per step and each flip re-randomises the rest of
that trajectory — identical law, realisation differs on ~2% of
trajectories (measured on-chip at N=M=2^14, T=30).  Run bounded::

    timeout 580 python -c "import runpy; \
        runpy.run_path('tools/smoke_whileloop_pallas.py', \
        run_name='__main__')"

Env knobs: ``SMOKE_N`` / ``SMOKE_NP`` shrink the sizes (CPU mechanics
check); ``SMOKE_SKIP_REJECT=1`` runs only the PaRIS section.

Measured on-chip 2026-08-19 (v5e): reject-FFBS N=M=2^14 cold
69.7 s gated vs 7.4 s ungated, warm 7.29 vs 7.17; PaRIS N=2048
validated correct.  ``SMOKE OK`` = the gates can be dropped — and they
WERE (commit 170cfe5), so the "gated" leg now runs the same Pallas
program as the ungated one (the comparison degenerates to a
determinism check; kept as an on-chip regression smoke, re-run after
the straggler-chunked fallback landed: identical outputs, SMOKE OK).
"""

import contextlib
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import particles_tpu as particles
from particles_tpu import collectors, kalman
from particles_tpu import core as _core
from particles_tpu import state_space_models as ssms
from particles_tpu.ops import guard


def force(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timed(fn, *a, **kw):
    t0 = time.monotonic()
    out = fn(*a, **kw)
    f = force(out)
    return out, f, time.monotonic() - t0


class _LGSmooth(kalman.LinearGauss):
    """LinearGauss + the additive functional PaRIS accumulates."""

    def add_func(self, t, xp, x):
        return x


def smoke_reject(ssm, y, N):
    fk = ssms.Bootstrap(ssm=ssm, data=y)
    pf = particles.SMC(fk=fk, N=N, key=jax.random.key(1),
                       store_history=True)
    pf.run()
    print("forward pf done, logLt =", float(pf.logLt))

    null = contextlib.nullcontext
    orig = guard.no_pallas

    # gated (round-4 default): no_pallas active inside the while loop
    paths_g, _, dt_g = timed(
        pf.hist.backward_sampling_reject, jax.random.key(4), N,
        max_trials=20)
    acc_g = np.asarray(pf.hist.acc_rate)
    # ungated: patch the ambient gate to a null context -> Pallas route
    guard.no_pallas = null
    try:
        paths_u, _, dt_u = timed(
            pf.hist.backward_sampling_reject, jax.random.key(4), N,
            max_trials=20)
        acc_u = np.asarray(pf.hist.acc_rate)
    finally:
        guard.no_pallas = orig
    nmis = int(jnp.sum(jnp.any(paths_g != paths_u, axis=0)))
    dmean = float(jnp.max(jnp.abs(
        jnp.mean(paths_g, axis=1) - jnp.mean(paths_u, axis=1))))
    print(f"reject-FFBS N=M={N}: gated {dt_g:.3f}s  ungated(Pallas) "
          f"{dt_u:.3f}s  path-mismatches {nmis}/{N} "
          f"max|mean diff| {dmean:.4f} "
          f"acc {acc_g.mean():.3f}/{acc_u.mean():.3f}")
    assert nmis <= max(4, N // 10), nmis          # flips are rare events
    assert dmean < 0.05, dmean                    # same smoothing law
    assert abs(acc_g.mean() - acc_u.mean()) < 0.05

    # second timed pass each way (first pass pays compile)
    _, _, dt_g2 = timed(
        pf.hist.backward_sampling_reject, jax.random.key(5), N,
        max_trials=20)
    guard.no_pallas = null
    try:
        _, _, dt_u2 = timed(
            pf.hist.backward_sampling_reject, jax.random.key(5), N,
            max_trials=20)
    finally:
        guard.no_pallas = orig
    print(f"reject-FFBS warm: gated {dt_g2:.3f}s  ungated {dt_u2:.3f}s")


def smoke_paris(ssm, y, Np):
    null = contextlib.nullcontext
    orig = guard.no_pallas

    def run_paris():
        # both runs share the engine's value-hashed runner cache key (the
        # guard difference is INSIDE the collector trace): force a fresh
        # trace so the ungated run genuinely embeds the Pallas route
        _core._runner_cache.clear()
        pfp = particles.SMC(
            fk=ssms.Bootstrap(ssm=ssm, data=y), N=Np,
            key=jax.random.key(2),
            collect=[collectors.Paris(Nparis=2, max_trials=15)],
        )
        pfp.run()
        return jnp.asarray(pfp.summaries.paris)

    s_g, _, dt_pg = timed(run_paris)
    guard.no_pallas = null
    try:
        s_u, _, dt_pu = timed(run_paris)
    finally:
        guard.no_pallas = orig
    err = float(jnp.max(jnp.abs(s_g - s_u)))
    print(f"PaRIS N={Np}: gated {dt_pg:.3f}s  ungated(Pallas) {dt_pu:.3f}s"
          f"  max|diff| {err:.4g}")
    # same law; realisation may differ at ulp boundaries -> loose check
    assert np.isfinite(np.asarray(s_u)).all()
    assert err < 0.5, err


def main():
    print("devices:", jax.devices())
    ssm = _LGSmooth(rho=0.9, sigmaX=1.0, sigmaY=0.3)
    _, y = ssm.simulate(jax.random.key(7), 30)

    if not os.environ.get("SMOKE_SKIP_REJECT"):
        smoke_reject(ssm, y, int(os.environ.get("SMOKE_N", 1 << 14)))
    smoke_paris(ssm, y, int(os.environ.get("SMOKE_NP", 2048)))
    print("SMOKE OK")


if __name__ == "__main__":
    main()
