"""Device-time comparison of resampling schemes across N.

TPU-native counterpart of book/resampling/compare_cpu_time_resampling.py
(Chapter 9's Python corner), which the reference quotes at ~1 h 10 min of
CPU time for N = 10^2..10^8: there the contest is pure-Python loop vs
numba-jitted ``inverse_cdf``; here every scheme is a compiled device
program, and the interesting comparison is *between formulations* —
ancestor-vector schemes (a gather) vs the offspring-counts / analytic
z-form fast path the engine actually uses (a repeat, ~10x cheaper on TPU
where random gathers run at ~60M elem/s).

Per (scheme, N): best-of-3 wall time of a jitted kernel, value-forced
(the axon tunnel's block_until_ready is unreliable).
"""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import time

import numpy as np

import jax
import jax.numpy as jnp

from particles_tpu import resampling as rs


def _timeit(fn, *args, reps=3):
    out = fn(*args)  # compile + warmup
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)  # force
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main(small=False):
    if small:
        Ns = [10**3, 10**4]
    elif jax.default_backend() == "cpu":
        # the full grid is a *device*-timing study; on the single-core CPU
        # fallback the N=10^6 programs pay minutes of XLA-CPU compile time
        # (measured: >15 min for the 6x2 jits), so cap the sweep at 10^5
        Ns = [10**3, 10**4, 10**5]
    else:
        Ns = [10**3, 10**4, 10**5, 10**6]
    schemes = ["multinomial", "stratified", "systematic", "residual",
               "ssp", "killing"]
    key = jax.random.key(0)
    times = {}
    for N in Ns:
        W = rs.exp_and_normalise(
            jnp.asarray(np.random.default_rng(0).normal(size=N), jnp.float32)
        )
        for scheme in schemes:
            f = jax.jit(
                lambda k, w, s=scheme: rs.resampling(s, k, w, M=N))
            times[(scheme, N, "ancestors")] = _timeit(f, key, W)
            if scheme in rs.rs_counts_funcs:
                g = jax.jit(
                    lambda k, w, s=scheme: rs.resampling_counts(s, k, w, M=N))
                times[(scheme, N, "counts")] = _timeit(g, key, W)

    print(f"{'scheme':>12} " + "".join(f"{N:>12}" for N in Ns))
    for scheme in schemes:
        row = [times[(scheme, N, "ancestors")] * 1e3 for N in Ns]
        print(f"{scheme:>12} " + "".join(f"{v:>11.2f}m" for v in row))
        assert all(np.isfinite(v) and v > 0 for v in row)
    print("counts fast path (schemes with an offspring-counts form):")
    for scheme in schemes:
        if (scheme, Ns[0], "counts") in times:
            row = [times[(scheme, N, "counts")] * 1e3 for N in Ns]
            print(f"{scheme:>12} " + "".join(f"{v:>11.2f}m" for v in row))

    # the engine's fast-path claim: at the largest N, producing offspring
    # counts for systematic resampling is no slower than materialising the
    # ancestor vector (it skips the N-sized gather entirely)
    Nbig = Ns[-1]
    assert (times[("systematic", Nbig, "counts")]
            <= 2.0 * times[("systematic", Nbig, "ancestors")])
    return times


if __name__ == "__main__":
    main()
