"""Total-variation distance between the resampled empirical distribution
and the weighted one, for every resampling scheme.

TPU-native counterpart of book/resampling/compare_tv_distance_resampling.py
("~8 min on my laptop"): for each scheme, TV(W, counts/N) is averaged over
replicates, on weight vectors of varying peakedness.  Asserts the textbook
variance ordering: the negatively-associated schemes (systematic,
stratified, residual, ssp) beat multinomial.
"""

# allow running directly from a source checkout
import os as _os
import sys as _sys
_sys.path.insert(
    0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), ".."))
)

import numpy as np

import jax
import jax.numpy as jnp

from particles_tpu import resampling as rs

SCHEMES = ("multinomial", "residual", "stratified", "systematic", "ssp",
           "ssp-tree")


def tv_of_scheme(scheme, W, keys):
    N = W.shape[0]

    def one(key):
        if scheme == "ssp-tree":
            # the hierarchical pairing ssp_counts routes to at N >= 8192
            # (a different valid SSP — forced here at small N so the TV
            # harness validates it against the sequential pairing)
            counts = rs._ssp_counts_blocked(key, W, N)
        else:
            counts = rs.resampling_counts(scheme, key, W, M=N)
        return 0.5 * jnp.sum(jnp.abs(counts / N - W))

    return np.asarray(jax.vmap(one)(keys))


def main(small=False):
    N = 256 if small else 1024
    nreps = 20 if small else 100
    rng = np.random.default_rng(0)
    tvs = {}
    for tau in (1.0, 5.0):  # weight peakedness (exponent on iid uniforms)
        lw = tau * rng.standard_normal(N)
        W = jnp.asarray(np.exp(lw - lw.max()) / np.exp(lw - lw.max()).sum(),
                        jnp.float32)
        keys = jax.random.split(jax.random.key(int(10 * tau)), nreps)
        for scheme in SCHEMES:
            tvs[(scheme, tau)] = tv_of_scheme(scheme, W, keys).mean()
        order = sorted(SCHEMES, key=lambda s: tvs[(s, tau)])
        print(f"tau={tau}: " + "  ".join(
            f"{s}={tvs[(s, tau)]:.4f}" for s in order))
        # negative-association schemes dominate multinomial
        for s in ("systematic", "stratified", "residual", "ssp",
                  "ssp-tree"):
            assert tvs[(s, tau)] < tvs[("multinomial", tau)], (s, tau, tvs)
        # the tree pairing is the same algorithm class as sequential SSP:
        # identical marginals (floor/ceil Bernoulli), so the mean TV must
        # agree closely
        rel = abs(tvs[("ssp-tree", tau)] - tvs[("ssp", tau)]) / tvs[
            ("ssp", tau)]
        assert rel < 0.15, (rel, tvs[("ssp-tree", tau)], tvs[("ssp", tau)])
    return tvs


if __name__ == "__main__":
    main()
