"""Variable selection over an expanded Boston design (squares +
interactions), with dense and sparse priors.

TPU-native counterpart of papers/binarySMC/boston.py (Schafer & Chopin
2013, first example: main effects + squares + pairwise interactions,
~104 predictors, Bernoulli(1/2) prior) and of lost_time.py (Griffin et
al 2018 reproduction: same design, standardised, SPARSE Bernoulli(0.05)
prior with a fixed ridge precision).

TPU design: the marginal likelihood of every particle is one batched
masked-Cholesky over the (p, p) Gram matrix — the expanded design only
grows that single MXU-friendly kernel, not the sampler; a waste-free
adaptive-tempering run over 2^104 models is one compiled program.

Asserted outcomes: finite evidence, valid inclusion probabilities; the
sparse prior selects far fewer predictors than the dense one (the point
of Griffin et al's prior); and on real data the top main effects include
LSTAT or RM (the variables every Boston study finds).
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

import particles_tpu as particles
from particles_tpu import binary_smc as bin_smc
from particles_tpu import datasets
from particles_tpu import distributions as dists
from particles_tpu import smc_samplers as ssp

BOSTON_NAMES = ("CRIM", "ZN", "INDUS", "CHAS", "NOX", "RM", "AGE", "DIS",
                "RAD", "TAX", "PTRATIO", "B", "LSTAT")


def expanded_design(raw):
    """Main effects + squares (except the binary CHAS) + pairwise
    interactions, standardised (reference boston.py:24-41 /
    lost_time.py:22-41)."""
    cols, names = [], []
    base = {k: raw[:, i] for i, k in enumerate(BOSTON_NAMES)}
    for i, k in enumerate(BOSTON_NAMES):
        cols.append(base[k]); names.append(k)
        if k != "CHAS":
            cols.append(base[k] ** 2); names.append(f"{k}^2")
        for j in range(i):
            k2 = BOSTON_NAMES[j]
            cols.append(base[k] * base[k2]); names.append(f"{k} x {k2}")
    X = np.stack(cols, axis=1)
    X = (X - X.mean(axis=0)) / X.std(axis=0)
    return X, names


def main(small=False):
    ds = datasets.Boston()
    raw = np.asarray(ds.raw_data, np.float64)
    y = np.log(raw[:, -1])
    y = (y - y.mean()) / y.std()
    X, names = expanded_design(raw[:, :-1])
    if small:
        keep = list(range(0, X.shape[1], 4))  # thin the design for smoke
        X, names = X[:, keep], [names[i] for i in keep]
    n, p = X.shape
    print(f"Boston expanded design: n={n}, p={p} "
          f"({'synthetic surrogate' if ds.synthetic else 'real data'})")

    P = 20 if small else 300
    M = 16 if small else 100
    incl = {}
    for label, pri_p, model_kw in (
        ("dense",  0.5,  {}),                       # boston.py prior
        ("sparse", 0.05, {"nu": 0.0, "iv2": 0.01}),  # lost_time.py prior
    ):
        prior = dists.StructDist(
            {"gamma": dists.IID(bin_smc.Bernoulli(p=pri_p), p)})
        model = bin_smc.BayesianVS(data=(X, y), prior=prior, **model_kw)
        move = ssp.MCMCSequenceWF(mcmc=bin_smc.BinaryMetropolis(),
                                  len_chain=P)
        fk = ssp.AdaptiveTempering(model=model, len_chain=P, move=move)
        pf = particles.SMC(fk=fk, N=M, key=jax.random.key(1))
        pf.run()
        W = np.asarray(pf.wgts.W)
        g = np.asarray(pf.X.theta["gamma"], np.float64)
        incl[label] = g.T @ W
        top = np.argsort(-incl[label])[:5]
        print(f"{label:>6} prior: logLt={float(pf.logLt):9.2f}  "
              f"E|gamma|={incl[label].sum():5.1f}  top: "
              + ", ".join(f"{names[j]}({incl[label][j]:.2f})" for j in top))
        assert np.isfinite(float(pf.logLt))
        assert np.all((incl[label] >= 0) & (incl[label] <= 1 + 1e-6))

    # the sparse prior prunes: expected model size strictly smaller
    assert incl["sparse"].sum() < incl["dense"].sum(), (
        incl["sparse"].sum(), incl["dense"].sum())
    if not (small or ds.synthetic):
        best = {names[j] for j in np.argsort(-incl["dense"])[:15]}
        assert best & {"LSTAT", "RM", "LSTAT^2", "RM^2"}, best
    return incl


if __name__ == "__main__":
    main()
