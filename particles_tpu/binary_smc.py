"""SMC on binary spaces {0,1}^d: Bayesian variable selection.

Counterpart of reference ``binary_smc.py``: the nested-logistic proposal
(:class:`NestedLogistic`, binary_smc.py:83-143), its independent-Metropolis
move (:154-163), and the variable-selection likelihood classes (BIC,
BayesianVS, g-prior) built on per-particle Cholesky factorisations
(:165-293).

TPU-native redesign:

* The reference fits the nested-logistic proposal per coordinate with
  sklearn's ``LogisticRegression`` and variable-length predecessor sets.
  Here the fit is a *masked ridge-IRLS*: a fixed number of Newton steps on a
  dense lower-triangular coefficient matrix whose inactive entries are
  masked — one vmapped batch of (d, d) solves, fully jittable
  (SURVEY.md §7.6).
* ``chol_and_friends`` (binary_smc.py:165-180) — a per-particle Cholesky of
  the active submatrix — becomes ONE batched Cholesky of (N, p, p) matrices
  where excluded rows/columns are replaced by identity (so they contribute
  zero to the log-determinant and the quadratic form), mapping the whole
  likelihood evaluation onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import particles_tpu.distributions as dists
from particles_tpu import smc_samplers as ssps

__all__ = [
    "all_binary_words",
    "Bernoulli",
    "log_no_warn",
    "NestedLogistic",
    "BinaryMetropolis",
    "chol_and_friends",
    "VariableSelection",
    "BIC",
    "BayesianVS",
    "BayesianVS_gprior",
]


def all_binary_words(p):
    """(2^p, p) array of all binary words (reference binary_smc.py:54-60)."""
    ns = jnp.arange(2**p)
    out = jnp.stack(
        [(ns % 2 ** (i + 1)) // 2**i for i in range(p)], axis=1
    )
    return out.astype(bool)


def log_no_warn(x):
    return jnp.log(jnp.clip(x, 1e-30, None))


class Bernoulli(dists.ProbDist):
    """Bernoulli distribution over booleans (reference binary_smc.py:67-80)."""

    dtype = "bool"

    def __init__(self, p):
        self.p = p

    def rvs(self, key, size=None):
        if size is None:
            size = jnp.shape(self.p)[0] if jnp.ndim(self.p) >= 1 else 1
        return jax.random.uniform(key, (size,)) < self.p

    def logpdf(self, x):
        return jnp.where(x, log_no_warn(self.p), log_no_warn(1.0 - self.p))


def corr_bin(pi, pj, pij):
    varij = pi * (1.0 - pi) * pj * (1.0 - pj)
    return jnp.where(varij > 0, (pij - pi * pj) / jnp.sqrt(varij + 1e-30), 0.0)


class NestedLogistic(dists.DiscreteDist):
    """Nested logistic proposal: component i is Bernoulli(coeffs[i,i]) if
    "edgy" (prob close to 0/1), else logistic in the preceding components
    (reference binary_smc.py:83-143).

    ``coeffs`` is (d, d) lower-triangular (diag = intercept / raw prob);
    ``edgy`` a (d,) boolean.
    """

    dtype = "bool"

    def __init__(self, coeffs, edgy):
        self.coeffs = coeffs
        self.edgy = edgy
        self.dim = edgy.shape[0]

    def _probs(self, x):
        """(N, d) matrix of conditional probabilities given sampled prefix."""
        xf = x.astype(jnp.float32)
        lin = xf @ jnp.tril(self.coeffs, -1).T + jnp.diag(self.coeffs)
        return jnp.where(self.edgy, jnp.diag(self.coeffs),
                         jax.nn.sigmoid(lin))

    def rvs(self, key, size=1):
        d = self.dim
        us = jax.random.uniform(key, (size, d))

        def body(i, out):
            probs = self._probs(out)[:, i]
            return out.at[:, i].set(us[:, i] < probs)

        out = jnp.zeros((size, d), bool)
        return jax.lax.fori_loop(0, d, body, out)

    def logpdf(self, x):
        probs = self._probs(x)
        lp = jnp.where(x, log_no_warn(probs), log_no_warn(1.0 - probs))
        return jnp.sum(lp, axis=1)

    @classmethod
    def fit(cls, W, x, probs_thresh=0.02, corr_thresh=0.075,
            newton_steps=8, ridge=1e-3):
        """Fit by masked ridge-IRLS (replaces the reference's per-coordinate
        sklearn LogisticRegression, binary_smc.py:120-143)."""
        xf = x.astype(jnp.float32)
        N, d = xf.shape
        ph = jnp.sum(W[:, None] * xf, axis=0)
        edgy = (ph < probs_thresh) | (ph > 1.0 - probs_thresh)
        pij = xf.T @ (W[:, None] * xf)  # E[x_i x_j]
        corr = corr_bin(ph[:, None], ph[None, :], pij)
        tri = jnp.tril(jnp.ones((d, d), bool), -1)
        pred_mask = tri & (jnp.abs(corr) > corr_thresh) & ~edgy[:, None] \
            & ~edgy[None, :]

        def fit_row(i):
            mask = pred_mask[i]  # (d,)
            y = xf[:, i]
            X = xf * mask[None, :]  # masked features

            def newton(_, beta_b):
                beta, b = beta_b
                eta = X @ beta + b
                p = jax.nn.sigmoid(eta)
                wts = W * p * (1.0 - p) + 1e-8
                g_beta = X.T @ (W * (y - p)) - ridge * beta
                g_b = jnp.sum(W * (y - p))
                H = (X * wts[:, None]).T @ X + ridge * jnp.eye(d)
                Hb = X.T @ wts
                hbb = jnp.sum(wts) + 1e-8
                # full (d+1) system
                Hfull = jnp.block(
                    [[H, Hb[:, None]], [Hb[None, :], jnp.array([[hbb]])]]
                )
                gfull = jnp.concatenate([g_beta, jnp.array([g_b])])
                step = jnp.linalg.solve(Hfull, gfull)
                return beta + step[:d], b + step[d]

            beta0 = jnp.zeros(d)
            b0 = jax.scipy.special.logit(jnp.clip(ph[i], 1e-6, 1 - 1e-6))
            beta, b = jax.lax.fori_loop(0, newton_steps, newton, (beta0, b0))
            beta = beta * mask
            return beta, b

        betas, bs = jax.vmap(fit_row)(jnp.arange(d))
        coeffs = betas * pred_mask  # strictly lower-triangular part
        diag = jnp.where(
            edgy,
            ph,
            jnp.where(
                jnp.any(pred_mask, axis=1),
                bs,
                jax.scipy.special.logit(jnp.clip(ph, 1e-6, 1 - 1e-6)),
            ),
        )
        coeffs = coeffs + jnp.diag(diag)
        return cls(coeffs, edgy)


class BinaryMetropolis(ssps.ArrayMetropolis):
    """Independent Metropolis with a nested-logistic proposal fitted to the
    weighted cloud (reference binary_smc.py:154-163)."""

    def calibrate(self, W, x):
        prop = NestedLogistic.fit(W, x.theta["gamma"])
        return {"prop_coeffs": prop.coeffs, "prop_edgy": prop.edgy}

    def step(self, key, x, target):
        k1, k2, kt = jax.random.split(key, 3)
        prop_dist = NestedLogistic(
            x.shared["prop_coeffs"], x.shared["prop_edgy"]
        )
        gamma_prop = prop_dist.rvs(k1, size=x.N)
        xprop = target(x.replace(theta={"gamma": gamma_prop}), key=kt)
        delta_lp = prop_dist.logpdf(x.theta["gamma"]) - prop_dist.logpdf(
            gamma_prop
        )
        lp_acc = xprop.lpost - x.lpost + delta_lp
        pb_acc = jnp.exp(jnp.clip(lp_acc, None, 0.0))
        accept = jax.random.uniform(k2, (x.N,)) < pb_acc
        return xprop.where(accept, x), jnp.mean(pb_acc)


def chol_and_friends(gamma, xtx, xty, vm2):
    """(len_gam, ldet, wtw) for each particle's active-variable submatrix
    (reference binary_smc.py:165-180), via ONE batched Cholesky: excluded
    rows/columns are replaced by identity so they contribute log(1)=0 to the
    log-determinant and 0 to the quadratic form."""
    gf = gamma.astype(jnp.float32)
    p = xtx.shape[0]
    len_gam = jnp.sum(gf, axis=1)
    mask = gf[:, :, None] * gf[:, None, :]  # (N, p, p)
    A = xtx[None] * mask + jax.vmap(jnp.diag)(
        gf * vm2 + (1.0 - gf)
    )
    C = jnp.linalg.cholesky(A)
    ldet = jnp.sum(jnp.log(jnp.diagonal(C, axis1=1, axis2=2)), axis=1)
    rhs = xty[None, :] * gf  # (N, p)
    w = jax.scipy.linalg.solve_triangular(C, rhs[:, :, None], lower=True)
    wtw = jnp.sum(w[:, :, 0] ** 2, axis=1)
    return len_gam, ldet, wtw


class VariableSelection(ssps.StaticModel):
    """Base class for Bayesian variable selection: the state is a vector of
    inclusion indicators gamma; the likelihood is the marginal likelihood
    with coefficients integrated out (reference binary_smc.py:183-213).

    ``data = (x, y)`` with x (n, p), y (n,); ``theta['gamma']`` is (N, p)
    boolean.
    """

    def __init__(self, data=None, prior=None):
        x, y = data
        self.x = jnp.asarray(x, jnp.float32)
        self.y = jnp.asarray(y, jnp.float32)
        self.prior = prior
        self.xtx = self.x.T @ self.x
        self.yty = jnp.sum(self.y**2)
        self.xty = self.x.T @ self.y

    @property
    def n(self):
        return self.x.shape[0]

    @property
    def p(self):
        return self.x.shape[1]

    @property
    def T(self):
        return 1

    def complete_enum(self):
        """Exact enumeration over all 2^p gamma (for small p): oracle for
        tests (reference binary_smc.py:204-207)."""
        gammas = all_binary_words(self.p)
        lp = self.logpost({"gamma": gammas})
        return gammas, lp

    def chol_intermediate(self, gamma):
        return chol_and_friends(gamma, self.xtx, self.xty, self.iv2)

    def sig2_full(self):
        gamma_full = jnp.ones((1, self.p), bool)
        _, _, btb = chol_and_friends(gamma_full, self.xtx, self.xty, 0.0)
        return (self.yty - btb[0]) / self.n

    def loglik(self, theta, t=None):
        return self._loglik_gamma(theta["gamma"])


class BIC(VariableSelection):
    """Pseudo-posterior exp(-lambda * BIC(gamma))
    (reference binary_smc.py:216-230)."""

    def __init__(self, data=None, prior=None, lamb=10.0):
        super().__init__(data=data, prior=prior)
        self.lamb = lamb
        self.iv2 = 0.0

    def _loglik_gamma(self, gamma):
        len_gam, ldet, wtw = self.chol_intermediate(gamma)
        return -(
            jnp.log(self.n * 1.0) * self.lamb * len_gam
            + self.n * self.lamb * jnp.log(self.yty - wtw)
        )


class BayesianVS(VariableSelection):
    """Marginal likelihood of the hierarchical model
    y = X beta + eps, sigma^2 ~ IG(nu/2, nu*lambda/2),
    beta | sigma^2 ~ N(0, v2 sigma^2 I) (reference binary_smc.py:233-265)."""

    def __init__(self, data=None, prior=None, nu=4.0, lamb=None, iv2=None):
        super().__init__(data=data, prior=prior)
        self.nu = nu
        self.lamb = self.sig2_full() if lamb is None else lamb
        self.iv2 = self.lamb / 10.0 if iv2 is None else iv2

    def _loglik_gamma(self, gamma):
        len_gam, ldet, wtw = self.chol_intermediate(gamma)
        return -(
            -0.5 * jnp.log(self.iv2) * len_gam
            + ldet
            + 0.5 * (self.nu + self.n)
            * jnp.log(self.nu * self.lamb + self.yty - wtw)
        )


class BayesianVS_gprior(BayesianVS):
    """Same but with Zellner's g-prior beta | sigma^2 ~ N(0, g sigma^2
    (X'X)^-1) (reference binary_smc.py:268-293)."""

    def __init__(self, data=None, prior=None, nu=4.0, lamb=None, g=None):
        self.g = g
        VariableSelection.__init__(self, data=data, prior=prior)
        self.nu = nu
        self.lamb = self.sig2_full() if lamb is None else lamb
        self.iv2 = 0.0
        if self.g is None:
            self.g = float(self.n)

    def _loglik_gamma(self, gamma):
        len_gam, _, wtw = self.chol_intermediate(gamma)
        gogp1 = self.g / (self.g + 1.0)
        return -(
            0.5 * jnp.log(1.0 + self.g) * len_gam
            + 0.5 * (self.n + self.nu)
            * jnp.log(self.nu * self.lamb + self.yty - gogp1 * wtw)
        )
