"""Linear-Gaussian state-space models and exact Kalman filtering/smoothing.

Counterpart of reference ``kalman.py``: the low-level steps
(``predict_step`` kalman.py:169, ``filter_step`` :196-229,
``filter_step_asarray`` :232, ``smoother_step`` :266-288), the model classes
``MVLinearGauss`` (:296-361), ``MVLinearGauss_Guarniero_etal`` (:364),
``LinearGauss`` (:397-452), and the :class:`Kalman` driver (:459-517).

TPU-native: the forward and backward recursions are ``lax.scan``s; the whole
filter compiles to one XLA program.  Serves throughout the test-suite as the
exact oracle for particle-filter output (SURVEY.md §4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import particles_tpu.distributions as dists
from particles_tpu import state_space_models as ssms

__all__ = [
    "MeanAndCov",
    "predict_step",
    "filter_step",
    "filter_step_asarray",
    "smoother_step",
    "MVLinearGauss",
    "MVLinearGauss_Guarniero_etal",
    "LinearGauss",
    "Kalman",
]


class MeanAndCov(NamedTuple):
    mean: jnp.ndarray
    cov: jnp.ndarray


def dotdot(a, b, c):
    return jnp.dot(jnp.dot(a, b), c)


def dotdotinv(a, b, c):
    """a @ b @ inv(c) for symmetric positive c (reference kalman.py:160-162),
    via a solve."""
    return jnp.linalg.solve(c, jnp.dot(a, b).T).T


def predict_step(F, covX, filt):
    """Predictive step: N(F m, F P F' + covX) (reference kalman.py:169-193).

    ``filt.mean`` may be (dx,) or (N, dx) — N predictions in parallel.
    """
    pred_mean = jnp.matmul(filt.mean, F.T)
    pred_cov = dotdot(F, filt.cov, F.T) + covX
    return MeanAndCov(mean=pred_mean, cov=pred_cov)


def filter_step(G, covY, pred, yt):
    """Filtering step + log-density of Y_t | Y_{0:t-1}
    (reference kalman.py:196-229)."""
    data_pred_mean = jnp.matmul(pred.mean, G.T)
    data_pred_cov = dotdot(G, pred.cov, G.T) + covY
    if covY.shape[0] == 1:
        yt1 = yt[..., 0] if jnp.ndim(yt) >= 1 else yt
        logpyt = dists.Normal(
            loc=data_pred_mean[..., 0], scale=jnp.sqrt(data_pred_cov[0, 0])
        ).logpdf(yt1)
    else:
        logpyt = dists.MvNormal(loc=data_pred_mean, cov=data_pred_cov).logpdf(yt)
    residual = yt - data_pred_mean
    # gain = pred.cov @ G.T @ inv(data_pred_cov), via a solve (cov is PSD)
    gain = jnp.linalg.solve(
        data_pred_cov, jnp.dot(pred.cov, G.T).T
    ).T
    filt_mean = pred.mean + jnp.matmul(residual, gain.T)
    filt_cov = pred.cov - dotdot(gain, G, pred.cov)
    return MeanAndCov(mean=filt_mean, cov=filt_cov), logpyt


def filter_step_asarray(G, covY, pred, yt):
    """Filtering step vectorised over N predictive means
    (reference kalman.py:232-263): ``pred.mean`` is (N,) or (N, dx)."""
    pm = pred.mean[:, None] if pred.mean.ndim == 1 else pred.mean
    new_pred = MeanAndCov(mean=pm, cov=pred.cov)
    filt, logpyt = filter_step(G, covY, new_pred, yt)
    if pred.mean.ndim == 1:
        filt = MeanAndCov(mean=filt.mean[:, 0], cov=filt.cov)
    return filt, logpyt


def smoother_step(F, filt, next_pred, next_smth):
    """RTS backward smoothing step (reference kalman.py:266-288)."""
    J = jnp.linalg.solve(next_pred.cov, jnp.dot(filt.cov, F.T).T).T
    smth_cov = filt.cov + dotdot(J, next_smth.cov - next_pred.cov, J.T)
    smth_mean = filt.mean + jnp.matmul(next_smth.mean - next_pred.mean, J.T)
    return MeanAndCov(mean=smth_mean, cov=smth_cov)


class MVLinearGauss(ssms.StateSpaceModel):
    r"""Multivariate linear Gaussian SSM (reference kalman.py:296-361).

    .. math::
        X_0 \sim N(\mu_0, cov_0), \quad
        X_t = F X_{t-1} + U_t, \ U_t \sim N(0, cov_X), \quad
        Y_t = G X_t + V_t, \ V_t \sim N(0, cov_Y)
    """

    def __init__(self, F=None, G=None, covX=None, covY=None, mu0=None,
                 cov0=None):
        self.covX = jnp.atleast_2d(jnp.asarray(covX, jnp.float32))
        self.covY = jnp.atleast_2d(jnp.asarray(covY, jnp.float32))
        dx, dy = self.covX.shape[0], self.covY.shape[0]
        self.mu0 = jnp.zeros(dx) if mu0 is None else jnp.asarray(mu0)
        self.cov0 = self.covX if cov0 is None else jnp.atleast_2d(
            jnp.asarray(cov0, jnp.float32))
        self.F = jnp.eye(dx) if F is None else jnp.atleast_2d(
            jnp.asarray(F, jnp.float32))
        self.G = jnp.eye(dy, dx) if G is None else jnp.atleast_2d(
            jnp.asarray(G, jnp.float32))

    @property
    def dx(self):
        return self.covX.shape[0]

    @property
    def dy(self):
        return self.covY.shape[0]

    def PX0(self):
        return dists.MvNormal(loc=self.mu0, cov=self.cov0)

    def PX(self, t, xp):
        return dists.MvNormal(loc=jnp.dot(xp, self.F.T), cov=self.covX)

    def PY(self, t, xp, x):
        return dists.MvNormal(loc=jnp.dot(x, self.G.T), cov=self.covY)

    def proposal(self, t, xp, data):
        """Locally optimal proposal, via one vectorised filter step
        (reference kalman.py:348-356)."""
        pred = MeanAndCov(mean=jnp.matmul(xp, self.F.T), cov=self.covX)
        f, _ = filter_step_asarray(self.G, self.covY, pred, data[t])
        return dists.MvNormal(loc=f.mean, cov=f.cov)

    def proposal0(self, data):
        pred0 = MeanAndCov(mean=self.mu0, cov=self.cov0)
        f, _ = filter_step(self.G, self.covY, pred0, data[0])
        return dists.MvNormal(loc=f.mean, cov=f.cov)

    def logeta(self, t, x, data):
        """Optimal auxiliary function (reference kalman.py:358-361)."""
        pred = MeanAndCov(mean=jnp.matmul(x, self.F.T), cov=self.covX)
        _, logpyt = filter_step_asarray(self.G, self.covY, pred, data[t + 1])
        return logpyt


class MVLinearGauss_Guarniero_etal(MVLinearGauss):
    r"""The Guarniero et al. (2016) benchmark: F[i,j] = alpha^(1+|i-j|),
    all covariances identity (reference kalman.py:364-394)."""

    def __init__(self, alpha=0.4, dx=2):
        i = jnp.arange(dx)
        F = alpha ** (1.0 + jnp.abs(i[:, None] - i[None, :]))
        MVLinearGauss.__init__(
            self, F=F, G=jnp.eye(dx), covX=jnp.eye(dx), covY=jnp.eye(dx)
        )


class LinearGauss(ssms.StateSpaceModel):
    r"""Univariate linear Gaussian model (reference kalman.py:397-452).

    .. math::
        X_0 \sim N(0, \sigma_0^2), \quad
        X_t | X_{t-1} \sim N(\rho X_{t-1}, \sigma_X^2), \quad
        Y_t | X_t \sim N(X_t, \sigma_Y^2)

    If ``sigma0`` is None it is set to the stationary std
    :math:`\sigma_X/\sqrt{1-\rho^2}`.
    """

    default_params = {"sigmaY": 0.2, "rho": 0.9, "sigmaX": 1.0, "sigma0": None}

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if self.sigma0 is None:
            self.sigma0 = self.sigmaX / jnp.sqrt(1.0 - self.rho**2)

    # --- Kalman interface (scalar model as 1x1 matrices) ---
    @property
    def F(self):
        return jnp.atleast_2d(jnp.asarray(self.rho, jnp.float32))

    @property
    def G(self):
        return jnp.ones((1, 1))

    @property
    def covX(self):
        return jnp.atleast_2d(jnp.asarray(self.sigmaX**2, jnp.float32))

    @property
    def covY(self):
        return jnp.atleast_2d(jnp.asarray(self.sigmaY**2, jnp.float32))

    @property
    def mu0(self):
        return jnp.zeros(1)

    @property
    def cov0(self):
        return jnp.atleast_2d(jnp.asarray(self.sigma0**2, jnp.float32))

    def PX0(self):
        return dists.Normal(scale=self.sigma0)

    def PX(self, t, xp):
        return dists.Normal(loc=self.rho * xp, scale=self.sigmaX)

    def PY(self, t, xp, x):
        return dists.Normal(loc=x, scale=self.sigmaY)

    def proposal0(self, data):
        sig2post = 1.0 / (1.0 / self.sigma0**2 + 1.0 / self.sigmaY**2)
        mupost = sig2post * (data[0] / self.sigmaY**2)
        return dists.Normal(loc=mupost, scale=jnp.sqrt(sig2post))

    def proposal(self, t, xp, data):
        sig2post = 1.0 / (1.0 / self.sigmaX**2 + 1.0 / self.sigmaY**2)
        mupost = sig2post * (
            self.rho * xp / self.sigmaX**2 + data[t] / self.sigmaY**2
        )
        return dists.Normal(loc=mupost, scale=jnp.sqrt(sig2post))

    def logeta(self, t, x, data):
        law = dists.Normal(
            loc=self.rho * x,
            scale=jnp.sqrt(self.sigmaX**2 + self.sigmaY**2),
        )
        return law.logpdf(data[t + 1])

    def upper_bound_log_pt(self, t):
        """log sup_x p(x_t | x_{t-1}) — needed by rejection-based FFBS."""
        return -0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(self.sigmaX)


class Kalman:
    """Exact Kalman filter/smoother driver (reference kalman.py:459-517).

    Same API as the reference — ``filter()``, ``smoother()``, attributes
    ``pred``/``filt``/``smth`` (MeanAndCov of stacked (T, ...) arrays) and
    ``logpyt`` — but the recursions are compiled ``lax.scan``s.
    """

    def __init__(self, ssm=None, data=None):
        self.ssm = ssm
        data = jnp.asarray(data, jnp.float32)
        self.data = data[:, None] if data.ndim == 1 else data
        self.pred = None
        self.filt = None
        self.logpyt = None
        self.smth = None

    def filter(self):
        """Forward recursion over all T observations."""
        ssm, data = self.ssm, self.data
        F, G, covX, covY = ssm.F, ssm.G, ssm.covX, ssm.covY
        mu0, cov0 = jnp.atleast_1d(ssm.mu0), ssm.cov0

        def body(filt_prev, yt):
            pred = predict_step(F, covX, filt_prev)
            filt, logpyt = filter_step(G, covY, pred, yt)
            return filt, (pred, filt, logpyt)

        pred0 = MeanAndCov(mean=mu0, cov=cov0)
        filt0, logpyt0 = filter_step(G, covY, pred0, data[0])
        _, (preds, filts, logpyts) = jax.lax.scan(body, filt0, data[1:])
        cat = lambda a, rest: jnp.concatenate([a[None], rest], axis=0)
        self.pred = MeanAndCov(
            mean=cat(pred0.mean, preds.mean), cov=cat(pred0.cov, preds.cov)
        )
        self.filt = MeanAndCov(
            mean=cat(filt0.mean, filts.mean), cov=cat(filt0.cov, filts.cov)
        )
        self.logpyt = cat(jnp.asarray(logpyt0), logpyts)

    @property
    def logLt(self):
        """Exact log-likelihood log p(y_{0:T-1})."""
        if self.logpyt is None:
            self.filter()
        return jnp.sum(self.logpyt)

    def smoother(self):
        """Backward RTS recursion (runs the filter first if needed)."""
        if self.filt is None:
            self.filter()
        F = self.ssm.F
        filt_rev = MeanAndCov(
            mean=self.filt.mean[-2::-1], cov=self.filt.cov[-2::-1]
        )
        pred_rev = MeanAndCov(
            mean=self.pred.mean[:0:-1], cov=self.pred.cov[:0:-1]
        )
        last = MeanAndCov(mean=self.filt.mean[-1], cov=self.filt.cov[-1])

        def body(next_smth, xs):
            filt_t, pred_t1 = xs
            smth = smoother_step(F, filt_t, pred_t1, next_smth)
            return smth, smth

        _, smths_rev = jax.lax.scan(body, last, (filt_rev, pred_rev))
        self.smth = MeanAndCov(
            mean=jnp.concatenate(
                [smths_rev.mean[::-1], last.mean[None]], axis=0
            ),
            cov=jnp.concatenate([smths_rev.cov[::-1], last.cov[None]], axis=0),
        )
