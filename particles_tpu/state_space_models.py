"""State-space models and their Feynman-Kac particle-filter adapters.

Counterpart of reference ``state_space_models.py``: the same model-as-class
DSL — subclass :class:`StateSpaceModel`, define ``PX0``/``PX``/``PY``
returning :mod:`particles_tpu.distributions` objects, optionally
``proposal0``/``proposal``/``logeta`` for guided/auxiliary filters
(reference state_space_models.py:172-296) — plus the FK adapters
``Bootstrap`` (:299-349), ``GuidedPF`` (:352-398), ``AuxiliaryPF`` (:406) and
``AuxiliaryBootstrap`` (:431), and the built-in model zoo (:446-689).

JAX-specific conventions:

* Model parameters are pytree leaves (see
  :class:`particles_tpu.utils.struct.KwPytree`), so a PMMH chain can rebuild
  a model with new parameter values at every iteration without recompiling.
* ``t`` is a *concrete* Python int when 0 (the engine calls time-0 methods
  outside the scan) and may be a traced scalar for t >= 1; model code that
  branches on "t == 0" must use ``isinstance(t, int) and t == 0``.
* ``simulate`` takes a PRNG key and returns stacked ``(T, ...)`` arrays
  rather than lists of length-1 arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import particles_tpu.distributions as dists
from particles_tpu.core import FeynmanKac
from particles_tpu.utils.struct import KwPytree

__all__ = [
    "StateSpaceModel",
    "Bootstrap",
    "GuidedPF",
    "APFMixin",
    "AuxiliaryPF",
    "AuxiliaryBootstrap",
    "StochVol",
    "StochVolLeverage",
    "Gordon_etal",
    "BearingsOnly",
    "DiscreteCox",
    "MVStochVol",
    "ThetaLogistic",
]

err_msg_missing_cst = """
    State-space model %s is missing method upper_bound_log_pt, which provides
    log of constant C_t, such that p(x_t|x_{t-1}) <= C_t.  This is required
    for smoothing algorithms based on rejection."""


class StateSpaceModel(KwPytree):
    """Base class for state-space models (reference state_space_models.py:172-296).

    Define a model by subclassing and providing ``PX0``, ``PX``, ``PY``::

        class LinearGauss(StateSpaceModel):
            default_params = {'rho': 0.9, 'sigmaX': 1., 'sigmaY': .1}
            def PX0(self):
                return dists.Normal(scale=self.sigmaX)
            def PX(self, t, xp):
                return dists.Normal(loc=self.rho * xp, scale=self.sigmaX)
            def PY(self, t, xp, x):
                return dists.Normal(loc=x, scale=self.sigmaY)

    ``default_params`` are merged with constructor kwargs and become instance
    attributes (and pytree leaves).
    """

    def _error_msg(self, method):
        return f"method {method} not implemented in class {self.__class__.__name__}"

    @classmethod
    def state_container(cls, N, T):
        """Empty (N, T[, dim]) container for states
        (reference state_space_models.py:223-230)."""
        law_x0 = cls().PX0()
        shape = [N, T]
        if law_x0.dim > 1:
            shape.append(law_x0.dim)
        return jnp.zeros(shape, dtype=law_x0.dtype)

    def PX0(self):
        """Law of X_0."""
        raise NotImplementedError(self._error_msg("PX0"))

    def PX(self, t, xp):
        """Law of X_t given X_{t-1} = xp."""
        raise NotImplementedError(self._error_msg("PX"))

    def PY(self, t, xp, x):
        """Law of Y_t given X_t = x (and possibly X_{t-1} = xp)."""
        raise NotImplementedError(self._error_msg("PY"))

    def proposal0(self, data):
        raise NotImplementedError(self._error_msg("proposal0"))

    def proposal(self, t, xp, data):
        raise NotImplementedError(self._error_msg("proposal"))

    def upper_bound_log_pt(self, t):
        raise NotImplementedError(err_msg_missing_cst % self.__class__.__name__)

    def add_func(self, t, xp, x):
        raise NotImplementedError(self._error_msg("add_func"))

    def simulate_given_x(self, key, x):
        """Simulate observations given a state trajectory (stacked (T, ...))."""
        T = x.shape[0]
        keys = jax.random.split(key, T)
        y0 = self.PY(0, None, x[0:1]).rvs(keys[0], size=1)

        def sim_yt(t, k):
            return self.PY(t, x[t - 1 : t], x[t : t + 1]).rvs(k, size=1)

        ys = [y0] + [sim_yt(t, keys[t]) for t in range(1, T)]
        return jnp.concatenate(ys, axis=0)

    def simulate(self, key, T):
        """Simulate states and observations up to time T-1
        (reference state_space_models.py:278-296).

        Returns stacked arrays ``x`` (T, ...) and ``y`` (T, ...).
        """
        kx, ky = jax.random.split(key)
        keys = jax.random.split(kx, T)
        x0 = self.PX0().rvs(keys[0], size=1)
        xs = [x0]
        for t in range(1, T):
            xs.append(self.PX(t, xs[-1]).rvs(keys[t], size=1))
        x = jnp.concatenate(xs, axis=0)
        y = self.simulate_given_x(ky, x)
        return x, y


class Bootstrap(FeynmanKac):
    """Bootstrap Feynman-Kac formalism of a state-space model
    (reference state_space_models.py:299-349)."""

    def __init__(self, ssm=None, data=None):
        self.ssm = ssm
        self.data = None if data is None else jnp.asarray(data)

    @property
    def T(self):
        return 0 if self.data is None else self.data.shape[0]

    @property
    def du(self):
        return self.ssm.PX0().dim

    def M0(self, key, N):
        return self.ssm.PX0().rvs(key, size=N)

    def M(self, key, t, xp):
        return self.ssm.PX(t, xp).rvs(key, size=xp.shape[0])

    def logG(self, t, xp, x):
        return self.ssm.PY(t, xp, x).logpdf(self.data[t])

    def Gamma0(self, u):
        return self.ssm.PX0().ppf(u)

    def Gamma(self, t, xp, u):
        return self.ssm.PX(t, xp).ppf(u)

    def logpt(self, t, xp, x):
        """Log-pdf of X_t | X_{t-1} = xp."""
        return self.ssm.PX(t, xp).logpdf(x)

    def upper_bound_trans(self, t):
        return self.ssm.upper_bound_log_pt(t)

    def add_func(self, t, xp, x):
        return self.ssm.add_func(t, xp, x)


class GuidedPF(Bootstrap):
    """Guided particle filter: moves come from the model's proposal kernels
    (reference state_space_models.py:352-398)."""

    def M0(self, key, N):
        return self.ssm.proposal0(self.data).rvs(key, size=N)

    def M(self, key, t, xp):
        return self.ssm.proposal(t, xp, self.data).rvs(key, size=xp.shape[0])

    def logG(self, t, xp, x):
        if isinstance(t, int) and t == 0:
            return (
                self.ssm.PX0().logpdf(x)
                + self.ssm.PY(0, xp, x).logpdf(self.data[0])
                - self.ssm.proposal0(self.data).logpdf(x)
            )
        return (
            self.ssm.PX(t, xp).logpdf(x)
            + self.ssm.PY(t, xp, x).logpdf(self.data[t])
            - self.ssm.proposal(t, xp, self.data).logpdf(x)
        )

    def Gamma0(self, u):
        return self.ssm.proposal0(self.data).ppf(u)

    def Gamma(self, t, xp, u):
        return self.ssm.proposal(t, xp, self.data).ppf(u)


class APFMixin:
    def logeta(self, t, x):
        return self.ssm.logeta(t, x, self.data)


class AuxiliaryPF(GuidedPF, APFMixin):
    """Auxiliary particle filter (reference state_space_models.py:406-428):
    guided proposals + auxiliary weight function logeta."""

    pass


class AuxiliaryBootstrap(Bootstrap, APFMixin):
    """APF with the bootstrap (transition) proposal
    (reference state_space_models.py:431-437)."""

    pass


# ---------------------------------------------------------------------------
# built-in state-space models
# ---------------------------------------------------------------------------

class StochVol(StateSpaceModel):
    r"""Univariate stochastic volatility model (Pitt & Shephard 1999)
    (reference state_space_models.py:446-498).

    .. math::
        X_0 \sim N(\mu, \sigma^2/(1-\rho^2)), \quad
        X_t = \mu + \rho(X_{t-1}-\mu) + \sigma U_t, \quad
        Y_t|X_t \sim N(0, e^{X_t})
    """

    default_params = {"mu": -1.02, "rho": 0.9702, "sigma": 0.178}

    def sig0(self):
        return self.sigma / jnp.sqrt(1.0 - self.rho**2)

    def PX0(self):
        return dists.Normal(loc=self.mu, scale=self.sig0())

    def EXt(self, xp):
        return (1.0 - self.rho) * self.mu + self.rho * xp

    def PX(self, t, xp):
        return dists.Normal(loc=self.EXt(xp), scale=self.sigma)

    def PY(self, t, xp, x):
        return dists.Normal(loc=0.0, scale=jnp.exp(0.5 * x))

    def _xhat(self, xst, sig, yt):
        return xst + 0.5 * sig**2 * (yt**2 * jnp.exp(-xst) - 1.0)

    def proposal0(self, data):
        return dists.Normal(
            loc=self._xhat(0.0, self.sig0(), data[0]), scale=self.sig0()
        )

    def proposal(self, t, xp, data):
        return dists.Normal(
            loc=self._xhat(self.EXt(xp), self.sigma, data[t]), scale=self.sigma
        )

    def logeta(self, t, x, data):
        xst = self.EXt(x)
        xstmmu = xst - self.mu
        xhat = self._xhat(xst, self.sigma, data[t + 1])
        xhatmmu = xhat - self.mu
        return 0.5 / self.sigma**2 * (
            xhatmmu**2 - xstmmu**2
        ) - 0.5 * data[t + 1] ** 2 * jnp.exp(-xst) * (1.0 + xstmmu)


class StochVolLeverage(StochVol):
    r"""Stochastic volatility with leverage: correlated state/observation
    noise (reference state_space_models.py:501-543)."""

    default_params = {"mu": -1.02, "rho": 0.9702, "sigma": 0.178, "phi": 0.0}

    def PY(self, t, xp, x):
        if isinstance(t, int) and t == 0:
            u = (x - self.mu) / self.sig0()
        else:
            u = (x - self.EXt(xp)) / self.sigma
        std_x = jnp.exp(0.5 * x)
        return dists.Normal(
            loc=std_x * self.phi * u,
            scale=std_x * jnp.sqrt(1.0 - self.phi**2),
        )


class Gordon_etal(StateSpaceModel):
    r"""The classic toy nonlinear model of Gordon et al. (1993)
    (reference state_space_models.py:546-577)."""

    default_params = {
        "a": 0.05,
        "b": 0.5,
        "c": 25.0,
        "d": 8.0,
        "e": 1.2,
        "sigmaX": 3.162278,  # sqrt(10)
    }

    def PX0(self):
        return dists.Normal(scale=2.0)

    def PX(self, t, xp):
        return dists.Normal(
            loc=self.b * xp
            + self.c * xp / (1.0 + xp**2)
            + self.d * jnp.cos(self.e * (t - 1.0)),
            scale=self.sigmaX,
        )

    def PY(self, t, xp, x):
        return dists.Normal(loc=self.a * x**2)


class BearingsOnly(StateSpaceModel):
    """Bearings-only tracking model (reference state_space_models.py:580-608)."""

    default_params = {
        "sigmaX": 2.0e-4,
        "sigmaY": 1e-3,
        "x0": jnp.array([3e-3, -3e-3, 1.0, 1.0]),
    }

    def PX0(self):
        return dists.IndepProd(
            dists.Normal(loc=self.x0[0], scale=self.sigmaX),
            dists.Normal(loc=self.x0[1], scale=self.sigmaX),
            dists.Dirac(loc=self.x0[2]),
            dists.Dirac(loc=self.x0[3]),
        )

    def PX(self, t, xp):
        return dists.IndepProd(
            dists.Normal(loc=xp[:, 0], scale=self.sigmaX),
            dists.Normal(loc=xp[:, 1], scale=self.sigmaX),
            dists.Dirac(loc=xp[:, 0] + xp[:, 2]),
            dists.Dirac(loc=xp[:, 1] + xp[:, 3]),
        )

    def PY(self, t, xp, x):
        angle = jnp.arctan(x[:, 3] / x[:, 2])
        angle = angle + jnp.where(x[:, 2] < 0.0, jnp.pi, 0.0)
        return dists.Normal(loc=angle, scale=self.sigmaY)


class DiscreteCox(StateSpaceModel):
    r"""Discrete Cox (log-Gaussian Poisson) model
    (reference state_space_models.py:611-630)."""

    default_params = {"mu": 0.0, "sigma": 1.0, "phi": 0.95}

    def PX0(self):
        return dists.Normal(
            loc=self.mu, scale=self.sigma / jnp.sqrt(1.0 - self.phi**2)
        )

    def PX(self, t, xp):
        return dists.Normal(
            loc=self.mu + self.phi * (xp - self.mu), scale=self.sigma
        )

    def PY(self, t, xp, x):
        return dists.Poisson(rate=jnp.exp(x))


class MVStochVol(StateSpaceModel):
    """Multivariate stochastic volatility model
    (reference state_space_models.py:633-654)."""

    default_params = {"mu": 0.0, "covX": None, "corY": None, "F": None}

    def offset(self):
        return self.mu - jnp.dot(self.F, self.mu)

    def PX0(self):
        return dists.MvNormal(loc=self.mu, cov=self.covX)

    def PX(self, t, xp):
        return dists.MvNormal(
            loc=jnp.dot(xp, self.F.T) + self.offset(), cov=self.covX
        )

    def PY(self, t, xp, x):
        return dists.MvNormal(scale=jnp.exp(0.5 * x), cov=self.corY)


class ThetaLogistic(StateSpaceModel):
    r"""Theta-Logistic population model (Peters et al. 2010)
    (reference state_space_models.py:657-689)."""

    default_params = {
        "tau0": 0.15,
        "tau1": 0.12,
        "tau2": 0.1,
        "sigmaX": 0.47,
        "sigmaY": 0.39,
    }

    def PX0(self):
        return dists.Normal(loc=0.0, scale=1.0)

    def PX(self, t, xp):
        return dists.Normal(
            loc=xp + self.tau0 - self.tau1 * jnp.exp(self.tau2 * xp),
            scale=self.sigmaX,
        )

    def PY(self, t, xp, x):
        return dists.Normal(loc=x, scale=self.sigmaY)

    def proposal0(self, data):
        return self.PX0().posterior(data[0:1], sigma=self.sigmaY)

    def proposal(self, t, xp, data):
        # data[t][None]: works with traced t (gather), unlike data[t:t+1]
        return self.PX(t, xp).posterior(data[t][None], sigma=self.sigmaY)
