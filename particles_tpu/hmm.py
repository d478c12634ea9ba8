"""Finite hidden Markov models and exact Baum-Welch filtering/smoothing.

Counterpart of reference ``hmm.py``: the :class:`HMM`/:class:`GaussianHMM`
model classes (hmm.py:107-141) and the :class:`BaumWelch` forward/backward
algorithm (hmm.py:143-268), with the recursions as ``lax.scan``s.  Serves as
the exact oracle for particle filters on finite state spaces (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import particles_tpu.distributions as dists
from particles_tpu import resampling as rs
from particles_tpu import state_space_models as ssms

__all__ = ["HMM", "GaussianHMM", "BaumWelch"]


class HMM(ssms.StateSpaceModel):
    """Base class for (finite) hidden Markov models (reference hmm.py:107-131).

    Subclass and define ``PY``.  Parameters: ``init_dist`` (dim,) initial
    probabilities (uniform by default), ``trans_mat`` (dim, dim) transition
    matrix.
    """

    default_params = {"init_dist": None, "trans_mat": None}

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if self.trans_mat is None:
            raise ValueError("Transition Matrix is missing")
        self.trans_mat = jnp.asarray(self.trans_mat)
        if self.init_dist is None:
            self.init_dist = jnp.full(
                self.trans_mat.shape[0], 1.0 / self.trans_mat.shape[0]
            )
        else:
            self.init_dist = jnp.asarray(self.init_dist)

    @property
    def dim(self):
        return self.trans_mat.shape[0]

    def PX0(self):
        return dists.Categorical(p=self.init_dist)

    def PX(self, t, xp):
        return dists.Categorical(p=self.trans_mat[xp, :])


class GaussianHMM(HMM):
    r"""Gaussian HMM: Y_t | X_t = k ~ N(mus[k], sigmas[k]^2)
    (reference hmm.py:134-141)."""

    default_params = {"mus": None, "sigmas": None}
    default_params.update(HMM.default_params)

    def PY(self, t, xp, x):
        return dists.Normal(loc=self.mus[x], scale=self.sigmas[x])


class BaumWelch:
    """Exact forward/backward algorithm for finite HMMs
    (reference hmm.py:143-268).

    After ``forward()``: ``filt``/``pred`` (T, dim) probability arrays,
    ``logpyt`` (T,) log-likelihood factors, ``logft`` (T, dim) emission
    log-densities.  After ``backward()``: ``smth`` (T, dim).  ``sample(key,
    N)`` draws N posterior trajectories.  Requires Y_t to depend on X_t only
    and a homogeneous chain, like the reference.
    """

    def __init__(self, hmm=None, data=None):
        self.hmm = hmm
        self.data = jnp.asarray(data)
        self.pred = None
        self.filt = None
        self.logpyt = None
        self.logft = None
        self.smth = None

    def _emission_logpdf(self, t, yt):
        return self.hmm.PY(t, None, jnp.arange(self.hmm.dim)).logpdf(yt)

    def forward(self):
        """Forward recursion over all T observations (reference hmm.py:212-221)."""
        hmm, data = self.hmm, self.data
        dim = hmm.dim
        # emission log-densities can be computed all at once: (T, dim)
        logft = jax.vmap(
            lambda t, yt: self._emission_logpdf(t, yt)
        )(jnp.arange(data.shape[0]), data)

        def body(filt_prev, emis):
            p = jnp.matmul(filt_prev, hmm.trans_mat)
            lp = jnp.log(p) + emis
            logpyt = rs.log_sum_exp(lp)
            f = jnp.exp(lp - logpyt)
            return f, (p, f, logpyt)

        lp0 = jnp.log(hmm.init_dist) + logft[0]
        logpyt0 = rs.log_sum_exp(lp0)
        f0 = jnp.exp(lp0 - logpyt0)
        _, (preds, filts, logpyts) = jax.lax.scan(body, f0, logft[1:])
        cat = lambda a, rest: jnp.concatenate([a[None], rest], axis=0)
        self.pred = cat(hmm.init_dist, preds)
        self.filt = cat(f0, filts)
        self.logpyt = cat(logpyt0, logpyts)
        self.logft = logft

    @property
    def logLt(self):
        """Exact log-likelihood log p(y_{0:T-1})."""
        if self.logpyt is None:
            self.forward()
        return jnp.sum(self.logpyt)

    def backward(self):
        """Backward recursion for marginal smoothing probabilities
        (reference hmm.py:223-245)."""
        if self.filt is None:
            self.forward()
        log_trans = jnp.log(self.hmm.trans_mat)

        def body(ctg, xs):
            filt_t, next_ft = xs
            # cost-to-go update: log-sum-exp over next state
            lp = log_trans + (next_ft + ctg)[None, :]
            m = jnp.max(lp, axis=1, keepdims=True)
            new_ctg = (m[:, 0] + jnp.log(
                jnp.sum(jnp.exp(lp - m), axis=1)
            ))
            smth = rs.exp_and_normalise(jnp.log(filt_t) + new_ctg)
            return new_ctg, smth

        ctg0 = jnp.zeros(self.hmm.dim)
        filt_rev = self.filt[-2::-1]
        ft_rev = self.logft[:0:-1]
        _, smths_rev = jax.lax.scan(body, ctg0, (filt_rev, ft_rev))
        self.smth = jnp.concatenate(
            [smths_rev[::-1], self.filt[-1][None]], axis=0
        )

    def run(self):
        self.forward()
        self.backward()

    def sample(self, key, N=1):
        """Sample N trajectories from the joint smoothing posterior
        (reference hmm.py:251-268), vectorised over N."""
        if self.filt is None:
            self.forward()
        T = self.filt.shape[0]
        kT, kscan = jax.random.split(key)
        last = rs.multinomial_iid(kT, self.filt[-1], N)
        log_trans = jnp.log(self.hmm.trans_mat)
        keys = jax.random.split(kscan, T - 1)

        def body(next_states, xs):
            filt_t, k = xs
            # probs (N, dim): column of trans_mat for each sampled next state
            lp = jnp.take(log_trans.T, next_states, axis=0) + jnp.log(filt_t)
            W = jax.nn.softmax(lp, axis=1)
            cs = jnp.cumsum(W, axis=1)
            u = jax.random.uniform(k, (N, 1))
            states = jnp.clip(
                jnp.sum(u > cs, axis=1), 0, self.hmm.dim - 1
            ).astype(jnp.int32)
            return states, states

        _, path_rev = jax.lax.scan(
            body, last, (self.filt[-2::-1], keys)
        )
        paths = jnp.concatenate([path_rev[::-1], last[None]], axis=0)
        return paths
