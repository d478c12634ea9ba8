"""Nested sampling: vanilla NS and the SMC variant (NS-SMC).

Counterpart of reference ``nested.py``: the vanilla nested-sampling loop
with random-walk mutation inside the likelihood contour
(:class:`NestedSampling` / :class:`Nested_RWmoves`, nested.py:155-274) and
the Salomone et al. (2018) :class:`NestedSamplingSMC` Feynman-Kac class
(nested.py:281-373).

TPU-native: the vanilla NS inner step (argmin deletion, constrained RWM
mutation with cloud-covariance proposals) is one jitted kernel; the host
loop only handles the streaming evidence estimate and the stopping rule.
NS-SMC runs through the SMC-sampler stepping engine with adaptive
percentile levels computed in-kernel; its ``done`` syncs one scalar (the
current level) per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from particles_tpu import resampling as rs
from particles_tpu import smc_samplers as ssps
from particles_tpu import utils

__all__ = ["NestedParticles", "NestedSampling", "Nested_RWmoves",
           "NestedSamplingSMC", "MeanCovTracker", "unif_minus_one"]


class NestedParticles(ssps.ThetaParticles):
    """Container for nested-sampling points (reference nested.py:147-152):
    parameters plus per-point log-prior and log-likelihood fields."""

    def __init__(self, theta=None, lprior=None, llik=None, shared=None):
        super().__init__(theta=theta, shared=shared, lprior=lprior,
                         llik=llik)


def unif_minus_one(key, N, m):
    """Uniform draw from {0..N-1} \\ {m} (reference nested.py:107-109)."""
    return (jax.random.randint(key, (), m + 1, m + N) % N).astype(jnp.int32)


def xxT(x):
    return jnp.outer(x, x)


class MeanCovTracker:
    """Tracks mean/cov/Cholesky of a set of points under add/remove
    (reference nested.py:117-144).  Host-side helper."""

    def __init__(self, x):
        self.N = x.shape[0]
        self.sx = jnp.sum(x, axis=0)
        self.sxxT = jnp.dot(x.T, x)
        self.update_mean_cov()

    def update_mean_cov(self):
        self.mean = self.sx / self.N
        self.cov = self.sxxT / self.N - xxT(self.mean)
        self.L = jnp.linalg.cholesky(self.cov)

    def remove_point(self, x):
        self.N -= 1
        self.sx = self.sx - x
        self.sxxT = self.sxxT - xxT(x)
        self.update_mean_cov()

    def add_point(self, x):
        self.N += 1
        self.sx = self.sx + x
        self.sxxT = self.sxxT + xxT(x)
        self.update_mean_cov()


class NestedSampling:
    """Base class for vanilla nested sampling (reference nested.py:155-230).

    Subclasses implement the jitted ``_mutate_kernel``; :class:`Nested_RWmoves`
    provides constrained random-walk mutation.

    Attributes after ``run()``: ``log_weights``, ``points`` (dict with
    ``llik`` and ``theta`` arrays), ``lZhats`` (log-evidence estimates).
    """

    def __init__(self, model=None, N=100, eps=1e-8, key=None, seed=0):
        self.model = model
        self.N = N
        self.eps = eps
        self.key = key if key is not None else jax.random.key(seed)

    def setup(self):
        self.key, k = jax.random.split(self.key)
        th = self.model.prior.rvs(k, size=self.N)
        self.arr = ssps.view_2d_array(dict(th))
        self.template = dict(th)
        self.lprior = self.model.prior.logpdf(th)
        self.llik = self.model.loglik(th)

    def _mutate_kernel(self, key, arr, lprior, llik, n, m):
        raise NotImplementedError

    def _chunk(self, key, arr, lprior, llik, lZ, i0, K):
        """K contractions (delete-lowest + constrained mutation + streaming
        evidence update) in ONE compiled call — the per-contraction host
        round-trip otherwise dominates on an accelerator."""
        lw0 = jnp.log(1.0 - jnp.exp(-1.0 / self.N))

        def body(c, j):
            arr, lprior, llik, lZ, key = c
            key, k = jax.random.split(key)
            n = jnp.argmin(llik)
            pt_ll = llik[n]
            pt_th = arr[n]
            i = i0 + j
            lw = lw0 - i.astype(jnp.float32) / self.N
            lZ = jnp.logaddexp(lZ, lw + pt_ll)
            m = unif_minus_one(jax.random.fold_in(k, 1), self.N, n)
            arr, lprior, llik = self._mutate_kernel(
                k, arr, lprior, llik, n, m
            )
            return (arr, lprior, llik, lZ, key), (pt_ll, pt_th, lZ)

        (arr, lprior, llik, lZ, _), (pll, pth, lZs) = jax.lax.scan(
            body, (arr, lprior, llik, lZ, key), jnp.arange(K)
        )
        return arr, lprior, llik, lZ, pll, pth, lZs

    @utils.timer
    def run(self, chunk_size=None):
        self.setup()
        K = max(self.N // 2, 10) if chunk_size is None else chunk_size
        chunk = jax.jit(self._chunk, static_argnames=("K",))
        lZ = jnp.float32(-jnp.inf)
        i0 = 0
        plls, pths, lZs_all = [], [], []
        while True:
            self.key, k = jax.random.split(self.key)
            self.arr, self.lprior, self.llik, lZ, pll, pth, lZs = chunk(
                k, self.arr, self.lprior, self.llik, lZ, jnp.int32(i0), K=K
            )
            plls.append(pll)
            pths.append(pth)
            lZs_all.append(lZs)
            i0 += K
            # stop when the evidence gained over the last chunk is negligible
            if abs(float(lZs[-1]) - float(lZs[0])) < self.eps:
                break
            if i0 > 1000 * self.N:  # safety bound
                break
        self.lZhats = list(np.asarray(jnp.concatenate(lZs_all)))
        self.points = {
            "llik": jnp.concatenate(plls),
            "theta": jnp.concatenate(pths),
        }
        self.log_weights = [
            float(np.log(1.0 - np.exp(-1.0 / self.N)) - i / self.N)
            for i in range(len(self.lZhats))
        ]


class Nested_RWmoves(NestedSampling):
    """Nested sampling with adaptive random-walk Metropolis mutation inside
    the likelihood contour (reference nested.py:233-274)."""

    def __init__(self, model=None, N=100, eps=1e-8, nsteps=1, scale=None,
                 key=None, seed=0):
        super().__init__(model=model, N=N, eps=eps, key=key, seed=seed)
        self.nsteps = nsteps
        self.scale = scale

    def _mutate_kernel(self, key, arr, lprior, llik, n, m):
        N, d = arr.shape
        scale = 2.38 / jnp.sqrt(d) if self.scale is None else self.scale
        lmin = llik[n]
        # cloud covariance without the deleted point
        mask = (jnp.arange(N) != n)[:, None]
        cnt = N - 1
        mean = jnp.sum(jnp.where(mask, arr, 0.0), axis=0) / cnt
        xc = jnp.where(mask, arr - mean, 0.0)
        cov = xc.T @ xc / cnt
        L = jnp.linalg.cholesky(cov + 1e-10 * jnp.eye(d))
        # start the chain from point m
        cur = arr[m]
        cur_lp = lprior[m]

        def body(i, state):
            cur, cur_lp, cur_ll, k = state
            k, k1, k2 = jax.random.split(k, 3)
            z = scale * (L @ jax.random.normal(k1, (d,)))
            prop = cur + z
            th_prop = ssps.theta_from_2d(
                prop[None], {p: v[:1] for p, v in self.template.items()}
            )
            lp = self.model.prior.logpdf(th_prop)[0]
            ll = self.model.loglik(th_prop)[0]
            ok = (ll > lmin) & (
                jnp.log(jax.random.uniform(k2, ())) < lp - cur_lp
            )
            cur = jnp.where(ok, prop, cur)
            cur_lp = jnp.where(ok, lp, cur_lp)
            cur_ll = jnp.where(ok, ll, cur_ll)
            return cur, cur_lp, cur_ll, k

        cur, cur_lp, cur_ll, _ = jax.lax.fori_loop(
            0, self.nsteps, body, (cur, cur_lp, llik[m], key)
        )
        arr = arr.at[n].set(cur)
        lprior = lprior.at[n].set(cur_lp)
        llik = llik.at[n].set(cur_ll)
        return arr, lprior, llik


class NestedSamplingSMC(ssps.FKSMCsampler):
    """Nested sampling by SMC (Salomone et al. 2018)
    (reference nested.py:281-373): at time t the target is the prior
    constrained to {L(theta) > l_t}, with l_t the (1-ESSrmin)-quantile of
    the current likelihood values; the evidence estimate accumulates in
    ``X.shared['log_evid']``.  Always resamples; terminates when the
    final-time evidence correction is below ``eps`` (level set to +inf).
    """

    always_resample = True

    def __init__(self, model=None, wastefree=True, len_chain=10, move=None,
                 ESSrmin=0.1, eps=0.01):
        super().__init__(model=model, wastefree=wastefree,
                         len_chain=len_chain, move=move)
        self.ESSrmin = ESSrmin
        self.eps = eps

    def time_to_resample(self, view):
        return jnp.asarray(True)

    def done(self, smc):
        if smc.X is None:
            return False
        # terminate ONLY on lt == +inf (the final "consume the remaining
        # prior mass" level, reference nested.py:330-351).  lt can be -inf
        # mid-run when most particles sit in a hard-constrained zero-
        # likelihood region — the level must keep shrinking then.
        return bool(smc.X.shared["lt"] == jnp.inf)

    def _M0(self, key, N0):
        th = dict(self.model.prior.rvs(key, size=N0))
        x = ssps.ThetaParticles(
            theta=th,
            lprior=self.model.prior.logpdf(th),
            llik=self.model.loglik(th),
        )
        x = x.replace(lpost=x.lprior)
        # uniform weights normalised over the GLOBAL count (calibrate's
        # moment reductions are dist-aware)
        cal = self.move.calibrate(jnp.full(N0, 1.0 / ssps._gN(N0)), x)
        return x.with_shared(
            lt=jnp.float32(-jnp.inf),
            log_evid=jnp.float32(-jnp.inf),
            acc_rate=jnp.float32(0.0),
            **cal,
        )

    def current_target(self, lt):
        def target(xx, key=None):
            lprior = self.model.prior.logpdf(xx.theta)
            llik = self.model.loglik(xx.theta)
            lpost = jnp.where(
                jnp.isinf(lt) & (lt < 0),
                lprior,
                jnp.where(llik >= lt, lprior, -jnp.inf),
            )
            return xx.replace(lprior=lprior, llik=llik, lpost=lpost)

        return target

    def move_target(self, t, x):
        return self.current_target(x.shared["lt"])

    def logG_and_update(self, t, x):
        llik = x.llik
        curr_evid = x.shared["log_evid"]
        # one (N0,) all-gather serves the percentile level AND the two
        # evidence reductions, replicated identically on every shard
        # (identity single-device); under particle sharding a shard-local
        # percentile/log_sum_exp would be silently wrong
        llik_all = ssps._gather_global(llik)
        N0 = llik_all.shape[0]
        lt = jnp.percentile(llik_all, 100.0 * (1.0 - self.ESSrmin))
        t_f = t.astype(jnp.float32) if hasattr(t, "astype") else jnp.float32(t)
        log_shrink = t_f * jnp.log(self.ESSrmin) - jnp.log(N0)
        lZt = log_shrink + rs.log_sum_exp(
            jnp.where(llik_all <= lt, llik_all, -jnp.inf))
        new_evid = jnp.logaddexp(curr_evid, lZt)
        lZt_final = log_shrink + rs.log_sum_exp(llik_all)
        new_evid_final = jnp.logaddexp(curr_evid, lZt_final)
        stop = jnp.abs(new_evid - new_evid_final) < self.eps
        lt = jnp.where(stop, jnp.inf, lt)
        new_evid = jnp.where(stop, new_evid_final, new_evid)
        lw = jnp.where(
            stop, jnp.zeros_like(llik), jnp.where(llik > lt, 0.0, -jnp.inf)
        )
        x = x.with_shared(lt=lt, log_evid=new_evid)
        return lw, x
