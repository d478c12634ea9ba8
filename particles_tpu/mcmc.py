"""MCMC and particle MCMC: adaptive RWM, PMMH, CSMC, (Particle) Gibbs.

Counterpart of reference ``mcmc.py``: the :class:`MCMC` runner (mcmc.py:122-181),
the vanishing-adaptation covariance tracker (:188-223), adaptive random-walk
Metropolis (:226-304), :class:`PMMH` (:359-450), conditional SMC
(:453-475) and (Particle) Gibbs (:482-619).

TPU-native design: for :class:`BasicRWHM` and :class:`PMMH` the WHOLE chain
— propose, evaluate (for PMMH: run a full inner particle filter as a nested
``lax.scan``), accept/reject, adapt the proposal covariance — is one
``lax.scan`` compiled once.  The reference runs one Python iteration (and
one full NumPy particle filter) per MCMC step (mcmc.py:445-450; quoted cost
">10h" for 1e5 iterations, book/pmcmc/pmmh_lingauss.py:15); here the same
experiment is one XLA program.  Particle Gibbs iterates a jitted CSMC kernel
under host control (its theta-update is user-defined).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from particles_tpu import core
from particles_tpu import resampling as rs
from particles_tpu import smc_samplers as ssp
from particles_tpu import state_space_models as ssms
from particles_tpu import utils

__all__ = [
    "msjd",
    "MCMC",
    "VanishCovTracker",
    "GenericRWHM",
    "BasicRWHM",
    "PMMH",
    "CSMC",
    "GenericGibbs",
    "ParticleGibbs",
]


def msjd(theta):
    """Mean squared jumping distance of a chain stored as a dict of
    (niter, ...) arrays (reference mcmc.py:105-119)."""
    s = 0.0
    for p in theta:
        s += jnp.sum(jnp.diff(theta[p], axis=0) ** 2)
    return s


class MCMC:
    """MCMC base class (reference mcmc.py:122-181): subclasses define
    ``step0`` and ``step(n)``; ``run`` may be overridden with a fully
    compiled path."""

    def __init__(self, niter=10, verbose=0, key=None, seed=0):
        self.niter = niter
        self.verbose = verbose
        self.key = key if key is not None else jax.random.key(seed)

    def step0(self):
        raise NotImplementedError

    def step(self, n):
        raise NotImplementedError

    def mean_sq_jump_dist(self, discard_frac=0.1):
        discard = int(self.niter * discard_frac)
        return msjd({k: v[discard:] for k, v in self.chain.theta.items()})

    def diagnostics(self, discard_frac=0.1, method="init_seq"):
        """Per-parameter split-Rhat and effective sample size of the stored
        chain(s) (``variance_mcmc.chain_diagnostics``); with ``nchains > 1``
        the chains enter jointly.  No counterpart in the reference (its
        pmcmc studies eyeball trace plots)."""
        from particles_tpu import variance_mcmc

        discard = int(self.niter * discard_frac)
        return variance_mcmc.chain_diagnostics(
            self.chain.theta, nchains=getattr(self, "nchains", 1),
            discard=discard, method=method)

    def print_progress(self, n):
        msg = f"Iteration {n}"
        if hasattr(self, "nacc") and n > 0:
            msg += f", acc. rate={self.nacc / n:.3f}"
        print(msg)

    @utils.timer
    def run(self):
        for n in range(self.niter):
            if n == 0:
                self.step0()
            else:
                self.step(n)
            if self.verbose > 0 and (n * self.verbose) % self.niter == 0:
                self.print_progress(n)


class _TrackerState(NamedTuple):
    t: jnp.ndarray
    mu: jnp.ndarray
    Sigma: jnp.ndarray
    L: jnp.ndarray
    L0: jnp.ndarray


class VanishCovTracker:
    """Vanishing-adaptation running mean/covariance tracker
    (reference mcmc.py:188-223), as a functional state + update so it can
    live inside a scanned chain.  On a failed Cholesky the initial factor is
    reused (reference mcmc.py:220-223), via a finite-ness mask."""

    def __init__(self, alpha=0.6, dim=1, mu0=None, Sigma0=None):
        self.alpha = alpha
        self.dim = dim
        self.mu0 = jnp.zeros(dim) if mu0 is None else jnp.asarray(mu0)
        self.Sigma0 = jnp.eye(dim) if Sigma0 is None else jnp.asarray(Sigma0)

    def init_state(self):
        L0 = jnp.linalg.cholesky(self.Sigma0)
        return _TrackerState(
            t=jnp.int32(0), mu=self.mu0, Sigma=self.Sigma0, L=L0, L0=L0
        )

    def update(self, state, v):
        t = state.t + 1
        g = (t + 1.0) ** (-self.alpha)
        mu = (1.0 - g) * state.mu + g * v
        mv = v - mu
        Sigma = (1.0 - g) * state.Sigma + g * jnp.outer(mv, mv)
        L = jnp.linalg.cholesky(Sigma)
        L = jnp.where(jnp.all(jnp.isfinite(L)), L, state.L0)
        return _TrackerState(t=t, mu=mu, Sigma=Sigma, L=L, L0=state.L0)


def _theta_template(prior, key):
    """dict of scalar arrays defining the parameter layout."""
    th1 = prior.rvs(key, size=1)
    return {k: v[0] for k, v in th1.items()}


def _dict_to_vec(theta):
    parts = []
    for k in theta:
        v = jnp.atleast_1d(theta[k])
        parts.append(v.ravel())
    return jnp.concatenate(parts)


def _vec_to_dict(vec, template):
    out = {}
    j = 0
    for k in template:
        v = template[k]
        d = int(np.prod(v.shape)) if v.ndim > 0 else 1
        out[k] = vec[j : j + d].reshape(v.shape)
        j += d
    return out


class GenericRWHM(MCMC):
    """Adaptive Gaussian random-walk Hastings-Metropolis
    (reference mcmc.py:226-304), with the whole chain as one ``lax.scan``.

    Subclasses define ``logpost(theta_dict) -> scalar`` (jittable).
    """

    def __init__(self, niter=10, verbose=0, theta0=None, adaptive=True,
                 scale=1.0, rw_cov=None, key=None, seed=0, nchains=1,
                 mesh=None, mesh_axis=None):
        super().__init__(niter=niter, verbose=verbose, key=key, seed=seed)
        self.theta0 = theta0
        self.adaptive = adaptive
        self.nchains = int(nchains)
        # chains x devices (SURVEY §2b row 1: the reference's primary
        # parallelism is one run per core, utils.py:158-186): with a mesh,
        # the vmapped chain axis is sharded over ``mesh_axis`` (default:
        # the mesh's first axis) — chains are independent, so GSPMD
        # partitions the program with ZERO collectives; per-chain
        # results match the single-device vmapped path to ulp-level
        # reassociation tolerance (XLA per-partition codegen may
        # re-vectorise within-chain reductions).
        # Composes with the particle axis multiplicatively: each chain's
        # inner filter stays on one device (vmap); sharding BOTH chains
        # and particles of one chain would need the shard_map engine
        # inside vmap, which is not plumbed (particle sharding at
        # PMMH's Nx ~ 100 would be all overhead anyway).
        self.mesh = mesh
        if mesh is not None and mesh_axis is None:
            mesh_axis = mesh.axis_names[0]
        self.mesh_axis = mesh_axis
        k_tmpl, self.key = jax.random.split(self.key)
        self.template = _theta_template(self.prior, k_tmpl)
        self.dim = int(_dict_to_vec(self.template).shape[0])
        if self.adaptive:
            self.scale = scale * 2.38 / np.sqrt(self.dim)
            self.cov_tracker = VanishCovTracker(dim=self.dim, Sigma0=rw_cov)
        else:
            # reference parity (mcmc.py:269-272): `scale` deliberately does
            # NOT multiply the fixed proposal factor — it is documented as
            # adaptive-only; non-adaptive users tune via rw_cov
            self.scale = 1.0
            cov = jnp.eye(self.dim) if rw_cov is None else jnp.asarray(rw_cov)
            self.fixed_L = jnp.linalg.cholesky(cov)

    def logpost(self, theta):
        raise NotImplementedError

    # chains longer than this run as several compiled segments: very long
    # single XLA programs can exceed runtime deadlines on some backends
    chain_chunk = 2000

    def _chain_scan(self, key, state0, nsteps):
        adaptive = self.adaptive
        tracker = self.cov_tracker if adaptive else None
        scale = self.scale

        def body(state, k):
            theta_vec, lpost, trk, nacc = state
            k1, k2, keval = jax.random.split(k, 3)
            L = scale * trk.L if adaptive else self.fixed_L
            z = jax.random.normal(k1, (self.dim,))
            prop_vec = theta_vec + L @ z
            # subclasses whose logpost is stochastic (PMMH: an inner particle
            # filter) read a fresh key from self._eval_key
            self._eval_key = keval
            lpost_prop = self.logpost(_vec_to_dict(prop_vec, self.template))
            lu = jnp.log(jax.random.uniform(k2, ()))
            accept = lu < (lpost_prop - lpost)
            theta_vec = jnp.where(accept, prop_vec, theta_vec)
            lpost = jnp.where(accept, lpost_prop, lpost)
            if adaptive:
                trk = tracker.update(trk, theta_vec)
            nacc = nacc + accept.astype(jnp.int32)
            return (theta_vec, lpost, trk, nacc), (theta_vec, lpost)

        keys = jax.random.split(key, nsteps)
        state, (thetas, lposts) = jax.lax.scan(body, state0, keys)
        return state, thetas, lposts

    @utils.timer
    def run(self):
        """Run the chain(s) as (a few) compiled segments.

        With ``nchains > 1`` the chains run VMAPPED — K independent
        chains (overdispersed prior starts, independent proposal
        adaptation and, for PMMH, independent inner-filter randomness)
        for roughly the device cost of one when a single chain
        underutilises the chip (the PMMH regime: Nx ~ 100 inner
        particles leaves the VPU ~idle).  The reference runs its
        multi-chain PMMH studies serially (book/pmcmc/pmmh_lingauss.py:15,
        ">10 h" on one core).  The chain is stored with leaves shaped
        ``(niter, nchains, ...)`` — the (P, M) layout
        :mod:`particles_tpu.variance_mcmc` estimators consume directly.
        """
        if self.nchains > 1:
            return self._run_multichain()
        k0, keval0, kchain = jax.random.split(self.key, 3)
        if self.theta0 is None:
            th0 = {k: v[0] for k, v in self.prior.rvs(k0, size=1).items()}
        else:
            # pack in TEMPLATE order (the unpack order), never the user's
            # dict insertion order — a mismatch silently swaps parameters
            if set(self.theta0) != set(self.template):
                raise ValueError(
                    f"theta0 keys {sorted(self.theta0)} != prior keys "
                    f"{sorted(self.template)}")
            th0 = {k: jnp.asarray(self.theta0[k]) for k in self.template}
        th0_vec = _dict_to_vec(th0)
        self._eval_key = keval0
        lpost0 = jax.jit(self.logpost)(_vec_to_dict(th0_vec, self.template))
        trk0 = (self.cov_tracker.init_state() if self.adaptive
                else _TrackerState(jnp.int32(0), jnp.zeros(self.dim),
                                   jnp.eye(self.dim), jnp.eye(self.dim),
                                   jnp.eye(self.dim)))

        # cache the jitted runner ON THE INSTANCE: run() may be called
        # again (bench re-runs with a re-seeded key) and a fresh jax.jit
        # wrapper around a fresh bound method would retrace AND recompile
        # the whole nested chain scan
        if not hasattr(self, "_runner_single"):
            self._runner_single = jax.jit(self._chain_scan,
                                          static_argnames=("nsteps",))
        runner = self._runner_single
        state = (th0_vec, lpost0, trk0, jnp.int32(0))
        remaining = self.niter - 1
        th_chunks, lp_chunks = [th0_vec[None]], [jnp.asarray(lpost0)[None]]
        while remaining > 0:
            nsteps = min(remaining, self.chain_chunk)
            kchain, kc = jax.random.split(kchain)
            state, thetas, lposts = runner(kc, state, nsteps=nsteps)
            jax.block_until_ready(lposts)
            th_chunks.append(thetas)
            lp_chunks.append(lposts)
            remaining -= nsteps
        all_thetas = jnp.concatenate(th_chunks, axis=0)
        all_lposts = jnp.concatenate(lp_chunks, axis=0)
        theta_chain = jax.vmap(
            lambda v: _vec_to_dict(v, self.template)
        )(all_thetas)
        self.chain = ssp.ThetaParticles(theta=theta_chain, lpost=all_lposts)
        self.nacc = int(state[3])

    def _run_multichain(self):
        """``nchains`` vmapped chains; see :meth:`run`."""
        nc = self.nchains
        k0, keval0, kchain = jax.random.split(self.key, 3)
        if self.theta0 is None:
            th0 = self.prior.rvs(k0, size=nc)  # dict of (nc, ...) leaves
        else:
            if set(self.theta0) != set(self.template):
                raise ValueError(
                    f"theta0 keys {sorted(self.theta0)} != prior keys "
                    f"{sorted(self.template)}")
            th0 = {}
            for k in self.template:
                v = jnp.asarray(self.theta0[k])
                tgt = (nc,) + self.template[k].shape
                if v.shape == self.template[k].shape:
                    v = jnp.broadcast_to(v, tgt)  # same start, all chains
                elif v.shape != tgt:
                    raise ValueError(
                        f"theta0[{k!r}]: shape {v.shape} is neither the "
                        f"scalar template shape {self.template[k].shape} "
                        f"nor the per-chain shape {tgt}")
                th0[k] = v
        th0_vecs = jax.vmap(_dict_to_vec)(th0)  # (nc, dim)

        def _lp0(vec, kev):
            self._eval_key = kev
            return self.logpost(_vec_to_dict(vec, self.template))

        # chains x devices: shard the chain axis of every (nc, ...) leaf
        # over the mesh; GSPMD partitions the independent chains with no
        # collectives.  Pallas kernels cannot be partitioned by GSPMD, so
        # trace under no_pallas (at PMMH's Nx the kernels would not route
        # anyway; this keeps large-Nx configs safe).
        from contextlib import nullcontext

        from particles_tpu.ops import guard

        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            Dm = int(self.mesh.shape[self.mesh_axis])
            if nc % Dm:
                raise ValueError(
                    f"nchains={nc} not divisible by mesh axis "
                    f"{self.mesh_axis!r} size {Dm}")
            _shard = NamedSharding(self.mesh, _P(self.mesh_axis))
            put = lambda tree: jax.tree_util.tree_map(  # noqa: E731
                lambda l: jax.device_put(l, _shard), tree)
            trace_ctx = guard.no_pallas
        else:
            put = lambda tree: tree  # noqa: E731
            trace_ctx = nullcontext

        with trace_ctx():
            lpost0 = jax.jit(jax.vmap(_lp0))(
                put(th0_vecs), put(jax.random.split(keval0, nc)))
        trk1 = (self.cov_tracker.init_state() if self.adaptive
                else _TrackerState(jnp.int32(0), jnp.zeros(self.dim),
                                   jnp.eye(self.dim), jnp.eye(self.dim),
                                   jnp.eye(self.dim)))
        trk0 = jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l, (nc,) + l.shape), trk1)

        def _scan_mc(ks, states, nsteps):
            return jax.vmap(
                lambda k, s: self._chain_scan(k, s, nsteps))(ks, states)

        # instance-cached jit wrapper: see run()
        if not hasattr(self, "_runner_multi"):
            self._runner_multi = jax.jit(_scan_mc,
                                         static_argnames=("nsteps",))
        runner = self._runner_multi
        state = (put(th0_vecs), lpost0, put(trk0),
                 put(jnp.zeros(nc, jnp.int32)))
        remaining = self.niter - 1
        th_chunks = [th0_vecs[:, None, :]]        # (nc, 1, dim)
        lp_chunks = [lpost0[:, None]]
        # per-chunk device time scales with nchains — scale the chunk down
        # so one compiled segment stays well under backend runtime
        # deadlines (the axon tunnel kills single programs at ~100 s; an
        # unscaled chunk re-wedged the chip on 2026-08-19).  The floor of
        # 25 keeps host-dispatch overhead negligible while preserving the
        # 1/nchains scaling up to nc = 80 (a floor of 100 stopped scaling
        # at nc = 20 and eroded the deadline margin for expensive configs).
        chunk = max(25, self.chain_chunk // nc)
        while remaining > 0:
            nsteps = min(remaining, chunk)
            kchain, kc = jax.random.split(kchain)
            with trace_ctx():
                state, thetas, lposts = runner(
                    put(jax.random.split(kc, nc)), state, nsteps=nsteps)
            jax.block_until_ready(lposts)
            th_chunks.append(thetas)              # (nc, nsteps, dim)
            lp_chunks.append(lposts)
            remaining -= nsteps
        # (niter, nc, ...) — the variance_mcmc (P, M) chain-array layout
        all_thetas = jnp.concatenate(th_chunks, axis=1).transpose(1, 0, 2)
        all_lposts = jnp.concatenate(lp_chunks, axis=1).T
        theta_chain = jax.vmap(jax.vmap(
            lambda v: _vec_to_dict(v, self.template)))(all_thetas)
        self.chain = ssp.ThetaParticles(theta=theta_chain, lpost=all_lposts)
        self.nacc = np.asarray(state[3])          # per-chain accept counts

    @property
    def acc_rate(self):
        """Acceptance rate — a scalar for one chain, (nchains,) vmapped."""
        return self.nacc / (self.niter - 1)


class BasicRWHM(GenericRWHM):
    """Random-walk Metropolis for a StaticModel posterior
    (reference mcmc.py:304-356)."""

    def __init__(self, niter=10, verbose=0, theta0=None, adaptive=True,
                 scale=1.0, rw_cov=None, model=None, key=None, seed=0,
                 nchains=1, mesh=None, mesh_axis=None):
        if model is None:
            raise ValueError("BasicRWHM: model not provided")
        self.model = model
        self.prior = model.prior
        super().__init__(niter=niter, verbose=verbose, theta0=theta0,
                         adaptive=adaptive, scale=scale, rw_cov=rw_cov,
                         key=key, seed=seed, nchains=nchains, mesh=mesh,
                         mesh_axis=mesh_axis)

    def logpost(self, theta):
        th_batch = {k: jnp.atleast_1d(v) for k, v in theta.items()}
        return self.model.logpost(th_batch)[0]


class PMMH(GenericRWHM):
    """Particle marginal Metropolis-Hastings (reference mcmc.py:359-450):
    the likelihood in the Metropolis ratio is the logLt estimate of a
    bootstrap (or guided) filter run at the proposed parameter.

    The inner particle filter is a nested ``lax.scan``, so the entire
    PMMH chain compiles to a single XLA program.
    """

    def __init__(self, niter=10, verbose=0, ssm_cls=None, prior=None,
                 data=None, fk_cls=None, Nx=100, theta0=None,
                 adaptive=True, scale=1.0, rw_cov=None, key=None, seed=0,
                 resampling="systematic", ESSrmin=0.5, smc_cls=None,
                 smc_options=None, nchains=1, mesh=None, mesh_axis=None):
        self.ssm_cls = ssm_cls
        self.prior = prior
        self.data = jnp.asarray(data)
        self.fk_cls = ssms.Bootstrap if fk_cls is None else fk_cls
        self.Nx = Nx
        self.resampling = resampling
        self.ESSrmin = ESSrmin
        # reference parity (mcmc.py:424-426): smc_cls / smc_options are
        # forwarded to the inner filter.  The inner filter always runs
        # through the compiled scan engine, so we translate the supported
        # options (qmc -> the SQMC step, resampling, ESSrmin) and raise on
        # anything else rather than silently running a different algorithm.
        from particles_tpu import core as _core

        self.qmc = False
        if smc_cls is not None:
            if smc_cls is _core.SQMC:
                self.qmc = True
            elif smc_cls is not _core.SMC:
                raise ValueError(
                    f"PMMH: unsupported smc_cls {smc_cls!r} (use SMC or "
                    "SQMC)")
        if smc_options:
            opts = dict(smc_options)
            self.qmc = bool(opts.pop("qmc", self.qmc))
            self.resampling = opts.pop("resampling", self.resampling)
            self.ESSrmin = opts.pop("ESSrmin", self.ESSrmin)
            if opts:
                raise ValueError(
                    "PMMH: unsupported smc_options "
                    f"{sorted(opts)} (supported: qmc, resampling, ESSrmin)")
        super().__init__(niter=niter, verbose=verbose, theta0=theta0,
                         adaptive=adaptive, scale=scale, rw_cov=rw_cov,
                         key=key, seed=seed, nchains=nchains, mesh=mesh,
                         mesh_axis=mesh_axis)
        self._pf_key = jax.random.fold_in(self.key, 12345)

    def alg_instance(self, theta, key=None):
        """A runnable SMC object at a given (dict of scalars) theta —
        API parity with reference mcmc.py:438-443."""
        import particles_tpu as particles

        fk = self.fk_cls(ssm=self.ssm_cls(**theta), data=self.data)
        return particles.SMC(fk=fk, N=self.Nx, key=key, collect="off",
                             qmc=self.qmc, resampling=self.resampling,
                             ESSrmin=self.ESSrmin)

    def _pf_logLt(self, key, theta):
        fk = self.fk_cls(ssm=self.ssm_cls(**theta), data=self.data)
        T = self.data.shape[0]
        carry, _, _ = core._run_full(
            fk, key, self.Nx, T, self.qmc, self.resampling, self.ESSrmin,
            None, False,
        )
        return carry.logLt

    def logpost(self, theta):
        lprior = self.prior.logpdf(
            {k: jnp.atleast_1d(v) for k, v in theta.items()}
        )[0]
        # fresh PF randomness per evaluation: fold the log-prior bits in
        # (the scan body supplies fresh keys through self._eval_key)
        key = self._eval_key
        neg_inf = jnp.asarray(-jnp.inf, dtype=jnp.result_type(float))
        loglik = jax.lax.cond(
            jnp.isfinite(lprior),
            lambda: self._pf_logLt(key, theta).astype(neg_inf.dtype),
            lambda: neg_inf,
        )
        return lprior + loglik

# ---------------------------------------------------------------------------
# conditional SMC and Particle Gibbs
# ---------------------------------------------------------------------------

def _csmc_run(fk, key, N, T, xstar, ESSrmin):
    """Conditional SMC as one scan: multinomial resampling, particle 0 pinned
    to the reference trajectory (ancestor forced to 0), full history."""
    k0, kloop = jax.random.split(key)
    X = fk.M0(k0, N)
    X = X.at[0].set(xstar[0])
    lw = fk.logG(0, None, X)
    wgts0 = rs.Weights(lw)

    def body(carry, inp):
        X, lw, log_mean_w, logLt = carry
        t, k = inp
        k_rs, k_m = jax.random.split(k)
        wgts = rs.Weights(lw)
        rs_flag = wgts.ESS < N * ESSrmin
        A_res = rs.multinomial(k_rs, wgts.W, N)
        A = jnp.where(rs_flag, A_res, jnp.arange(N, dtype=jnp.int32))
        A = A.at[0].set(0)
        Xp = jnp.take(X, A, axis=0)
        lw_base = jnp.where(rs_flag, jnp.zeros(N, lw.dtype), lw)
        Xnew = fk.M(k_m, t, Xp)
        Xnew = Xnew.at[0].set(xstar[t])
        lw_new = lw_base + fk.logG(t, Xp, Xnew)
        w_new = rs.Weights(lw_new)
        loglt = jnp.where(rs_flag, w_new.log_mean, w_new.log_mean - log_mean_w)
        return (Xnew, lw_new, w_new.log_mean, logLt + loglt), (Xnew, A, lw_new)

    ts = jnp.arange(1, T, dtype=jnp.int32)
    keys = jax.random.split(kloop, T - 1)
    (Xf, lwf, _, logLt), (Xs, As, lws) = jax.lax.scan(
        body, (X, lw, wgts0.log_mean, wgts0.log_mean), (ts, keys)
    )
    cat = lambda a, rest: jnp.concatenate([a[None], rest], axis=0)
    histX = cat(X, Xs)
    histA = cat(jnp.arange(N, dtype=jnp.int32), As)
    histlw = cat(lw, lws)
    return histX, histA, histlw, logLt


_csmc_cache = {}


class CSMC:
    """Conditional SMC: a particle filter in which particle 0 is pinned to a
    reference trajectory ``xstar`` with its ancestor forced to 0
    (reference mcmc.py:453-475).  Multinomial resampling + full history,
    like the reference; the whole conditional filter is one compiled scan.

    Currently supports array-valued states (all built-in SSMs).
    """

    def __init__(self, fk=None, N=100, ESSrmin=0.5, xstar=None, key=None,
                 seed=0):
        self.fk = fk
        self.N = N
        self.ESSrmin = ESSrmin
        self.xstar = jnp.asarray(xstar)
        self.key = key if key is not None else jax.random.key(seed)
        self.hist = None
        self.logLt = None

    @utils.timer
    def run(self):
        from particles_tpu import smoothing

        T = int(self.fk.T)
        ck = (type(self.fk), self.N, T, self.ESSrmin)
        if ck not in _csmc_cache:
            _csmc_cache[ck] = jax.jit(
                lambda fk, key, xstar: _csmc_run(
                    fk, key, self.N, T, xstar, self.ESSrmin
                )
            )
        histX, histA, histlw, logLt = _csmc_cache[ck](
            self.fk, self.key, self.xstar
        )
        self.hist = smoothing.ParticleHistory(self.fk, histX, histA, histlw)
        self.X = histX[-1]
        self.wgts = rs.Weights(histlw[-1])
        self.logLt = logLt


class GenericGibbs(MCMC):
    """Generic Gibbs sampler alternating theta- and state-updates
    (reference mcmc.py:482-531).  Subclasses define ``update_theta`` and
    ``update_states``."""

    def __init__(self, niter=10, verbose=0, theta0=None, ssm_cls=None,
                 prior=None, data=None, store_x=False, key=None, seed=0):
        super().__init__(niter=niter, verbose=verbose, key=key, seed=seed)
        self.ssm_cls = ssm_cls
        self.prior = prior
        self.data = jnp.asarray(data)
        self.theta0 = theta0
        self.store_x = store_x
        self._thetas = []
        self._xs = []

    def update_states(self, key, theta, x):
        raise NotImplementedError

    def update_theta(self, key, theta, x):
        raise NotImplementedError

    def step0(self):
        self.key, k1, k2 = jax.random.split(self.key, 3)
        if self.theta0 is None:
            th0 = {k: v[0] for k, v in self.prior.rvs(k1, size=1).items()}
        else:
            th0 = self.theta0
        self._thetas.append(th0)
        self.x = self.update_states(k2, th0, None)
        if self.store_x:
            self._xs.append(self.x)

    def step(self, n):
        self.key, k1, k2 = jax.random.split(self.key, 3)
        new_theta = self.update_theta(k1, self._thetas[-1], self.x)
        self._thetas.append(new_theta)
        # condition the state update on the theta JUST sampled (a stale
        # theta breaks invariance of the systematic-scan Gibbs kernel)
        self.x = self.update_states(k2, new_theta, self.x)
        if self.store_x:
            self._xs.append(self.x)

    @utils.timer
    def run(self):
        for n in range(self.niter):
            if n == 0:
                self.step0()
            else:
                self.step(n)
            if self.verbose > 0 and (n * self.verbose) % self.niter == 0:
                self.print_progress(n)
        theta_chain = {
            k: jnp.stack([th[k] for th in self._thetas])
            for k in self._thetas[0]
        }
        if self.store_x:
            self.chain = ssp.ThetaParticles(
                theta=theta_chain, x=jnp.stack(self._xs)
            )
        else:
            self.chain = ssp.ThetaParticles(theta=theta_chain)


class ParticleGibbs(GenericGibbs):
    """Particle Gibbs: state update via conditional SMC (+ optional backward
    step); theta update is user-defined (reference mcmc.py:533-619).

    ``regenerate_data=True`` turns the sampler into a prior sampler — the
    reference's built-in correctness check (mcmc.py:555-560).
    """

    def __init__(self, niter=10, verbose=0, ssm_cls=None, prior=None,
                 data=None, theta0=None, Nx=100, fk_cls=None,
                 regenerate_data=False, backward_step=False, store_x=False,
                 key=None, seed=0):
        super().__init__(niter=niter, verbose=verbose, ssm_cls=ssm_cls,
                         prior=prior, data=data, theta0=theta0,
                         store_x=store_x, key=key, seed=seed)
        self.Nx = Nx
        self.fk_cls = ssms.Bootstrap if fk_cls is None else fk_cls
        self.regenerate_data = regenerate_data
        self.backward_step = backward_step

    def fk_mod(self, theta):
        ssm = self.ssm_cls(**theta)
        return self.fk_cls(ssm=ssm, data=self.data)

    def update_states(self, key, theta, x):
        import particles_tpu as particles

        k_pf, k_traj, k_data = jax.random.split(key, 3)
        fk = self.fk_mod(theta)
        if x is None:
            cpf = particles.SMC(fk=fk, N=self.Nx, store_history=True,
                                key=k_pf)
        else:
            cpf = CSMC(fk=fk, N=self.Nx, xstar=x, key=k_pf)
        cpf.run()
        if self.backward_step:
            paths = cpf.hist.backward_sampling_ON2(k_traj, 1)
            new_x = jax.tree_util.tree_map(lambda leaf: leaf[:, 0], paths)
        else:
            new_x = cpf.hist.extract_one_trajectory(k_traj)
        if self.regenerate_data:
            self.data = fk.ssm.simulate_given_x(k_data, new_x)
        return new_x
