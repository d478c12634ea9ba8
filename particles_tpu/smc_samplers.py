"""SMC samplers for static-parameter inference: IBIS, tempering, waste-free.

Counterpart of reference ``smc_samplers.py``: :class:`StaticModel` /
:class:`TemperingBridge` targets (smc_samplers.py:216-306), the
:class:`ThetaParticles` container (:401-500), ArrayMCMC move machinery
(:553-711), the :class:`FKSMCsampler` base with **waste-free SMC** as the
default (:714-769), :class:`IBIS` (:772), :class:`Tempering` (:797),
:class:`AdaptiveTempering` (:897-936), single-run waste-free variance
estimators (:943-1036), and :class:`SMC2` (:1038-1167, in this module too).

TPU-native redesign:

* **ThetaParticles is a pytree**: ``theta`` is a dict of (N,) / (N, d)
  arrays (the reference's numpy record arrays), per-particle fields
  (``lpost``, ``llik``...) are arrays, and ``shared`` is a dict of *scalar*
  state (tempering exponent, path-sampling accumulator, calibrated proposal
  Cholesky) threaded functionally through the run — replacing the
  reference's mutated ``x.shared`` lists.
* **Moves are scans**: a length-P MCMC chain is ``lax.scan`` of a fused
  Metropolis step over all M resampled particles; the waste-free expansion
  concatenates all P chain states back to N = M·P particles
  (reference smc_samplers.py:669-683).
* **Adaptive tempering's Brent solve** (smc_samplers.py:876-895) becomes a
  fixed-iteration bisection, fully jittable, so the whole step (resample →
  calibrate → move → solve exponent → reweight) is ONE compiled kernel; only
  the ``done`` test syncs a scalar to the host per step.
* Samplers run step-by-step (dynamic horizon); each step is one jitted
  function, cached per Feynman-Kac structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from particles_tpu import collectors as col
from particles_tpu import core
from particles_tpu import distctx
from particles_tpu import resampling as rs
from particles_tpu import variance_mcmc
from particles_tpu.utils.struct import Pytree


def _gN(n):
    """Global particle count for a local leading dim ``n`` (trace-time:
    under a :mod:`particles_tpu.distctx` context arrays hold per-shard
    slices, so counts multiply by the static shard count)."""
    ctx = distctx.current()
    return n * ctx.D if ctx is not None else n


def _dist_mean(v):
    """Mean over the (possibly sharded) particle axis."""
    ctx = distctx.current()
    if ctx is None:
        return jnp.mean(v)
    return jax.lax.psum(jnp.sum(v), ctx.axis) / (v.shape[0] * ctx.D)


def _unkey_tree(tree):
    """Bitcast PRNG-key-typed leaves of ``tree`` to their raw uint32 key
    data (ring-serve scaffolding builds zeros/where/ppermute on every
    leaf, none of which accept extended key dtypes — SMC²'s ``pf_key``
    field is the motivating case).  Returns ``(plain_tree, rekey)`` where
    ``rekey`` wraps a same-structure served tree's data leaves back into
    typed keys."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    impls = [jax.random.key_impl(l)
             if jnp.issubdtype(l.dtype, jax.dtypes.prng_key) else None
             for l in leaves]
    plain = treedef.unflatten([
        jax.random.key_data(l) if im is not None else l
        for l, im in zip(leaves, impls)])

    def rekey(out):
        outl = treedef.flatten_up_to(out)
        return treedef.unflatten([
            jax.random.wrap_key_data(o, impl=im) if im is not None else o
            for o, im in zip(outl, impls)])

    return plain, rekey


def _gather_global(v):
    """The full global vector of a (possibly sharded) per-particle array.

    Sampler steps need a handful of data-dependent scalar solves over all
    particles (the adaptive-tempering bisection evaluates ESS ~60 times;
    path sampling ~10 softmax reductions): ONE (N0,)-sized all-gather —
    sampler populations are small (M*P ~ 1e3-1e5) — replaces ~100
    latency-bound scalar all-reduces, and the solve then runs replicated
    on every shard.
    """
    ctx = distctx.current()
    if ctx is None:
        return v
    return jax.lax.all_gather(v, ctx.axis, tiled=True)

__all__ = [
    "SamplerHistory",
    "StaticModel",
    "TemperingBridge",
    "ThetaParticles",
    "ImportanceSampler",
    "ArrayMCMC",
    "ArrayMetropolis",
    "ArrayRandomWalk",
    "ArrayIndependentMetropolis",
    "MCMCSequence",
    "MCMCSequenceWF",
    "AdaptiveMCMCSequence",
    "FKSMCsampler",
    "IBIS",
    "Tempering",
    "AdaptiveTempering",
    "next_annealing_epn",
    "var_wf",
    "Var_phi",
    "Var_logLt",
    "view_2d_array",
    "rec_to_dict",
    "all_distinct",
    "FancyList",
    "gen_concatenate",
    "SMC2",
]


# ---------------------------------------------------------------------------
# static models
# ---------------------------------------------------------------------------

class StaticModel(Pytree):
    """Base class for static (parameter-inference) models
    (reference smc_samplers.py:216-301).

    Subclass and define ``logpyt(theta, t)``: the log-density of datapoint t
    given parameters ``theta`` (a dict of (N,) arrays) and past data.
    """

    def __init__(self, data=None, prior=None):
        self.data = data if data is None else jnp.asarray(data)
        self.prior = prior

    @property
    def T(self):
        return 0 if self.data is None else self.data.shape[0]

    def logpyt(self, theta, t):
        raise NotImplementedError("StaticModel: logpyt not implemented")

    def loglik(self, theta, t=None):
        """Log-likelihood of data up to time t (masked sum, so ``t`` may be a
        traced scalar); NaN -> -inf (reference smc_samplers.py:263-284)."""
        if t is None:
            t = self.T - 1
        all_l = jax.vmap(lambda s: self.logpyt(theta, s))(
            jnp.arange(self.T)
        )  # (T, N)
        mask = (jnp.arange(self.T) <= t)[:, None]
        l = jnp.sum(jnp.where(mask, all_l, 0.0), axis=0)
        return jnp.where(jnp.isnan(l), -jnp.inf, l)

    def logpost(self, theta, t=None):
        """Posterior log-density up to datapoint t (smc_samplers.py:286-301)."""
        return self.prior.logpdf(theta) + self.loglik(theta, t)


class TemperingBridge(StaticModel):
    """Bridge distributions between a base dist and a target
    (reference smc_samplers.py:304-313): define ``logtarget``."""

    def __init__(self, base_dist=None):
        self.prior = base_dist
        self.data = None

    def logtarget(self, theta):
        raise NotImplementedError

    def loglik(self, theta, t=None):
        return self.logtarget(theta) - self.prior.logpdf(theta)

    def logpost(self, theta, t=None):
        return self.logtarget(theta)


# ---------------------------------------------------------------------------
# theta-particles container
# ---------------------------------------------------------------------------

def rec_to_dict(arr):
    """Turn a single-particle theta into a plain dict (reference
    smc_samplers.py:1030-1034 converts record arrays; our thetas already
    are dicts, so this extracts scalars / passes through)."""
    if isinstance(arr, dict):
        return dict(arr)
    return {k: arr[k] for k in getattr(arr, "dtype").names}


def view_2d_array(theta):
    """Flatten a dict-of-arrays theta into an (N, d) matrix
    (counterpart of reference view_2d_array, smc_samplers.py:383-398, which
    reinterprets record arrays)."""
    cols = []
    for k in theta:
        v = theta[k]
        cols.append(v[:, None] if v.ndim == 1 else v.reshape(v.shape[0], -1))
    return jnp.concatenate(cols, axis=1)


def all_distinct(l, idx):
    """``[l[i] for i in idx]`` with repeated picks deep-copied so every
    element of the result is a distinct object (counterpart of reference
    smc_samplers.py:319-340).

    Host-side helper for list-of-Python-objects particle containers; our
    engine keeps per-particle state in immutable arrays, where this is
    unnecessary (``leaf[idx]`` already aliases nothing mutable), but code
    ported from the reference may rely on it.
    """
    import copy

    picked = set()
    out = []
    for i in idx:
        i = int(i)
        out.append(copy.deepcopy(l[i]) if i in picked else l[i])
        picked.add(i)
    return out


class FancyList:
    """List with ndarray fancy indexing and copy-on-duplicate semantics
    (counterpart of reference smc_samplers.py:343-380).

    Lets a ThetaParticles-style container hold arbitrary Python objects
    per particle on the host (outside jit).  Indexing with an int array
    resamples the list via :func:`all_distinct`.
    """

    def __init__(self, data):
        self.data = list(data) if data is not None else []

    def __iter__(self):
        return iter(self.data)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, key):
        if isinstance(key, (np.ndarray, jax.Array)):
            return type(self)(all_distinct(self.data, np.asarray(key)))
        return self.data[key]

    def __add__(self, other):
        return type(self)(self.data + other.data)

    @classmethod
    def concatenate(cls, *ls):
        out = []
        for l in ls:
            out.extend(l.data)
        return cls(out)

    def copy(self):
        import copy

        return copy.deepcopy(self)

    def copyto(self, src, where=None):
        """numpy.copyto semantics: self.data[n] = src.data[n] where
        ``where[n]`` is true."""
        for n in range(len(self.data)):
            if where[n]:
                self.data[n] = src.data[n]


def gen_concatenate(*xs):
    """Concatenate arrays or FancyLists (counterpart of reference
    smc_samplers.py:394-398)."""
    x0 = xs[0]
    if isinstance(x0, jax.Array):
        return jnp.concatenate(xs)
    if isinstance(x0, np.ndarray):
        return np.concatenate(xs)
    return type(x0).concatenate(*xs)


def theta_from_2d(arr, template):
    """Inverse of :func:`view_2d_array` given a template dict."""
    out = {}
    j = 0
    for k in template:
        v = template[k]
        if v.ndim == 1:
            out[k] = arr[:, j]
            j += 1
        else:
            d = int(np.prod(v.shape[1:]))
            out[k] = arr[:, j : j + d].reshape(v.shape)
            j += d
    return out


class ThetaParticles(Pytree):
    """Container for N particles with named parameter fields + shared state
    (reference smc_samplers.py:401-500).

    ``theta`` is a dict of (N,) / (N, d) arrays; extra keyword fields
    (``lpost``, ``llik``, ...) are per-particle arrays; ``shared`` is a dict
    of scalars/static-shape arrays common to all particles.  All operations
    are functional (a new object is returned).
    """

    def __init__(self, theta=None, shared=None, **fields):
        self.theta = theta
        self.shared = {} if shared is None else dict(shared)
        self.__dict__.update(fields)

    @property
    def N(self):
        return next(iter(self.theta.values())).shape[0]

    def _particle_fields(self):
        return {k: v for k, v in self.__dict__.items()
                if k not in ("shared",)}

    def map_fields(self, f):
        """Apply f to every per-particle array (incl. theta leaves)."""
        new = {k: jax.tree_util.tree_map(f, v)
               for k, v in self._particle_fields().items()}
        return ThetaParticles(shared=dict(self.shared), **new)

    def subset_by_counts(self, counts, M):
        """Resampling move by offspring counts (sorted ancestors).

        All kernel-routable leaves (1-D and (N, d<=2) float columns)
        share ONE fused Pallas serve — the plan is built once and the
        columns ride a single call's z-side select (core._repeat_z).
        When the kernel route is unavailable (CPU, M != N as in the
        waste-free shape change) every leaf falls back to
        ``jnp.repeat``."""
        from particles_tpu import core
        from particles_tpu.ops import repeat_kernel as rk

        fields = self._particle_fields()
        N = next(iter(self.theta.values())).shape[0]
        if not (rk._on_tpu() and M == N and N >= rk._C):
            # plan route unavailable (CPU, waste-free M != N)
            if N * M <= rk._DENSE_SERVE_MAX:
                # dense compare-count + take: identical output, batches
                # cleanly under vmap (jnp.repeat does not — see the
                # _DENSE_SERVE_MAX comment in ops/repeat_kernel.py)
                A = rk.dense_ancestors_by_z(
                    jnp.cumsum(counts.astype(jnp.int32)), M)
                return self.subset(A)
            served = jax.tree_util.tree_map(
                lambda a: jnp.repeat(a, counts, axis=0,
                                     total_repeat_length=M), fields)
            return ThetaParticles(shared=dict(self.shared), **served)
        z = jnp.cumsum(counts.astype(jnp.int32))
        served, _, _, _ = core._repeat_z(fields, z, M)
        return ThetaParticles(shared=dict(self.shared), **served)

    def subset(self, A):
        """Resampling move by ancestor indices (reference fancy indexing,
        smc_samplers.py:437-452 — the deep-copy-on-duplicate machinery is
        unnecessary with immutable arrays)."""
        return self.map_fields(lambda a: jnp.take(a, A, axis=0))

    def where(self, mask, other):
        """Per-particle select: self where mask else other."""
        def sel(a, b):
            m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)

        new = {
            k: jax.tree_util.tree_map(sel, v, other.__dict__[k])
            for k, v in self._particle_fields().items()
        }
        return ThetaParticles(shared=dict(self.shared), **new)

    @staticmethod
    def concatenate(*xs):
        """Concatenate particle systems along the particle axis
        (reference smc_samplers.py:453-460); shared taken from the last."""
        fields = {}
        for k in xs[0]._particle_fields():
            fields[k] = jax.tree_util.tree_map(
                lambda *leaves: jnp.concatenate(leaves, axis=0),
                *[x.__dict__[k] for x in xs],
            )
        return ThetaParticles(shared=dict(xs[-1].shared), **fields)

    def with_shared(self, **updates):
        shared = dict(self.shared)
        shared.update(updates)
        return ThetaParticles(shared=shared, **self._particle_fields())

    def copy(self):
        return ThetaParticles(shared=dict(self.shared),
                              **self._particle_fields())


# ---------------------------------------------------------------------------
# importance sampler
# ---------------------------------------------------------------------------

class ImportanceSampler:
    """Basic importance sampling with the SMC-sampler interface
    (reference smc_samplers.py:506-547)."""

    def __init__(self, model=None, proposal=None):
        self.proposal = model.prior if proposal is None else proposal
        self.model = model

    def run(self, N=100, key=None):
        key = key if key is not None else jax.random.key(0)
        th = self.proposal.rvs(key, size=N)
        lpost = self.model.logpost(th)
        self.X = ThetaParticles(theta=dict(th), lpost=lpost)
        lw = lpost - self.proposal.logpdf(th)
        self.wgts = rs.Weights(lw=lw)
        self.log_norm_cst = self.wgts.log_mean


# ---------------------------------------------------------------------------
# MCMC moves
# ---------------------------------------------------------------------------

class ArrayMCMC(Pytree):
    """Base class for one MCMC step applied to all particles at once
    (reference smc_samplers.py:553-592).

    Value-based equality/hash: move objects ride Feynman-Kac pytrees as
    STATIC aux-data (they are callable), so without these two fresh but
    identically-configured FK instances get unequal treedefs and every
    jit boundary retraces — a full recompile per ``SMC(fk=Tempering(...))``
    construction.  Configs are plain scalars/None, so dict comparison is
    the right notion.
    """

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.__dict__ == other.__dict__)

    def __hash__(self):
        try:
            return hash((type(self),
                         tuple(sorted(self.__dict__.items()))))
        except TypeError:
            return hash(type(self))

    def calibrate(self, W, x):
        """Return a dict of shared-state updates tuned on the weighted cloud."""
        return {}

    def step(self, key, x, target):
        """Apply one step to all particles; returns (new_x, mean_accept)."""
        raise NotImplementedError


class ArrayMetropolis(ArrayMCMC):
    """Metropolis step, any proposal (reference smc_samplers.py:596-612)."""

    def proposal(self, key, x, arr):
        """Returns (proposed (N, d) array, per-particle delta log-proposal)."""
        raise NotImplementedError

    def step(self, key, x, target):
        k1, k2, kt = jax.random.split(key, 3)
        arr = view_2d_array(x.theta)
        arr_prop, delta_lp = self.proposal(k1, x, arr)
        # replace() keeps any extra per-particle fields (e.g. SMC2's inner
        # filter state) so proposal and current system share one structure.
        # kt gives pseudo-marginal targets (SMC2 replay) FRESH auxiliary
        # randomness at every MCMC step — successive moves must not reuse
        # replay randomness (reference smc_samplers.py:1129-1143 rebuilds
        # inner filters with new draws each time).
        xprop = target(x.replace(theta=theta_from_2d(arr_prop, x.theta)),
                       key=kt)
        lp_acc = xprop.lpost - x.lpost + delta_lp
        # NaN log-posteriors (e.g. proposals outside the prior support
        # propagating through model recursions) mean "reject"
        lp_acc = jnp.where(jnp.isnan(lp_acc), -jnp.inf, lp_acc)
        pb_acc = jnp.exp(jnp.clip(lp_acc, None, 0.0))
        accept = jax.random.uniform(k2, (x.N,)) < pb_acc
        return xprop.where(accept, x), _dist_mean(pb_acc)


class ArrayRandomWalk(ArrayMetropolis):
    """Gaussian random-walk Metropolis with the 2.38/sqrt(d) optimal-scaling
    calibration (reference smc_samplers.py:614-629)."""

    def calibrate(self, W, x):
        arr = view_2d_array(x.theta)
        d = arr.shape[1]
        m, cov = rs.wmean_and_cov(W, arr)
        scale = 2.38 / jnp.sqrt(d)
        # jitter for numerical SPD-ness at startup
        L = jnp.linalg.cholesky(cov + 1e-9 * jnp.eye(d))
        return {"chol_cov": scale * L}

    def proposal(self, key, x, arr):
        L = x.shared["chol_cov"]
        z = jax.random.normal(key, arr.shape)
        return arr + z @ L.T, 0.0


class ArrayIndependentMetropolis(ArrayMetropolis):
    """Independent Metropolis with a Gaussian proposal matched to the
    weighted cloud (reference smc_samplers.py:632-652)."""

    def __init__(self, scale=1.0):
        self.scale = scale

    def calibrate(self, W, x):
        arr = view_2d_array(x.theta)
        m, cov = rs.wmean_and_cov(W, arr)
        d = arr.shape[1]
        L = jnp.linalg.cholesky(cov + 1e-9 * jnp.eye(d))
        return {"mean": m, "chol_cov": self.scale * L}

    def proposal(self, key, x, arr):
        mu = x.shared["mean"]
        L = x.shared["chol_cov"]
        z = jax.random.normal(key, arr.shape)
        zx = jax.scipy.linalg.solve_triangular(L, (arr - mu).T, lower=True)
        delta_lp = 0.5 * (jnp.sum(z * z, axis=1) - jnp.sum(zx * zx, axis=0))
        return mu + z @ L.T, delta_lp


class MCMCSequence(Pytree):
    """A fixed-length sequence of MCMC steps (reference smc_samplers.py:655-667).

    Value-based equality/hash for the same reason as :class:`ArrayMCMC`
    (move objects are static aux-data of FK pytrees)."""

    def __init__(self, mcmc=None, len_chain=10):
        self.mcmc = ArrayRandomWalk() if mcmc is None else mcmc
        self.nsteps = len_chain - 1

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.__dict__ == other.__dict__)

    def __hash__(self):
        return hash((type(self), self.nsteps, self.__dict__.get("mcmc")))

    def calibrate(self, W, x):
        return self.mcmc.calibrate(W, x)

    def __call__(self, key, x, target):
        raise NotImplementedError


class MCMCSequenceWF(MCMCSequence):
    """Waste-free move: keep ALL chain states — M starting points, P-1 steps,
    concatenated back to M*P particles (reference smc_samplers.py:669-683)."""

    def __call__(self, key, x, target):
        keys = jax.random.split(key, self.nsteps)

        def body(xc, k):
            x2, acc = self.mcmc.step(k, xc, target)
            return x2, ({k2: v for k2, v in x2._particle_fields().items()},
                        acc)

        x_last, (stacked, accs) = jax.lax.scan(body, x, keys)
        # concatenate [x0, x1, ..., x_{P-1}] along the particle axis:
        # chain-position major, matching the (P, M) reshape of var_wf
        fields = {}
        for k in x._particle_fields():
            first = x.__dict__[k]
            rest = stacked[k]
            fields[k] = jax.tree_util.tree_map(
                lambda f, r: jnp.concatenate(
                    [f[None], r], axis=0
                ).reshape((-1,) + f.shape[1:]),
                first,
                rest,
            )
        out = ThetaParticles(shared=dict(x.shared), **fields)
        return out.with_shared(acc_rate=jnp.mean(accs))


class AdaptiveMCMCSequence(MCMCSequence):
    """Standard move: keep only final states; optionally stop early when the
    cloud stops moving (reference smc_samplers.py:686-711)."""

    def __init__(self, mcmc=None, len_chain=10, adaptive=False,
                 delta_dist=0.1):
        super().__init__(mcmc=mcmc, len_chain=len_chain)
        self.adaptive = adaptive
        self.delta_dist = delta_dist

    def __call__(self, key, x, target):
        arr0 = view_2d_array(x.theta)

        if not self.adaptive:
            keys = jax.random.split(key, self.nsteps)

            def body(xc, k):
                x2, acc = self.mcmc.step(k, xc, target)
                return x2, acc

            xout, accs = jax.lax.scan(body, x, keys)
            return xout.with_shared(acc_rate=jnp.mean(accs))

        def cond(state):
            _, i, dist, prev_dist, _, go, _ = state
            return go & (i < self.nsteps)

        def body(state):
            xc, i, dist, prev_dist, k, _, acc_sum = state
            k, ks = jax.random.split(k)
            x2, acc = self.mcmc.step(ks, xc, target)
            diff = view_2d_array(x2.theta) - arr0
            new_dist = jnp.mean(jnp.linalg.norm(diff, axis=1))
            go = jnp.abs(new_dist - dist) >= self.delta_dist * dist
            return x2, i + 1, new_dist, dist, k, go, acc_sum + jnp.mean(acc)

        state = (x, jnp.int32(0), jnp.float32(0.0), jnp.float32(0.0), key,
                 jnp.asarray(True), jnp.float32(0.0))
        xout, nsteps_done, _, _, _, _, acc_sum = jax.lax.while_loop(
            cond, body, state)
        # the REALISED acceptance rate of this move (a stale carried value
        # here made SMC2's Nx-doubling trigger fire forever)
        acc_rate = acc_sum / jnp.maximum(nsteps_done.astype(jnp.float32),
                                         1.0)
        return xout.with_shared(acc_rate=acc_rate)


# ---------------------------------------------------------------------------
# FK classes for SMC samplers
# ---------------------------------------------------------------------------

class FKSMCsampler(core.FeynmanKac):
    """Base Feynman-Kac class for SMC samplers (reference smc_samplers.py:714-769).

    With ``wastefree=True`` (default), ``M0`` produces N*len_chain particles
    and each resample-move step picks N starting points and keeps all chain
    states.  Runs through the dedicated sampler stepping engine (dynamic
    horizon, shape-changing moves).
    """

    is_sampler = True

    def __init__(self, model=None, wastefree=True, len_chain=10, move=None):
        self.model = model
        self.wastefree = wastefree
        self.len_chain = len_chain
        if move is None:
            if wastefree:
                self.move = MCMCSequenceWF(len_chain=len_chain)
            else:
                self.move = AdaptiveMCMCSequence(len_chain=len_chain)
        else:
            self.move = move

    @property
    def T(self):
        return self.model.T

    # number of particles carried given the user-requested N
    def N0(self, N):
        return N * self.len_chain if self.wastefree else N

    def default_moments(self, W, x):
        return rs.wmean_and_var_str_array(W, x.theta)

    def summary_format(self, smc):
        acc = smc.X.shared.get("acc_rate", None)
        extra = "" if acc is None else f", Metropolis acc. rate: {float(acc):.3f}"
        return f"t={smc.t}{extra}, ESS={float(smc.wgts.ESS):.2f}"

    def time_to_resample(self, view):
        # X.N is the LOCAL leading dim under particle sharding; the ESS
        # threshold compares against the global particle count
        return view.aux.ESS < _gN(view.X.N) * view.ESSrmin

    # --- hooks used by the sampler engine ---

    def M0(self, key, N):
        return self._M0(key, self.N0(N))

    def move_target(self, t, x):
        """Target distribution for the MCMC move at time t (uses shared)."""
        raise NotImplementedError

    def logG_and_update(self, t, x):
        """Return (log-potential increments, updated particles)."""
        raise NotImplementedError


class IBIS(FKSMCsampler):
    """Iterated Batch Importance Sampling: sequence of partial posteriors
    (reference smc_samplers.py:772-794)."""

    def _M0(self, key, N0):
        th = dict(self.model.prior.rvs(key, size=N0))
        x = ThetaParticles(theta=th, lpost=self.model.prior.logpdf(th))
        # uniform weights normalised over the GLOBAL count (calibrate's
        # moment reductions are dist-aware)
        cal = self.move.calibrate(jnp.full(N0, 1.0 / _gN(N0)), x)
        return x.with_shared(acc_rate=jnp.float32(0.0), **cal)

    def move_target(self, t, x):
        def target(xx, key=None):
            lpost = self.model.logpost(xx.theta, t=t - 1)
            return xx.replace(lpost=lpost)

        return target

    def logG_and_update(self, t, x):
        lpyt = self.model.logpyt(x.theta, t)
        lpyt = jnp.where(jnp.isnan(lpyt), -jnp.inf, lpyt)
        return lpyt, x.replace(lpost=x.lpost + lpyt)


class Tempering(FKSMCsampler):
    """Tempering SMC with fixed exponents (reference smc_samplers.py:797-875);
    includes the path-sampling estimate of log Z."""

    def __init__(self, model=None, wastefree=True, len_chain=10, move=None,
                 exponents=None):
        super().__init__(model=model, wastefree=wastefree,
                         len_chain=len_chain, move=move)
        self.exponents = jnp.asarray(exponents) if exponents is not None else None

    @property
    def T(self):
        return self.exponents.shape[0]

    def _M0(self, key, N0):
        th = dict(self.model.prior.rvs(key, size=N0))
        x = ThetaParticles(
            theta=th,
            lprior=self.model.prior.logpdf(th),
            llik=self.model.loglik(th),
        )
        x = x.replace(lpost=x.lprior)
        cal = self.move.calibrate(jnp.full(N0, 1.0 / _gN(N0)), x)
        return x.with_shared(
            exponent=jnp.float32(0.0),
            path_sampling=jnp.float32(0.0),
            acc_rate=jnp.float32(0.0),
            **cal,
        )

    def current_target(self, epn):
        def target(xx, key=None):
            lprior = self.model.prior.logpdf(xx.theta)
            llik = self.model.loglik(xx.theta)
            lpost = lprior + jnp.where(epn > 0.0, epn * llik, 0.0)
            return xx.replace(lprior=lprior, llik=llik, lpost=lpost)

        return target

    def move_target(self, t, x):
        return self.current_target(x.shared["exponent"])

    def _path_sampling_update(self, x, delta, llik_all=None):
        """Trapezoidal path-sampling accumulation over a 10-point grid
        (reference smc_samplers.py:821-834).

        Under particle sharding ``llik_all`` is the pre-gathered GLOBAL
        log-likelihood vector (one all-gather shared with the adaptive
        solve), so the softmax reductions run replicated."""
        grid_size = 10
        binwidth = delta / (grid_size - 1)
        llik = _gather_global(x.llik) if llik_all is None else llik_all

        # a zero-likelihood particle has llik = -inf and softmax weight 0;
        # sum(w * llik) would be 0 * -inf = NaN, poisoning the accumulator
        # forever — take the correct limit (contribute 0) instead
        llik_f = jnp.where(jnp.isfinite(llik), llik, 0.0)

        def body(i, acc):
            e = i.astype(jnp.float32) * binwidth
            mult = jnp.where((i == 0) | (i == grid_size - 1), 0.5, 1.0)
            w = jax.nn.softmax(jnp.where(jnp.isfinite(llik), e * llik, -jnp.inf))
            return acc + mult * binwidth * jnp.sum(w * llik_f)

        inc = jax.lax.fori_loop(0, grid_size, body, jnp.float32(0.0))
        return x.shared["path_sampling"] + inc

    def _logG_tempering(self, x, delta, new_epn, llik_all=None):
        dl = delta * x.llik
        dl = jnp.where(jnp.isnan(dl), -jnp.inf, dl)
        ps = self._path_sampling_update(x, delta, llik_all=llik_all)
        x = x.replace(lpost=x.lpost + dl)
        x = x.with_shared(exponent=new_epn, path_sampling=ps)
        return dl, x

    def logG_and_update(self, t, x):
        new_epn = self.exponents[t]
        delta = new_epn - x.shared["exponent"]
        return self._logG_tempering(x, delta, new_epn)


def next_annealing_epn(epn, alpha, lw):
    """Next tempering exponent such that ESS(e*lw) = alpha*N, by
    fixed-iteration bisection over the increment (the jittable version of
    the reference's Brent solve, smc_samplers.py:876-895).

    ``lw`` must be the FULL log-likelihood vector: under particle
    sharding, callers gather it once (:func:`_gather_global`) so the ~60
    ESS evaluations of the bisection run replicated, collective-free."""
    N = lw.shape[0]
    lw = jnp.where(jnp.isnan(lw), -jnp.inf, lw)

    def f(delta):
        ess = jnp.where(delta > 0.0, rs.essl(delta * lw), jnp.float32(N))
        return ess - alpha * N

    hi = 1.0 - epn

    def body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        # f is decreasing in delta; move right while above target
        go_right = f(m) > 0.0
        return jnp.where(go_right, m, a), jnp.where(go_right, b, m)

    a, b = jax.lax.fori_loop(0, 60, body, (jnp.float32(0.0), hi))
    delta = 0.5 * (a + b)
    return jnp.where(f(hi) >= 0.0, 1.0, epn + delta)


class AdaptiveTempering(Tempering):
    """Adaptive tempering: exponents chosen so that ESS = alpha*N each step
    (reference smc_samplers.py:897-936).  Always resamples."""

    always_resample = True

    def __init__(self, model=None, wastefree=True, len_chain=10, move=None,
                 ESSrmin=0.5, max_iter=1000):
        FKSMCsampler.__init__(self, model=model, wastefree=wastefree,
                              len_chain=len_chain, move=move)
        self.ESSrmin = ESSrmin
        self.max_iter = max_iter
        self.exponents = None

    def done(self, smc):
        if smc.t >= self.max_iter:
            return True
        if smc.X is None:
            return False
        return bool(smc.X.shared["exponent"] >= 1.0)

    def time_to_resample(self, view):
        return jnp.asarray(True)

    def logG_and_update(self, t, x):
        epn = x.shared["exponent"]
        # one all-gather serves both the ~60-evaluation ESS bisection and
        # the path-sampling grid (replicated identically on every shard)
        llik_all = _gather_global(x.llik)
        new_epn = next_annealing_epn(epn, self.ESSrmin, llik_all)
        return self._logG_tempering(x, new_epn - epn, new_epn,
                                    llik_all=llik_all)


# ---------------------------------------------------------------------------
# the sampler stepping engine
# ---------------------------------------------------------------------------

def _sampler_step0(fk, key, N):
    """Initial sampler step.  Under a :mod:`particles_tpu.distctx`
    context ``N`` is the per-shard slice of the user N (prior draws get a
    shard-folded key; the carry key stays replicated)."""
    dctx = distctx.current()
    k0, knext = jax.random.split(key)
    if dctx is not None:
        k0 = jax.random.fold_in(k0, jax.lax.axis_index(dctx.axis))
    X = fk.M0(k0, N)
    G, X = fk.logG_and_update(0, X)
    wgts = rs.Weights(G)
    carry = core._Carry(
        key=knext, X=X, lw=wgts.lw, logLt=wgts.log_mean,
        log_mean_w=wgts.log_mean, col_states=(),
    )
    return carry


def _sampler_step(fk, carry, t, N, resampling_scheme, ESSrmin):
    """One SMC-sampler step: (calibrate, resample, move) then reweight.

    Waste-free shape change (reference core.py:329-331): X carries N0 = M*P
    particles; resampling picks M = N starting points; the move expands back
    to N0.

    Under a :mod:`particles_tpu.distctx` context (shard_map execution) the
    SAME step runs per shard on local slices: ``N`` stays the GLOBAL
    resample size, the weight/moment reductions are collectives (the
    dist-aware numerics layer), the resample becomes the ring
    redistribution serving N0loc -> N/D local outputs (the waste-free
    shape change rides :func:`particles_tpu.parallel.distributed.
    ring_serve`'s ``Mloc``), the chain moves run embarrassingly
    particle-parallel with shard-folded keys, and the adaptive-tempering
    solve gathers the llik vector once (see :func:`_gather_global`).
    The carry key stays replicated (it feeds the shared resampling
    uniforms and the branch predicate).
    """
    dctx = distctx.current()
    X, lw = carry.X, carry.lw
    N0 = X.N
    key, k_rs, k_mv = jax.random.split(carry.key, 3)
    if dctx is not None:
        if resampling_scheme not in ("systematic", "stratified",
                                     "multinomial"):
            raise NotImplementedError(
                f"resampling scheme {resampling_scheme!r} is not supported "
                "under particle sharding (rings exist for systematic/"
                "stratified z-forms and the multinomial sorted-uniform "
                "merge)")
        # chain-move proposals must be independent across shards; the
        # resampling key k_rs stays replicated (shared ring uniforms)
        k_mv = jax.random.fold_in(k_mv, jax.lax.axis_index(dctx.axis))
    wgts = rs.Weights(lw)

    view = core.StepView(
        fk=fk, t=t, X=X, Xp=X, A=None, wgts=wgts, aux=wgts, rs_flag=None,
        logLt=carry.logLt, loglt=None, N=N, ESSrmin=ESSrmin,
    )
    rs_flag = fk.time_to_resample(view)

    def do_resample_move(X, lw):
        cal = fk.move.calibrate(wgts.W, X)
        Xc = X.with_shared(**cal)
        if dctx is None:
            counts = rs.resampling_counts(resampling_scheme, k_rs, wgts.W,
                                          M=N)
            Xres = Xc.subset_by_counts(counts, N)
        else:
            from particles_tpu.parallel import distributed as dist

            fields, rekey = _unkey_tree(Xc._particle_fields())
            if resampling_scheme == "systematic":
                u = jax.random.uniform(k_rs, ())
                served = dist.ring_systematic_resample(
                    fields, wgts.lw, u, N, dctx.axis, dctx.D)
            elif resampling_scheme == "stratified":
                served = dist.ring_stratified_resample(
                    fields, wgts.lw, k_rs, N, dctx.axis, dctx.D)
            else:  # multinomial (checked at trace time above)
                served = dist.ring_multinomial_resample(
                    fields, wgts.lw, k_rs, N, dctx.axis, dctx.D)
            Xres = ThetaParticles(shared=dict(Xc.shared), **rekey(served))
        target = fk.move_target(t, Xc)
        Xmoved = fk.move(k_mv, Xres, target)
        return Xmoved, jnp.zeros(N0, lw.dtype)

    if getattr(fk, "always_resample", False):
        X, lw = do_resample_move(X, lw)
        rs_flag = jnp.asarray(True)
    else:
        X, lw = jax.lax.cond(
            rs_flag, do_resample_move, lambda X, lw: (X.copy(), lw), X, lw
        )

    G, X = fk.logG_and_update(t, X)
    lw = lw + G
    new_wgts = rs.Weights(lw)
    loglt = jnp.where(
        rs_flag, new_wgts.log_mean, new_wgts.log_mean - carry.log_mean_w
    )
    logLt = carry.logLt + loglt

    out_view = core.StepView(
        fk=fk, t=t, X=X, Xp=X, A=None, wgts=new_wgts, aux=wgts,
        rs_flag=rs_flag, logLt=logLt, loglt=loglt, N=N, ESSrmin=ESSrmin,
    )
    carry = core._Carry(
        key=key, X=X, lw=lw, logLt=logLt, log_mean_w=new_wgts.log_mean,
        col_states=(),
    )
    return carry, out_view


_sampler_jit_cache = {}
_SAMPLER_CACHE_MAX = 64


def _jitted_sampler_step(fk, N, scheme, ESSrmin):
    cache_key = (type(fk), fk.wastefree, fk.len_chain, type(fk.move),
                 N, scheme, ESSrmin)
    if cache_key not in _sampler_jit_cache:
        if len(_sampler_jit_cache) >= _SAMPLER_CACHE_MAX:
            for k in list(_sampler_jit_cache)[: _SAMPLER_CACHE_MAX // 2]:
                del _sampler_jit_cache[k]
        _sampler_jit_cache[cache_key] = jax.jit(
            lambda fk, carry, t: _sampler_step(fk, carry, t, N, scheme,
                                               ESSrmin)
        )
    return _sampler_jit_cache[cache_key]


class SamplerHistory:
    """History of an SMC sampler run: the ThetaParticles system and Weights
    at each time (counterpart of the reference storing ThetaParticles
    objects in ``ParticleHistory``; samplers have no genealogy use here, so
    plain per-time lists).

    Honors the full ``store_history`` option set (reference
    smoothing.py:151-161): ``True`` keeps everything, an int ``k`` keeps a
    rolling window of the k most recent systems, a callable ``f(t)`` saves
    only at times where it is true (``times`` records which).
    """

    def __init__(self, option=True):
        from collections import deque

        self._save_if = None
        self.times = []
        if option is True:
            self.X, self.wgts = [], []
        elif isinstance(option, int) and not isinstance(option, bool) \
                and option >= 1:
            self.X = deque([], option)
            self.wgts = deque([], option)
            self.times = deque([], option)
        elif callable(option):
            self.X, self.wgts = [], []
            self._save_if = option
        else:
            raise ValueError(
                f"store_history: invalid option {option!r} for an SMC "
                "sampler (use True, a window length k >= 1, or a callable "
                "t -> bool)")

    @property
    def T(self):
        return len(self.X)

    def save(self, X, wgts):
        self.X.append(X)
        self.wgts.append(wgts)

    def save_step(self, t, X, wgts):
        if self._save_if is None or self._save_if(t):
            self.X.append(X)
            self.wgts.append(wgts)
            self.times.append(t)


def sampler_next(smc):
    """One step of an SMC sampler; called from ``core.SMC.__next__``.

    The compiled step excludes collectors (they may be host-side, e.g. the
    waste-free variance estimators); summaries are updated eagerly on the
    host afterwards.
    """
    fk = smc.fk
    if smc.t == 0:
        carry = _sampler_step0(fk, smc.key, smc.N)
        wgts = rs.Weights(carry.lw)
        view = core.StepView(
            fk=fk, t=0, X=carry.X, Xp=carry.X, A=None, wgts=wgts, aux=wgts,
            rs_flag=jnp.asarray(False), logLt=carry.logLt,
            loglt=carry.logLt, N=smc.N, ESSrmin=smc.ESSrmin,
        )
        if smc.summaries is not None:
            smc._col_states, outs = smc.summaries.init_step(view)
            smc.summaries.append_step(outs)
    else:
        if hasattr(fk, "maybe_exchange"):
            fk.maybe_exchange(smc)
        step = _jitted_sampler_step(fk, smc.N, smc.resampling, smc.ESSrmin)
        carry, view = step(fk, smc._carry, jnp.int32(smc.t))
        if smc.summaries is not None:
            smc._col_states, outs = smc.summaries.step(view, smc._col_states)
            smc.summaries.append_step(outs)
    smc._carry = carry
    smc.X = view.X
    smc.Xp = view.Xp
    smc.A = view.A
    smc.wgts = view.wgts
    smc.aux = view.aux
    smc.rs_flag = view.rs_flag
    smc.logLt = view.logLt
    smc.loglt = view.loglt
    if smc.hist_option is not False and smc.hist_option is not None:
        if smc.t == 0:
            smc.hist = SamplerHistory(smc.hist_option)
        smc.hist.save_step(smc.t, view.X, view.wgts)
    if smc.verbose:
        print(fk.summary_format(smc))
    smc.t += 1


# ---------------------------------------------------------------------------
# single-run variance estimators for waste-free SMC
# ---------------------------------------------------------------------------

def var_wf(smc, phi):
    """Single-run asymptotic-variance estimate for a waste-free sampler
    (reference smc_samplers.py:943-1000; Dau & Chopin 2022): the N = M*P
    particles behave like M stationary chains of length P."""
    W = np.asarray(smc.wgts.W)
    N0 = W.shape[0]
    fx = np.asarray(phi(smc.X))
    fmean = np.average(fx, weights=W)
    wphi = W * (fx - fmean)
    wphi_reshaped = np.reshape(wphi, (-1, smc.N))
    return variance_mcmc.MCMC_variance(wphi_reshaped, "init_seq") * N0**2


class Var_phi(col.Collector):
    """Collects waste-free single-run variance estimates of E[phi]
    (reference smc_samplers.py:985-997).  Host-side (sampler mode only)."""

    summary_name = "var_phi"
    signature = {"phi": None}
    host_side = True

    def collect(self, view):
        class _V:
            pass

        v = _V()
        v.wgts = view.wgts
        v.X = view.X
        v.N = view.N
        return var_wf(v, self.phi)


class Var_logLt(col.Collector):
    """Waste-free single-run variance estimate of log L_t
    (reference smc_samplers.py:1000-1036).  Host-side, stateful."""

    summary_name = "var_logLt"
    stateful = True
    host_side = True

    def _var_logw(self, view):
        lw = np.reshape(np.asarray(view.wgts.lw), (-1, view.N))
        lwm = lw.max()
        w = np.exp(lw - lwm)
        var_w = variance_mcmc.MCMC_variance(w, "init_seq")
        return var_w / np.mean(w) ** 2

    def init(self, view):
        var_logw = self._var_logw(view)
        return (0.0, var_logw), var_logw

    def step(self, view, state):
        var_prev, var_logw = state
        if bool(view.rs_flag):
            var_prev = var_prev + var_logw
        var_logw = self._var_logw(view)
        return (var_prev, var_logw), var_logw + var_prev


# ---------------------------------------------------------------------------
# SMC^2
# ---------------------------------------------------------------------------

class SMC2(FKSMCsampler):
    """SMC² (Chopin, Jacob & Papaspiliopoulos 2013): IBIS over theta where
    each theta-particle carries a full inner particle filter
    (reference smc_samplers.py:1038-1167).

    TPU-native: the Ntheta inner bootstrap filters are ONE vmapped scan
    carry — per-theta particle arrays (Ntheta, Nx), log-weights and
    likelihoods advance in lockstep, one fused kernel per observation.
    Resampling theta-particles gathers whole inner-filter states (the
    reference's deep-copy of inner SMC objects, smc_samplers.py:319-340);
    after an MCMC move on theta, inner filters are re-run from scratch up to
    the current time (the reference's replay, smc_samplers.py:1129-1143) —
    expressed as a scan inside the move target.

    The exchange step (Nx doubling when MCMC acceptance drops below
    ``ar_to_increase_Nx``, reference smc_samplers.py:1099-1108/1159-1163) is
    host-controlled: the stepping engine calls :meth:`maybe_exchange` before
    each step; on trigger, every inner filter is re-run from scratch at
    2*Nx (one compiled replay) and the theta-weights are corrected by the
    likelihood ratio — a controlled shape change + recompile, which happens
    at most a handful of times per run.
    """

    def __init__(self, ssm_cls=None, prior=None, data=None, init_Nx=100,
                 fk_cls=None, wastefree=False, len_chain=10, move=None,
                 ar_to_increase_Nx=-1.0, smc_options=None):
        super().__init__(model=StaticModel(data=data, prior=prior),
                         wastefree=wastefree, len_chain=len_chain, move=move)
        self.ssm_cls = ssm_cls
        self.prior = prior
        self.data = jnp.asarray(data)
        self.init_Nx = init_Nx
        from particles_tpu import state_space_models as ssms

        self.fk_cls = ssms.Bootstrap if fk_cls is None else fk_cls
        self.ar_to_increase_Nx = ar_to_increase_Nx
        # options forwarded to the inner filters (reference
        # smc_samplers.py:1081-1088): honor what the vmapped inner step
        # supports, raise on the rest rather than silently ignoring it
        opts = dict(smc_options or {})
        self.inner_resampling = opts.pop("resampling", "systematic")
        self.inner_ESSrmin = float(opts.pop("ESSrmin", 0.5))
        if opts:
            raise ValueError(
                f"SMC2: unsupported smc_options {sorted(opts)} "
                "(supported: resampling, ESSrmin)")

    @property
    def T(self):
        return self.data.shape[0]

    def _ssm_from_theta(self, theta_single):
        return self.ssm_cls(**theta_single)

    def _inner_step(self, key, theta_single, xs, lws, t):
        """Advance one inner bootstrap filter one step; returns
        (new x-particles, new lw, incremental loglik)."""
        from particles_tpu import ops

        ssm = self._ssm_from_theta(theta_single)
        fk = self.fk_cls(ssm=ssm, data=self.data)
        Nx = xs.shape[0]
        k_rs, k_m = jax.random.split(key)
        wgts = rs.Weights(lws)
        rs_flag = wgts.ESS < self.inner_ESSrmin * Nx
        counts = rs.resampling_counts(self.inner_resampling, k_rs, wgts.W,
                                      M=Nx)
        # serve_by_z(use_pallas=False), NOT a bare jnp.repeat: this step
        # runs under a vmap over N-theta particles, where jnp.repeat's
        # batching rule is catastrophic (1681 vs 1006 us/step at
        # ntheta=1000, Nx=100 — see ops/repeat_kernel._DENSE_SERVE_MAX);
        # use_pallas=False because vmap-of-scalar-prefetch-pallas is an
        # unvalidated route on hardware
        xs_res = ops.serve_by_z(
            jnp.cumsum(counts.astype(jnp.int32)), Nx, use_pallas=False)(xs)
        xs_sel = jnp.where(rs_flag, xs_res, xs)
        lw_sel = jnp.where(rs_flag, jnp.zeros(Nx), lws)
        x_new = fk.M(k_m, t, xs_sel)
        lw_new = lw_sel + fk.logG(t, xs_sel, x_new)
        new_w = rs.Weights(lw_new)
        loglt = jnp.where(
            rs_flag, new_w.log_mean, new_w.log_mean - wgts.log_mean
        )
        return x_new, lw_new, loglt

    def _inner_init(self, key, theta_single, Nx):
        ssm = self._ssm_from_theta(theta_single)
        fk = self.fk_cls(ssm=ssm, data=self.data)
        x0 = fk.M0(key, Nx)
        lw0 = fk.logG(0, None, x0)
        return x0, lw0, rs.Weights(lw0).log_mean

    def _M0(self, key, N0):
        k_th, k_pf = jax.random.split(key)
        th = dict(self.prior.rvs(k_th, size=N0))
        keys = jax.random.split(k_pf, N0)
        # inner filters are strictly per-theta: their (Nx,) weight
        # reductions must stay local even under particle sharding
        with distctx.local_context():
            xs, lws, loglt = jax.vmap(
                lambda k, i: self._inner_init(
                    k, {p: th[p][i] for p in th}, self.init_Nx
                ),
                in_axes=(0, 0),
            )(keys, jnp.arange(N0))
        x = ThetaParticles(
            theta=th,
            lpost=self.prior.logpdf(th) + loglt,
            xs=xs,
            lws=lws,
            loglik=loglt,
            pf_key=jax.random.split(jax.random.fold_in(key, 7), N0),
        )
        cal = self.move.calibrate(jnp.full(N0, 1.0 / _gN(N0)), x)
        return x.with_shared(acc_rate=jnp.float32(0.0), **cal)

    @property
    def _Nx(self):
        raise AttributeError  # use x.xs.shape[1]

    def logG_and_update(self, t, x):
        """Advance every inner filter one step; potential = incremental
        likelihood (reference smc_samplers.py:1099-1120).

        At outer time 0 the inner filters' time-0 reweighting (observation
        y_0) was already performed by ``_M0``'s ``_inner_init``; the
        potential is that stored increment and the filters must NOT advance
        again (the engine guarantees a concrete Python t=0 there).
        """
        if isinstance(t, int) and t == 0:
            return x.loglik, x
        N0 = x.N
        keys = jax.vmap(jax.random.fold_in)(x.pf_key, jnp.broadcast_to(t, (N0,)))
        step_keys = jax.vmap(lambda k: jax.random.split(k, 2))(keys)

        def one(i):
            th_i = {p: x.theta[p][i] for p in x.theta}
            return self._inner_step(
                step_keys[i, 0], th_i, x.xs[i], x.lws[i], t
            )

        # per-theta inner steps: suppress any ambient dist context so the
        # (Nx,) weight reductions stay theta-local (see distctx.local_context)
        with distctx.local_context():
            xs, lws, loglt = jax.vmap(one)(jnp.arange(N0))
        x = x.replace(
            xs=xs,
            lws=lws,
            loglik=x.loglik + loglt,
            lpost=x.lpost + loglt,
            pf_key=step_keys[:, 1],
        )
        return loglt, x

    def _replay_one(self, key, theta_single, t, Nx):
        """Re-run ONE theta's inner filter from scratch, processing
        observations 0..t-1 (masked full-horizon scan, one compiled program
        per Nx).  Shared by the MCMC move target and the exchange step."""
        x0, lw0, ll0 = self._inner_init(key, theta_single, Nx)

        def body(carry, s):
            xs, lws, ll = carry
            k = jax.random.fold_in(key, s)
            xs2, lws2, loglt = self._inner_step(k, theta_single, xs, lws, s)
            live = s < t
            xs2 = jnp.where(live, xs2, xs)
            lws2 = jnp.where(live, lws2, lws)
            ll = ll + jnp.where(live, loglt, 0.0)
            return (xs2, lws2, ll), None

        (xs, lws, ll), _ = jax.lax.scan(
            body, (x0, lw0, ll0), jnp.arange(1, self.data.shape[0])
        )
        return xs, lws, ll

    def move_target(self, t, x):
        """Target for MCMC on theta at time t: prior(theta) * Z_t^{Nx}(theta)
        — rebuilding each proposed theta's inner filter from scratch up to
        time t-1 (the replay, reference smc_samplers.py:1129-1143)."""
        Nx = x.xs.shape[1]  # xs is (Ntheta, Nx[, dx])

        def target(xx, key=None):
            N0 = xx.N
            if key is not None:
                # fresh replay randomness per MCMC step (passed by
                # ArrayMetropolis.step) — successive moves must not reuse
                # inner-filter draws (pseudo-marginal correctness)
                keys = jax.random.split(key, N0)
            else:
                keys = jax.vmap(jax.random.fold_in)(
                    xx.pf_key, jnp.arange(N0)
                )

            def one(i):
                th_i = {p: xx.theta[p][i] for p in xx.theta}
                return self._replay_one(keys[i], th_i, t, Nx)

            # replays are per-theta inner filters (see logG_and_update)
            with distctx.local_context():
                xs, lws, ll = jax.vmap(one)(jnp.arange(N0))
            lpost = self.prior.logpdf(xx.theta) + ll
            return xx.replace(xs=xs, lws=lws, loglik=ll, lpost=lpost)

        return target

    # ------------------------------------------------------------------
    # exchange step (Nx doubling)
    # ------------------------------------------------------------------

    def _replay_all(self, key, x, t, new_Nx):
        """Re-run every theta-particle's inner filter with ``new_Nx``
        x-particles up to time t-1 (see :meth:`_replay_one`)."""
        N0 = x.N
        keys = jax.random.split(key, N0)

        def one(i):
            th_i = {p: x.theta[p][i] for p in x.theta}
            return self._replay_one(keys[i], th_i, t, new_Nx)

        with distctx.local_context():
            return jax.vmap(one)(jnp.arange(N0))

    def maybe_exchange(self, smc):
        """Host-side hook called by the stepping engine before each step
        (t >= 1): double Nx when the last move's acceptance rate is below
        ``ar_to_increase_Nx``, correcting the theta log-weights by the
        likelihood ratio of the new vs old inner filters."""
        if self.ar_to_increase_Nx <= 0.0 or smc.t == 0:
            return
        if not bool(smc.rs_flag):
            return  # only after an actual resample-move step
        acc = float(smc.X.shared.get("acc_rate", 1.0))
        if acc >= self.ar_to_increase_Nx:
            return
        x = smc._carry.X
        new_Nx = 2 * x.xs.shape[1]
        # smc.key was already consumed by _sampler_step0 (split -> k0,
        # knext): splitting it again would REGENERATE the carry key that
        # seeded every step, correlating the replayed inner filters with
        # the run's own randomness (fatal in a pseudo-marginal method).
        # Use a fold_in stream disjoint from every split-derived key.
        k = jax.random.fold_in(
            jax.random.fold_in(smc.key, 0x45584348), smc.t)  # "EXCH"
        replay = jax.jit(
            lambda key, x, t: self._replay_all(key, x, t, new_Nx),
            static_argnames=(),
        )
        xs, lws, ll_new = replay(k, x, jnp.int32(smc.t))
        delta = ll_new - x.loglik
        x = x.replace(
            xs=xs, lws=lws, loglik=ll_new, lpost=x.lpost + delta
        )
        new_lw = smc._carry.lw + delta
        new_wgts = rs.Weights(new_lw)
        # evidence correction: the reweighting by exp(delta) contributes
        # log E_W[exp(delta)] to logLt (reference smc_samplers.py:1118 folds
        # delta into the next potential; we account for it here and refresh
        # log_mean_w so the next step's increment is measured against the
        # post-exchange weights — no term is lost when that step resamples).
        corr = new_wgts.log_mean - smc._carry.log_mean_w
        smc._carry = smc._carry._replace(
            X=x, lw=new_lw, logLt=smc._carry.logLt + corr,
            log_mean_w=new_wgts.log_mean,
        )
        smc.X = x
        smc.wgts = new_wgts
        smc.logLt = smc._carry.logLt
        if smc.verbose:
            print(f"t={smc.t}: exchange step, Nx -> {new_Nx}")
