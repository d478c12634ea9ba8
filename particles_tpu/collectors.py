"""On-line summary collectors.

Counterpart of reference ``collectors.py`` (collectors.py:215-449).  A
collector is a pure function of the per-step state view; *stateful*
collectors (on-line smoothers, fixed-lag smoothers, variance estimators)
additionally thread a state pytree through the scan carry — the TPU-native
replacement for the reference's mutable collector attributes
(``self.Phi``, ``self.B``...).

Defaults (always on unless ``collect='off'``): ESS, logLt and the
resampling flag (reference collectors.py:278-295).  Extra collectors are
passed as instances: ``SMC(fk=fk, N=100, collect=[Moments(), Paris()])``.

The state view passed to ``collect``/``step`` mimics the attributes
collectors read from the reference ``SMC`` object: ``t, X, Xp, A, wgts,
aux, W, rs_flag, logLt, loglt, fk, N``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from particles_tpu import resampling as rs
from particles_tpu.utils.struct import Pytree

__all__ = [
    "Collector",
    "Summaries",
    "ESSs",
    "LogLts",
    "Rs_flags",
    "Moments",
    "Fixed_lag_smooth",
    "Online_smooth_naive",
    "Online_smooth_ON2",
    "Paris",
    "default_collector_cls",
]


class Collector(Pytree):
    """Base class for collectors (reference collectors.py:234-271).

    Stateless collectors define ``collect(view) -> pytree``.  Stateful ones
    set ``stateful = True`` and define ``init(view) -> (state, out)`` (called
    at t=0, outside the scan) and ``step(view, state) -> (state, out)``.
    Keyword arguments declared in class attribute ``signature`` are stored as
    attributes (mirroring the reference's signature/clone protocol).
    """

    signature = {}
    stateful = False
    # True if step()/init() reads view.A or view.Xp.  The SQMC engine skips
    # materialising ancestor indices / resampled ancestors when no consumer
    # needs them (conservative default: custom collectors pay the cost).
    uses_genealogy = True
    # True if collect()/step() runs host-side NumPy (e.g. the waste-free
    # variance estimators): such collectors cannot execute inside the
    # compiled scan, so SMC falls back to step-by-step execution.
    host_side = False
    # True if the collector is correct under particle sharding (shard_map
    # execution with a distctx): its reductions must go through the
    # dist-aware numerics layer (Weights / wmean_and_var) and it must not
    # walk the genealogy or keep per-particle state across steps.
    dist_safe = False

    @property
    def summary_name(self):
        cn = self.__class__.__name__
        return cn[0].lower() + cn[1:]

    def __init__(self, **kwargs):
        params = dict(self.signature)
        params.update(kwargs)
        for k, v in params.items():
            setattr(self, k, v)

    def collect(self, view):
        raise NotImplementedError


class ESSs(Collector):
    """Effective sample size at each t (reference collectors.py:278-283)."""

    summary_name = "ESSs"
    uses_genealogy = False
    dist_safe = True

    def collect(self, view):
        return view.wgts.ESS


class LogLts(Collector):
    """Cumulative log-likelihood estimate at each t (collectors.py:285-288)."""

    summary_name = "logLts"
    uses_genealogy = False
    dist_safe = True

    def collect(self, view):
        return view.logLt


class Rs_flags(Collector):
    """Whether resampling happened at each t (collectors.py:290-293)."""

    summary_name = "rs_flags"
    uses_genealogy = False
    dist_safe = True

    def collect(self, view):
        return view.rs_flag


class Moments(Collector):
    """Weighted moments of the particle cloud at each t (collectors.py:301-317).

    Uses ``fk.default_moments`` unless a custom ``mom_func`` is provided.
    """

    summary_name = "moments"
    uses_genealogy = False
    # default_moments reduces through the dist-aware wmean_and_var; a
    # custom mom_func must do the same to remain correct under sharding
    dist_safe = True
    signature = {"mom_func": None}

    def collect(self, view):
        f = view.fk.default_moments if self.mom_func is None else self.mom_func
        return f(view.wgts.W, view.X)


# ---------------------------------------------------------------------------
# smoothing collectors
# ---------------------------------------------------------------------------

class Fixed_lag_smooth(Collector):
    """Fixed-lag smoothing over a rolling window of lag ``k``
    (reference collectors.py:323-341).

    The reference requires ``store_history=k``; here the rolling window is
    collector state (a (k, N, ...) ring buffer threaded through the scan).
    ``phi`` maps the stacked window (k, N, ...) to per-particle values
    (N, ...); default is the oldest slice (lag-k state).
    """

    summary_name = "fixed_lag_smooths"
    signature = {"phi": None, "lag": 5}
    stateful = True

    def test_func(self, Xwin):
        if self.phi is None:
            return Xwin[0]
        return self.phi(Xwin)

    def _out(self, view, Xbuf):
        vals = self.test_func(Xbuf)
        W = view.wgts.W
        Wc = W.reshape((-1,) + (1,) * (vals.ndim - 1))
        return jnp.sum(Wc * vals, axis=0)

    def init(self, view):
        k = self.lag + 1
        Xbuf = jnp.broadcast_to(view.X, (k,) + view.X.shape)
        Abuf = jnp.broadcast_to(
            jnp.arange(view.N, dtype=jnp.int32), (k, view.N)
        ).copy()
        state = (Xbuf, Abuf)
        return state, self._out(view, Xbuf)

    def step(self, view, state):
        Xbuf, Abuf = state
        # slide the window: drop oldest, append current
        Xbuf = jnp.concatenate([Xbuf[1:], view.X[None]], axis=0)
        Abuf = jnp.concatenate([Abuf[1:], view.A[None]], axis=0)
        # genealogy within the window: B[i] = ancestors at window slot i
        from particles_tpu.smoothing import _compute_trajectories

        B = _compute_trajectories(Abuf)
        Xs = jax.vmap(lambda Xt, Bt: jnp.take(Xt, Bt, axis=0))(Xbuf, B)
        state = (Xbuf, Abuf)
        return state, self._out(view, Xs)


class OnlineSmootherMixin:
    """Mix-in for on-line smoothing algorithms (reference collectors.py:345-366):
    maintains per-particle additive statistics Phi."""

    stateful = True

    def init(self, view):
        Phi = view.fk.add_func(0, None, view.X)
        state = self.save_for_later((Phi,), view)
        return state, self._avg(Phi, view)

    def _avg(self, Phi, view):
        W = view.wgts.W
        Wc = W.reshape((-1,) + (1,) * (Phi.ndim - 1))
        return jnp.sum(Wc * Phi, axis=0)

    def step(self, view, state):
        Phi = self.update(view, state)
        out = self._avg(Phi, view)
        return self.save_for_later((Phi,), view), out

    def update(self, view, state):
        raise NotImplementedError

    def save_for_later(self, base, view):
        return base


class Online_smooth_naive(OnlineSmootherMixin, Collector):
    """Naive (genealogy-tracking) on-line smoother, O(N) per step
    (reference collectors.py:368-370)."""

    summary_name = "online_smooth_naives"

    def update(self, view, state):
        (Phi,) = state
        return jnp.take(Phi, view.A, axis=0) + view.fk.add_func(
            view.t, view.Xp, view.X
        )


class Online_smooth_ON2(OnlineSmootherMixin, Collector):
    """Exact O(N²) on-line smoother (reference collectors.py:373-387),
    vectorised as a row-softmax + contraction."""

    summary_name = "online_smooth_ON2s"

    def update(self, view, state):
        Phi, prev_X, prev_lw = state
        fk, t = view.fk, view.t

        def per_particle(x_n):
            lw = prev_lw + fk.logpt(t, prev_X, x_n)
            Wn = jax.nn.softmax(lw)
            vals = Phi + fk.add_func(t, prev_X, x_n)
            Wc = Wn.reshape((-1,) + (1,) * (vals.ndim - 1))
            return jnp.sum(Wc * vals, axis=0)

        return jax.vmap(per_particle)(view.X)

    def save_for_later(self, base, view):
        return base + (view.X, view.wgts.lw)


class Paris(OnlineSmootherMixin, Collector):
    """Hybrid PaRIS on-line smoother (reference collectors.py:390-449;
    Olsson & Westerborn 2017, hybrid variant of Dau & Chopin 2022).

    Per particle, ``Nparis`` backward indices are drawn by rejection from
    the multinomial proposal (at most ``max_trials`` masked rounds), with an
    exact O(N) fallback.  Requires ``fk.ssm.upper_bound_log_pt``.
    """

    summary_name = "paris"
    signature = {"Nparis": 2, "max_trials": None}

    def update(self, view, state):
        Phi, prev_X, prev_lw, key = state
        fk, t, N = view.fk, view.t, view.N
        maxtries = N if self.max_trials is None else self.max_trials
        prev_W = rs.exp_and_normalise(prev_lw)
        upb = fk.ssm.upper_bound_log_pt(t)
        P = self.Nparis
        key, kloop, kfall = jax.random.split(key, 3)

        from particles_tpu.smoothing import _tree_cols

        xprep = _tree_cols(prev_X)

        def trial(st):
            As, rejected, k, trials = st
            k, k1, k2 = jax.random.split(k, 3)
            if xprep is None:
                prop = rs.multinomial_iid(k1, prev_W, N * P)
                x_prop = jnp.take(prev_X, prop, axis=0)
            else:
                # fused draw + value serve (one kernel-chunk pass instead
                # of a random (N*P,) gather per trial); falls back to
                # exactly the take above off-TPU
                xcols, xrebuild = xprep
                prop, vals = rs.multinomial_iid_values(
                    k1, prev_W, list(xcols), N * P)
                x_prop = xrebuild(vals)
            prop = prop.reshape(N, P)
            x_prop = jax.tree_util.tree_map(
                lambda l: l.reshape((N, P) + l.shape[1:]), x_prop)
            # view.X[:, None]: (N, 1[, d]) broadcasts against (N, P[, d])
            lp = fk.logpt(t, x_prop, view.X[:, None]) - upb
            lu = jnp.log(jax.random.uniform(k2, (N, P)))
            newly = rejected & (lu < lp)
            As = jnp.where(newly, prop, As)
            rejected = rejected & ~newly
            return As, rejected, k, trials + 1

        def cond(st):
            _, rejected, _, trials = st
            return jnp.any(rejected) & (trials < maxtries)

        As0 = jnp.zeros((N, P), jnp.int32)
        # multinomial_iid's Pallas fast path inside this while_loop body
        # is chip-validated (tools/smoke_whileloop_pallas.py, 2026-08-19:
        # N=2048/Nparis=2, compiles and runs, same law as the
        # searchsorted route — the round-4 no_pallas gate here is no
        # longer needed)
        As, rejected, _, _ = jax.lax.while_loop(
            cond, trial, (As0, jnp.ones((N, P), bool), kloop,
                          jnp.int32(0))
        )
        # exact fallback for the stragglers only, in (K, N) chunks
        # (reference collectors.py:390-449 loops over them; the naive
        # jittable phrasing — a full (N, N) weight matrix + (N, P, N)
        # Gumbel tensor — is O(N²P) per step and memory-infeasible at
        # N = 2^17): compact the rejected flat indices to the front with
        # one sort, then a while_loop whose trip count is
        # ceil(n_rejected / K) — zero on fully-accepted steps
        MF = N * P
        rej_f = rejected.reshape(MF)
        Kc = int(min(MF, max(8, (1 << 24) // max(N, 1))))
        nrej = jnp.sum(rej_f.astype(jnp.int32))
        _, strag = jax.lax.sort(
            ((~rej_f).astype(jnp.int32), jnp.arange(MF, dtype=jnp.int32)),
            num_keys=1)
        # pad with MF (out of bounds): invalid lanes drop in the scatter
        strag_pad = jnp.concatenate([strag, jnp.full((Kc,), MF, jnp.int32)])

        def fb_body(st):
            start, A = st
            sl = jax.lax.dynamic_slice(strag_pad, (start,), (Kc,))
            valid = (start + jnp.arange(Kc, dtype=jnp.int32)) < nrej
            sl = jnp.where(valid, sl, MF)
            x_sl = jnp.take(view.X, sl // P, axis=0)
            lwm = jax.vmap(
                lambda x_n: prev_lw + fk.logpt(t, prev_X, x_n)
            )(x_sl)  # (Kc, N)
            g = jax.random.gumbel(jax.random.fold_in(kfall, start),
                                  (Kc, N))
            exact = jnp.argmax(lwm + g, axis=-1).astype(jnp.int32)
            A = A.at[sl].set(exact, mode="drop")
            return start + Kc, A

        _, As_f = jax.lax.while_loop(
            lambda st: st[0] < nrej, fb_body, (jnp.int32(0), As.reshape(MF)))
        As = As_f.reshape(N, P)
        vals = jnp.take(Phi, As, axis=0) + fk.add_func(
            t, jnp.take(prev_X, As, axis=0), view.X[:, None]
        )
        return jnp.mean(vals, axis=1)

    def init(self, view):
        Phi = view.fk.add_func(0, None, view.X)
        key = view.key if view.key is not None else jax.random.key(987654321)
        state = (Phi, view.X, view.wgts.lw, key)
        return state, self._avg(Phi, view)

    def step(self, view, state):
        Phi = self.update(view, state)
        out = self._avg(Phi, view)
        new_key = (view.key if view.key is not None
                   else jax.random.fold_in(state[3], view.t))
        return (Phi, view.X, view.wgts.lw, new_key), out


default_collector_cls = [ESSs, LogLts, Rs_flags]


class Summaries:
    """Container of per-run summaries (reference collectors.py:215-231).

    After a run, each collector's stacked output is available as an
    attribute, e.g. ``smc.summaries.ESSs`` (a (T,) array), exactly like the
    reference (modulo array-vs-list).
    """

    def __init__(self, cols):
        self._collectors = [cls() for cls in default_collector_cls]
        if cols is not None:
            self._collectors.extend(
                c if isinstance(c, Collector) else c() for c in cols
            )
        for col in self._collectors:
            setattr(self, col.summary_name, [])

    @property
    def needs_genealogy(self):
        """True if any collector reads view.A / view.Xp (the SQMC engine
        skips materialising them otherwise)."""
        return any(c.uses_genealogy for c in self._collectors)

    @property
    def has_host_side(self):
        """True if any collector runs host-side NumPy (cannot trace):
        forces step-by-step execution instead of the compiled scan."""
        return any(c.host_side for c in self._collectors)

    def init_step(self, view):
        """t=0: returns (states, outputs) across collectors."""
        states, outs = [], []
        for c in self._collectors:
            if c.stateful:
                s, o = c.init(view)
            else:
                s, o = None, c.collect(view)
            states.append(s)
            outs.append(o)
        return tuple(states), tuple(outs)

    def step(self, view, states):
        new_states, outs = [], []
        for c, s in zip(self._collectors, states):
            if c.stateful:
                s2, o = c.step(view, s)
            else:
                s2, o = None, c.collect(view)
            new_states.append(s2)
            outs.append(o)
        return tuple(new_states), tuple(outs)

    def assign_stacked(self, stacked):
        """Install scan-stacked outputs as attributes (scan mode)."""
        for col, out in zip(self._collectors, stacked):
            setattr(self, col.summary_name, out)

    def append_step(self, outputs):
        """Append one step's outputs (step-by-step mode)."""
        for col, out in zip(self._collectors, outputs):
            getattr(self, col.summary_name).append(out)

    def finalize_lists(self):
        """Stack host-accumulated lists into arrays where possible."""
        for col in self._collectors:
            val = getattr(self, col.summary_name)
            if isinstance(val, list) and val and isinstance(val[0], jnp.ndarray):
                try:
                    setattr(self, col.summary_name, jnp.stack(val))
                except (ValueError, TypeError):
                    pass
