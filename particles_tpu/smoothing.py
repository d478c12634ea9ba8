"""Particle history and off-line smoothing algorithms (FFBS, two-filter).

Counterpart of reference ``smoothing.py``: particle history containers
(full / partial / rolling, smoothing.py:151-254), genealogy tracing
(:222-254), FFBS in its variants — O(N²) (:291-311), MCMC (:313-350,
recommended), hybrid rejection (:352-423), QMC (:425-456, see
``particles_tpu.rqmc``) — two-filter smoothing O(N²)/O(N) (:487-575), and
the generic :func:`smoothing_worker` benchmark harness (:578-677).

TPU-native design: the history is the *stacked scan output* of the forward
pass — ``X`` (T, N, ...), ``A`` (T, N), ``lw`` (T, N) device arrays, not
Python lists — and every backward pass is a ``lax.scan`` over reversed time,
vectorised over the M trajectories:

* O(N²) FFBS computes the (M, N) backward-weight matrix per step and samples
  with the Gumbel-argmax trick (no per-row searchsorted);
* MCMC FFBS is the Dau & Chopin (2022) independent-Metropolis variant, one
  fused step for all M trajectories;
* rejection FFBS is the hybrid variant with a bounded ``fori_loop`` of
  masked proposal rounds followed by an exact O(MN) fallback for the
  still-rejected — the JAX-friendly formulation of the reference's queue
  loop (smoothing.py:391-423).
"""

from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp

from particles_tpu import resampling as rs

__all__ = [
    "ParticleHistory",
    "PartialParticleHistory",
    "RollingParticleHistory",
    "generate_hist_obj",
    "smoothing_worker",
]


def generate_hist_obj(option, smc):
    """Dispatch on the ``store_history`` option (reference smoothing.py:151-161)."""
    if option is True:
        return True  # engine stacks full history; wrapped after the run
    elif option is False:
        return None
    elif callable(option):
        return PartialParticleHistory(option)
    elif isinstance(option, int) and option >= 0:
        return RollingParticleHistory(option)
    raise ValueError("store_history: invalid option")


class PartialParticleHistory:
    """History recorded only at times where ``func(t)`` is true
    (reference smoothing.py:164-178).  Step-by-step mode only."""

    def __init__(self, func):
        self.is_save_time = func
        self.X, self.wgts = {}, {}

    def save(self, smc):
        t = smc.t
        if self.is_save_time(t):
            self.X[t] = smc.X
            self.wgts[t] = smc.wgts


class RollingParticleHistory:
    """History keeping the k most recent particle systems
    (reference smoothing.py:181-219)."""

    def __init__(self, length):
        self.X = deque([], length)
        self.A = deque([], length)
        self.wgts = deque([], length)

    @property
    def N(self):
        return self.X[0].shape[0]

    @property
    def T(self):
        return len(self.X)

    def save(self, smc):
        self.X.append(smc.X)
        self.A.append(smc.A)
        self.wgts.append(smc.wgts)

    def compute_trajectories(self):
        """(T, N) array B with B[t, n] = time-t ancestor of particle X_T^n
        (reference smoothing.py:209-219), as a reverse scan of gathers."""
        A = jnp.stack(list(self.A))
        return _compute_trajectories(A)


def _compute_trajectories(A):
    N = A.shape[1]

    def body(B_next, A_t1):
        B_t = jnp.take(A_t1, B_next)
        return B_t, B_t

    B_T = jnp.arange(N, dtype=jnp.int32)
    _, Bs_rev = jax.lax.scan(body, B_T, A[:0:-1])
    return jnp.concatenate([Bs_rev[::-1], B_T[None]], axis=0)


def _tree_cols(tree):
    """Flatten a particle pytree into 1-D columns for the fused kernel
    serves (``rs.take_by_sort`` / ``rs.multinomial_iid_values``).
    Returns ``(cols, rebuild)`` or ``None`` when a leaf has ndim > 2
    (callers then keep the plain-gather path)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    cols, dims = [], []
    for l in leaves:
        if l.ndim == 1:
            cols.append(l)
            dims.append(None)
        elif l.ndim == 2:
            cols.extend(l[:, j] for j in range(l.shape[1]))
            dims.append(l.shape[1])
        else:
            return None

    def rebuild(served):
        out, j = [], 0
        for d in dims:
            if d is None:
                out.append(served[j])
                j += 1
            else:
                out.append(jnp.stack(served[j:j + d], axis=1))
                j += d
        return jax.tree_util.tree_unflatten(treedef, out)

    return cols, rebuild


def _gumbel_categorical(key, logits):
    """One draw per row of (M, N) logits via Gumbel argmax — O(MN) fully
    parallel, instead of M searchsorted lookups."""
    g = jax.random.gumbel(key, logits.shape)
    return jnp.argmax(logits + g, axis=-1).astype(jnp.int32)


class ParticleHistory:
    """Full particle history as stacked device arrays; off-line smoothing
    algorithms are methods (reference smoothing.py:222-456).

    Attributes: ``X`` pytree with (T, N, ...) leaves, ``A`` (T, N) int32,
    ``lw`` (T, N).  ``wgts[t]``-style access of the reference becomes
    ``wgts_at(t)``; ``wgts`` (no index) is the final-time Weights.
    ``hilbert_ordered`` records that the forward pass was SQMC, whose
    engine stores every frame in Hilbert order (with ancestor indices into
    the previous Hilbert-ordered frame) — the layout QMC-FFBS needs.
    """

    def __init__(self, fk, X, A, lw, hilbert_ordered=False):
        self.fk = fk
        self.X = X
        self.A = A
        self.lw = lw
        self.hilbert_ordered = hilbert_ordered

    @property
    def T(self):
        return self.A.shape[0]

    @property
    def N(self):
        return self.A.shape[1]

    @property
    def wgts(self):
        return rs.Weights(self.lw[-1])

    def wgts_at(self, t):
        return rs.Weights(self.lw[t])

    def _x_at(self, t):
        return jax.tree_util.tree_map(lambda leaf: leaf[t], self.X)

    def compute_trajectories(self):
        return _compute_trajectories(self.A)

    def extract_one_trajectory(self, key):
        """Sample one trajectory from the genealogy
        (reference smoothing.py:256-270)."""
        k1, _ = jax.random.split(key)
        n_T = rs.multinomial_once(k1, self.wgts.W)
        B = self.compute_trajectories()
        idx = B[:, n_T]
        return jax.tree_util.tree_map(
            lambda leaf: jax.vmap(lambda t, i: leaf[t, i])(
                jnp.arange(self.T), idx
            ),
            self.X,
        )

    # ------------------------------------------------------------------
    # FFBS
    # ------------------------------------------------------------------

    def _init_backward(self, key, M):
        return rs.multinomial_iid(key, self.wgts.W, M)

    def _output_paths(self, idx):
        """paths as a (T, M, ...) pytree (reference returns list of arrays)."""
        return jax.tree_util.tree_map(
            lambda leaf: jax.vmap(
                lambda t, ix: jnp.take(leaf[t], ix, axis=0)
            )(jnp.arange(self.T), idx),
            self.X,
        )

    def backward_sampling_ON2(self, key, M):
        """Exact O(N²) FFBS (reference smoothing.py:290-310), vectorised over
        the M trajectories and scanned backward over time."""
        kT, kscan = jax.random.split(key)
        idx_T = self._init_backward(kT, M)
        fk = self.fk
        keys = jax.random.split(kscan, self.T - 1)

        def body(idx_next, inputs):
            t, k, X_t, lw_t, X_t1 = inputs
            xn = jax.tree_util.tree_map(
                lambda leaf: jnp.take(leaf, idx_next, axis=0), X_t1
            )
            # (M, N) backward log-weights
            lwm = jax.vmap(
                lambda x_one: lw_t + fk.logpt(t + 1, X_t, x_one)
            )(xn)
            idx_t = _gumbel_categorical(k, lwm)
            return idx_t, idx_t

        ts = jnp.arange(self.T - 1, dtype=jnp.int32)
        inputs = (
            ts[::-1],
            keys,
            jax.tree_util.tree_map(lambda leaf: leaf[-2::-1], self.X),
            self.lw[-2::-1],
            jax.tree_util.tree_map(lambda leaf: leaf[:0:-1], self.X),
        )
        _, idx_rev = jax.lax.scan(body, idx_T, inputs)
        idx = jnp.concatenate([idx_rev[::-1], idx_T[None]], axis=0)
        return self._output_paths(idx)

    def backward_sampling_mcmc(self, key, M, nsteps=1):
        """MCMC (independent Metropolis) FFBS — O(N + M T), the recommended
        default (reference smoothing.py:313-350; Dau & Chopin 2022).

        Gather-free on TPU (VERDICT r4 task 3): the backward body's four
        random M-sized gathers — ``X_{t+1}[idx]``, ``A_{t+1}[idx]``,
        ``X_t[A_{t+1}[idx]]`` and the proposal's ``X_t[prop]`` — were the
        dominant cost (~2 ms apiece at M=2^17 at the measured ~60M
        elem/s random-gather rate).  Here:

        * ``X_t[A_{t+1}[·]]`` is precomputed as columns ``Xa``: ancestor
          vectors from the engine's counts fast path are SORTED, so this
          is ONE fused inverse-CDF serve (``rs.take_sorted``); unsorted
          ancestors (QMC histories) fall back to a gather via lax.cond;
        * all idx-dependent reads (``A``, ``X_{t+1}`` cols, ``Xa`` cols)
          ride ONE sort-serve-unsort (``rs.take_by_sort``);
        * the proposal draw serves ``X_t[prop]`` in the SAME kernel call
          as the indices (``rs.multinomial_iid_values``).

        Realisation-equivalent to the plain-gather formulation (the
        serves are exact and consume the identical uniform stream).
        """
        kT, kscan = jax.random.split(key)
        idx_T = self._init_backward(kT, M)
        fk = self.fk
        keys = jax.random.split(kscan, self.T - 1)

        def body(idx_next, inputs):
            t, k, X_t, lw_t, A_t1, X_t1 = inputs
            W_t = rs.exp_and_normalise(lw_t)
            xt_prep = _tree_cols(X_t)
            x1_prep = _tree_cols(X_t1)
            if xt_prep is None or x1_prep is None:
                # >2-D leaves: plain-gather path
                xn = jax.tree_util.tree_map(
                    lambda leaf: jnp.take(leaf, idx_next, axis=0), X_t1)
                idx_t = jnp.take(A_t1, idx_next)
                x_cur = jax.tree_util.tree_map(
                    lambda l: jnp.take(l, idx_t, axis=0), X_t)
                serve_prop = None
            else:
                xt_cols, xt_rebuild = xt_prep
                x1_cols, x1_rebuild = x1_prep
                # Xa = X_t[A_{t+1}]: sorted-ancestor serve, gather fallback
                n_src = A_t1.shape[0]
                a_sorted = jnp.all(jnp.diff(A_t1) >= 0)
                Xa_cols = jax.lax.cond(
                    a_sorted,
                    lambda: tuple(rs.take_sorted(A_t1, xt_cols)),
                    lambda: tuple(jnp.take(c, A_t1, axis=0)
                                  for c in xt_cols),
                )
                served = rs.take_by_sort(
                    idx_next, [A_t1] + list(x1_cols) + list(Xa_cols))
                idx_t = served[0]
                nx1 = len(x1_cols)
                xn = x1_rebuild(served[1:1 + nx1])
                x_cur = xt_rebuild(served[1 + nx1:])
                serve_prop = (xt_cols, xt_rebuild)
            lp_cur = fk.logpt(t + 1, x_cur, xn)

            def mh_step(i, carry):
                idx_t, lp_cur, k = carry
                k, k1, k2 = jax.random.split(k, 3)
                if serve_prop is None:
                    prop = rs.multinomial_iid(k1, W_t, M)
                    x_prop = jax.tree_util.tree_map(
                        lambda l: jnp.take(l, prop, axis=0), X_t)
                else:
                    xt_cols, xt_rebuild = serve_prop
                    prop, vals = rs.multinomial_iid_values(
                        k1, W_t, list(xt_cols), M)
                    x_prop = xt_rebuild(vals)
                lp_prop = fk.logpt(t + 1, x_prop, xn)
                lu = jnp.log(jax.random.uniform(k2, (M,)))
                accept = lu < (lp_prop - lp_cur)
                idx_t = jnp.where(accept, prop, idx_t)
                lp_cur = jnp.where(accept, lp_prop, lp_cur)
                return idx_t, lp_cur, k

            idx_t, _, _ = jax.lax.fori_loop(
                0, nsteps, mh_step, (idx_t, lp_cur, k)
            )
            return idx_t, idx_t

        ts = jnp.arange(self.T - 1, dtype=jnp.int32)
        inputs = (
            ts[::-1],
            keys,
            jax.tree_util.tree_map(lambda leaf: leaf[-2::-1], self.X),
            self.lw[-2::-1],
            self.A[:0:-1],
            jax.tree_util.tree_map(lambda leaf: leaf[:0:-1], self.X),
        )
        _, idx_rev = jax.lax.scan(body, idx_T, inputs)
        idx = jnp.concatenate([idx_rev[::-1], idx_T[None]], axis=0)
        return self._output_paths(idx)

    def backward_sampling_reject(self, key, M, max_trials=None):
        """Hybrid rejection FFBS (reference smoothing.py:352-423): at most
        ``max_trials`` masked rejection rounds per time step, then the exact
        O(MN) method for trajectories still rejected.  Requires the model to
        define ``upper_bound_trans``.  Acceptance rates stored in
        ``self.acc_rate``."""
        if max_trials is None:
            max_trials = M
        kT, kscan = jax.random.split(key)
        idx_T = self._init_backward(kT, M)
        fk = self.fk
        keys = jax.random.split(kscan, self.T - 1)

        def body(idx_next, inputs):
            t, k, X_t, lw_t, X_t1 = inputs
            W_t = rs.exp_and_normalise(lw_t)
            xn = jax.tree_util.tree_map(
                lambda leaf: jnp.take(leaf, idx_next, axis=0), X_t1
            )
            ubnd = fk.upper_bound_trans(t + 1)
            k, kfall = jax.random.split(k)

            xt_prep = _tree_cols(X_t)

            def trial(state):
                idx_t, rejected, nprops, trials, k = state
                k, k1, k2 = jax.random.split(k, 3)
                if xt_prep is None:
                    prop = rs.multinomial_iid(k1, W_t, M)
                    x_prop = jax.tree_util.tree_map(
                        lambda l: jnp.take(l, prop, axis=0), X_t)
                else:
                    # fused draw + value serve: X_t[prop] rides the same
                    # kernel pass as the proposal draw (identical
                    # fallback semantics off-TPU)
                    xt_cols, xt_rebuild = xt_prep
                    prop, vals = rs.multinomial_iid_values(
                        k1, W_t, list(xt_cols), M)
                    x_prop = xt_rebuild(vals)
                lp = fk.logpt(t + 1, x_prop, xn) - ubnd
                lu = jnp.log(jax.random.uniform(k2, (M,)))
                newly = rejected & (lu < lp)
                idx_t = jnp.where(newly, prop, idx_t)
                rejected = rejected & ~newly
                nprops = nprops + jnp.sum(rejected | newly)
                return idx_t, rejected, nprops, trials + 1, k

            def cond(state):
                _, rejected, _, trials, _ = state
                return jnp.any(rejected) & (trials < max_trials)

            idx_t0 = jnp.zeros(M, jnp.int32)
            state = (idx_t0, jnp.ones(M, bool), jnp.int32(0), jnp.int32(0), k)
            # multinomial_iid's Pallas fast path inside this while_loop
            # body is chip-validated (tools/smoke_whileloop_pallas.py,
            # 2026-08-19: compiles and runs at N=M=2^14, identical law to
            # the searchsorted route — the round-4 no_pallas gate here is
            # no longer needed)
            idx_t, rejected, nprops, _, _ = jax.lax.while_loop(
                cond, trial, state
            )
            # exact fallback for still-rejected trajectories, processed in
            # straggler chunks (reference smoothing.py:352-423 loops over
            # the stragglers only; a full (M, N) logpt matrix — the naive
            # jittable phrasing — costs O(MN) per step and at M = N = 2^14
            # measured 250 ms/step because SOME trajectory is almost
            # always still rejected).  Compact the rejected indices to the
            # front with one sort (sorts are the fast primitive on TPU),
            # then a while_loop over (K, N) chunks — trip count
            # ceil(n_rejected / K), i.e. ZERO on fully-accepted steps and
            # one small chunk in the typical few-stragglers case.
            N_src = lw_t.shape[0]
            Kc = int(min(M, max(8, (1 << 24) // max(N_src, 1))))
            nrej = jnp.sum(rejected.astype(jnp.int32))
            _, strag = jax.lax.sort(
                ((~rejected).astype(jnp.int32),
                 jnp.arange(M, dtype=jnp.int32)), num_keys=1)
            # pad with M (out-of-bounds): invalid lanes are dropped by the
            # scatter, so no stale writes can race a real update
            strag_pad = jnp.concatenate(
                [strag, jnp.full((Kc,), M, jnp.int32)])

            def fb_body(st):
                start, idx = st
                sl = jax.lax.dynamic_slice(strag_pad, (start,), (Kc,))
                valid = (start + jnp.arange(Kc, dtype=jnp.int32)) < nrej
                sl = jnp.where(valid, sl, M)
                xn_sl = jax.tree_util.tree_map(
                    lambda l: jnp.take(l, sl, axis=0), xn)
                lwm = jax.vmap(
                    lambda x_one: lw_t + fk.logpt(t + 1, X_t, x_one)
                )(xn_sl)
                exact = _gumbel_categorical(
                    jax.random.fold_in(kfall, start), lwm)
                idx = idx.at[sl].set(exact, mode="drop")
                return start + Kc, idx

            _, idx_t = jax.lax.while_loop(
                lambda st: st[0] < nrej, fb_body,
                (jnp.int32(0), idx_t))
            acc = (M - jnp.sum(rejected)) / jnp.maximum(nprops, 1)
            return idx_t, (idx_t, acc)

        ts = jnp.arange(self.T - 1, dtype=jnp.int32)
        inputs = (
            ts[::-1],
            keys,
            jax.tree_util.tree_map(lambda leaf: leaf[-2::-1], self.X),
            self.lw[-2::-1],
            jax.tree_util.tree_map(lambda leaf: leaf[:0:-1], self.X),
        )
        _, (idx_rev, acc_rev) = jax.lax.scan(body, idx_T, inputs)
        self.acc_rate = acc_rev[::-1]
        idx = jnp.concatenate([idx_rev[::-1], idx_T[None]], axis=0)
        return self._output_paths(idx)

    def backward_sampling_qmc(self, key, M):
        """QMC FFBS (reference smoothing.py:425-456); requires the forward
        pass to have been run with ``qmc=True`` — the SQMC engine stores
        every frame in Hilbert order, so the inverse-CDF lookups below act
        directly on stored indices (no per-step permutation)."""
        if not self.hilbert_ordered:
            raise ValueError(
                "QMC FFBS requires particles to have been Hilbert-ordered "
                "during the forward pass (run SMC with qmc=True)"
            )
        from particles_tpu import rqmc

        u = rqmc.sobol(key, M, self.T)
        fk = self.fk
        # final time: inverse-CDF over the (Hilbert-ordered) final weights.
        # searchsorted-style lookup of the UNSORTED final coordinates keeps
        # each trajectory's Sobol coordinates paired across time
        # (reference smoothing.py:440-442)
        # binary search needs a MONOTONE array: XLA's parallel f32 cumsum
        # can dip at large N (see resampling._normalised_cumsum_mono)
        csT, _mono = rs._normalised_cumsum_mono(self.wgts.W)
        if not _mono:
            csT = rs._monotone_z(csT)
        idx_T = jnp.clip(
            jnp.searchsorted(csT, u[:, -1], side="left"), 0, self.N - 1
        ).astype(jnp.int32)

        def body(idx_next, inputs):
            t, u_t, X_t, lw_t, X_t1 = inputs
            xn = jax.tree_util.tree_map(
                lambda leaf: jnp.take(leaf, idx_next, axis=0), X_t1
            )
            lwm = jax.vmap(
                lambda x_one: lw_t + fk.logpt(t + 1, X_t, x_one)
            )(xn)  # (M, N), columns already in Hilbert order of time t
            cw = jnp.cumsum(
                jax.nn.softmax(lwm, axis=1), axis=1
            )
            # monotonise each row (f32 cumsum association can dip) so the
            # count-based inverse CDF matches the true bracket exactly
            cw = jax.lax.associative_scan(jnp.maximum, cw, axis=1)
            pos = jnp.sum(u_t[:, None] > cw, axis=1)
            idx_t = jnp.clip(pos, 0, self.N - 1).astype(jnp.int32)
            return idx_t, idx_t

        ts = jnp.arange(self.T - 1, dtype=jnp.int32)
        inputs = (
            ts[::-1],
            u[:, :-1].T[::-1],
            jax.tree_util.tree_map(lambda leaf: leaf[-2::-1], self.X),
            self.lw[-2::-1],
            jax.tree_util.tree_map(lambda leaf: leaf[:0:-1], self.X),
        )
        _, idx_rev = jax.lax.scan(body, idx_T, inputs)
        idx = jnp.concatenate([idx_rev[::-1], idx_T[None]], axis=0)
        return self._output_paths(idx)

    # ------------------------------------------------------------------
    # two-filter smoothing
    # ------------------------------------------------------------------

    def two_filter_smoothing(self, t, info, phi, loggamma, linear_cost=False,
                             return_ess=False, modif_forward=None,
                             modif_info=None, key=None):
        """Two-filter smoothing estimate of E[phi(X_t, X_{t+1}) | y_{0:T-1}]
        (reference smoothing.py:487-525)."""
        ti = self.T - 2 - t
        if isinstance(t, int) and not (0 <= t < self.T - 1):
            raise ValueError("two-filter smoothing: t must be in 0..T-2")
        Xinfo = jax.tree_util.tree_map(lambda l: l[ti], info.hist.X)
        lwinfo = info.hist.lw[ti] - loggamma(Xinfo)
        if linear_cost:
            key = key if key is not None else jax.random.key(0)
            return self._two_filter_ON(
                t, Xinfo, lwinfo, phi, return_ess, modif_forward, modif_info,
                key,
            )
        return self._two_filter_ON2(t, Xinfo, lwinfo, phi)

    def _two_filter_ON2(self, t, Xinfo, lwinfo, phi):
        """O(N²), blocked over the forward particles
        (reference smoothing.py:527-546)."""
        X_t = self._x_at(t)
        lw_t = self.lw[t]
        upb = jnp.max(lwinfo) + jnp.max(lw_t)

        def per_n(x_n, lw_n):
            om = jnp.exp(
                lwinfo + lw_n - upb + self.fk.logpt(t + 1, x_n, Xinfo)
            )
            return jnp.sum(om * phi(x_n, Xinfo)), jnp.sum(om)

        sp, sw = jax.vmap(per_n)(X_t, lw_t)
        return jnp.sum(sp) / jnp.sum(sw)

    def _two_filter_ON(self, t, Xinfo, lwinfo, phi, return_ess,
                       modif_forward, modif_info, key):
        """O(N) importance-sampling version (reference smoothing.py:548-575)."""
        k1, k2 = jax.random.split(key)
        if modif_info is not None:
            lwinfo = lwinfo + modif_info
        Winfo = rs.exp_and_normalise(lwinfo)
        I = rs.multinomial(k1, Winfo)
        lw_t = self.lw[t]
        if modif_forward is not None:
            W = rs.exp_and_normalise(lw_t + modif_forward)
        else:
            W = rs.exp_and_normalise(lw_t)
        J = rs.multinomial(k2, W)
        X_J = jax.tree_util.tree_map(lambda l: jnp.take(l[t], J, axis=0), self.X)
        Xinfo_I = jax.tree_util.tree_map(lambda l: jnp.take(l, I, axis=0), Xinfo)
        log_omega = self.fk.logpt(t + 1, X_J, Xinfo_I)
        if modif_forward is not None:
            log_omega = log_omega - jnp.take(modif_forward, J)
        if modif_info is not None:
            log_omega = log_omega - jnp.take(modif_info, I)
        Om = rs.exp_and_normalise(log_omega)
        vals = phi(X_J, Xinfo_I)
        est = jnp.sum(Om * vals, axis=0) if vals.ndim == 1 else jnp.tensordot(
            Om, vals, axes=(0, 0)
        )
        if return_ess:
            return est, 1.0 / jnp.sum(Om**2)
        return est


def smoothing_worker(method=None, N=100, fk=None, fk_info=None,
                     add_func=None, log_gamma=None, key=None):
    """Generic worker for off-line smoothing benchmarks
    (reference smoothing.py:578-677).

    ``method`` in ['FFBS_purereject', 'FFBS_hybrid', 'FFBS_MCMC',
    'FFBS_ON2', 'FFBS_QMC', 'two-filter_ON', 'two-filter_ON_prop',
    'two-filter_ON2'].  Returns ``{'est': (T-1,) array, 'cpu': seconds}``.
    """
    import time as _time

    import particles_tpu as particles

    key = key if key is not None else jax.random.key(0)
    k_pf, k_bs, k_info = jax.random.split(key, 3)
    T = fk.T
    if fk_info is None:
        fk_info = fk.__class__(ssm=fk.ssm, data=fk.data[::-1])
    qmc = method == "FFBS_QMC"
    pf = particles.SMC(fk=fk, N=N, qmc=qmc, store_history=True, key=k_pf)
    tic = _time.perf_counter()
    pf.run()
    if method.startswith("FFBS"):
        submethod = method.split("_")[-1]
        if submethod == "QMC":
            z = pf.hist.backward_sampling_qmc(k_bs, N)
        elif submethod == "ON2":
            z = pf.hist.backward_sampling_ON2(k_bs, N)
        elif submethod == "MCMC":
            z = pf.hist.backward_sampling_mcmc(k_bs, N)
        elif submethod == "hybrid":
            z = pf.hist.backward_sampling_reject(k_bs, N)
        elif submethod == "purereject":
            z = pf.hist.backward_sampling_reject(k_bs, N, max_trials=10**9)
        else:
            raise ValueError(f"unknown FFBS submethod {submethod}")
        est = jax.vmap(
            lambda t: jnp.mean(
                add_func(
                    t,
                    jax.tree_util.tree_map(lambda l: l[t], z),
                    jax.tree_util.tree_map(lambda l: l[t + 1], z),
                )
            )
        )(jnp.arange(T - 1))
    elif method in ["two-filter_ON2", "two-filter_ON", "two-filter_ON_prop"]:
        infopf = particles.SMC(fk=fk_info, N=N, store_history=True, key=k_info)
        infopf.run()

        # one compiled body for all t (lax.map), instead of one jit per t
        def est_at(t):
            psi = lambda x, xf: add_func(t, x, xf)
            if method == "two-filter_ON2":
                return pf.hist.two_filter_smoothing(t, infopf, psi, log_gamma)
            ti = T - 2 - t
            if method == "two-filter_ON_prop":
                import jax.scipy.stats as jss

                Xi1 = infopf.hist.X[ti + 1]
                modif_fwd = jss.norm.logpdf(
                    pf.hist.X[t], loc=jnp.mean(Xi1), scale=jnp.std(Xi1)
                )
                Xf1 = pf.hist.X[t + 1]
                modif_info = jss.norm.logpdf(
                    infopf.hist.X[ti], loc=jnp.mean(Xf1), scale=jnp.std(Xf1)
                )
            else:
                modif_fwd, modif_info = None, None
            return pf.hist.two_filter_smoothing(
                t, infopf, psi, log_gamma, linear_cost=True,
                modif_forward=modif_fwd, modif_info=modif_info,
                key=jax.random.fold_in(k_bs, t),
            )

        est = jax.lax.map(est_at, jnp.arange(T - 1))
    else:
        raise ValueError(f"smoothing_worker: no such method {method}")
    jax.block_until_ready(est)
    cpu_time = _time.perf_counter() - tic
    return {"est": est, "cpu": cpu_time}
