"""Feynman-Kac models and the SMC engine, TPU-native.

Counterpart of the reference ``core.py`` (nchopin/particles): the same two
central objects — the :class:`FeynmanKac` abstraction (core.py:108-197) and
the :class:`SMC` driver (core.py:200-409) — re-architected for XLA:

* **Time loop = ``lax.scan``.** For models with a static horizon ``T`` (all
  particle filters), ``SMC.run()`` compiles the whole filter into a single
  scan with fused per-step work; summaries and history are scan outputs, not
  Python-list mutation.
* **Step 0 is concrete.** The engine always calls ``M0``/``logG(0, None, x)``
  with a *Python* ``t=0`` outside the scan, so reference-style ``if t == 0``
  branches in user models keep working; inside the scan ``t`` is traced and
  always >= 1.
* **Adaptive resampling via ``lax.cond`` + offspring counts.** The
  resample-or-not decision (reference core.py:326-337) is a ``lax.cond``
  whose taken branch alone executes; inside it, sorted-ancestor schemes
  move particles by ``repeat``-by-counts, which is ~10x faster than a
  random-index gather on TPU (see ``particles_tpu.resampling``).
* **Dynamic-horizon algorithms** (adaptive tempering, nested sampling — any
  subclass overriding ``done``) run step-by-step: each step is the same
  jitted kernel, the Python loop only syncs the termination scalar.
* **Explicit PRNG**: the engine owns a key; model methods receive
  per-step subkeys (``M0(key, N)``, ``M(key, t, xp)``).

``multiSMC`` (reference core.py:431-518) replaces the joblib process pool
(utils.py:158-186) with a ``vmap`` over run keys — many independent filters
batched on one chip — crossed with the reference's cartesian option grid.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from particles_tpu import collectors
from particles_tpu import distctx
from particles_tpu import resampling as rs
from particles_tpu import utils
from particles_tpu.utils.struct import Pytree

__all__ = ["FeynmanKac", "SMC", "SQMC", "multiSMC", "SMCResult"]


err_msg_missing_trans = """
    Feynman-Kac class %s is missing method logpt, which provides the log-pdf
    of Markov transition X_t | X_{t-1}. This is required by most smoothing
    algorithms."""


class FeynmanKac(Pytree):
    """Abstract base class for Feynman-Kac models (reference core.py:108-197).

    Necessary methods:

    * ``M0(self, key, N)``: sample N initial particles
    * ``M(self, key, t, xp)``: sample X_t given ancestors xp (t >= 1; ``t``
      may be a traced scalar)
    * ``logG(self, t, xp, x)``: potential function log G_t; called once with
      concrete ``t=0`` and ``xp=None``, then with traced ``t >= 1``

    Optional: ``Gamma0(u)`` / ``Gamma(t, xp, u)`` (deterministic pushforwards
    of uniforms, for SQMC), ``logpt(t, xp, x)`` (transition density, for
    smoothing), ``logeta(t, x)`` (auxiliary function — defining it makes the
    model an APF, reference core.py:172-175), ``done``, ``time_to_resample``,
    ``default_moments``, ``summary_format``.
    """

    # horizon; subclasses with data override (static under jit)
    T = 0
    du = 0

    def M0(self, key, N):
        raise NotImplementedError(self._error_msg("M0"))

    def M(self, key, t, xp):
        raise NotImplementedError(self._error_msg("M"))

    def logG(self, t, xp, x):
        raise NotImplementedError(self._error_msg("logG"))

    def Gamma0(self, u):
        raise NotImplementedError(self._error_msg("Gamma0"))

    def Gamma(self, t, xp, u):
        raise NotImplementedError(self._error_msg("Gamma"))

    def logpt(self, t, xp, x):
        raise NotImplementedError(err_msg_missing_trans % self.__class__.__name__)

    def _error_msg(self, method):
        return f"method/property {method} missing in class {self.__class__.__name__}"

    @property
    def isAPF(self):
        """True if the model defines an auxiliary function ``logeta``
        (reference core.py:172-175).  Deliberately *not* a base-class
        attribute: a ``logeta = None`` default would shadow mixin-provided
        methods in the MRO of ``AuxiliaryBootstrap(Bootstrap, APFMixin)``.
        """
        return callable(getattr(self, "logeta", None))

    def done(self, smc):
        """Time to stop? Called host-side (reference core.py:177-179).

        Subclasses overriding this are treated as dynamic-horizon models and
        executed step-by-step instead of via one big scan.
        """
        return smc.t >= self.T

    def time_to_resample(self, smc):
        """Resample or not; may return a traced bool (core.py:181-183)."""
        return smc.aux.ESS < smc.N * smc.ESSrmin

    def default_moments(self, W, X):
        """Default moments collected by the Moments collector (core.py:185-187)."""
        if isinstance(X, dict):
            return rs.wmean_and_var_str_array(W, X)
        return rs.wmean_and_var(W, X)

    def summary_format(self, smc):
        return f"t={smc.t}: resample={smc.rs_flag}, ESS (end of iter)={smc.wgts.ESS}"


class StepView(NamedTuple):
    """What collectors and ``time_to_resample`` see at each step.

    Field names mirror the reference ``SMC`` attributes that collectors read
    (reference collectors.py passim).
    """

    fk: Any
    t: Any
    X: Any
    Xp: Any
    A: Any
    wgts: Any
    aux: Any
    rs_flag: Any
    logLt: Any
    loglt: Any
    N: int
    ESSrmin: float
    key: Any = None  # per-step subkey for stochastic collectors

    @property
    def W(self):
        return self.wgts.W


class _Carry(NamedTuple):
    """Scan carry of the SMC loop: the minimal evolving state.

    ``col_states`` threads stateful-collector state (on-line smoothers,
    variance estimators) through the scan.
    """

    key: Any
    X: Any
    lw: Any
    logLt: Any
    log_mean_w: Any
    col_states: Any = ()


def _gather(X, A):
    """Select ancestors: works for array or (nested) pytree particles."""
    return jax.tree_util.tree_map(lambda leaf: jnp.take(leaf, A, axis=0), X)


def _qmc_reorder(X, extras):
    """Re-order particles ``X`` (an (N,) or (N, d) array) and extra (N,)
    arrays into the Hilbert order of X, as ONE multi-operand ``lax.sort``.

    Random gathers run at ~60M elem/s on TPU while a multi-operand sort of
    2^20 elements takes a few ms total, so co-sorting the payloads beats
    argsort + per-array ``take`` by a wide margin.  Returns
    ``(X_sorted, extras_sorted)``.
    """
    from particles_tpu import hilbert

    if X.ndim == 1 or X.shape[1] == 1:
        # 1-d Hilbert order = plain sort on X itself, so the sorted KEY
        # is the sorted state — don't carry X as a payload too (one
        # fewer (N,) operand in the sort, ~0.4 ms at N=2^20)
        xkey = X if X.ndim == 1 else X[:, 0]
        out = jax.lax.sort((xkey,) + tuple(extras), num_keys=1,
                           is_stable=True)
        Xs = out[0] if X.ndim == 1 else out[0][:, None]
        return Xs, out[1:]
    d = X.shape[1]
    cols = tuple(X[:, j] for j in range(d)) + tuple(extras)
    out = hilbert.hilbert_sort_with(X, cols)
    return jnp.stack(out[:d], axis=1), out[d:]


def _step0(fk, key, N, qmc, summaries, ESSrmin, constrain=None):
    """Initial step, with concrete t=0 (outside any scan).

    Under a :mod:`particles_tpu.distctx` context (shard_map execution),
    ``N`` is the per-shard slice size: model keys are folded with the
    shard index (the carry key stays replicated), ancestor indices are
    global, and the view's ``N`` is the global particle count.
    """
    dctx = distctx.current()
    k0, k_col, knext = jax.random.split(key, 3)
    if dctx is not None:
        shard = jax.lax.axis_index(dctx.axis)
        k_col = jax.random.fold_in(k_col, shard)
        if not qmc:
            # the Sobol draw must come from the REPLICATED key (one global
            # point set, sliced per shard); Monte-Carlo draws fold the
            # shard in for independence
            k0 = jax.random.fold_in(k0, shard)
    if qmc:
        from particles_tpu import rqmc

        if dctx is None:
            u = rqmc.sobol(k0, N, max(fk.du, 1))
        else:
            u = rqmc.sobol(k0, N * dctx.D, max(fk.du, 1),
                           start=shard * N, count=N)
        X = fk.Gamma0(u if fk.du > 1 else u[:, 0])
    else:
        X = fk.M0(k0, N)
    lw = fk.logG(0, None, X)
    if constrain is not None:
        X, lw = constrain(X, lw)
    if qmc:
        # SQMC invariant: the carry holds particles in Hilbert order
        # (globally, under sharding), so every later step's inverse-CDF
        # resampling is an offspring-counts repeat with NO random gathers
        # (see _step_qmc)
        if dctx is None:
            X, (lw,) = _qmc_reorder(X, (lw,))
        else:
            from particles_tpu.parallel import dqmc

            X, (lw,) = dqmc.dist_qmc_reorder(X, (lw,), dctx.axis, dctx.D)
    wgts = rs.Weights(lw)
    loglt = wgts.log_mean
    logLt = loglt
    A = jnp.arange(N, dtype=jnp.int32)
    if dctx is not None:
        A = shard * N + A  # global ancestor indices
    view = StepView(
        fk=fk,
        t=jnp.int32(0),
        X=X,
        Xp=X,
        A=A,
        wgts=wgts,
        aux=wgts,
        rs_flag=jnp.asarray(False),
        logLt=logLt,
        loglt=loglt,
        N=N if dctx is None else N * dctx.D,
        ESSrmin=ESSrmin,
        key=k_col,
    )
    if summaries is not None:
        states, outs = summaries.init_step(view)
    else:
        states, outs = (), ()
    carry = _Carry(key=knext, X=X, lw=lw, logLt=logLt,
                   log_mean_w=wgts.log_mean, col_states=states)
    # fourth element kept for call-site compatibility (was the Hilbert
    # order; SQMC now keeps the carry itself Hilbert-ordered)
    return carry, view, outs, None


def _repeat(X, counts, M, use_pallas=True):
    """Resampling move for sorted-ancestor schemes: X[A] = repeat-by-counts.

    1-D and single-column (N, 1) leaves route through the Pallas
    visit-list kernel on TPU (see particles_tpu.ops/repeat_kernel.py);
    wider leaves use `jnp.repeat` (its 2-D row form is measured cheaper).  ``use_pallas=False`` forces the XLA path (needed
    under multichip sharding: GSPMD cannot partition a pallas_call).
    Prefer :func:`_repeat_z` inside the engine — it shares the plan across
    leaves and skips the counts cumsum.
    """
    from particles_tpu.ops import repeat_by_counts

    return jax.tree_util.tree_map(
        lambda leaf: repeat_by_counts(leaf, counts, M)
        if (use_pallas and leaf.ndim <= 2)
        else jnp.repeat(leaf, counts, axis=0, total_repeat_length=M),
        X,
    )


def _repeat_z(X, z, M, use_pallas=True, want_anc=False, extras=()):
    """z-form resampling move with ONE fused kernel call for every
    routable leaf.

    ``z`` is the inclusive cumsum of offspring counts (a scheme's
    ``resampling_z`` output).  All kernel-routable columns — 1-D state
    leaves, columns of (N, d<=2) leaves, and the 1-D ``extras`` (the APF
    aux weights) — are served in one fused pallas_call sharing the
    z-side select work (~43% marginal cost per extra column, see
    ops.repeat_with_plan_cols); when ``want_anc`` the ancestor vector
    rides the same call as a near-free extra output.  Non-routable
    leaves (d >= 3, exotic dtypes) go through ``jnp.repeat``.

    Returns ``(X_served, rep, A, extras_served)`` with ``A`` None unless
    ``want_anc``.
    """
    from particles_tpu import ops
    from particles_tpu.ops import repeat_kernel as rk

    plan = ops.make_repeat_plan(z, M) if use_pallas else None
    if plan is None:
        rep = ops.serve_by_z(z, M, use_pallas=False)
        A = (rep(jnp.arange(z.shape[0], dtype=jnp.int32)) if want_anc
             else None)
        return (jax.tree_util.tree_map(rep, X), rep, A,
                tuple(rep(e) for e in extras))
    rep = lambda leaf: ops.repeat_with_plan(plan, leaf)
    X_served, A, extras_served = _serve_with_plan(plan, X, extras, want_anc)
    return X_served, rep, A, extras_served


def _serve_with_plan(plan, X, extras, want_anc):
    """Shared leaf packing for the fused kernel serve: flatten the state
    pytree, route every kernel-routable column through ONE fused
    ``repeat_with_plan_cols`` call (ancestors riding when ``want_anc``),
    fall back per-leaf otherwise."""
    from particles_tpu import ops
    from particles_tpu.ops import repeat_kernel as rk

    N = plan.M
    leaves, treedef = jax.tree_util.tree_flatten(X)
    all_leaves = list(leaves) + list(extras)
    cols, col_ix = [], []
    for leaf in all_leaves:
        if rk._leaf_routable(leaf, N):
            if leaf.ndim == 1:
                col_ix.append([len(cols)])
                cols.append(leaf)
            else:
                col_ix.append(list(range(len(cols),
                                         len(cols) + leaf.shape[1])))
                cols.extend(leaf[:, j] for j in range(leaf.shape[1]))
        else:
            col_ix.append(None)
    served_cols, A = ops.repeat_with_plan_cols(plan, cols,
                                               want_anc=want_anc)
    served_all = []
    for leaf, ix in zip(all_leaves, col_ix):
        if ix is None:
            served_all.append(ops.repeat_with_plan(plan, leaf))
        elif leaf.ndim == 1:
            served_all.append(served_cols[ix[0]])
        else:
            served_all.append(
                jnp.stack([served_cols[j] for j in ix], axis=1))
    n_state = len(leaves)
    X_served = jax.tree_util.tree_unflatten(treedef, served_all[:n_state])
    return X_served, A, tuple(served_all[n_state:])


def _repeat_su(X, su, cs, want_anc=False, extras=()):
    """Fused inverse-CDF serve DIRECTLY from (sorted uniforms, monotone
    cumulative weights): ``Y[j] = X[i]`` with ``cs_{i-1} < su_j <= cs_i``
    — one kernel, no merge-rank count, no materialised z (see
    ops.make_repeat_plan_su; measured 3.25 vs 5.58 ms/iter for the
    merge-rank + z-plan pipeline at N=2^20 on v5e).

    Returns ``(X_served, A, extras_served)`` or None when the kernel
    route is unavailable (non-TPU, unrouteable leaf) — callers fall back
    to the merge-rank z path.  ``cs[-1]`` must dominate every ``su``
    (pin it to 1.0; uniform/Sobol draws are < 1).
    """
    from particles_tpu import ops
    from particles_tpu.ops import repeat_kernel as rk

    N = su.shape[0]
    leaves = jax.tree_util.tree_leaves(X)
    if not all(rk._leaf_routable(leaf, N)
               for leaf in list(leaves) + list(extras)):
        return None
    plan = ops.make_repeat_plan_su(su, cs, N)
    if plan is None:
        return None
    return _serve_with_plan(plan, X, extras, want_anc)


def _step(fk, carry, t, N, resampling_scheme, ESSrmin, summaries,
          constrain=None, need_gen=True):
    """One SMC step for (possibly traced) t >= 1 (reference core.py:369-383).

    The resample-or-not decision (reference core.py:326-337) is a
    ``lax.cond``: non-resampling steps skip the resampling work entirely.
    Sorted-ancestor schemes (systematic/stratified/multinomial/ssp/residual)
    go through the offspring-counts fast path; others (killing) fall back to
    an ancestor gather.  Requires the particle count to be constant across
    steps (true for all filters; waste-free samplers use the
    always-resample path).

    Under a :mod:`particles_tpu.distctx` context (shard_map execution) the
    SAME code runs per shard on ``N``-sized local slices: the Weights
    reductions become collectives, the resample branch becomes the ring
    redistribution (APF logeta rides as a payload), ancestor indices are
    global, and model keys are folded with the shard index.
    """
    dctx = distctx.current()
    key, k_rs, k_m, k_col = jax.random.split(carry.key, 4)
    if dctx is not None:
        if resampling_scheme not in ("systematic", "stratified",
                                     "multinomial"):
            raise NotImplementedError(
                f"resampling scheme {resampling_scheme!r} is not supported "
                "under particle sharding (rings exist for systematic/"
                "stratified z-forms and the multinomial sorted-uniform "
                "merge; ssp/residual/killing have no distributed form)")
        shard = jax.lax.axis_index(dctx.axis)
        k_m = jax.random.fold_in(k_m, shard)
        k_col = jax.random.fold_in(k_col, shard)
    Ng = N if dctx is None else N * dctx.D
    X, lw = carry.X, carry.lw
    wgts = rs.Weights(lw)

    # auxiliary weights (APF only; reference core.py:307-313)
    if fk.isAPF:
        logetat = fk.logeta(t - 1, X)
        aux = wgts.add(logetat)
    else:
        logetat = None
        aux = wgts

    pre_view = StepView(
        fk=fk, t=t, X=X, Xp=X, A=None, wgts=wgts, aux=aux,
        rs_flag=None, logLt=carry.logLt, loglt=None, N=Ng, ESSrmin=ESSrmin,
    )
    rs_flag = fk.time_to_resample(pre_view)

    use_counts = resampling_scheme in rs.rs_counts_funcs

    def do_resample_dist(X, lw):
        """Resample branch under particle sharding: ring redistribution.

        The shared systematic uniform comes from the replicated k_rs; the
        APF reset weights follow reference core.py:307-313 with
        log_mean_exp's reductions global via the dist context and
        logeta recomputed on the served particles.
        """
        from particles_tpu.parallel import distributed as dist

        payload = {"x": X}
        if resampling_scheme == "systematic":
            u = jax.random.uniform(k_rs, ())
            ring = lambda *a, **kw: dist.ring_systematic_resample(  # noqa: E731
                payload, aux.lw, u, Ng, dctx.axis, dctx.D, **kw)
        elif resampling_scheme == "stratified":
            ring = lambda *a, **kw: dist.ring_stratified_resample(  # noqa: E731
                payload, aux.lw, k_rs, Ng, dctx.axis, dctx.D, **kw)
        else:  # multinomial (checked at trace time above)
            ring = lambda *a, **kw: dist.ring_multinomial_resample(  # noqa: E731
                payload, aux.lw, k_rs, Ng, dctx.axis, dctx.D, **kw)
        if need_gen:
            served, A = ring(return_ancestors=True)
        else:
            served = ring()
            A = shard * N + jnp.arange(N, dtype=jnp.int32)
        Xp = served["x"]
        if fk.isAPF:
            # recompute the aux weights from the served particles (logeta
            # is pure in the particle value — float-exact) instead of
            # ringing the eta column
            reset_lw = (rs.log_mean_exp(logetat, lw=wgts.lw)
                        - fk.logeta(t - 1, Xp))
        else:
            reset_lw = jnp.zeros(N, dtype=lw.dtype)
        return Xp, reset_lw, A

    def do_resample(X, lw):
        if use_counts:
            # z-form fast path: z is analytic in cumsum(W) for systematic;
            # one plan shared by state leaves, ancestors and APF weights.
            # use_pallas=False under sharding (GSPMD cannot partition a
            # pallas_call).
            z = rs.resampling_z(resampling_scheme, k_rs, aux.W, M=N)
            # ancestors only when the genealogy is consumed (need_gen):
            # XLA does NOT dead-code-eliminate pallas custom-calls, so an
            # unconditional serve would cost real work per step; when
            # consumed they ride the state's fused kernel call
            Xp, rep, A, _ = _repeat_z(
                X, z, N, use_pallas=constrain is None, want_anc=need_gen)
            if A is None:
                A = jnp.arange(N, dtype=jnp.int32)
        else:
            A = rs.resampling(resampling_scheme, k_rs, aux.W, M=N)
            Xp = _gather(X, A)
        if fk.isAPF:
            # recompute the served aux weights from the served particles
            # (logeta is pure in the particle value, so this is
            # float-exact vs serving/gathering the precomputed column) —
            # one elementwise model eval (~0.1 ms at N=2^20 for
            # StochVol) instead of a ~1.7 ms fused kernel column
            reset_lw = (rs.log_mean_exp(logetat, lw=wgts.lw)
                        - fk.logeta(t - 1, Xp))
        else:
            reset_lw = jnp.zeros(N, dtype=lw.dtype)
        return Xp, reset_lw, A

    def no_resample(X, lw):
        A = jnp.arange(N, dtype=jnp.int32)
        if dctx is not None:
            A = shard * N + A
        return X, lw, A

    Xp, lw, A = jax.lax.cond(
        rs_flag, do_resample_dist if dctx is not None else do_resample,
        no_resample, X, lw)

    X_new = fk.M(k_m, t, Xp)
    lw_new = lw + fk.logG(t, Xp, X_new)
    if constrain is not None:
        X_new, lw_new = constrain(X_new, lw_new)
    new_wgts = rs.Weights(lw_new)

    # logLt accounting (reference core.py:351-359)
    loglt = jnp.where(
        rs_flag, new_wgts.log_mean, new_wgts.log_mean - carry.log_mean_w
    )
    logLt = carry.logLt + loglt

    view = StepView(
        fk=fk, t=t, X=X_new, Xp=Xp, A=A, wgts=new_wgts, aux=aux,
        rs_flag=rs_flag, logLt=logLt, loglt=loglt, N=Ng, ESSrmin=ESSrmin,
        key=k_col,
    )
    if summaries is not None:
        states, outs = summaries.step(view, carry.col_states)
    else:
        states, outs = (), ()
    carry = _Carry(
        key=key, X=X_new, lw=lw_new, logLt=logLt,
        log_mean_w=new_wgts.log_mean, col_states=states,
    )
    return carry, view, outs


def _step_qmc(fk, carry, t, N, ESSrmin, summaries, constrain=None,
              need_gen=True):
    """One SQMC step (reference core.py:339-349): always resample, using one
    scrambled-Sobol point set per step — the first coordinate drives an
    inverse-CDF resampling of the Hilbert-ordered particles, the remaining
    ``du`` coordinates are pushed through the deterministic kernel ``Gamma``.

    Gather-free design: the carry holds the particles ALREADY in Hilbert
    order, so

    * the inverse-CDF resampling is an offspring-counts repeat (the sorted
      Sobol coordinate meets the sorted cumulative weights — Pallas kernel),
    * sorting the Sobol first coordinate co-sorts the remaining ``du``
      coordinates as payloads of one ``lax.sort``,
    * the end-of-step Hilbert re-ordering co-sorts the new particles,
      weights, ancestor indices and resampled ancestors in one more
      multi-operand sort (ancestors index the previous Hilbert-ordered
      generation, so the genealogy exposed to collectors/history stays
      exact).

    The pre-sort particle system is identical to a gather-based
    implementation; only the (arbitrary) storage order differs.

    Under a :mod:`particles_tpu.distctx` context (shard_map execution)
    the SAME recursion runs per shard: each shard generates its slice of
    the ONE globally-sorted Sobol set in closed form (``sobol_sorted0``
    with a shard offset — requires global N a power of two), the
    inverse-CDF serve rides the ``ppermute`` ring
    (:func:`particles_tpu.parallel.dqmc.ring_merge_resample`) and the
    Hilbert re-ordering is a distributed odd-even block merge
    (:func:`particles_tpu.parallel.dqmc.dist_qmc_reorder`).
    """
    from particles_tpu import rqmc

    dctx = distctx.current()
    key, k_u, k_col = jax.random.split(carry.key, 3)
    if dctx is not None:
        shard = jax.lax.axis_index(dctx.axis)
        k_col = jax.random.fold_in(k_col, shard)
    X, lw = carry.X, carry.lw  # Hilbert-ordered (globally, under sharding)
    wgts = rs.Weights(lw)
    if fk.isAPF:
        logetat = fk.logeta(t - 1, X)
        aux = wgts.add(logetat)
    else:
        logetat = None
        aux = wgts

    use_pallas = constrain is None
    du = max(fk.du, 1)
    if dctx is not None:
        from particles_tpu.parallel import dqmc

        Ng = N * dctx.D
        if Ng & (Ng - 1):
            raise NotImplementedError(
                "SQMC under particle sharding requires the GLOBAL particle "
                f"count to be a power of two (got N={Ng}): the sharded "
                "sorted-Sobol generation is closed-form only at 2^m")
        # this shard's block of the globally first-coordinate-sorted set
        us = rqmc.sobol_sorted0(k_u, Ng, du + 1, start=shard * N, count=N)
        sorted_u = tuple(us[:, j] for j in range(du + 1))
        su = sorted_u[0]
        payload = {"x": X}
        if need_gen:
            served, A_h = dqmc.ring_merge_resample(
                payload, su, aux.W, dctx.axis, dctx.D,
                return_ancestors=True)
        else:
            served = dqmc.ring_merge_resample(
                payload, su, aux.W, dctx.axis, dctx.D)
            A_h = None
        Xp = served["x"]
        if fk.isAPF:
            # recompute the aux weights from the served particles instead
            # of ringing the eta column (logeta is pure in the particle
            # value — float-exact, and one elementwise eval is cheaper
            # than a ring payload)
            lw_reset = (rs.log_mean_exp(logetat, lw=wgts.lw)
                        - fk.logeta(t - 1, Xp))
        else:
            lw_reset = jnp.zeros(N, dtype=lw.dtype)
    else:
        if N & (N - 1) == 0:
            # power-of-two N: generate the points DIRECTLY in first-
            # coordinate order (closed-form cell-permutation inverse,
            # rqmc.sobol_sorted0) — bit-identical to sorting, without the
            # ~2.4 ms multi-operand lax.sort at N=2^20
            us = rqmc.sobol_sorted0(k_u, N, du + 1)
            sorted_u = tuple(us[:, j] for j in range(du + 1))
        else:
            u = rqmc.sobol(k_u, N, du + 1)
            sorted_u = jax.lax.sort(
                tuple(u[:, j] for j in range(du + 1)), num_keys=1
            )
        su = sorted_u[0]
        # fixed-point kernel when routable: cs monotone by construction,
        # so the merge-rank z needs no cummax wave (and the XLA cumsum +
        # normalising divide collapse into one streaming pass)
        cs, cs_mono = rs._normalised_cumsum_mono(aux.W)
        # fused su-mode serve when routable: the repeat kernel consumes
        # (su, cs) directly — no merge-rank count kernel, no z (measured
        # 3.25 vs 5.58 ms at N=2^20).  Requires monotone cs with the top
        # pinned above every su (the z-form's z[-1]=N convention).
        served = None
        if cs_mono and use_pallas:
            served = _repeat_su(X, su, cs.at[-1].set(jnp.float32(1.0)),
                                want_anc=need_gen)
        if served is not None:
            # ancestor indices are only materialised when something
            # consumes the genealogy (history, genealogy-reading
            # collectors); need_gen is static
            Xp, A_h, _ = served
        else:
            z = rs._merge_rank_counts(su, cs, N)
            z = z.at[-1].set(N)
            if not cs_mono:
                z = rs._monotone_z(z)
            Xp, rep, A_h, _ = _repeat_z(
                X, z, N, use_pallas=use_pallas, want_anc=need_gen)
        if fk.isAPF:
            # recompute the served aux weights from the served particles
            # (logeta is a pure function of the particle value, so this
            # is float-exact vs serving the precomputed column) — one
            # elementwise model eval (~0.1 ms at N=2^20 for StochVol)
            # instead of a ~1.7 ms fused kernel column
            lw_reset = (rs.log_mean_exp(logetat, lw=wgts.lw)
                        - fk.logeta(t - 1, Xp))
        else:
            lw_reset = jnp.zeros(N, dtype=lw.dtype)

    v = sorted_u[1] if fk.du <= 1 else jnp.stack(sorted_u[1:], axis=1)
    X_new = fk.Gamma(t, Xp, v)
    lw_new = lw_reset + fk.logG(t, Xp, X_new)
    if constrain is not None:
        X_new, lw_new = constrain(X_new, lw_new)

    # restore the invariant: one multi-operand sort carries everything a
    # consumer pairs elementwise with the new particles
    if dctx is not None:
        from particles_tpu.parallel import dqmc

        reorder = lambda Xn, extras: dqmc.dist_qmc_reorder(  # noqa: E731
            Xn, extras, dctx.axis, dctx.D)
    else:
        reorder = _qmc_reorder
    if need_gen:
        xp_cols = (Xp,) if X_new.ndim == 1 else tuple(
            Xp[:, j] for j in range(Xp.shape[1])
        )
        X_h, rest = reorder(X_new, (lw_new, A_h) + xp_cols)
        lw_h, A_s = rest[0], rest[1]
        Xp_h = rest[2] if X_new.ndim == 1 else jnp.stack(rest[2:], axis=1)
    else:
        X_h, (lw_h,) = reorder(X_new, (lw_new,))
        A_s, Xp_h = None, None
    h_wgts = rs.Weights(lw_h)
    loglt = h_wgts.log_mean  # always resampled
    logLt = carry.logLt + loglt
    rs_flag = jnp.asarray(True)

    view = StepView(
        fk=fk, t=t, X=X_h, Xp=Xp_h, A=A_s, wgts=h_wgts, aux=aux,
        rs_flag=rs_flag, logLt=logLt, loglt=loglt,
        N=N if dctx is None else N * dctx.D, ESSrmin=ESSrmin,
        key=k_col,
    )
    if summaries is not None:
        states, outs = summaries.step(view, carry.col_states)
    else:
        states, outs = (), ()
    carry = _Carry(
        key=key, X=X_h, lw=lw_h, logLt=logLt,
        log_mean_w=h_wgts.log_mean, col_states=states,
    )
    return carry, view, outs


def _history_out(view, store_history):
    if not store_history:
        return ()
    return (view.X, view.A, view.wgts.lw)


def _run_full(fk, key, N, T, qmc, resampling_scheme, ESSrmin, summaries,
              store_history, constrain=None):
    """The whole filter as step0 + one lax.scan (jit this).

    Under ``qmc=True`` this is the SQMC algorithm; the carry holds the
    particles in Hilbert order (see _step_qmc), so stored history frames
    are Hilbert-ordered too (what QMC-FFBS smoothing needs).

    ``store_history``: ``False``, ``True`` (stack every frame as a scan
    output), or ``("slots", slot_of_t, nslots)`` for windowed storage
    (rolling / partial history, reference smoothing.py:164-219): a ring of
    ``nslots`` frames rides in the scan carry and step t overwrites slot
    ``slot_of_t[t]`` (an O(k N) dynamic-index update, not a (T, N) stack),
    so a rolling window costs O(k N) memory inside the compiled run.
    """
    windowed = isinstance(store_history, tuple)
    full = store_history is True
    if windowed:
        _, slot_seq, nslots = store_history
        slots = jnp.asarray(slot_seq, jnp.int32)

    def frame_of(view, h):
        return _history_out(view, full or windowed)

    def ring_write(ring, frame, slot):
        return jax.tree_util.tree_map(
            lambda buf, leaf: jax.lax.dynamic_update_index_in_dim(
                buf, leaf, slot, 0
            ),
            ring,
            frame,
        )

    carry, view0, outs0, h0 = _step0(fk, key, N, qmc, summaries, ESSrmin,
                                     constrain)
    frame0 = frame_of(view0, h0)
    hist0 = frame0 if full else ()
    ring = None
    if windowed:
        ring = jax.tree_util.tree_map(
            lambda leaf: jnp.zeros((nslots,) + leaf.shape, leaf.dtype),
            frame0,
        )
        ring = ring_write(ring, frame0, int(slot_seq[0]))

    need_gen = (full or windowed
                or (summaries is not None and summaries.needs_genealogy))

    def body(c, t):
        carry, ring = c
        if qmc:
            carry, view, outs = _step_qmc(
                fk, carry, t, N, ESSrmin, summaries, constrain,
                need_gen=need_gen,
            )
        else:
            carry, view, outs = _step(
                fk, carry, t, N, resampling_scheme, ESSrmin, summaries,
                constrain, need_gen=need_gen,
            )
        frame = frame_of(view, None)
        if windowed:
            ring = ring_write(ring, frame, slots[t])
        return (carry, ring), (outs, frame if full else ())

    ts = jnp.arange(1, T, dtype=jnp.int32)
    (carry, ring), (outs_rest, hist_rest) = jax.lax.scan(
        body, (carry, ring), ts
    )

    # prepend step-0 outputs to the stacked scan outputs
    all_outs = jax.tree_util.tree_map(
        lambda o0, orest: jnp.concatenate([o0[None], orest], axis=0),
        outs0,
        outs_rest,
    )
    if windowed:
        all_hist = ring
    else:
        all_hist = jax.tree_util.tree_map(
            lambda h0_, hrest: jnp.concatenate([h0_[None], hrest], axis=0),
            hist0,
            hist_rest,
        )
    return carry, all_outs, all_hist


class SMC:
    """Particle filter / SMC algorithm driver (reference core.py:200-409).

    Same public surface as the reference::

        pf = SMC(fk=ssms.Bootstrap(ssm=model, data=y), N=1000)
        pf.run()
        pf.logLt, pf.summaries.ESSs, pf.X, pf.W

    plus the iterator protocol (``next(pf)`` advances one step).  Extra
    keyword ``key`` (or ``seed``) makes randomness explicit.

    Execution strategy: if the model's ``done`` is the default horizon test,
    ``run()`` compiles the whole loop into one ``lax.scan``; otherwise it
    iterates a jitted single step under host control.
    """

    def __init__(
        self,
        fk=None,
        N=100,
        key=None,
        seed=0,
        qmc=False,
        resampling="systematic",
        ESSrmin=0.5,
        store_history=False,
        verbose=False,
        collect=None,
    ):
        self.fk = fk
        self.N = N
        self.qmc = qmc
        self.resampling = resampling
        self.ESSrmin = ESSrmin
        self.verbose = verbose
        self.key = key if key is not None else jax.random.key(seed)

        self.t = 0
        self.rs_flag = False
        self.logLt = 0.0
        self.wgts = rs.Weights()
        self.aux = None
        self.X, self.Xp, self.A = None, None, None
        self.loglt = None

        if collect == "off":
            self.summaries = None
        else:
            self.summaries = collectors.Summaries(collect)
        # store_history: True (full), int k (rolling window), or callable
        # t -> bool (partial); reference smoothing.py:151-161
        self.hist_option = store_history
        self.store_history = store_history is True
        self.hist = None
        self._hist_obj = None
        if not isinstance(store_history, bool):
            if getattr(fk, "is_sampler", False):
                # samplers fill a SamplerHistory honoring the option
                # (rolling k / save-time callable) in sampler_next
                pass
            else:
                from particles_tpu import smoothing

                self._hist_obj = smoothing.generate_hist_obj(
                    store_history, self)
                self.hist = self._hist_obj
        self._carry = None

    def __str__(self):
        return self.fk.summary_format(self)

    @property
    def W(self):
        return self.wgts.W

    # ------------------------------------------------------------------
    # step-by-step execution (iterator protocol)
    # ------------------------------------------------------------------

    def _install_view(self, view, carry):
        self._carry = carry
        self.X = view.X
        self.Xp = view.Xp
        self.A = view.A
        self.wgts = view.wgts
        self.aux = view.aux
        self.rs_flag = view.rs_flag
        self.logLt = view.logLt
        self.loglt = view.loglt
        if self.store_history:
            self._hist_frames.append(_history_out(view, True))
        if self._hist_obj is not None:
            self._hist_obj.save(self)

    def __next__(self):
        if self.fk.done(self):
            if self.summaries is not None:
                self.summaries.finalize_lists()
            self._finalize_history()
            raise StopIteration
        if getattr(self.fk, "is_sampler", False):
            from particles_tpu import smc_samplers

            smc_samplers.sampler_next(self)
            return
        # host-side (NumPy) collectors cannot trace: exclude summaries from
        # the jitted step and run them on the concrete view afterwards
        host_cols = (self.summaries is not None
                     and self.summaries.has_host_side)
        in_step = None if host_cols else self.summaries
        if self.t == 0:
            self._hist_frames = []
            carry, view, outs, _ = _step0(
                self.fk, self.key, self.N, self.qmc, in_step, self.ESSrmin
            )
        elif self.qmc:
            if not hasattr(self, "_jit_step_qmc"):
                self._jit_step_qmc = jax.jit(
                    lambda fk, carry, t: _step_qmc(
                        fk, carry, t, self.N, self.ESSrmin, in_step,
                    ),
                )
            carry, view, outs = self._jit_step_qmc(
                self.fk, self._carry, jnp.int32(self.t)
            )
        else:
            if not hasattr(self, "_jit_step"):
                self._jit_step = jax.jit(
                    lambda fk, carry, t: _step(
                        fk, carry, t, self.N, self.resampling, self.ESSrmin,
                        in_step,
                    ),
                )
            carry, view, outs = self._jit_step(
                self.fk, self._carry, jnp.int32(self.t)
            )
        self._install_view(view, carry)
        if host_cols:
            if self.t == 0:
                self._col_states, outs = self.summaries.init_step(view)
            else:
                self._col_states, outs = self.summaries.step(
                    view, self._col_states)
        if self.summaries is not None:
            self.summaries.append_step(outs)
        if self.verbose:
            print(self)
        self.t += 1

    def next(self):
        return self.__next__()

    def __iter__(self):
        return self

    # ------------------------------------------------------------------
    # checkpoint / resume
    # ------------------------------------------------------------------

    def save_state(self, path):
        """Checkpoint a (partially) run algorithm to ``path`` (pickle).

        The reference's substitute for checkpointing is the in-process
        iterator protocol (SURVEY.md §5); with a pytree carry, serialising
        the state is trivial.  Valid in step-by-step mode (after at least
        one ``next``); reload with :meth:`load_state` on an ``SMC`` object
        constructed with the same model/configuration.
        """
        import pickle

        import numpy as np

        if self._carry is None:
            if self.t > 0:
                raise ValueError(
                    "save_state: this algorithm ran to completion through "
                    "the compiled path (run()); checkpointing applies to "
                    "step-by-step execution (use `next(pf)` / iterate, then "
                    "save mid-run)"
                )
            raise ValueError("save_state: nothing to save (run a step first)")
        def to_np(leaf):
            # typed PRNG keys cannot round-trip through numpy directly
            if hasattr(leaf, "dtype") and jnp.issubdtype(
                leaf.dtype, jax.dtypes.prng_key
            ):
                return ("key", np.asarray(jax.random.key_data(leaf)))
            return ("arr", np.asarray(leaf))

        def dump_tree(obj):
            leaves, treedef = jax.tree_util.tree_flatten(obj)
            return [to_np(l) for l in leaves], treedef

        state = {
            "t": self.t,
            "carry": dump_tree(self._carry),
            "key": np.asarray(jax.random.key_data(self.key)),
            "summaries": None,
        }
        if getattr(self, "_hist_frames", None):
            state["hist_frames"] = dump_tree(self._hist_frames)
        if self._hist_obj is not None:
            # rolling/partial history (round 4, closing the last
            # checkpoint hole): deques/dicts are not pytree nodes, so
            # materialise as lists (+ the partial save times)
            from particles_tpu import smoothing

            h = self._hist_obj
            if isinstance(h, smoothing.RollingParticleHistory):
                state["windowed_hist"] = (
                    "rolling",
                    dump_tree((list(h.X), list(h.A), list(h.wgts))),
                    None,
                )
            else:  # PartialParticleHistory
                times = sorted(h.X)
                state["windowed_hist"] = (
                    "partial",
                    dump_tree(([h.X[t] for t in times],
                               [h.wgts[t] for t in times])),
                    times,
                )
        if (self.hist is not None and self.hist is not self._hist_obj
                and hasattr(self.hist, "save") and hasattr(self.hist, "X")
                and hasattr(self.hist, "times")):
            # sampler history (per-time lists/deques of pytrees); deques
            # are not pytree nodes, so materialise as lists before dumping
            state["sampler_hist"] = dump_tree(
                (list(self.hist.X), list(self.hist.wgts)))
            state["sampler_hist_times"] = [int(t) for t in self.hist.times]
        if self.summaries is not None:
            # per-step collector outputs may be pytrees (Moments returns
            # {'mean','var'} dicts) — np.asarray would silently pickle
            # unrestorable 0-d object arrays, so dump as flattened trees
            state["summaries"] = {
                c.summary_name: dump_tree(
                    list(getattr(self.summaries, c.summary_name)))
                for c in self.summaries._collectors
            }
        if getattr(self, "_col_states", None) is not None:
            state["col_states"] = dump_tree(self._col_states)
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_state(self, path):
        """Restore a checkpoint saved by :meth:`save_state` and continue
        stepping (``next(pf)`` / ``pf.run()``)."""
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)

        def from_np(tagged):
            tag, v = tagged
            if tag == "key":
                return jax.random.wrap_key_data(jnp.asarray(v))
            return jnp.asarray(v)

        def load_tree(dumped):
            leaves, treedef = dumped
            return jax.tree_util.tree_unflatten(
                treedef, [from_np(l) for l in leaves]
            )

        self._carry = load_tree(state["carry"])
        self.t = state["t"]
        self.key = jax.random.wrap_key_data(jnp.asarray(state["key"]))
        self.X = self._carry.X
        self.Xp = self._carry.X
        self.wgts = rs.Weights(self._carry.lw)
        self.logLt = self._carry.logLt
        self.A, self.aux, self.rs_flag, self.loglt = None, None, None, None
        self._hist_frames = (
            load_tree(state["hist_frames"]) if "hist_frames" in state else []
        )
        if "windowed_hist" in state:
            # rolling/partial history: refill the (fresh) object built by
            # __init__ from the same store_history option
            kind, dumped, times = state["windowed_hist"]
            h = self._hist_obj
            if h is None:
                raise ValueError(
                    "load_state: checkpoint carries rolling/partial "
                    "history but this SMC was constructed with "
                    f"store_history={self.hist_option!r}")
            if kind == "rolling":
                X_l, A_l, w_l = load_tree(dumped)
                h.X.clear(), h.A.clear(), h.wgts.clear()
                for x, a, w in zip(X_l, A_l, w_l):
                    h.X.append(x)
                    h.A.append(a)
                    h.wgts.append(w)
            else:
                X_l, w_l = load_tree(dumped)
                h.X.clear(), h.wgts.clear()
                for t, x, w in zip(times, X_l, w_l):
                    h.X[t] = x
                    h.wgts[t] = w
            self.hist = h
        if "sampler_hist" in state:
            from particles_tpu.smc_samplers import SamplerHistory

            X_list, w_list = load_tree(state["sampler_hist"])
            # rebuild with the live option so rolling-window (deque) and
            # save-if-callable semantics survive the round trip
            opt = self.hist_option
            sh = SamplerHistory(True if opt in (False, None) else opt)
            for X, w in zip(X_list, w_list):
                sh.X.append(X)
                sh.wgts.append(w)
            for t in state.get("sampler_hist_times", []):
                sh.times.append(t)
            self.hist = sh
        if state.get("summaries") and self.summaries is not None:
            for name, vals in state["summaries"].items():
                setattr(self.summaries, name, load_tree(vals))
        if "col_states" in state:
            self._col_states = load_tree(state["col_states"])

    def _finalize_history(self):
        if self.store_history and getattr(self, "_hist_frames", None):
            stacked = jax.tree_util.tree_map(
                lambda *frames: jnp.stack(frames), *self._hist_frames
            )
            from particles_tpu.smoothing import ParticleHistory

            self.hist = ParticleHistory(self.fk, *stacked,
                                        hilbert_ordered=self.qmc)

    # ------------------------------------------------------------------
    # compiled whole-horizon execution
    # ------------------------------------------------------------------

    @property
    def _static_horizon(self):
        """True if fk uses the default horizon-based ``done`` (and is not an
        SMC sampler, which always runs through its own stepping engine)."""
        opt = self.hist_option
        hist_ok = (
            isinstance(opt, bool)
            or (isinstance(opt, int) and opt >= 1)  # rolling window
            or callable(opt)  # partial (save times are static)
        )
        return (
            type(self.fk).done is FeynmanKac.done
            and self.t == 0
            and hist_ok
            and not self.verbose  # per-iteration printing: step mode
            and not getattr(self.fk, "is_sampler", False)
            # host-side (NumPy) collectors cannot run inside the scan
            and not (self.summaries is not None
                     and self.summaries.has_host_side)
        )

    def _hist_spec(self, T):
        return _hist_spec(self.hist_option, T)

    def _install_windowed_hist(self, hist, T):
        """Rebuild the rolling/partial history object from the scan ring."""
        h = _windowed_hist_from_ring(self.hist_option, hist, T)
        self.hist = h
        self._hist_obj = h

    @utils.timer
    def run(self):
        """Run the algorithm to completion (reference core.py:391-409).

        Like the reference, ``run`` CONTINUES from the current state: on a
        partially-stepped algorithm (``next(pf)`` was called) it finishes
        via the stepping path rather than restarting the compiled
        whole-run scan from t=0 (which would silently discard the
        completed steps and, since stepping advances ``self.key``, replay
        a different randomness stream)."""
        if not self._static_horizon or self.t > 0:
            for _ in self:
                pass
            return
        T = int(self.fk.T)
        hist_spec = self._hist_spec(T)
        runner = _get_compiled_runner(
            type(self.fk),
            self.N,
            T,
            self.qmc,
            self.resampling,
            self.ESSrmin,
            self.summaries,
            hist_spec,
        )
        carry, outs, hist = runner(self.fk, self.key)
        wgts = rs.Weights(carry.lw)
        self.X = carry.X
        self.wgts = wgts
        self.logLt = carry.logLt
        self.t = T
        if self.summaries is not None:
            self.summaries.assign_stacked(outs)
            self.rs_flag = self.summaries.rs_flags[-1]
        if self.store_history:
            from particles_tpu.smoothing import ParticleHistory

            self.hist = ParticleHistory(self.fk, *hist,
                                        hilbert_ordered=self.qmc)
        elif isinstance(hist_spec, tuple):
            self._install_windowed_hist(hist, T)


def _hist_spec(opt, T):
    """Map the store_history option to the engine's history argument:
    bool passes through; rolling k / partial callable become a static
    ("slots", slot_of_t, nslots) ring spec (slot assignments are known
    at trace time since T is static)."""
    if isinstance(opt, bool):
        return opt
    if isinstance(opt, int):
        kk = min(opt, T)
        return ("slots", tuple(t % kk for t in range(T)), kk)
    times = tuple(t for t in range(T) if opt(t))
    nslots = len(times) + 1  # last slot = scratch for unsaved steps
    lookup = {t: i for i, t in enumerate(times)}
    return ("slots", tuple(lookup.get(t, nslots - 1) for t in range(T)),
            nslots)


def _windowed_hist_from_ring(opt, hist, T):
    """Rebuild a rolling/partial history object from the engine's scan
    ring output (shared by ``SMC.run`` and the shard_map driver)."""
    from particles_tpu import smoothing

    take = lambda tree, i: jax.tree_util.tree_map(  # noqa: E731
        lambda leaf: leaf[i], tree)
    X_ring, A_ring, lw_ring = hist
    if isinstance(opt, int) and not isinstance(opt, bool):
        kk = min(opt, T)
        h = smoothing.RollingParticleHistory(opt)
        for i in range(kk):
            slot = (T - kk + i) % kk  # time order
            h.X.append(take(X_ring, slot))
            h.A.append(A_ring[slot])
            h.wgts.append(rs.Weights(lw_ring[slot]))
    else:
        h = smoothing.PartialParticleHistory(opt)
        times = [t for t in range(T) if opt(t)]
        for i, t in enumerate(times):
            h.X[t] = take(X_ring, i)
            h.wgts[t] = rs.Weights(lw_ring[i])
    return h


_runner_cache = {}
_RUNNER_CACHE_MAX = 64


class _IdKey:
    """Identity-hashed wrapper holding a STRONG reference: while the key
    lives in the cache, the wrapped object cannot be garbage-collected, so
    its id cannot be recycled by a different, differently-configured
    object (raw ``id(v)`` in a cache key silently aliases entries after
    GC reuses the address)."""

    __slots__ = ("obj",)

    def __init__(self, obj):
        self.obj = obj

    def __hash__(self):
        return id(self.obj)

    def __eq__(self, other):
        return isinstance(other, _IdKey) and other.obj is self.obj


def _hashable(v):
    try:
        hash(v)
        return v
    except TypeError:
        pass
    # hash common config containers by VALUE (e.g. a collector configured
    # with levels=[...] must hit the same runner for equal levels and a
    # different one for different levels)
    if isinstance(v, (list, tuple)):
        return ("__seq__",) + tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return ("__dict__",) + tuple(
            sorted((k, _hashable(x)) for k, x in v.items()))
    import numpy as _np

    if isinstance(v, (_np.ndarray, jax.Array)):
        a = _np.asarray(v)
        return ("__arr__", a.shape, str(a.dtype), a.tobytes())
    return _IdKey(v)


def _summaries_signature(summaries):
    """Hashable description of a Summaries config (for the jit cache)."""
    if summaries is None:
        return None
    return tuple(
        (type(c), tuple(sorted((k, _hashable(v)) for k, v in c.__dict__.items())))
        for c in summaries._collectors
    )


def _get_compiled_runner(fk_cls, N, T, qmc, resampling_scheme, ESSrmin,
                         summaries, store_history):
    """Cache jitted whole-run functions per static configuration.

    ``summaries`` is closed over (its collectors are pure config); the cache
    key includes its structural signature so differently-configured
    collectors do not collide.
    """
    from particles_tpu.ops.guard import pallas_allowed

    # the ambient Pallas guard is trace-time state: a runner traced with
    # kernels enabled must never be served to a no_pallas() caller (GSPMD
    # contexts), nor vice versa — key the cache on it
    cache_key = (fk_cls, N, T, qmc, resampling_scheme, ESSrmin,
                 _summaries_signature(summaries), store_history,
                 pallas_allowed())
    if cache_key not in _runner_cache:
        if len(_runner_cache) >= _RUNNER_CACHE_MAX:
            # Evict oldest half (dicts preserve insertion order).  Unbounded
            # growth in a long-lived process (hundreds of distinct configs)
            # pins every compiled executable in memory forever.
            for k in list(_runner_cache)[: _RUNNER_CACHE_MAX // 2]:
                del _runner_cache[k]

        def run(fk, key):
            return _run_full(
                fk, key, N, T, qmc, resampling_scheme, ESSrmin,
                summaries, store_history,
            )

        _runner_cache[cache_key] = jax.jit(run)
    return _runner_cache[cache_key]


def SQMC(*args, **kwargs):
    """Sequential quasi-Monte Carlo: an :class:`SMC` with ``qmc=True``
    (convenience constructor; the reference's book scripts call
    ``particles.SQMC``)."""
    kwargs["qmc"] = True
    return SMC(*args, **kwargs)


class SMCResult:
    """Light-weight result of one run inside ``multiSMC`` (host-side)."""

    def __init__(self, logLt, summaries_dict, X=None, lw=None):
        self.logLt = logLt
        self.X = X
        self.lw = lw
        for name, val in summaries_dict.items():
            setattr(self, name, val)
        self.summaries = self

    @property
    def wgts(self):
        return rs.Weights(self.lw) if self.lw is not None else None

    @property
    def W(self):
        return None if self.lw is None else rs.exp_and_normalise(self.lw)


def multiSMC(
    fk=None,
    N=100,
    qmc=False,
    resampling="systematic",
    ESSrmin=0.5,
    nruns=10,
    nprocs=0,
    collect=None,
    key=None,
    out_func=None,
    **args,
):
    """Run many independent SMC algorithms, batched on device.

    Reference parity (core.py:431-518): ``nruns`` independent replicates,
    crossed with a cartesian product over any keyword argument given as a
    list (e.g. ``resampling=['multinomial', 'systematic']``) or as a dict of
    name -> value (e.g. ``fk={'boot': fk_b, 'guided': fk_g}``).  Returns a
    list of dicts with the varying option values, ``'run'`` index and
    ``'output'`` (an :class:`SMCResult`).

    TPU-native execution: the ``nruns`` replicates of each option combo are
    *vmapped over PRNG keys* and run as one compiled program — the reference's
    joblib process pool (utils.py:158-202) and its seeding discipline are
    replaced by ``jax.random.split``.  ``nprocs`` is accepted for API
    compatibility and ignored.

    Any other :class:`SMC` constructor option (``verbose``, sampler FKs
    such as IBIS/Tempering, future options) is accepted too: combos that
    cannot take the vmapped scan fast path (SMC-sampler FKs run through
    the stepping engine; unrecognised options) fall back to one
    :class:`SMC` per run — same results, per-run compilation (cached
    across runs).  ``seed`` is accepted as an alternative to ``key``.
    """
    del nprocs
    base_args = dict(
        fk=fk, N=N, qmc=qmc, resampling=resampling, ESSrmin=ESSrmin
    )
    seed = args.pop("seed", None)
    base_args.update(args)
    varying_keys = [
        k for k, v in base_args.items() if isinstance(v, (list, dict))
    ]
    labels_list, values_list = utils.cartesian_args(base_args)

    if key is None:
        key = jax.random.key(0 if seed is None else seed)
    keys = jax.random.split(key, nruns)

    _FAST_KEYS = {"fk", "N", "qmc", "resampling", "ESSrmin", "store_history"}

    results = []
    for labels, values in zip(labels_list, values_list):
        fk_v = values["fk"]
        is_sampler = bool(getattr(fk_v, "is_sampler", False))
        extra = set(values) - _FAST_KEYS
        # rolling (int) / partial (callable) history cannot ride the vmapped
        # fast path (it would silently degrade to a full (T, N) stack);
        # route those combos through one SMC per run, which honors them
        plain_hist = isinstance(values.get("store_history", False), bool)
        if is_sampler or extra or not plain_hist:
            # generic path: sampler FKs need the stepping engine
            # (waste-free shape changes, host-side collectors); unknown
            # options are forwarded to the SMC constructor
            for r in range(nruns):
                pf = SMC(collect=collect, key=keys[r], **values)
                pf.run()
                out_obj = pf if out_func is None else out_func(pf)
                entry = {k: labels[k] for k in varying_keys}
                entry["run"] = r
                entry["output"] = out_obj
                results.append(entry)
            continue
        values = dict(values)
        fk_v = values.pop("fk")
        N_v = values.pop("N")
        qmc_v = values.pop("qmc")
        scheme_v = values.pop("resampling")
        essrmin_v = values.pop("ESSrmin")
        store_hist_v = bool(values.pop("store_history", False))
        summaries = collectors.Summaries(collect) if collect != "off" else None
        T = int(fk_v.T)

        def single(fk_obj, k):
            carry, outs, hist = _run_full(
                fk_obj, k, N_v, T, qmc_v, scheme_v, essrmin_v, summaries,
                store_hist_v,
            )
            return carry.logLt, outs, carry.lw, hist

        logLts, outs, lws, hists = jax.jit(
            jax.vmap(single, in_axes=(None, 0))
        )(fk_v, keys)
        names = (
            [c.summary_name for c in summaries._collectors]
            if summaries is not None
            else []
        )
        for r in range(nruns):
            sm = {
                name: jax.tree_util.tree_map(lambda o: o[r], out)
                for name, out in zip(names, outs)
            }
            res = SMCResult(logLts[r], sm, lw=lws[r])
            if store_hist_v:
                from particles_tpu.smoothing import ParticleHistory

                res.hist = ParticleHistory(
                    fk_v,
                    *jax.tree_util.tree_map(lambda h: h[r], hists),
                    hilbert_ordered=qmc_v,
                )
            out_obj = res if out_func is None else out_func(res)
            entry = {k: labels[k] for k in varying_keys}
            entry["run"] = r
            entry["output"] = out_obj
            results.append(entry)
    return results
