"""Distributed (shard_map) particle filtering with ring resampling.

The explicit-SPMD counterpart of :mod:`particles_tpu.parallel.sharded`
(which relies on GSPMD to insert collectives): here the whole filter runs
inside ``jax.shard_map`` with hand-placed collectives, which is the layout
a real multi-chip deployment wants (SURVEY.md §2b; cf. Murray et al.,
PAPERS.md):

* per step, the only cross-chip traffic is two scalar all-reduces
  (log-normaliser and ESS);
* at adaptive resampling steps, a **ring redistribution**: systematic
  resampling's analytic z-form (``z_k = floor(M*C_k - u) + 1`` with C the
  global normalised cumsum) is computed shard-locally from a (D,) shard-sum
  table (one tiny all-gather), and particles are redistributed by rotating
  each shard's (z, x) block around the ring with ``lax.ppermute`` — D
  static hops of N/D particles, so the worst-case traffic equals one
  all-gather but the memory high-water stays at 2 N/D per shard and every
  shape is static.  Each hop serves the outputs whose global ancestor index
  falls in the passing block — a shard-local repeat-by-z, routed through
  the engine's Pallas visit-plan kernel on TPU.

Cross-shard consistency of the z boundaries is exact by construction: all
shards compute the same (D,) prefix table from the same all-gathered sums,
and each shard's z is clamped to (and its last entry pinned at) the shared
boundary value AFTER the monotonising scan, so the per-shard source ranges
tile [0, M) with no gaps or double serves even under float32
reduction-order differences.

Since round 3 there is ONE engine: :func:`run_shardmap_smc` executes
``core._run_full`` itself inside shard_map under a
:mod:`particles_tpu.distctx` context, so bootstrap / guided / APF models,
adaptive resampling, collectors and history all behave exactly as on a
single device (APF auxiliary weights follow reference core.py:307-313,
with logeta recomputed on the served particles — float-exact and cheaper
than ringing the column).  Round 4 adds stratified and multinomial rings
(:func:`ring_stratified_resample` — counter-based shared uniforms — and
:func:`ring_multinomial_resample` — order-statistics-decomposed shared
sorted uniforms over the SQMC merge ring).  Genealogy-crossing
collectors are explicitly rejected rather than silently approximated.

The reference has no counterpart (its parallelism is a communication-free
joblib pool, utils.py:158-186); this module is the TPU-native deliverable
named in SURVEY §2b.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from particles_tpu import distctx

__all__ = ["ring_systematic_resample", "ring_stratified_resample",
           "ring_multinomial_resample", "run_shardmap_smc",
           "sharded_backward_mcmc"]


def _shard_map(f, mesh, in_specs, out_specs):
    # jax.shard_map moved around across versions; support both spellings
    try:
        from jax import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm2

        return _sm2(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False)


def _serve_fn(z_blk, d, Mloc):
    """Local repeat-by-z for one passing block: a function mapping a
    payload (leading dim Nloc, the block's source count) to
    ``Y[j_loc] = X[#{k: z_blk_k <= j}]`` with ``j = d*Mloc + j_loc`` —
    ``Mloc`` output slots per shard (equal to Nloc for filters; the
    waste-free sampler shape change has Mloc = Nloc / len_chain).

    Restated on local output indices (``z' = clip(z_blk - d*Mloc, 0,
    Mloc)``, last entry pinned to Mloc) this is exactly the engine's
    repeat-by-z problem, so it shares
    :func:`particles_tpu.ops.make_repeat_plan`: the Pallas visit-list
    kernel on TPU (when source and output counts agree), counts +
    ``jnp.repeat`` elsewhere.  The mapping agrees with
    ``searchsorted(z_blk, j, 'right')`` for every SERVED output (outputs
    outside the block's range are masked by the caller, so their values
    are irrelevant).
    """
    from particles_tpu import ops

    zp = jnp.clip(z_blk - d * Mloc, 0, Mloc).at[-1].set(Mloc)
    return ops.serve_by_z(zp, Mloc)


def ring_systematic_resample(x_loc, lw_loc, u, M, axis, D,
                             return_ancestors=False):
    """Systematic resampling of globally-M particles sharded over ``axis``.

    Must be called INSIDE shard_map.  ``x_loc`` is a pytree of local
    particle slices (leading dim N/D), ``lw_loc`` the local log-weights,
    ``u`` the shared systematic uniform (identical on every shard), ``D``
    the static axis size.  Returns the redistributed local particles (the
    same global result as the single-device z-form counts path, sorted
    ancestors); with ``return_ancestors=True`` returns ``(y, A)`` where
    ``A`` is this shard's (N/D,) slice of the GLOBAL sorted ancestor
    vector.
    """
    Nloc = lw_loc.shape[0]
    Mloc = M // D  # output slots per shard (== Nloc except shape changes)
    d = jax.lax.axis_index(axis)
    # global normalisation (reduction-order-stable per shard)
    m = jax.lax.pmax(jnp.max(lw_loc), axis)
    w = jnp.exp(lw_loc - m)
    cum_loc = jnp.cumsum(w)
    all_s = jax.lax.all_gather(cum_loc[-1], axis)      # (D,) shard sums
    S = jnp.sum(all_s)
    prefix = jnp.cumsum(all_s) - all_s                 # exclusive, (D,)
    # shared boundary table: z before each shard's first source, + final M
    zb = jnp.clip(
        jnp.floor(M * prefix / S - u).astype(jnp.int32) + 1, 0, M)
    zb = zb.at[0].set(0)
    zb_ext = jnp.concatenate([zb, jnp.full((1,), M, jnp.int32)])
    # local global-z, then clamp AFTER the monotonising max-scan to the
    # shard's shared upper boundary (and pin the last entry to it): a
    # float32-rounding interior z exceeding the boundary cannot propagate
    # past it, so shard ranges tile [0, M) exactly even when
    # prefix[d] + cum_loc[k] and prefix[d+1] differ in float association
    z_loc = jnp.clip(
        jnp.floor(M * (prefix[d] + cum_loc) / S - u).astype(jnp.int32) + 1,
        0, M)
    z_loc = jnp.minimum(jax.lax.associative_scan(jnp.maximum, z_loc),
                        zb_ext[d + 1])
    z_loc = z_loc.at[-1].set(zb_ext[d + 1])

    # ring: rotate each shard's (z, x) block; serve outputs whose global
    # index j falls in the passing block's range [zb[e], zb[e+1])
    j = d * Mloc + jnp.arange(Mloc, dtype=jnp.int32)
    return ring_serve(
        x_loc, z_loc, Nloc,
        served_of=lambda e: (j >= zb_ext[e]) & (j < zb_ext[e + 1]),
        rep_of=lambda z_blk: _serve_fn(z_blk, d, Mloc),
        axis=axis, D=D, return_ancestors=return_ancestors, Mloc=Mloc)


def _counter_uniforms(key, k):
    """Shared counter-based uniforms ``u_k = U(fold_in(key, k))`` —
    identical on every shard for the same global index ``k`` (the key is
    replicated), with no (M,) materialisation and no communication.
    This is what makes stratified resampling ring-able: the per-output
    iid uniforms of the z-form become a pure function of the output
    index."""
    return jax.vmap(
        lambda kk: jax.random.uniform(jax.random.fold_in(key, kk)))(k)


def ring_stratified_resample(x_loc, lw_loc, key, M, axis, D,
                             return_ancestors=False):
    """Stratified resampling of globally-M particles sharded over
    ``axis`` — the same D-hop ring as :func:`ring_systematic_resample`
    with the stratified z-form (reference ``resampling.py:599-604``;
    single-device counterpart ``resampling.stratified_z``):

        z_i = k_i + 1[u_{k_i} <= frac_i],   k_i = floor(M * cs_i),

    where the per-output uniforms ``u_k`` are COUNTER-BASED (see
    :func:`_counter_uniforms`) so every shard evaluates the same u at the
    same global output index without materialising an (M,) vector or
    communicating.  Boundary tables, the monotonising max-scan and the
    clamp-after-scan exactness argument are identical to the systematic
    ring.  ``key`` must be the REPLICATED resampling key.
    """
    Nloc = lw_loc.shape[0]
    Mloc = M // D
    d = jax.lax.axis_index(axis)
    m = jax.lax.pmax(jnp.max(lw_loc), axis)
    w = jnp.exp(lw_loc - m)
    cum_loc = jnp.cumsum(w)
    all_s = jax.lax.all_gather(cum_loc[-1], axis)
    S = jnp.sum(all_s)
    prefix = jnp.cumsum(all_s) - all_s
    # shared boundary table at the shard-prefix cumulative weights
    gb = M * prefix / S
    kb = jnp.floor(gb).astype(jnp.int32)
    ub = _counter_uniforms(key, jnp.clip(kb, 0, M - 1))
    zb = jnp.clip(kb + (ub <= gb - kb).astype(jnp.int32), 0, M)
    zb = zb.at[0].set(0)
    zb_ext = jnp.concatenate([zb, jnp.full((1,), M, jnp.int32)])
    # local global-z, monotonised then clamped to the shared boundary
    # (see ring_systematic_resample for the exact-tiling argument)
    g = M * (prefix[d] + cum_loc) / S
    kk = jnp.floor(g).astype(jnp.int32)
    uk = _counter_uniforms(key, jnp.clip(kk, 0, M - 1))
    z_loc = jnp.where(kk >= M, M,
                      kk + (uk <= g - kk).astype(jnp.int32))
    z_loc = jnp.clip(z_loc, 0, M)
    z_loc = jnp.minimum(jax.lax.associative_scan(jnp.maximum, z_loc),
                        zb_ext[d + 1])
    z_loc = z_loc.at[-1].set(zb_ext[d + 1])

    j = d * Mloc + jnp.arange(Mloc, dtype=jnp.int32)
    return ring_serve(
        x_loc, z_loc, Nloc,
        served_of=lambda e: (j >= zb_ext[e]) & (j < zb_ext[e + 1]),
        rep_of=lambda z_blk: _serve_fn(z_blk, d, Mloc),
        axis=axis, D=D, return_ancestors=return_ancestors, Mloc=Mloc)


def ring_multinomial_resample(x_loc, lw_loc, key, M, axis, D,
                              return_ancestors=False):
    """Multinomial (sorted-ancestor) resampling of globally-M particles
    sharded over ``axis``.

    The single-device z-form merges M globally SORTED uniforms against
    the cumulative weights (``resampling.multinomial_z``).  Sharded, the
    sorted-uniform set is generated with ZERO communication by the
    order-statistics decomposition:

    * every shard computes the same (D-1,) boundary order statistics
      ``V_e = U_(e*Nloc)`` from the replicated key — a sequential Beta
      chain, ``(V_{e+1} - V_e) / (1 - V_e) ~ Beta(Nloc,
      M - (e+1) Nloc + 1)``;
    * shard d fills in its block: conditional on the boundaries, the
      interior order statistics are ``lo + (hi - lo) * (sorted uniforms
      of the block size)`` (shard-folded key, O(Nloc) spacings
      construction), the block's last point being the boundary itself —
      the top shard scales a full block into ``(V_{D-1}, 1)``.

    The serve then rides the same merge-rank ppermute ring as
    distributed SQMC (:func:`particles_tpu.parallel.dqmc.
    ring_merge_resample` — sorted su against global cumulative weights).
    """
    from particles_tpu import resampling as rs
    from particles_tpu.parallel import dqmc

    Nloc = lw_loc.shape[0]
    Mloc = M // D  # sorted-uniform block per shard (M outputs globally)
    d = jax.lax.axis_index(axis)
    # (D+1,) boundary table V_0=0, V_1..V_{D-1} order stats, V_D=1
    # (replicated key -> identical on every shard)
    kb = jax.random.split(jax.random.fold_in(key, 0x626f756e), D)
    v = jnp.float32(0.0)
    Vs = [v]
    for e in range(D - 1):
        b = jax.random.beta(kb[e], Mloc, M - (e + 1) * Mloc + 1)
        v = v + (1.0 - v) * b.astype(jnp.float32)
        Vs.append(v)
    Vs.append(jnp.float32(1.0))
    V = jnp.stack(Vs)
    lo = jnp.take(V, d)
    hi = jnp.take(V, d + 1)
    k_loc = jax.random.fold_in(key, d)
    # interior blocks: Mloc-1 interiors + the boundary as the last point;
    # top shard: a full Mloc block scaled into (V_{D-1}, 1)
    inner = rs.uniform_spacings(jax.random.fold_in(k_loc, 1), Mloc - 1)
    su_mid = jnp.concatenate(
        [lo + (hi - lo) * inner, hi[None].astype(inner.dtype)])
    su_top = lo + (1.0 - lo) * rs.uniform_spacings(
        jax.random.fold_in(k_loc, 2), Mloc)
    su = jnp.where(d == D - 1, su_top, su_mid)

    # globally-normalised local weights for the merge ring
    m = jax.lax.pmax(jnp.max(lw_loc), axis)
    w = jnp.exp(lw_loc - m)
    S = jax.lax.psum(jnp.sum(w), axis)
    return dqmc.ring_merge_resample(
        x_loc, su, w / S, axis, D, return_ancestors=return_ancestors)


def ring_serve(x_loc, blk0, Nloc, served_of, rep_of, axis, D,
               return_ancestors=False, Mloc=None):
    """The shared D-hop ring-serve scaffolding of both distributed
    resamplers (systematic repeat-by-z and SQMC merge-rank): rotate each
    shard's (``blk``, ``x``) around the ring with ``ppermute``; at hop
    ``s`` (holding origin-``e``'s block, ``e = (d - s) % D``) overwrite
    the local outputs selected by ``served_of(e)`` with
    ``rep_of(blk)(x_blk)``.  Every output is served by exactly one hop
    (the callers' boundary tables tile the output range), so masked
    accumulation needs no combining.

    ``Mloc`` (default ``Nloc``) is the number of OUTPUT slots per shard:
    the waste-free sampler resample serves M = N0/len_chain outputs from
    N0 sources, so ``rep_of`` maps (Nloc,)-leading payloads to
    (Mloc,)-leading outputs and ``served_of(e)`` masks (Mloc,).

    With ``return_ancestors=True`` also returns this shard's slice of the
    GLOBAL ancestor vector (``e * Nloc + rep(iota)`` at the serving hop).
    """
    if Mloc is None:
        Mloc = Nloc
    d = jax.lax.axis_index(axis)
    y0 = jax.tree_util.tree_map(
        lambda a: jnp.zeros((Mloc,) + a.shape[1:], a.dtype), x_loc)
    A0 = jnp.zeros((Mloc,), jnp.int32)
    iota = jnp.arange(Nloc, dtype=jnp.int32)
    perm = [(i, (i + 1) % D) for i in range(D)]

    def body(s, carry):
        y, A, blk, x_blk = carry
        e = (d - s) % D  # origin shard of the block currently held
        served = served_of(e)
        rep = rep_of(blk)
        y = jax.tree_util.tree_map(
            lambda acc, xb: jnp.where(
                served.reshape((-1,) + (1,) * (acc.ndim - 1)),
                rep(xb), acc),
            y, x_blk)
        if return_ancestors:
            A = jnp.where(served, e * Nloc + rep(iota), A)
        blk = jax.lax.ppermute(blk, axis, perm)
        x_blk = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis, perm), x_blk)
        return y, A, blk, x_blk

    carry = (y0, A0, blk0, x_loc)
    if D <= 16:
        # unrolled (D is small and static): lets XLA overlap each hop's
        # ppermute with the next hop's serve
        for s in range(D):
            carry = body(s, carry)
    else:
        carry = jax.lax.fori_loop(0, D, body, carry)
    y, A, _, _ = carry
    return (y, A) if return_ancestors else y


def _hist_prefix_spec(hist_spec, axis):
    """out_specs prefix for the engine's history output."""
    if hist_spec is False:
        return P()
    # full: (X, A, lw) stacked (T, Nloc, ...); windowed: same-shape ring
    return P(None, axis)


def _sampler_carry_specs(carry_shapes, N0loc, axis):
    """PartitionSpec tree for the sampler carry: per-particle leaves
    (leading dim == the local particle count N0loc) ride the particle
    axis; everything else (the replicated key, shared scalars, the
    calibrated proposal Cholesky, logLt accounting) is replicated.

    The rule is shape-based because ThetaParticles fields are model-
    defined; a shared leaf whose leading dim coincidentally equals N0loc
    would be mis-sharded — sampler configs (N0 = N*len_chain >= 1000 vs
    parameter dims of a few) keep the two regimes far apart.
    """
    def spec_of(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == N0loc:
            return P(axis)
        return P()

    return jax.tree_util.tree_map(spec_of, carry_shapes)


class ShardedSamplerResult:
    """Result of :func:`run_shardmap_smc` on an SMC-sampler FK: the final
    particle system (global arrays), evidence, summaries and history —
    the attributes sampler users read off ``SMC`` after ``run()``."""

    def __init__(self, logLt, X, wgts, t, summaries, hist):
        self.logLt = logLt
        self.X = X
        self.wgts = wgts
        self.t = t
        self.summaries = summaries
        self.hist = hist

    @property
    def W(self):
        return self.wgts.W


_sampler_shard_cache = {}


def _run_shardmap_sampler(fk, N, key, mesh, axis, resampling, ESSrmin,
                          collect, store_history, verbose=False):
    """Run an SMC sampler (IBIS / Tempering / AdaptiveTempering / NS-SMC /
    SMC² — any ``is_sampler`` FK) with its PARTICLES sharded over ``axis``.

    The sampler stepping engine (``smc_samplers._sampler_step``) executes
    inside ``shard_map`` under :mod:`particles_tpu.distctx`, one compiled
    program per step, host loop only syncing the replicated termination
    scalar (the tempering exponent / horizon): the waste-free resample
    serves M = N global starting points from N0 = N*len_chain sharded
    particles through the ring redistribution (the M != N0 shape change
    rides ``ring_serve``'s ``Mloc``), chain moves run embarrassingly
    particle-parallel with shard-folded keys, and the adaptive-tempering
    exponent solve gathers the (N0,) llik once per step and bisects
    replicated.  Reference workload being served: the waste-free sampler
    step (smc_samplers.py:714-936) — the M·P-particle resample+move at
    the heart of the reference's heaviest published runs (SMC² "~2 h",
    adaptive tempering studies).

    Collectors and history run HOST-side between steps on the global
    arrays (sampler populations are small; this is what the single-device
    stepping engine does too), so the full collector set — including the
    host-side waste-free variance estimators — is supported.

    SMC² (reference smc_samplers.py:1038-1167) shards the THETA axis:
    each shard advances its slice of the vmapped inner bootstrap filters
    (their (Nx,) weight reductions stay theta-local — the model wraps
    them in ``distctx.local_context()``), the theta-resample ring-serves
    whole inner-filter pytrees (xs/lws plus the uint32-bitcast pf_key),
    and the host-controlled exchange step (Nx doubling) replays the
    sharded inner filters through plain-GSPMD jit (embarrassingly
    theta-parallel, traced under ``no_pallas()``).
    """
    from particles_tpu import collectors as col
    from particles_tpu import core
    from particles_tpu import resampling as rs
    from particles_tpu import smc_samplers as ssp

    if resampling not in ("systematic", "stratified", "multinomial"):
        raise NotImplementedError(
            f"run_shardmap_smc (sampler): resampling scheme {resampling!r} "
            "is not supported under particle sharding")
    key = key if key is not None else jax.random.key(0)
    D = int(mesh.shape[axis])
    if N % D:
        raise ValueError(f"N={N} not divisible by mesh axis size {D}")
    Nloc = N // D
    N0loc = fk.N0(Nloc)

    summaries = col.Summaries(collect) if collect != "off" else None

    def local_step0(fk, key):
        with distctx.dist_context(axis, D):
            return ssp._sampler_step0(fk, key, Nloc)

    def local_step(fk, carry, t):
        with distctx.dist_context(axis, D):
            carry2, view = ssp._sampler_step(fk, carry, t, N, resampling,
                                             ESSrmin)
        return carry2, {"rs_flag": view.rs_flag, "loglt": view.loglt}

    fk_spec = jax.tree_util.tree_map(lambda _: P(), fk)
    carry_shapes = jax.eval_shape(
        lambda fk_, k_: ssp._sampler_step0(fk_, k_, Nloc), fk, key)
    carry_spec = _sampler_carry_specs(carry_shapes, N0loc, axis)

    # key on the fk TREEDEF: the in_specs trees are structural, and fk
    # aux-data (the move object) hashes by identity, so equal-config but
    # distinct fk instances need their own wrapper (jit would retrace for
    # them anyway — same behaviour as the single-device sampler cache)
    ck = (jax.tree_util.tree_structure(fk), N, D, resampling, ESSrmin,
          axis)
    if ck not in _sampler_shard_cache:
        f0 = _shard_map(local_step0, mesh, in_specs=(fk_spec, P()),
                        out_specs=carry_spec)
        f1 = _shard_map(local_step, mesh,
                        in_specs=(fk_spec, carry_spec, P()),
                        out_specs=(carry_spec, P()))
        _sampler_shard_cache[ck] = (jax.jit(f0), jax.jit(f1))
    jit_step0, jit_step = _sampler_shard_cache[ck]

    hist = (ssp.SamplerHistory(store_history)
            if store_history not in (False, None) else None)

    import types

    def make_view(t, carry, rs_flag, loglt):
        wgts = rs.Weights(carry.lw)  # global arrays, global reductions
        return core.StepView(
            fk=fk, t=t, X=carry.X, Xp=carry.X, A=None, wgts=wgts,
            aux=wgts, rs_flag=rs_flag, logLt=carry.logLt, loglt=loglt,
            N=N, ESSrmin=ESSrmin)

    with mesh:
        carry = jit_step0(fk, key)
    view = make_view(0, carry, jnp.asarray(False), carry.logLt)
    col_states = None
    if summaries is not None:
        col_states, outs = summaries.init_step(view)
        summaries.append_step(outs)
    if hist is not None:
        hist.save_step(0, view.X, view.wgts)
    if verbose:
        print(fk.summary_format(types.SimpleNamespace(
            t=0, X=view.X, wgts=view.wgts, rs_flag=view.rs_flag)))

    # SMC²'s host-controlled exchange step (Nx doubling): reuse
    # fk.maybe_exchange through a minimal smc-shim — the replay inside it
    # is a plain jit over the GSPMD-sharded theta axis (embarrassingly
    # parallel; inner-filter reductions are distctx-suppressed by the
    # model itself), traced under no_pallas() per the GSPMD guard.
    exch = types.SimpleNamespace(
        key=key, verbose=verbose, rs_flag=view.rs_flag, t=0,
        X=carry.X, wgts=rs.Weights(carry.lw), logLt=carry.logLt,
        _carry=carry)

    t = 1
    while not fk.done(types.SimpleNamespace(t=t, X=carry.X)):
        if hasattr(fk, "maybe_exchange"):
            # mirror sampler_next: called with smc.t == the step ABOUT to
            # run (the inner filters hold observations 0..t-1, the replay
            # horizon), smc.rs_flag == the just-completed step's flag
            exch.t, exch.rs_flag, exch._carry, exch.X = (
                t, view.rs_flag, carry, carry.X)
            from particles_tpu.ops import no_pallas
            with no_pallas():
                fk.maybe_exchange(exch)
            carry = exch._carry
        with mesh:
            carry, small = jit_step(fk, carry, jnp.int32(t))
        view = make_view(t, carry, small["rs_flag"], small["loglt"])
        if summaries is not None:
            col_states, outs = summaries.step(view, col_states)
            summaries.append_step(outs)
        if hist is not None:
            hist.save_step(t, view.X, view.wgts)
        if verbose:
            print(fk.summary_format(types.SimpleNamespace(
                t=t, X=view.X, wgts=view.wgts, rs_flag=view.rs_flag)))
        t += 1

    if summaries is not None:
        summaries.finalize_lists()
    return ShardedSamplerResult(
        logLt=carry.logLt, X=carry.X, wgts=rs.Weights(carry.lw), t=t,
        summaries=summaries, hist=hist)


def run_shardmap_smc(fk, N, key=None, mesh=None, axis="particles",
                     resampling="systematic", ESSrmin=0.5, qmc=False,
                     collect=None, store_history=False):
    """Run the FULL SMC engine inside shard_map over ``axis``.

    One engine, shardable: this executes ``core._run_full`` — the same
    step0 + ``lax.scan`` program as ``SMC.run()`` — inside ``shard_map``
    under a :mod:`particles_tpu.distctx` context, so every feature of the
    single-device engine behaves identically under particle sharding:

    * bootstrap / guided / **APF** models (auxiliary weights and the
      reset-weight compensation of reference core.py:307-313; the logeta
      payload rides the ring),
    * adaptive-ESS resampling via the ring redistribution (two scalar
      all-reduces per step otherwise),
    * collectors (default ESS/logLt/rs_flag + Moments — their reductions
      become psum collectives via the dist-aware numerics layer),
    * history (full / rolling / partial), with GLOBAL ancestor indices.

    ``qmc=True`` runs distributed SQMC (round 3): each shard generates
    its slice of ONE globally-sorted Sobol set in closed form, the
    inverse-CDF serve rides the same ppermute ring, and the per-step
    Hilbert re-ordering is a distributed odd-even block merge
    (:mod:`particles_tpu.parallel.dqmc`).  Requires N a power of two.

    Explicitly rejected (raise, never silently wrong): non-systematic
    resampling schemes, and collectors that walk the genealogy or keep
    per-particle state across steps (fixed-lag / on-line smoothers).

    Returns an ``SMCResult`` (with ``.hist`` when history is requested).
    """
    from particles_tpu import collectors as col
    from particles_tpu import core

    if getattr(fk, "is_sampler", False):
        # SMC samplers (IBIS / tempering / adaptive tempering / NS-SMC /
        # SMC²) run through the sharded stepping engine: dynamic horizon +
        # waste-free shape changes need per-step host control, not the
        # one-scan program
        if qmc:
            raise NotImplementedError(
                "run_shardmap_smc: qmc=True is not supported for SMC "
                "samplers (the reference's SQMC path is a filter-engine "
                "feature)")
        return _run_shardmap_sampler(
            fk, N, key, mesh, axis, resampling, ESSrmin, collect,
            store_history)

    if qmc and (N & (N - 1)):
        raise NotImplementedError(
            "run_shardmap_smc: SQMC under particle sharding requires N a "
            f"power of two (got {N}): the sharded sorted-Sobol generation "
            "is closed-form only at 2^m")
    if not qmc and resampling not in ("systematic", "stratified",
                                      "multinomial"):
        raise NotImplementedError(
            f"run_shardmap_smc: resampling scheme {resampling!r} is not "
            "supported under particle sharding (rings exist for "
            "systematic/stratified z-forms and the multinomial "
            "sorted-uniform merge)")

    key = key if key is not None else jax.random.key(0)
    D = int(mesh.shape[axis])
    if N % D:
        raise ValueError(f"N={N} not divisible by mesh axis size {D}")
    Nloc = N // D
    T = int(fk.T)

    summaries = col.Summaries(collect) if collect != "off" else None
    if summaries is not None:
        bad = [c for c in summaries._collectors
               if not getattr(c, "dist_safe", False)]
        if bad:
            raise NotImplementedError(
                "run_shardmap_smc: collector(s) "
                f"{[type(c).__name__ for c in bad]} are not supported "
                "under particle sharding (genealogy-walking / stateful "
                "collectors need cross-shard gathers); run them on a "
                "single device")

    # reuse the engine's history-spec machinery (rolling/partial ring)
    hist_spec = core._hist_spec(store_history, T)

    def local_run(fk, key):
        with distctx.dist_context(axis, D):
            return core._run_full(
                fk, key, Nloc, T, qmc, resampling, ESSrmin, summaries,
                hist_spec, None,
            )

    carry_spec = core._Carry(key=P(), X=P(axis), lw=P(axis), logLt=P(),
                             log_mean_w=P(), col_states=P())
    out_specs = (carry_spec, P(), _hist_prefix_spec(hist_spec, axis))
    f = _shard_map(local_run, mesh, in_specs=(P(), P()),
                   out_specs=out_specs)
    with mesh:
        carry, outs, hist = jax.jit(f)(fk, key)

    names = ([c.summary_name for c in summaries._collectors]
             if summaries is not None else [])
    sm = dict(zip(names, outs))
    res = core.SMCResult(carry.logLt, sm, X=carry.X, lw=carry.lw)
    if store_history is True:
        from particles_tpu.smoothing import ParticleHistory

        # distributed SQMC stores frames in global Hilbert order, exactly
        # like the single-device engine (core._finalize_history)
        res.hist = ParticleHistory(fk, *hist, hilbert_ordered=qmc)
    elif isinstance(hist_spec, tuple):
        res.hist = core._windowed_hist_from_ring(store_history, hist, T)
    else:
        res.hist = None
    return res


def sharded_backward_mcmc(hist, key, M, mesh, axis="particles", nsteps=1,
                          lower_only=False):
    """FFBS-MCMC backward pass with the stored history SHARDED over the
    particle axis (VERDICT r4 task 6 — memory-motivated).

    A full f32 history at the headline scale (N=2^20, T=10^3) is ~4 GB
    PER payload column — near the single-chip HBM ceiling (reference
    workload class: ``book/smoothing/offline_smoothing.py:20``, the
    "~1 day" study).  Sharded over D devices the resident cost is
    ``T*N/D`` per device; each backward step all-gathers ONE frame's
    columns ((N,)-sized transients), so the high-water mark per device is
    ``T*N/D + O(N)`` instead of ``T*N``.

    Algorithm (Dau & Chopin 2022 independent-Metropolis FFBS, exactly as
    :meth:`particles_tpu.smoothing.ParticleHistory.backward_sampling_mcmc`):
    each shard runs ``Mloc = M/D`` trajectories; the iid multinomial
    proposals are drawn shard-locally from the replicated (all-gathered)
    frame weights with a shard-folded key — iid proposals are
    exchangeable across shards, so the sharded pass targets the SAME law
    as the single-device pass (the realisation differs: a different
    uniform stream).  ``logpt`` is elementwise in the Mloc trajectories.

    Collective budget per backward step: ``L + 2`` all-gathers (L = state
    columns, plus ``lw_t`` and ``A_{t+1}``), ZERO all-reduces, ZERO
    permutes (enforced by ``tests/test_collective_budget.py``).

    Returns paths as a (T, M, ...) pytree, M sharded over ``axis``.
    """
    from particles_tpu import resampling as rs

    D = int(mesh.shape[axis])
    if M % D:
        raise ValueError(f"M={M} not divisible by mesh axis size {D}")
    Mloc = M // D
    fk = hist.fk
    T = hist.T

    def local_bw(fk, X, A, lw, key):
        # X/A/lw are the shard's (T, Nloc, ...) slices
        shard = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, shard)
        kT, kscan = jax.random.split(key)
        gather = lambda l: jax.lax.all_gather(l, axis, axis=0, tiled=True)

        take = lambda tree, ix: jax.tree_util.tree_map(
            lambda l: jnp.take(l, ix, axis=0), tree)

        WT = rs.exp_and_normalise(gather(lw[-1]))
        idx_T = rs.multinomial_iid(kT, WT, Mloc)
        xg_T = jax.tree_util.tree_map(
            gather, jax.tree_util.tree_map(lambda l: l[-1], X))
        path_T = take(xg_T, idx_T)

        def body(carry, inputs):
            idx_next, xg_next = carry
            t, k, X_t, lw_t, A_t1 = inputs
            xg_t = jax.tree_util.tree_map(gather, X_t)
            W_t = rs.exp_and_normalise(gather(lw_t))
            A_g = gather(A_t1)
            xn = take(xg_next, idx_next)
            idx_t = jnp.take(A_g, idx_next)
            lp_cur = fk.logpt(t + 1, take(xg_t, idx_t), xn)

            def mh_step(i, st):
                idx_t, lp_cur, k = st
                k, k1, k2 = jax.random.split(k, 3)
                prop = rs.multinomial_iid(k1, W_t, Mloc)
                lp_prop = fk.logpt(t + 1, take(xg_t, prop), xn)
                lu = jnp.log(jax.random.uniform(k2, (Mloc,)))
                accept = lu < (lp_prop - lp_cur)
                idx_t = jnp.where(accept, prop, idx_t)
                lp_cur = jnp.where(accept, lp_prop, lp_cur)
                return idx_t, lp_cur, k

            idx_t, _, _ = jax.lax.fori_loop(0, nsteps, mh_step,
                                            (idx_t, lp_cur, k))
            return (idx_t, xg_t), take(xg_t, idx_t)

        ts = jnp.arange(T - 1, dtype=jnp.int32)
        inputs = (
            ts[::-1],
            jax.random.split(kscan, T - 1),
            jax.tree_util.tree_map(lambda l: l[-2::-1], X),
            lw[-2::-1],
            A[:0:-1],
        )
        _, paths_rev = jax.lax.scan(body, (idx_T, xg_T), inputs)
        return jax.tree_util.tree_map(
            lambda rev, last: jnp.concatenate([rev[::-1], last[None]],
                                              axis=0),
            paths_rev, path_T)

    in_specs = (P(), P(None, axis), P(None, axis), P(None, axis), P())
    out_specs = P(None, axis)
    f = _shard_map(local_bw, mesh, in_specs=in_specs, out_specs=out_specs)
    jf = jax.jit(f)
    with mesh:
        if lower_only:  # collective-census tests inspect the StableHLO
            return jf.lower(fk, hist.X, hist.A, hist.lw, key).as_text()
        return jf(fk, hist.X, hist.A, hist.lw, key)
