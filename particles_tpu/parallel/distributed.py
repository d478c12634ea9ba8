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
  falls in the passing block (a local sorted search — Pallas-ready).

Cross-shard consistency of the z boundaries is exact by construction: all
shards compute the same (D,) prefix table from the same all-gathered sums,
and each shard's last local z is overwritten with the shared boundary
value, so the per-shard source ranges tile [0, M) with no gaps or double
serves even under float32 reduction-order differences.

The reference has no counterpart (its parallelism is a communication-free
joblib pool, utils.py:158-186); this module is the TPU-native deliverable
named in SURVEY §2b.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["ring_systematic_resample", "run_shardmap_smc"]


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


def ring_systematic_resample(x_loc, lw_loc, u, M, axis, D):
    """Systematic resampling of globally-M particles sharded over ``axis``.

    Must be called INSIDE shard_map.  ``x_loc`` is a pytree of local
    particle slices (leading dim N/D), ``lw_loc`` the local log-weights,
    ``u`` the shared systematic uniform (identical on every shard), ``D``
    the static axis size.  Returns the redistributed local particles (the
    same global result as the single-device z-form counts path, sorted
    ancestors).
    """
    Nloc = lw_loc.shape[0]
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
    j = d * Nloc + jnp.arange(Nloc, dtype=jnp.int32)
    y0 = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), x_loc)
    perm = [(i, (i + 1) % D) for i in range(D)]

    def body(s, carry):
        y, z_blk, x_blk = carry
        e = (d - s) % D  # origin shard of the block currently held
        lo = zb_ext[e]
        hi = zb_ext[e + 1]
        served = (j >= lo) & (j < hi)
        idx = jnp.clip(
            jnp.searchsorted(z_blk, j, side="right").astype(jnp.int32),
            0, Nloc - 1)
        y = jax.tree_util.tree_map(
            lambda acc, xb: jnp.where(
                served.reshape((-1,) + (1,) * (acc.ndim - 1)),
                jnp.take(xb, idx, axis=0), acc),
            y, x_blk)
        z_blk = jax.lax.ppermute(z_blk, axis, perm)
        x_blk = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis, perm), x_blk)
        return y, z_blk, x_blk

    y, _, _ = jax.lax.fori_loop(0, D, body, (y0, z_loc, x_loc))
    return y


def run_shardmap_smc(fk, N, key=None, mesh=None, axis="particles",
                     ESSrmin=0.5):
    """Whole bootstrap/guided filter inside shard_map over ``axis``.

    Explicit-collective twin of ``run_sharded_smc``: two scalar
    all-reduces per step, ring redistribution at adaptive resampling
    steps, shard-local moves with shard-folded keys (the shared systematic
    uniform is derived from the global key + t so every shard draws the
    same u).  Returns an ``SMCResult`` with stacked ESSs/logLts/rs_flags.
    """
    from particles_tpu import core

    key = key if key is not None else jax.random.key(0)
    D = int(mesh.shape[axis])
    if N % D:
        raise ValueError(f"N={N} not divisible by mesh axis size {D}")
    Nloc = N // D
    T = int(fk.T)

    def glse(lw):
        m = jax.lax.pmax(jnp.max(lw), axis)
        s = jax.lax.psum(jnp.sum(jnp.exp(lw - m)), axis)
        return m + jnp.log(s)

    def gess(lw):
        m = jax.lax.pmax(jnp.max(lw), axis)
        w = jnp.exp(lw - m)
        s1 = jax.lax.psum(jnp.sum(w), axis)
        s2 = jax.lax.psum(jnp.sum(w * w), axis)
        return s1 * s1 / s2

    def local_run(fk, key):
        d = jax.lax.axis_index(axis)
        kd = jax.random.fold_in(key, d)
        x = fk.M0(jax.random.fold_in(kd, 2**31 - 1), Nloc)
        lw = fk.logG(0, None, x)
        lmw = glse(lw) - jnp.log(jnp.float32(N))
        logL0 = lmw

        def body(carry, t):
            x, lw, logLt, lmw = carry
            k_u = jax.random.fold_in(key, t)       # shared across shards
            k_m = jax.random.fold_in(kd, t)        # shard-local
            ess = gess(lw)
            rs_flag = ess < ESSrmin * N

            def do_rs(x, lw):
                u = jax.random.uniform(k_u, ())
                y = ring_systematic_resample(x, lw, u, N, axis, D)
                return y, jnp.zeros_like(lw)

            xp, lw2 = jax.lax.cond(rs_flag, do_rs, lambda x, lw: (x, lw),
                                   x, lw)
            x_new = fk.M(k_m, t, xp)
            lw_new = lw2 + fk.logG(t, xp, x_new)
            new_lmw = glse(lw_new) - jnp.log(jnp.float32(N))
            loglt = jnp.where(rs_flag, new_lmw, new_lmw - lmw)
            return ((x_new, lw_new, logLt + loglt, new_lmw),
                    (ess, logLt + loglt, rs_flag))

        (x, lw, logLt, _), outs = jax.lax.scan(
            body, (x, lw, logL0, lmw), jnp.arange(1, T, dtype=jnp.int32))
        return x, lw, logLt, outs

    f = _shard_map(
        local_run, mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis), P(axis), P(), (P(), P(), P())),
    )
    with mesh:
        x, lw, logLt, (ESSs, logLts, rs_flags) = jax.jit(f)(fk, key)
    res = core.SMCResult(
        logLt,
        {"ESSs": ESSs, "logLts": logLts, "rs_flags": rs_flags},
        X=x, lw=lw,
    )
    return res
