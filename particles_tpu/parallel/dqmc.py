"""Distributed SQMC primitives: sharded sorted-Sobol serve + a
distributed Hilbert sort (odd-even block merge over the mesh).

SQMC (Gerber & Chopin 2015; reference core.py:339-349 via qmc=True) needs
two global orders per step that plain particle sharding cannot provide
shard-locally:

* the inverse-CDF resampling pairs the GLOBALLY sorted Sobol first
  coordinate with the GLOBAL cumulative weights, and
* the end-of-step reordering sorts the new particles along the Hilbert
  curve GLOBALLY.

The reference sidesteps both by being single-process.  Here:

1. Each shard generates exactly its block of the globally-sorted Sobol
   point set in closed form (:func:`particles_tpu.rqmc.sobol_sorted0`
   with ``start = shard * N_local`` — no communication at all), so the
   "global sort of u" costs nothing.
2. :func:`ring_merge_resample` redistributes particles with the same
   D-hop ``ppermute`` ring as systematic resampling
   (:mod:`particles_tpu.parallel.distributed`), except the per-hop serve
   is a data-dependent merge-rank (local sorted u against the passing
   block's global cumulative weights) instead of an analytic z — the
   engine's repeat-plan kernel serves each hop.
3. :func:`dist_sort_with` sorts key/payload tuples globally by odd-even
   block transposition: D rounds of (ppermute exchange + one local
   2xN_local multi-operand ``lax.sort`` + keep-half).  By the 0-1
   principle D merge-split rounds sort D locally-sorted blocks, so the
   result is exact, every shape is static, and per-round traffic is one
   neighbour exchange.

All functions must be called INSIDE shard_map (they use
``jax.lax.axis_index`` / ``ppermute`` / ``psum``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dist_sort_with", "dist_qmc_reorder", "ring_merge_resample"]


def _round_pairing(D, r):
    """Static pairing for odd-even transposition round ``r``: returns
    (perm, paired, keep_lower) — the ppermute pair list (with self-sends
    for unpaired shards) and per-shard static predicates."""
    lo0 = 0 if r % 2 == 0 else 1
    paired = [False] * D
    keep_lower = [False] * D
    perm = []
    for i in range(lo0, D - 1, 2):
        perm += [(i, i + 1), (i + 1, i)]
        paired[i] = paired[i + 1] = True
        keep_lower[i] = True
    for i in range(D):
        if not paired[i]:
            perm.append((i, i))
    return perm, paired, keep_lower


def dist_sort_with(keys, payloads, axis, D):
    """Globally sort ``keys + payloads`` (tuples of (N_local,) arrays) by
    the lexicographic key order, leaving shard d with the d-th sorted
    block.  Returns the sorted ``(keys, payloads)`` tuples.

    Odd-even block transposition: one local sort, then D merge-split
    rounds.  Partners concatenate the two blocks in CANONICAL order
    (lower shard's block first on both sides) so tied keys split
    identically on both partners — each element is kept exactly once
    even with duplicate keys.
    """
    nk = len(keys)
    ops = jax.lax.sort(tuple(keys) + tuple(payloads), num_keys=nk,
                       is_stable=True)
    if D == 1:
        return ops[:nk], ops[nk:]
    d = jax.lax.axis_index(axis)
    Nloc = ops[0].shape[0]
    for r in range(D):
        perm, paired, keep_lower = _round_pairing(D, r)
        has_partner = jnp.asarray(paired)[d]
        lower = jnp.asarray(keep_lower)[d]
        recv = tuple(jax.lax.ppermute(o, axis, perm) for o in ops)
        first = tuple(jnp.where(lower, a, b) for a, b in zip(ops, recv))
        second = tuple(jnp.where(lower, b, a) for a, b in zip(ops, recv))
        merged = jax.lax.sort(
            tuple(jnp.concatenate([a, b]) for a, b in zip(first, second)),
            num_keys=nk, is_stable=True,
        )
        start = jnp.where(lower, 0, Nloc)
        halves = tuple(
            jax.lax.dynamic_slice_in_dim(m_, start, Nloc) for m_ in merged
        )
        ops = tuple(jnp.where(has_partner, h, o)
                    for h, o in zip(halves, ops))
    return ops[:nk], ops[nk:]


def _dist_hilbert_keys(X, axis, D):
    """Hilbert-curve sort keys of the LOCAL particle slice, with the
    standardisation statistics computed GLOBALLY (psum) so every shard
    quantises against the same bounding box (counterpart of
    hilbert._standardise_and_integerise, reference hilbert.py:33-57)."""
    from particles_tpu import hilbert

    if X.ndim == 1:
        return (X,)
    if X.shape[1] == 1:
        return (X[:, 0],)
    d_dim = X.shape[1]
    n = X.shape[0] * D
    nbits = hilbert.sort_nbits(n, d_dim)  # reduced-width sort keys
    s1 = jax.lax.psum(jnp.sum(X, axis=0), axis)
    s2 = jax.lax.psum(jnp.sum(X * X, axis=0), axis)
    m = s1 / n
    sd = jnp.sqrt(jnp.maximum(s2 / n - m * m, 0.0)) + 1e-30
    u = jax.nn.sigmoid((X - m) / sd)
    maxint = (1 << nbits) - 1
    xint = jnp.clip(jnp.floor(u * (1 << nbits)), 0, maxint).astype(
        jnp.uint32)
    hi, lo = hilbert.hilbert_index(xint, nbits)
    if d_dim * nbits <= 32:
        return (lo,)  # single-limb key (see hilbert.sort_nbits)
    return (hi, lo)


def dist_qmc_reorder(X, extras, axis, D):
    """Distributed counterpart of ``core._qmc_reorder``: re-order the
    globally-sharded particles ``X`` (local slice (N_local,) or
    (N_local, d)) and extra (N_local,) arrays into the GLOBAL Hilbert
    order of X, shard d ending with the d-th block.  Returns
    ``(X_sorted, extras_sorted)``."""
    keys = _dist_hilbert_keys(X, axis, D)
    if X.ndim == 1:
        _, out = dist_sort_with(keys, (X,) + tuple(extras), axis, D)
        return out[0], out[1:]
    d_dim = X.shape[1]
    cols = tuple(X[:, j] for j in range(d_dim)) + tuple(extras)
    _, out = dist_sort_with(keys, cols, axis, D)
    return jnp.stack(out[:d_dim], axis=1), out[d_dim:]


def _merge_serve_fn(su_loc, cs_blk, Mloc):
    """Serve function for one passing block: maps a payload (leading dim
    Nloc, the block's source count) to ``Y[j] = X[min{k: su_loc[j] <=
    cs_blk[k]}]`` for the ``Mloc`` local sorted-uniform queries — the
    SQMC inverse-CDF ancestor rule restricted to this block.  Phrased as
    the engine's repeat-by-z (z = merge-rank counts), so it shares the
    Pallas visit-plan kernel; outputs whose ancestor is NOT in this block
    get a well-defined but irrelevant value (the caller masks them)."""
    from particles_tpu import ops
    from particles_tpu import resampling as rs

    z = rs._merge_rank_counts(su_loc, cs_blk, Mloc)
    z = rs._monotone_z(z).at[-1].set(Mloc)
    return ops.serve_by_z(z, Mloc)


def ring_merge_resample(x_loc, su_loc, W_loc, axis, D,
                        return_ancestors=False):
    """SQMC inverse-CDF resampling of globally-N particles sharded over
    ``axis``: ancestor of the j-th sorted-Sobol point is the particle
    whose global normalised cumulative weight first reaches ``su[j]``.

    Must be called INSIDE shard_map.  ``x_loc``: pytree of local particle
    slices (in GLOBAL Hilbert order — the SQMC carry invariant);
    ``su_loc``: this shard's block of the globally-sorted Sobol first
    coordinate; ``W_loc``: local slice of the globally-normalised weights
    (sums to 1 across shards).  Returns the served local particles; with
    ``return_ancestors=True`` also the (N_local,) slice of the GLOBAL
    ancestor vector.

    Ring: rotate each shard's (cs, x) block; the hop holding origin-e's
    block serves the local outputs whose ``su`` falls in
    ``(B[e], B[e+1]]`` where B is the shared (D+1,) table of shard-end
    cumulative weights — identical on every shard, so the per-output
    serve tiles exactly even under float32 reduction-order differences
    (cs is clamped to, and pinned at, its shard's boundary value).
    """
    Mloc = su_loc.shape[0]      # output slots per shard (== Nloc for SQMC)
    Nloc = W_loc.shape[0]       # source slots per shard
    d = jax.lax.axis_index(axis)
    cum_loc = jnp.cumsum(W_loc)
    all_s = jax.lax.all_gather(cum_loc[-1], axis)      # (D,) shard sums
    S = jnp.sum(all_s)
    prefix = jnp.cumsum(all_s) - all_s                 # exclusive, (D,)
    # shared boundary table: B_ext[e] = global cum-weight before shard e
    B_ext = jnp.concatenate(
        [prefix / S, jnp.ones((1,), W_loc.dtype)])     # (D+1,)
    cs_loc = (prefix[d] + cum_loc) / S
    cs_loc = jnp.minimum(cs_loc, B_ext[d + 1]).at[-1].set(B_ext[d + 1])

    from particles_tpu.parallel.distributed import ring_serve

    return ring_serve(
        x_loc, cs_loc, Nloc,
        served_of=lambda e: (su_loc > B_ext[e]) & (su_loc <= B_ext[e + 1]),
        rep_of=lambda cs_blk: _merge_serve_fn(su_loc, cs_blk, Mloc),
        axis=axis, D=D, return_ancestors=return_ancestors, Mloc=Mloc)
