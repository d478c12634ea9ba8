"""Pallas kernel: repeat-by-counts (the resampling particle move).

The particle move of every sorted-ancestor resampling scheme is
``Y[j] = X[i(j)]`` with ``i(j) = #{k : z_k <= j}`` where ``z`` is the
inclusive cumulative sum of offspring counts — the parallel form of the
reference's sequential numba two-pointer ``inverse_cdf`` kernel
(resampling.py:484-509).

XLA's general gather/scatter run at ~60M elem/s on TPU (measured on v5e),
making ``jnp.repeat`` the dominant cost of a resampling step at N=1e6
(~16 ms/step).  This module implements a **static visit-list kernel**
(v6; supersedes the round-1 dynamic-fori design):

* the work is a list of (output chunk, source block) *visits*, bounded by
  ``2 * nchunks`` because both pointers of the merge only move forward —
  so the grid is static and Mosaic double-buffers every DMA (the round-1
  kernel's data-dependent ``fori_loop`` around manual DMAs stalled on DMA
  latency every iteration);
* all prep runs on (nchunks,)-sized arrays: the serving source block of
  an output boundary is found by searchsorted over per-block end offsets
  (z[C-1::C]), never over the full N; prep is shared across payload
  columns/leaves via :func:`make_repeat_plan`;
* sources are pre-transposed by XLA ((nblocks, R, 128) -> (nblocks, 128,
  R)) so the kernel never pays Mosaic's expensive sublane<->lane
  transpose (measured ~1 us per (8,128) block);
* inside a visit, output j's source k* always lies in the first source
  row whose last z exceeds j, so the select is two-level: row count on
  (1,128) vectors, one masked row materialisation, one 128x128 one-hot —
  statically scheduled dense tiles (the v2/v3 sparsity post-mortems in
  CLAUDE.md rule out dynamic-loop sparsity on Mosaic).

Measured on v5e at N=2^20 (jitted 50-step chain, value-forced; the axon
tunnel's block_until_ready is unreliable): pallas_call alone ~0.6 ms —
~7x less than the round-1 kernel's 4.1 ms — with the remaining end-to-end
cost in XLA glue (z cumsum ~0.7 ms, transposes ~0.4 ms each), vs ~16 ms
for ``jnp.repeat``.

Gating inside the kernel: a j served by an earlier block fails
``j >= prev_last``; one served by a later block sees all rows below so
the z-row select leaves INT32_MAX and the one-hot never fires (the
contribution is the 0.0 default).  Inputs of any 1-D length are
zero-padded to a block multiple; f32/f16/bf16 and sub-24-bit-int (N,)
and (N, d <= 2) payloads route here with columns FUSED into one call
(wider payloads fall back to ``jnp.repeat``, whose 2-D row form
amortises by d >= 3 — see ``_MAX_COLS``; int32/int64 user payloads are
NEVER routed: the f32 round-trip rounds values >= 2^24 — see
``_leaf_routable``); the ancestor-index vector can ride any fused call
as a near-free extra output (``repeat_with_plan_anc`` / ``_cols``),
computed in-kernel in exact ints.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["repeat_by_counts", "repeat_by_z", "make_repeat_plan",
           "make_repeat_plan_su", "repeat_with_plan",
           "repeat_with_plan_anc", "repeat_with_plan_cols"]

_C = 1024   # outputs per chunk == sources per block
_R = _C // 128


def _make_visit_kernel(P, anc, su_in=False):
    """Visit-kernel factory for ``P`` fused payloads (plus, when ``anc``,
    the ancestor-index output).

    The z-side work (jrow/valid, level-1 row count, zrow materialise,
    in-row rank, one-hot) is computed ONCE and shared by all payloads —
    each extra payload adds only its xrow materialise (R wheres) and
    one select-sum, ~43% of a standalone call.  The ancestor output is
    cheaper still: the serving source index is ``wblk*C + rb*128 + c``,
    already in hand from the select, so it costs three (1,128) int ops.

    ``su_in`` is the fused inverse-CDF mode (see
    :func:`make_repeat_plan_su`): instead of the output-index iota,
    ``jrow`` is loaded from an extra per-output-chunk block input holding
    ``bitcast(su) - 1`` and ``zT`` holds ``bitcast(cs)`` — the bitcast of
    nonnegative f32 to int32 is order-preserving, so the integer select
    body below is UNCHANGED (``cs_k < su_j`` ⟺ ``cs_b <= su_b - 1``,
    matching every ``<=`` below).  This serves inverse-CDF resampling
    directly from (sorted uniforms, cumulative weights) with no separate
    merge-rank count kernel and no materialised z."""

    def kernel(tref, wref, pref, fref, zT_ref, *refs):
        su_ref = refs[0] if su_in else None
        refs = refs[1:] if su_in else refs
        xrefs = refs[:P]
        yrefs = refs[P:2 * P]
        a_ref = refs[2 * P] if anc else None
        R = _R
        v = pl.program_id(0)
        j0 = tref[v] * _C
        plast = pref[v]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        INT_MAX = jnp.int32(2**31 - 1)
        zt = zT_ref[:]   # (128, R): source k = sr*128 + sublane
        xts = [r[:] for r in xrefs]
        rows = [[] for _ in range(P)]
        arows = []
        for og in range(R):
            if su_in:
                jrow = su_ref[og:og + 1, :]  # (1,128) bitcast(su)-1
            else:
                jrow = j0 + og * 128 + lane
            valid = jrow >= plast
            # level 1: source rows fully below j ((1,128) compares)
            rb = jnp.zeros((1, 128), jnp.int32)
            for sr in range(R):
                rb = rb + (zt[127, sr] <= jrow).astype(jnp.int32)
            # materialise the boundary row (z and every x) per output lane
            zrow = jnp.full((128, 128), INT_MAX)
            xrows = [jnp.zeros((128, 128), jnp.float32) for _ in range(P)]
            for sr in range(R):
                m = rb == sr  # (1,128) mask, broadcast down sublanes
                zrow = jnp.where(m, zt[:, sr:sr + 1], zrow)
                for p in range(P):
                    xrows[p] = jnp.where(m, xts[p][:, sr:sr + 1], xrows[p])
            # level 2: in-row rank + one-hot value select (shared)
            c = jnp.sum((zrow <= jrow).astype(jnp.int32), axis=0,
                        keepdims=True)
            onehot = (sub == c) & valid
            for p in range(P):
                rows[p].append(jnp.sum(jnp.where(onehot, xrows[p], 0.0),
                                       axis=0, keepdims=True))
            if anc:
                # rb == R means every row here is below j (served by a
                # LATER block): contribute 0, like the never-firing
                # one-hot above
                a = wref[v] * jnp.int32(_C) + rb * jnp.int32(128) + c
                arows.append(jnp.where(valid & (rb < R), a, jnp.int32(0)))
        contribs = [jnp.concatenate(r, axis=0) for r in rows]
        acontrib = jnp.concatenate(arows, axis=0) if anc else None

        @pl.when(fref[v] == 1)
        def _():
            for p in range(P):
                yrefs[p][:] = contribs[p]
            if anc:
                a_ref[:] = acontrib

        @pl.when(fref[v] == 0)
        def _():
            for p in range(P):
                yrefs[p][:] = yrefs[p][:] + contribs[p]
            if anc:
                a_ref[:] = a_ref[:] + acontrib

    return kernel


class RepeatPlan(NamedTuple):
    """Precomputed visit list + transposed z for one resampling step.

    Build once per step with :func:`make_repeat_plan`, then apply to any
    number of payloads (state columns, log-weights, ancestor iota) with
    :func:`repeat_with_plan` — the prep and the z transpose are shared.
    """

    tch: jnp.ndarray    # (NV,) output chunk of each visit
    wblk: jnp.ndarray   # (NV,) source block of each visit
    plast: jnp.ndarray  # (NV,) z before the visited block (gate + offset)
    first: jnp.ndarray  # (NV,) 1 on the first visit of each chunk
    zT: jnp.ndarray     # (Mp//128 * 128? , R) transposed padded z
    z: jnp.ndarray      # (N,) original (unpadded) z; None for su-plans
    M: int              # logical output length
    Mp: int             # padded length (multiple of _C)
    suI: jnp.ndarray = None   # su-mode: (Mp//128, 128) bitcast(su)-1
    su: jnp.ndarray = None    # su-mode: original sorted uniforms (fallback)
    cs: jnp.ndarray = None    # su-mode: original cumulative weights


def make_repeat_plan(z, M):
    """Visit-list plan for ``Y[j] = X[#{k: z_k <= j}]`` (see RepeatPlan).

    ``z`` is the inclusive cumsum of offspring counts ((N,) int32,
    nondecreasing, z[-1] == M == N required for the kernel route).
    Returns None when the kernel route is unavailable (non-TPU backend or
    M != N); callers then fall back to ``jnp.repeat``.
    """
    N = z.shape[0]
    if not (_on_tpu() and M == N and N >= _C):
        return None
    pad = (-N) % _C
    if pad:
        # padded sources absorb the padded output slots [N, N+pad)
        zp = jnp.concatenate([z, jnp.full(pad, N + pad, jnp.int32)])
    else:
        zp = z
    Mp = N + pad
    C, R = _C, _R
    nchunks = Mp // C
    nblocks = nchunks
    NV = 2 * nchunks
    zbl = zp[C - 1::C]                                  # z at block ends
    boundaries = jnp.arange(nchunks, dtype=jnp.int32) * C
    # serving block of output j = #{w: zbl[w] <= j}.  All searchsorted
    # calls are phrased as broadcast compare-and-count so XLA fuses each
    # into a single kernel (a searchsorted op breaks the fusion chain and
    # costs a separate dispatch; the tables are only nchunks long, so the
    # all-pairs compare is trivial device work).
    w_start = jnp.clip(
        jnp.sum((zbl[None, :] <= boundaries[:, None]).astype(jnp.int32),
                axis=1),
        0, nblocks - 1)
    w_end = jnp.maximum(jnp.clip(
        jnp.sum((zbl[None, :] <= boundaries[:, None] + (C - 1))
                .astype(jnp.int32), axis=1),
        0, nblocks - 1), w_start)
    cnt = w_end - w_start + 1
    s_incl = jnp.cumsum(cnt)
    s_excl = s_incl - cnt
    v = jnp.arange(NV, dtype=jnp.int32)
    tch = jnp.clip(
        jnp.sum((s_incl[None, :] <= v[:, None]).astype(jnp.int32), axis=1),
        0, nchunks - 1)
    active = v < s_incl[-1]
    wblk = jnp.clip(jnp.take(w_start, tch) + (v - jnp.take(s_excl, tch)),
                    0, nblocks - 1)
    tch = jnp.where(active, tch, nchunks - 1)
    wblk = jnp.where(active, wblk, nblocks - 1)
    plast = jnp.where(wblk >= 1, jnp.take(zbl, jnp.clip(wblk - 1, 0, None)),
                      0)
    plast = jnp.where(active, plast, jnp.int32(Mp))  # inactive: no writes
    first = jnp.concatenate([
        jnp.ones(1, jnp.int32), (tch[1:] != tch[:-1]).astype(jnp.int32)])
    zT = zp.reshape(nblocks, R, 128).swapaxes(1, 2).reshape(nblocks * 128, R)
    return RepeatPlan(tch, wblk, plast, first, zT, z, M, Mp)


def make_repeat_plan_su(su, cs, M):
    """Visit-list plan for the fused inverse-CDF serve
    ``Y[j] = X[i(j)]`` with ``i(j) = #{i: cs_i < su_j}`` — i.e.
    ``cs_{i-1} < su_j <= cs_i`` — phrased DIRECTLY on the sorted uniforms
    ``su`` and the normalised cumulative weights ``cs``, with no
    merge-rank count kernel and no materialised z (the z-form and this
    are mathematically identical: ``z_{i-1} <= j < z_i`` with
    ``z_i = #{j: su_j <= cs_i}`` says exactly ``su_j ∈ (cs_{i-1}, cs_i]``;
    reference ``resampling.py:484-509``).

    Requirements: ``su`` sorted nonnegative f32; ``cs`` nondecreasing
    nonnegative f32 with ``cs[-1] >= su[-1]`` (callers pin
    ``cs[-1] = 1.0``; Sobol/uniform draws are < 1).  All compares happen
    on int32 bitcasts — order-preserving for nonnegative f32 and exact —
    so the kernel reuses the integer two-level select unchanged with
    ``jrow := bitcast(su) - 1`` (strict/non-strict flip: ``cs < su`` ⟺
    ``cs_b <= su_b - 1``).

    Returns None when the kernel route is unavailable (non-TPU backend,
    M != N, N < 1024); callers fall back to the merge-rank z path.
    """
    N = cs.shape[0]
    if not (_on_tpu() and M == N and N >= _C and su.shape[0] == N
            and su.dtype == jnp.float32 and cs.dtype == jnp.float32):
        return None
    csb = jax.lax.bitcast_convert_type(cs, jnp.int32)
    sub = jax.lax.bitcast_convert_type(su, jnp.int32) - 1
    pad = (-N) % _C
    if pad:
        # padded outputs (su' = bitcast(2.0)-1, above every real cs <= 1)
        # are absorbed by padded sources (cs = 2.0), then sliced away
        TWO = jnp.int32(0x40000000)  # bitcast(2.0f)
        csb = jnp.concatenate([csb, jnp.full(pad, TWO, jnp.int32)])
        sub = jnp.concatenate([sub, jnp.full(pad, TWO - 1, jnp.int32)])
    Mp = N + pad
    C, R = _C, _R
    nchunks = Mp // C
    nblocks = nchunks
    NV = 2 * nchunks
    zbl = csb[C - 1::C]            # cs bitcast at block ends
    b_lo = sub[0::C]               # first su' of each output chunk
    b_hi = sub[C - 1::C]           # last su' of each output chunk
    # serving block of output j = #{w: zbl[w] <= su'_j} (rows fully
    # below); broadcast compare-and-count as in make_repeat_plan
    w_start = jnp.clip(
        jnp.sum((zbl[None, :] <= b_lo[:, None]).astype(jnp.int32), axis=1),
        0, nblocks - 1)
    w_end = jnp.maximum(jnp.clip(
        jnp.sum((zbl[None, :] <= b_hi[:, None]).astype(jnp.int32), axis=1),
        0, nblocks - 1), w_start)
    cnt = w_end - w_start + 1
    s_incl = jnp.cumsum(cnt)
    s_excl = s_incl - cnt
    v = jnp.arange(NV, dtype=jnp.int32)
    tch = jnp.clip(
        jnp.sum((s_incl[None, :] <= v[:, None]).astype(jnp.int32), axis=1),
        0, nchunks - 1)
    active = v < s_incl[-1]
    wblk = jnp.clip(jnp.take(w_start, tch) + (v - jnp.take(s_excl, tch)),
                    0, nblocks - 1)
    tch = jnp.where(active, tch, nchunks - 1)
    wblk = jnp.where(active, wblk, nblocks - 1)
    INT_MIN, INT_MAX = jnp.int32(-2**31), jnp.int32(2**31 - 1)
    plast = jnp.where(wblk >= 1, jnp.take(zbl, jnp.clip(wblk - 1, 0, None)),
                      INT_MIN)  # su' >= -1 > INT_MIN: first block all-valid
    plast = jnp.where(active, plast, INT_MAX)  # inactive: no writes
    first = jnp.concatenate([
        jnp.ones(1, jnp.int32), (tch[1:] != tch[:-1]).astype(jnp.int32)])
    zT = csb.reshape(nblocks, R, 128).swapaxes(1, 2).reshape(nblocks * 128, R)
    suI = sub.reshape(Mp // 128, 128)
    return RepeatPlan(tch, wblk, plast, first, zT, None, M, Mp,
                      suI=suI, su=su, cs=cs)


@functools.partial(jax.jit, static_argnames=("Mp", "anc"))
def _repeat_pallas_n(plan_tch, plan_wblk, plan_plast, plan_first, zT, xfs,
                     Mp, anc=False, suI=None):
    """xfs: tuple of P (Mp,) float32 payloads -> tuple of P (Mp,) served
    float32 arrays (+ one (Mp,) int32 ancestor array when ``anc``) — one
    fused pallas_call sharing the z-side select work.  When ``suI`` is
    given (su-mode, :func:`make_repeat_plan_su`) it is the
    (Mp//128, 128) per-output ``bitcast(su)-1`` table, streamed per
    output chunk in place of the output-index iota."""
    R = _R
    nblocks = Mp // _C
    NV = plan_tch.shape[0]
    P = len(xfs)
    xTs = [xf.reshape(nblocks, R, 128).swapaxes(1, 2)
           .reshape(nblocks * 128, R) for xf in xfs]
    src_spec = pl.BlockSpec((128, R), lambda v, t, w, p, f: (w[v], 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((R, 128), lambda v, t, w, p, f: (t[v], 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((Mp // 128, 128), jnp.float32)
                 for _ in range(P)]
    out_specs = [out_spec] * P
    if anc:
        out_shape.append(jax.ShapeDtypeStruct((Mp // 128, 128), jnp.int32))
        out_specs.append(out_spec)
    su_in = suI is not None
    su_args = (suI,) if su_in else ()
    # the su table rides the OUT index map (per output chunk, natural
    # orientation), between the cs/z source spec and the payload sources
    su_specs = [out_spec] if su_in else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NV,),
        in_specs=[src_spec] + su_specs + [src_spec] * P,
        out_specs=tuple(out_specs),
    )
    outs = pl.pallas_call(
        _make_visit_kernel(P, anc, su_in=su_in),
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
    )(plan_tch, plan_wblk, plan_plast, plan_first, zT, *su_args, *xTs)
    return tuple(o.reshape(-1) for o in outs)


def _on_tpu():
    from particles_tpu.ops.guard import pallas_allowed

    return pallas_allowed() and jax.default_backend() in ("tpu", "axon")


# Max trailing dim routed through the kernel (columns FUSED in one call
# sharing the z-side select — see _make_visit_kernel).  Measured on v5e
# at N=2^20 (hoisted-plan chain, value-forced, round 3): fused kernel
# 3.62 / 5.28 / 6.94 / 8.96 ms at P=1..4 (~1.7 ms marginal column, 46%
# of a solo call) vs jnp.repeat 2-D row-form 9.9 / 7.3 / 5.4 / 5.4 —
# the kernel wins at d <= 2, XLA's row-repeat amortises by d >= 3.
_MAX_COLS = 2

# Fused-call column cap: each extra column is always cheaper than a
# separate kernel launch (1.7 vs 3.6 ms), but VMEM per visit and Mosaic
# compile time grow with P — chunk larger batches.
_MAX_FUSE = 8


def _leaf_routable(x, N):
    # whitelist dtypes the f32 round-trip serves EXACTLY:
    # - extended dtypes (typed PRNG keys, e.g. SMC2's per-particle pf_key
    #   field) cannot go through the f32 select at all;
    # - int32/int64 USER values may exceed 2^24 and would be silently
    #   rounded (16777217 -> 16777216) — value ranges are unknowable at
    #   trace time, so route only sub-24-bit ints; the engine's own
    #   ancestor/iota serves are unaffected (they use the kernel's fused
    #   in-kernel int path, repeat_with_plan_anc/_cols(anc=True));
    # - float64 is never silently truncated.
    ok_dtype = (x.dtype in (jnp.int8, jnp.int16, jnp.uint8, jnp.uint16)
                or x.dtype == jnp.bool_
                or (jnp.issubdtype(x.dtype, jnp.floating)
                    and x.dtype != jnp.float64))
    return (
        ok_dtype
        and x.ndim in (1, 2)
        and (x.ndim == 1 or x.shape[1] <= _MAX_COLS)
        and x.shape[0] == N
    )


def repeat_with_plan(plan, x):
    """Apply a :class:`RepeatPlan` to one payload array.

    Routes (N,) and (N, d <= _MAX_COLS) payloads of kernel-exact dtypes
    (see ``_leaf_routable``: floats below f64, bool, sub-24-bit ints —
    NOT int32/int64) through the Pallas kernel (columns FUSED into one
    call sharing the z-side select); anything else falls back to
    ``jnp.repeat`` with counts recovered from ``plan.z`` (measured
    cheaper for d >= 3 — XLA's 2-D row-repeat amortises), or to
    searchsorted + take for su-plans (which carry no z).
    """
    N = plan.M
    if not _leaf_routable(x, N):
        if plan.z is None:  # su-plan: ancestor gather (exact, same ties)
            A = jnp.clip(
                jnp.searchsorted(plan.cs, plan.su, side="left"),
                0, N - 1).astype(jnp.int32)
            return jnp.take(x, A, axis=0)
        counts = jnp.diff(plan.z, prepend=jnp.zeros(1, jnp.int32))
        return jnp.repeat(x, counts, axis=0, total_repeat_length=plan.M)
    if x.ndim == 1:
        (out,), _ = repeat_with_plan_cols(plan, [x])
        return out
    cols, _ = repeat_with_plan_cols(plan, [x[:, j] for j in range(x.shape[1])])
    return jnp.stack(cols, axis=1)


def repeat_with_plan_anc(plan, x):
    """Serve one (N,) payload AND the ancestor-index vector
    ``A[j] = #{k: z_k <= j}`` in a single fused kernel call.

    The ancestor indices are a byproduct of the two-level select (the
    serving block/row/rank are already computed for the value one-hot),
    so this costs ~(1,128) int arithmetic on top of
    :func:`repeat_with_plan` — versus a full second kernel launch for
    ``repeat_with_plan(plan, arange(N))`` (~2.6 ms at N=2^20).

    Falls back to two plain serves when the payload is not kernel-
    routable.  Returns ``(y, A)``.
    """
    N = plan.M
    if not (x.ndim == 1 and _leaf_routable(x, N)):
        (_, A) = repeat_with_plan_cols(plan, [], want_anc=True)
        return repeat_with_plan(plan, x), A
    (y,), A = repeat_with_plan_cols(plan, [x], want_anc=True)
    return y, A


def repeat_with_plan_cols(plan, cols, want_anc=False):
    """Serve several (N,) payload columns in ONE fused kernel call
    (shared z-side select work — each extra column costs ~43% of a
    standalone call), optionally with the ancestor vector.

    ``cols`` is a sequence of kernel-routable (N,) arrays (f32/int32;
    the caller checks routability); batches larger than ``_MAX_FUSE``
    are chunked, the ancestor output riding the first chunk.  Returns
    ``(served_list, A_or_None)``.
    """
    N = plan.M
    pad = plan.Mp - N
    served, A = [], None
    for s in range(0, max(len(cols), 1), _MAX_FUSE):
        chunk = list(cols[s:s + _MAX_FUSE])
        anc_here = want_anc and s == 0
        if not chunk:
            if not anc_here:
                break
            # ancestors with no payload: a P=0 kernel instantiation skips
            # ALL payload work (xrow materialise + select-sum) — roughly
            # half the per-visit vector ops of a one-payload call
            (A,) = _repeat_pallas_n(plan.tch, plan.wblk, plan.plast,
                                    plan.first, plan.zT, (), plan.Mp,
                                    anc=True, suI=plan.suI)
            A = A[:N] if pad else A
            break
        xfs = []
        for x in chunk:
            xf = x.astype(jnp.float32)
            if pad:
                xf = jnp.concatenate([xf, jnp.zeros(pad, jnp.float32)])
            xfs.append(xf)
        outs = _repeat_pallas_n(plan.tch, plan.wblk, plan.plast,
                                plan.first, plan.zT, tuple(xfs), plan.Mp,
                                anc=anc_here, suI=plan.suI)
        if anc_here:
            A = outs[-1][:N] if pad else outs[-1]
            outs = outs[:-1]
        served.extend(
            (o[:N] if pad else o).astype(x.dtype)
            for o, x in zip(outs, chunk)
        )
    return served, A


def repeat_by_z(x, z, M):
    """``Y[j] = X[#{k: z_k <= j}]`` for inclusive count-cumsum ``z``."""
    return serve_by_z(z, M)(x)


# Element gate (N*M) for the DENSE small-N serve: below it the fallback
# serve is a broadcast compare-count ancestor vector + `jnp.take` instead
# of counts + `jnp.repeat`.  Identical outputs; chosen because `jnp.repeat`
# BATCHES CATASTROPHICALLY under vmap — the multichain-PMMH / SMC²
# inner-filter pattern (round-5 probe, v5e, Nx=100 inner step in a scan):
# repeat 87.8 us/step at nc=8 and 1681 at nc=1000, vs compare-count+take
# 20.6 / 1006 us.  (A one-hot MXU matmul serve at HIGHEST is faster still
# — 16.4 / 41 us — but is NOT inf/NaN-safe: 0*(+-inf) = NaN corrupts
# outputs whose one-hot row zeros a non-finite source, and sampler leaves
# like lpost are legitimately -inf; do not "optimise" this to a dot.)
# 2^22 keeps the dense (N, M) compare at <= 4M lanes — at N >= _C on TPU
# the Pallas plan route takes over anyway, so this mainly governs
# sub-1024-particle inner filters and small CPU cases.
_DENSE_SERVE_MAX = 2 ** 22


def dense_ancestors_by_z(z, M):
    """Sorted ancestor vector ``A[j] = #{k: z_k <= j}`` by broadcast
    compare-count — O(N*M) lanes, no gather/scatter/repeat, batches
    cleanly under vmap.  Callers gate on ``_DENSE_SERVE_MAX``."""
    j = jnp.arange(M, dtype=jnp.int32)
    A = jnp.sum((z[None, :] <= j[:, None]).astype(jnp.int32), axis=1)
    return jnp.clip(A, 0, z.shape[0] - 1)


def serve_by_z(z, M, use_pallas=True):
    """Serve *function* for the repeat-by-z problem: returns ``rep``
    mapping any leading-dim-N payload to ``Y[j] = X[#{k: z_k <= j}]``.

    The one shared dispatch for every caller that repeats several
    payloads by the same ``z`` (the engine fast path's fallback branch
    and the distributed ring drivers' per-hop serves): the Pallas
    visit-plan kernel when available; below ``_DENSE_SERVE_MAX`` the
    compare-count ancestor + ``jnp.take`` (vmap-friendly — see the gate's
    comment); else offspring counts + ``jnp.repeat``.  ``use_pallas=False``
    skips the plan attempt (e.g. when the caller already knows the kernel
    route is unavailable).
    """
    plan = make_repeat_plan(z, M) if use_pallas else None
    if plan is None:
        if z.shape[0] * M <= _DENSE_SERVE_MAX:
            A = dense_ancestors_by_z(z, M)
            return lambda leaf: jnp.take(leaf, A, axis=0)
        counts = jnp.diff(z, prepend=jnp.zeros(1, jnp.int32))
        return lambda leaf: jnp.repeat(leaf, counts, axis=0,
                                       total_repeat_length=M)
    return lambda leaf: repeat_with_plan(plan, leaf)


def ancestors_by_z(z, M):
    """Sorted ancestor vector ``A[j] = #{k: z_k <= j}`` for inclusive
    count-cumsum ``z``.

    Uses the kernel's fused IN-KERNEL int path (``want_anc`` — exact for
    any N, no f32 round-trip), falling back to the dense compare-count
    below ``_DENSE_SERVE_MAX`` and to counts + ``jnp.repeat`` above it.
    Prefer this over serving an iota payload: int32 payloads are excluded
    from the f32 route (see ``_leaf_routable``).
    """
    plan = make_repeat_plan(z, M)
    if plan is None:
        if z.shape[0] * M <= _DENSE_SERVE_MAX:
            return dense_ancestors_by_z(z, M)
        counts = jnp.diff(z, prepend=jnp.zeros(1, jnp.int32))
        return jnp.repeat(jnp.arange(z.shape[0], dtype=jnp.int32), counts,
                          axis=0, total_repeat_length=M)
    _, A = repeat_with_plan_cols(plan, [], want_anc=True)
    return A


def repeat_by_counts(x, counts, M):
    """``jnp.repeat(x, counts, axis=0, total_repeat_length=M)``, TPU-fast.

    Prefer :func:`make_repeat_plan` + :func:`repeat_with_plan` (or a
    scheme's z-formulation via ``resampling.resampling_z``) when repeating
    several payloads with the same counts — this convenience wrapper pays
    the counts->z cumsum and the plan on every call.
    """
    N = x.shape[0]
    if not (_on_tpu() and M == N and N >= _C and _leaf_routable(x, N)):
        if N * M <= _DENSE_SERVE_MAX:
            z = jnp.cumsum(counts.astype(jnp.int32))
            return jnp.take(x, dense_ancestors_by_z(z, M), axis=0)
        return jnp.repeat(x, counts, axis=0, total_repeat_length=M)
    z = jnp.cumsum(counts.astype(jnp.int32))
    return repeat_by_z(x, z, M)
