"""Pallas repeat-by-counts, v3: v1's coarse grid + boundary-row pruning.

Identical outer structure to v1 (`repeat_kernel.py`): one C=1024 output
chunk per grid step, scalar-prefetched source-block ranges, whole (8,128)
source blocks DMA'd and transposed once.  The inner work is pruned using
sortedness at sub-row granularity: for each 128-output group ``og``, a
source sub-row is

* *all-below*  (its largest z <= first output) -> contributes exactly 128
  to the rank counter, no compares;
* *all-above*  (its smallest z > last output) -> contributes nothing;
* *boundary*   (a contiguous run of typically 1-3 sub-rows) -> needs the
  128x128 compare tiles.

Boundary runs are walked with dynamic-bound ``fori_loop``s (sub-row
selected from the transposed block by masked select — no dynamic slicing),
cutting the average compare volume ~4x vs v1's static 8x8 tile loops.

**Status: correct but SLOWER than v1 on v5e** — 12.4 vs 5.5 ms/step at
N=2^20 in a jitted chain: 16 short dynamic fori_loops per (chunk, block)
cost more than the compares they save.  Together with v2's result this is
conclusive for this machine: Mosaic strongly favours statically-scheduled
dense tile loops over dynamic sparsity at 128-granularity, and the
(8,128) DMA alignment pins the minimum source-block width to 1024, so
v1's N*(C_out + C_src) compare volume is the practical optimum of this
kernel family.  Kept for documentation/tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["repeat_by_counts_v3"]

_C = 1024
_R = _C // 128


def _repeat_kernel(wref, plref, z_hbm, x_hbm, y_ref, zbuf, xbuf, sems):
    C, R = _C, _R
    t = pl.program_id(0)
    j0c = t * C
    w0 = wref[t]
    nblk = wref[t + 1] - w0 + 1
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    colids = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)

    def body(b, carry):
        acc, prev_last = carry
        w = w0 + b
        cp1 = pltpu.make_async_copy(
            z_hbm.at[pl.ds(w * R, R), :], zbuf, sems.at[0]
        )
        cp2 = pltpu.make_async_copy(
            x_hbm.at[pl.ds(w * R, R), :], xbuf, sems.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        zt = zbuf[:].T  # (128, R): source k = sr*128 + sublane
        xt = xbuf[:].T
        # per sub-row extremes (1, R)
        zmin = zbuf[:, 0][None, :]      # first z of each sub-row
        zmax = zbuf[:, 127][None, :]    # last z of each sub-row

        rows = []
        for og in range(R):
            j0 = j0c + og * 128
            j1 = j0 + 127
            jrow = j0 + lane_row
            valid = jrow >= prev_last
            # classify sub-rows
            below = (zmax <= j0).astype(jnp.int32)      # (1, R)
            above = (zmin > j1).astype(jnp.int32)
            n_below = jnp.sum(below)
            n_above = jnp.sum(above)
            lo = n_below                  # first boundary sub-row
            # include the first "above" row: the serving source k has
            # z_k > j, so it may sit at the start of an all-above sub-row
            hi = jnp.minimum(R - n_above + 1, R)

            # pass 1: rank counter over boundary sub-rows only
            def cnt_body(sr, cnt):
                sel = (colids == sr).astype(jnp.int32)
                zc = jnp.sum(zt * sel, axis=1, keepdims=True)  # (128, 1)
                return cnt + jnp.sum(
                    (zc <= jrow).astype(jnp.int32), axis=0, keepdims=True
                )

            cnt0 = jnp.full((1, 128), 128 * n_below, jnp.int32)
            cnt = jax.lax.fori_loop(lo, hi, cnt_body, cnt0)

            # pass 2: one-hot select over boundary sub-rows only
            def sel_body(sr, r):
                sel = (colids == sr).astype(jnp.int32)
                zc = jnp.sum(zt * sel, axis=1, keepdims=True)
                xc = jnp.sum(xt * sel.astype(xt.dtype), axis=1, keepdims=True)
                kcol = sr * 128 + sub
                m = (kcol == cnt) & valid
                del zc
                return r + jnp.sum(jnp.where(m, xc, 0.0), axis=0,
                                   keepdims=True)

            r0 = jnp.zeros((1, 128), jnp.float32)
            r = jax.lax.fori_loop(lo, hi, sel_body, r0)
            rows.append(r)
        acc = acc + jnp.concatenate(rows, axis=0)
        return acc, zbuf[R - 1, 127]

    acc0 = jnp.zeros((R, 128), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, nblk, body, (acc0, plref[t]))
    y_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("M",))
def _repeat_pallas_v3(x, z, M):
    C, R = _C, _R
    nchunks = M // C
    boundaries = jnp.arange(nchunks + 1, dtype=jnp.int32) * C
    first_src = jnp.searchsorted(z, boundaries, side="right").astype(jnp.int32)
    wstart = jnp.minimum(first_src // C, nchunks - 1)
    prev_idx = wstart * C - 1
    prevlast = jnp.where(
        prev_idx >= 0, jnp.take(z, jnp.clip(prev_idx, 0, None)), 0
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.int32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _repeat_kernel,
        out_shape=jax.ShapeDtypeStruct((nchunks * R, 128), jnp.float32),
        grid_spec=grid_spec,
    )(wstart, prevlast, z.reshape(-1, 128), x.reshape(-1, 128))
    return out.reshape(-1)


def repeat_by_counts_v3(x, counts, M):
    if x.ndim != 1 or M != x.shape[0] or M % 1024 != 0:
        raise ValueError(
            "repeat_by_counts_v3: experimental kernel requires 1-D x with "
            "M == len(x) divisible by 1024; use ops.repeat_by_counts"
        )
    z = jnp.cumsum(counts.astype(jnp.int32))
    return _repeat_pallas_v3(x.astype(jnp.float32), z, M)
