"""Pallas repeat-by-counts, v2: row-granular two-pointer merge.

V1 (`repeat_kernel.py`) compares every output chunk of C=1024 against
C=1024-wide source blocks: O(N * 2C) VPU compares (~3.9 ms at N=2^20).
V2 flattens the merge into a *work list of (output-row, source-row)
incidences at 128 granularity*: because both pointers only move forward,
there are EXACTLY 2 * N/128 incidences, each costing one 128x128
comparison tile — O(N * 256) compares, ~8x less arithmetic.

**Status: correct but SLOWER than v1 on v5e** — measured 13.5 ms/step vs
v1's 5.4 ms/step at N=2^20 inside a jitted chain: with one 128x128 tile
per grid step, the per-grid-step overhead (index-map evaluation, pipeline
bookkeeping) dominates the ~0.1 us of tile compute.  Kept as a documented
experiment; the compute-volume insight (2*N/128 incidences) is right, but
it must be exploited INSIDE a coarser grid (predicated tiles or per-chunk
work lists with cached DMA) to pay off.  See CLAUDE.md round-2 notes.

Mechanics:

* XLA prep: one small searchsorted gives each output row's first source
  row; the flattened work list (out-row ``o``, derived ``w``, previous-z
  carry ``pl``, block-first flags) is computed arithmetically and passed
  via scalar prefetch.  Padding items (the work list is padded to the
  static bound 2*N/128) carry an impossible threshold so they contribute
  zero.
* grid = one incidence per step; ``in_specs`` index-maps read the
  prefetched scalars, so Pallas pipelines the (8,128) source blocks
  automatically and revisited blocks are not re-DMA'd.
* kernel: select the source row from the transposed block (masked select,
  no dynamic slicing), one (128,128) interval mask
  ``z_{k-1} <= j < z_k`` via a sublane shift with the prefetched carry,
  reduce over sources, accumulate into the (8,128) output block
  (initialised on its first visit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["repeat_by_counts_v2"]

_RW = 128  # row width


def _kernel(o_ref, w_ref, pl_ref, first_ref, zblk, xblk, y_ref):
    s = pl.program_id(0)
    o = o_ref[s]
    w = w_ref[s]
    prev_last = pl_ref[s]
    first = first_ref[s]
    ro = o % 8
    wi = w % 8

    zt = zblk[:].T  # (128, 8)
    xt = xblk[:].T
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    sel = (col == wi).astype(jnp.int32)
    zcol = jnp.sum(zt * sel, axis=1, keepdims=True)  # (128, 1)
    self_dtype = xt.dtype
    xcol = jnp.sum(xt * sel.astype(self_dtype), axis=1, keepdims=True)

    # zprev within the row: shift down one source, carry = prev_last
    sub = jax.lax.broadcasted_iota(jnp.int32, (_RW, 1), 0)
    zshift = pltpu.roll(zcol, 1, 0)
    zprev = jnp.where(sub == 0, prev_last, zshift)

    jrow = o * _RW + jax.lax.broadcasted_iota(jnp.int32, (1, _RW), 1)
    m = (zprev <= jrow) & (zcol > jrow)  # (128 src, 128 out)
    contrib_row = jnp.sum(jnp.where(m, xcol, 0.0), axis=0, keepdims=True)

    # scatter the row into the (8, 128) output block without dynamic stores
    osub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    full = jnp.where(osub == ro, contrib_row, 0.0)

    @pl.when(first == 1)
    def _():
        y_ref[:] = full

    @pl.when(first == 0)
    def _():
        y_ref[:] = y_ref[:] + full


@functools.partial(jax.jit, static_argnames=("M",))
def _repeat_pallas_v2(x, z, M):
    nrows = M // _RW
    total = 2 * nrows

    rowq = jnp.arange(nrows + 1, dtype=jnp.int32) * _RW
    fs = jnp.searchsorted(z, rowq, side="right").astype(jnp.int32)
    srs = jnp.minimum(fs // _RW, nrows - 1)  # (nrows+1,) first src row
    nblk = jnp.diff(srs) + 1
    o = jnp.repeat(
        jnp.arange(nrows, dtype=jnp.int32), nblk, total_repeat_length=total
    )
    # item offset of row r in the flattened list:
    # cum[r] = sum_{r'<r} nblk[r'] = srs[r] - srs[0] + r
    cum = srs[:-1] - srs[0] + jnp.arange(nrows, dtype=jnp.int32)
    sidx = jnp.arange(total, dtype=jnp.int32)
    w = jnp.clip(jnp.take(srs, o) + (sidx - jnp.take(cum, o)), 0, nrows - 1)
    pl_idx = w * _RW - 1
    plv = jnp.where(
        pl_idx >= 0, jnp.take(z, jnp.clip(pl_idx, 0, None)), 0
    ).astype(jnp.int32)
    real = sidx < (srs[-1] - srs[0] + nrows)
    # padded items write to a dummy output block (sliced off afterwards);
    # their jrow >= M exceeds every z so they contribute zero there
    o = jnp.where(real, o, nrows)
    ob = o // 8
    first = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (ob[1:] != ob[:-1]).astype(jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(total,),
        in_specs=[
            pl.BlockSpec(
                (8, _RW),
                lambda s, o_r, w_r, *_: (w_r[s] // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, _RW),
                lambda s, o_r, w_r, *_: (w_r[s] // 8, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, _RW),
            lambda s, o_r, *_: (o_r[s] // 8, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((nrows + 8, _RW), jnp.float32),
        grid_spec=grid_spec,
    )(o, w, plv, first, z.reshape(-1, _RW), x.reshape(-1, _RW))
    return out[:nrows].reshape(-1)


def repeat_by_counts_v2(x, counts, M):
    if x.ndim != 1 or M != x.shape[0] or M % 1024 != 0:
        raise ValueError(
            "repeat_by_counts_v2: experimental kernel requires 1-D x with "
            "M == len(x) divisible by 1024; use ops.repeat_by_counts"
        )
    """Like ops.repeat_by_counts but with the v2 row-granular kernel."""
    z = jnp.cumsum(counts.astype(jnp.int32))
    return _repeat_pallas_v2(x.astype(jnp.float32), z, M)
