"""Pallas kernel: repeat-by-counts (the resampling particle move).

The particle move of every sorted-ancestor resampling scheme is
``Y[j] = X[i(j)]`` with ``i(j) = #{k : z_k <= j}`` where ``z`` is the
inclusive cumulative sum of offspring counts — the parallel form of the
reference's sequential numba two-pointer ``inverse_cdf`` kernel
(resampling.py:484-509).

XLA's general gather/scatter run at ~60M elem/s on TPU (measured on v5e),
making ``jnp.repeat`` the dominant cost of a resampling step at N=1e6
(~16 ms/step).  This kernel performs a *block-aligned two-pointer merge*:

* the output is produced in C=1024-sized chunks, one grid step each;
* a cheap XLA-side ``searchsorted`` over the chunk boundaries (N/C queries)
  gives, per chunk, the first source block it needs and the previous
  block's last ``z`` — passed via scalar prefetch, so the kernel loops over
  a *bounded, known* number of source blocks (no data-dependent while);
* each (chunk, block) pair is expanded with 128x128 comparison tiles in
  two passes (count pass: ``cnt[j] = #{k in block: z_k <= j}``; select
  pass: output j takes in-block source ``cnt[j]`` unless already served by
  an earlier block, ``j < prev_last``) — all shapes native (8,128)-tiled,
  data transposed once per block.

Both pointers only move forward, so total work is O(N*(C_out + C_src))
VPU compares + two linear HBM streams.  Honest timing (forcing the value
to host; the axon tunnel's block_until_ready is unreliable) at N=2^20 on
v5e: ~3.9 ms vs ~16 ms for ``jnp.repeat`` (~4x), matching the VPU
roofline of the N*C compare volume.  Next optimisation (round 2): per-row
source windows (C_src=128 against each 128-output row, staged through the
1024-wide DMA block) cuts the compare volume ~4x again.  Inputs of any
1-D length are zero-padded to a block multiple; only the (N,) float32 /
int32 case is routed here (other shapes fall back to ``jnp.repeat``,
amortised over the d state columns).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["repeat_by_counts"]

_C = 1024   # chunk/block size (outputs per grid step, sources per DMA)
_R = _C // 128


def _repeat_kernel(wref, plref, z_hbm, x_hbm, y_ref, zbuf, xbuf, sems):
    """One output chunk per grid step (see module docstring)."""
    C, R = _C, _R
    t = pl.program_id(0)
    j0 = t * C
    w0 = wref[t]
    nblk = wref[t + 1] - w0 + 1
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

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
        # pass 1: local source rank per output group
        cnts = []
        for og in range(R):
            jrow = j0 + og * 128 + lane_row
            cnt = jnp.zeros((1, 128), jnp.int32)
            for sr in range(R):
                zc = zt[:, sr : sr + 1]
                cnt = cnt + jnp.sum(
                    (zc <= jrow).astype(jnp.int32), axis=0, keepdims=True
                )
            cnts.append(cnt)
        # pass 2: one-hot select
        rows = []
        for og in range(R):
            jrow = j0 + og * 128 + lane_row
            valid = jrow >= prev_last
            r = jnp.zeros((1, 128), jnp.float32)
            for sr in range(R):
                zc = zt[:, sr : sr + 1]
                xc = xt[:, sr : sr + 1]
                kcol = sr * 128 + sub
                m = (kcol == cnts[og]) & valid
                r = r + jnp.sum(jnp.where(m, xc, 0.0), axis=0, keepdims=True)
            rows.append(r)
        acc = acc + jnp.concatenate(rows, axis=0)
        return acc, zbuf[R - 1, 127]

    acc0 = jnp.zeros((R, 128), jnp.float32)
    acc, _ = jax.lax.fori_loop(0, nblk, body, (acc0, plref[t]))
    y_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("M",))
def _repeat_pallas(x, z, M):
    """x (M,) float32, z (M,) int32 nondecreasing with z[-1] == M."""
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


def _on_tpu():
    return jax.default_backend() in ("tpu", "axon")


# Max trailing dim routed column-wise through the kernel.  Measured on v5e
# at N=2^20 (jitted resample+move chain, value-forced): per-column kernel
# vs row-gather jnp.repeat = 9.0 vs 16.1 ms (d=2), 12.5 vs 16.1 (d=3),
# 15.7 vs 16.1 (d=4, a wash) -> route d <= 3.
_MAX_COLS = 3


def _repeat_1d(xf, z, N):
    pad = (-N) % _C
    if pad:
        # padded sources get zero offspring for outputs < N; one dummy source
        # absorbs the padded output slots
        xf = jnp.concatenate([xf, jnp.zeros(pad, jnp.float32)])
        zp = jnp.concatenate([z, jnp.full(pad, N + pad, jnp.int32)])
        return _repeat_pallas(xf, zp, N + pad)[:N]
    return _repeat_pallas(xf, z, N)


def repeat_by_counts(x, counts, M):
    """``jnp.repeat(x, counts, axis=0, total_repeat_length=M)``, TPU-fast.

    Routes 1-D float32/int32 inputs with M == N through the Pallas
    streaming-merge kernel on TPU (padding to the block size), and (N, d)
    inputs with d <= 3 column-by-column (the kernel beats the XLA row
    gather up to d = 3; see ``_MAX_COLS``).  All other cases fall back to
    ``jnp.repeat``.
    """
    N = x.shape[0]
    is_int = jnp.issubdtype(x.dtype, jnp.integer)
    is_f64 = x.dtype == jnp.float64
    routable = (
        x.ndim in (1, 2)
        and (x.ndim == 1 or x.shape[1] <= _MAX_COLS)
        and M == N
        and N >= _C
        and _on_tpu()
        and not (is_int and N >= 2**24)  # float32 routing only exact < 2^24
        and not is_f64  # kernel is float32; never silently truncate x64
    )
    if not routable:
        return jnp.repeat(x, counts, axis=0, total_repeat_length=M)
    z = jnp.cumsum(counts.astype(jnp.int32))
    if x.ndim == 1:
        out = _repeat_1d(x.astype(jnp.float32), z, N)
    else:
        out = jnp.stack(
            [_repeat_1d(x[:, j].astype(jnp.float32), z, N)
             for j in range(x.shape[1])],
            axis=1,
        )
    return out.astype(x.dtype)
