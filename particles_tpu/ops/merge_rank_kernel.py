"""Pallas TPU kernel for the sorted-merge rank count.

Computes ``z_i = #{j : su_j <= cs_i}`` for two SORTED float32 arrays — the
core of every inverse-CDF resampling formulation (multinomial / SQMC:
sorted uniforms meet the cumulative weights; reference
``resampling.py:484-509``).  The XLA formulation (two ``lax.sort``s of 2N,
``resampling._merge_rank_counts``) costs ~11 ms at N=2^20 on v5e; this
kernel streams su once against each 1024-wide cs chunk in the style of the
repeat kernel's count pass (``repeat_kernel.py``) and measures ~2 ms.

Structure (one output chunk of C=1024 cs entries per grid step):

* scalar-prefetched ``wstart``/``wend`` bound the su blocks that can
  intersect the chunk's value range [cs of previous chunk end, chunk's
  last cs]; blocks fully below contribute exactly C each (``base``),
  blocks above contribute 0;
* each candidate su block ((8, 128) rows) is DMA'd, transposed once, and
  compared against the chunk's cs rows in 8x8 static 128x128 tiles —
  Mosaic's preferred dense statically-scheduled schedule (see the v2/v3
  sparsity post-mortems in ops/).

Exactness: float32 compares are exact; the ``<=`` matches the convention
that a tied uniform counts (searchsorted side='left' on su).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["merge_rank_counts"]

_C = 1024
_R = _C // 128


def _merge_kernel(wsref, weref, su_hbm, cs_ref, z_ref, subuf, sem):
    R = _R
    t = pl.program_id(0)
    w0 = wsref[t]
    nblk = weref[t] - w0 + 1
    base = w0 * jnp.int32(_C)
    cst = cs_ref[:]  # (8, 128) cs chunk

    def body(b, cnt):
        w = w0 + b
        cp = pltpu.make_async_copy(
            su_hbm.at[pl.ds(w * R, R), :], subuf, sem
        )
        cp.start()
        cp.wait()
        sut = subuf[:].T  # (128, R): su_k with k = sr*128 + sublane
        rows = []
        for orow in range(R):
            csr = cst[orow : orow + 1, :]  # (1, 128)
            acc = jnp.zeros((1, 128), jnp.int32)
            for sr in range(R):
                suc = sut[:, sr : sr + 1]  # (128, 1)
                acc = acc + jnp.sum(
                    (suc <= csr).astype(jnp.int32), axis=0, keepdims=True
                )
            rows.append(acc)
        return cnt + jnp.concatenate(rows, axis=0)

    cnt0 = jnp.zeros((R, 128), jnp.int32)
    cnt = jax.lax.fori_loop(0, nblk, body, cnt0)
    z_ref[:] = cnt + base


@functools.partial(jax.jit, static_argnames=("N",))
def _merge_pallas(su, cs, N):
    C, R = _C, _R
    nchunks = N // C
    # lower bound per chunk: the previous chunk's last cs value — any su
    # <= it is counted by EVERY cs in this chunk (cs nondecreasing), so
    # whole blocks below contribute C each without compares
    b_lo = jnp.concatenate(
        [jnp.full((1,), -jnp.inf, jnp.float32), cs[C - 1 : -1 : C]]
    )
    first_gt = jnp.searchsorted(su, b_lo, side="right").astype(jnp.int32)
    wstart = jnp.minimum(first_gt // C, nchunks - 1)
    # upper bound: the chunk's last cs — blocks entirely above contribute 0
    cs_hi = cs[C - 1 :: C]  # (nchunks,)
    last_le = jnp.searchsorted(su, cs_hi, side="right").astype(jnp.int32) - 1
    wend = jnp.maximum(jnp.clip(last_le, 0, None) // C, wstart)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, 128), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _merge_kernel,
        out_shape=jax.ShapeDtypeStruct((nchunks * R, 128), jnp.int32),
        grid_spec=grid_spec,
    )(wstart, wend, su.reshape(-1, 128), cs.reshape(-1, 128))
    return out.reshape(-1)


def _on_tpu():
    from particles_tpu.ops.guard import pallas_allowed

    return pallas_allowed() and jax.default_backend() in ("tpu", "axon")


def merge_rank_counts(su, cs, M):
    """``z_i = #{j: su_j <= cs_i}`` for sorted float32 ``su`` (len M) and
    ``cs`` (len N), clipped to [0, M].

    Routes through the Pallas streaming kernel on TPU when both arrays
    have the same 1024-multiple length; returns None otherwise (caller
    falls back to the sort-based formulation).
    """
    N = cs.shape[0]
    if not (su.ndim == 1 and cs.ndim == 1 and su.shape[0] == N
            and su.dtype == jnp.float32 and cs.dtype == jnp.float32
            and N % _C == 0 and N >= _C and _on_tpu()):
        return None
    z = _merge_pallas(su.astype(jnp.float32), cs.astype(jnp.float32), N)
    return jnp.clip(z, 0, M)
