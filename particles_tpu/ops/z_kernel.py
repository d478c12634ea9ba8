"""Pallas TPU kernel: fused systematic z-form in one streaming pass.

The systematic-resampling z-form (reference resampling.py:606-610 via the
inverse-CDF core :484-509; here resampling.systematic_z) is

    z_i = clip(floor(M * cs_i - u) + 1, 0, M),   cs = normalised cumsum(W)

followed by a mandatory running max: a float32 parallel cumsum is not
association-monotone, so z can dip by 1 (a nonsense -1 offspring count
and a latent hole in the repeat kernel's visit plan — see
ops/cummax_kernel.py).  Computed in XLA + the streaming cummax kernel
this costs ~1.0 ms at N=2^20 (cumsum ~0.66 ms — log-passes, not
bandwidth — plus ~0.375 ms cummax).

This kernel removes the monotonisation problem instead of patching it:

1. quantise the weights to int32 fixed point, ``q_i = round(W_i *
   2^30 / S)`` with ``S = sum(W)`` (one XLA reduce, prefetched as a
   scalar) — the int cumsum is then EXACT, hence strictly nondecreasing;
2. lane/sublane-doubling inclusive int cumsum per (64, 128) block with
   an SMEM-carried running prefix (TPU grids iterate sequentially);
3. the affine floor transform ``floor(M * (float(csq) * 2^-30) - u) + 1``
   — every stage (int→f32 convert, multiply by a positive constant,
   subtract a constant, floor) is monotone, so the output is
   nondecreasing BY CONSTRUCTION and the cummax wave disappears.

Accuracy: the quantisation perturbs each weight by at most 2^-31
absolute, and the CDF is normalised by the QUANTISED total (one more
XLA reduce) so round-to-zero of sub-ulp weights is renormalised rather
than accumulating as a systematic shift; the exact int cumsum then
carries only random-walk rounding error (~sqrt(N) * 2^-31, i.e. z
within +-1 of the float64 answer at N=2^20 even under heavy weight
degeneracy — measured; the f32-cumsum path it replaces is in the same
+-1 band).

Requires W >= 0 (normalised weights): block row totals are then the
LAST element of each cumsum'ed row, read with a lane max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["systematic_z_fused", "normalised_cumsum_exact"]

_BR = 64                  # sublane rows per grid step
_SCALE = float(1 << 30)   # fixed-point grid


def _block_int_cumsum(w, scale, carry, t):
    """Exact int32 inclusive cumsum of a (BR, 128) f32 block of
    nonnegative weights quantised as ``round(w * scale)``, flattened
    row-major, with an SMEM-carried running prefix over the sequential
    TPU grid.  Hillis-Steele lane then sublane doubling via masked
    ``pltpu.roll`` (reshapes are forbidden in Mosaic — see CLAUDE.md)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BR, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_BR, 128), 0)

    q = jnp.round(w * scale).astype(jnp.int32)        # fixed-point weights
    # inclusive cumsum along lanes (exact in int32)
    k = 1
    while k < 128:
        sh = pltpu.roll(q, k, axis=1)
        q = q + jnp.where(lane >= k, sh, jnp.int32(0))
        k *= 2
    # row totals = last lane (q nondecreasing within a row since w >= 0)
    rowtot = jnp.max(q, axis=1, keepdims=True)        # (BR, 1)
    run = rowtot
    rr = row[:, :1]
    k = 1
    while k < _BR:
        sh = pltpu.roll(run, k, axis=0)
        run = run + jnp.where(rr >= k, sh, jnp.int32(0))
        k *= 2
    excl = jnp.where(rr >= 1, pltpu.roll(run, 1, axis=0), jnp.int32(0))
    q = q + excl

    @pl.when(t == 0)
    def _():
        carry[0] = jnp.int32(0)

    c = carry[0]
    q = q + c
    carry[0] = c + jnp.max(run)                       # block total (w >= 0)
    return q


def _z_kernel(sc_ref, w_ref, z_ref, carry, *, M):
    t = pl.program_id(0)
    scale = sc_ref[0]      # 2^30 / S
    minv = sc_ref[1]       # M / quantised total
    u = sc_ref[2]
    q = _block_int_cumsum(w_ref[:], scale, carry, t)
    # monotone transform: int -> f32 convert, * positive const, - const,
    # floor — each stage preserves the (exact) int ordering
    z = (jnp.floor(q.astype(jnp.float32) * minv - u).astype(jnp.int32)
         + jnp.int32(1))
    z_ref[:] = jnp.clip(z, 0, M)


def _cs_kernel(sc_ref, w_ref, cs_ref, carry):
    t = pl.program_id(0)
    q = _block_int_cumsum(w_ref[:], sc_ref[0], carry, t)
    # int -> f32 convert then * positive const: both monotone, so cs is
    # nondecreasing BY CONSTRUCTION
    cs_ref[:] = q.astype(jnp.float32) * sc_ref[1]


@functools.partial(jax.jit, static_argnames=("M",))
def _z_pallas(w2, scale, minv, u, M):
    nsteps = w2.shape[0] // _BR
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((_BR, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BR, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_z_kernel, M=M),
        out_shape=jax.ShapeDtypeStruct(w2.shape, jnp.int32),
        grid_spec=grid_spec,
    )(jnp.stack([scale, minv, u]), w2)


@jax.jit
def _cs_pallas(w2, scale, inv_qtotal):
    nsteps = w2.shape[0] // _BR
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((_BR, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BR, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    return pl.pallas_call(
        _cs_kernel,
        out_shape=jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        grid_spec=grid_spec,
    )(jnp.stack([scale, inv_qtotal]), w2)


def _on_tpu():
    from particles_tpu.ops.guard import pallas_allowed

    return pallas_allowed() and jax.default_backend() in ("tpu", "axon")


_TILE = _BR * 128


def systematic_z_fused(W, u, M):
    """Systematic z-form of weights ``W`` with uniform ``u``: (N,) int32
    nondecreasing with z[-1] == M, in ONE streaming pass (plus one XLA
    sum for the normaliser).

    Returns None when not routable (not on TPU, N not a multiple of
    8192, wrong dtype/rank) — the caller falls back to the XLA
    cumsum + cummax path.
    """
    N = W.shape[0]
    if not (_on_tpu() and W.ndim == 1 and W.dtype == jnp.float32
            and N % _TILE == 0 and N >= _TILE):
        return None
    S = jnp.sum(W)
    scale = jnp.float32(_SCALE) / jnp.maximum(S, jnp.float32(1e-37))
    # normalise by the QUANTISED total: weights below half an ulp of the
    # fixed-point grid round to zero, and dividing by 2^30 would leave
    # that lost mass un-renormalised (a systematic z shift of
    # M * lost_mass under heavy weight degeneracy)
    q_total = jnp.sum(jnp.round(W * scale).astype(jnp.int32))
    minv = jnp.float32(M) / jnp.maximum(
        q_total.astype(jnp.float32), jnp.float32(1.0))
    z = _z_pallas(W.reshape(-1, 128), scale, minv,
                  jnp.asarray(u, jnp.float32), M)
    return z.reshape(-1).at[-1].set(M)


def normalised_cumsum_exact(W):
    """Monotone normalised cumulative weights ``cs`` in ONE streaming
    pass: exact int32 fixed-point cumsum (2^30 grid, SMEM-carried
    prefix) converted to f32 and scaled by 1/quantised-total — every
    stage monotone, so ``cs`` is nondecreasing BY CONSTRUCTION (callers
    may skip the cummax wave that guards XLA's association-sensitive f32
    cumsum).  ``cs[-1]`` is 1.0 to within one f32 ulp; callers that need
    an exact top pin it themselves (the z-form convention is
    ``z.at[-1].set(M)``).

    Accuracy matches :func:`systematic_z_fused`: each weight is
    perturbed by <= 2^-31 absolute and the quantised-total
    renormalisation keeps sub-ulp truncation from shifting the CDF
    systematically.

    Returns None when not routable (not on TPU / guard active, N not a
    multiple of 8192, wrong dtype/rank) — callers fall back to
    ``cumsum + cummax``.
    """
    N = W.shape[0]
    if not (_on_tpu() and W.ndim == 1 and W.dtype == jnp.float32
            and N % _TILE == 0 and N >= _TILE):
        return None
    S = jnp.sum(W)
    scale = jnp.float32(_SCALE) / jnp.maximum(S, jnp.float32(1e-37))
    q_total = jnp.sum(jnp.round(W * scale).astype(jnp.int32))
    inv = jnp.float32(1.0) / jnp.maximum(
        q_total.astype(jnp.float32), jnp.float32(1.0))
    return _cs_pallas(W.reshape(-1, 128), scale, inv).reshape(-1)
