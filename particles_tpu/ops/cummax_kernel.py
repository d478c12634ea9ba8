"""Pallas TPU kernel: streaming running maximum (monotonise a z-form).

Every analytic resampling z-form is built from a float32 cumsum of the
normalised weights, and XLA's parallel cumsum is not association-monotone:
at N ~ 1e6 the resulting integer z dips by 1 at a handful of indices —
a nonsense -1 offspring count and a latent wrong-output hole in the
repeat kernel's visit plan (a dip on a block boundary makes the plan's
serve ranges overlap or gap).  The z contract (resampling.resampling_z)
is therefore NONDECREASING, enforced by a running max.

XLA's ``associative_scan(maximum)`` costs ~1.56 ms at N=2^20 on v5e in
every phrasing tried (1-D, two-level 1024/128 — measured round 3); this
kernel streams the array once through a sequential grid with a carried
running max and measures ~0.1-0.2 ms:

* per (64, 128) block: 7 masked lane-rolls give each row's inclusive
  cummax, a lane reduce extracts row maxima, 6 masked sublane-rolls scan
  them across rows, and one broadcast max folds in the previous blocks'
  running max (carried in SMEM scratch — TPU grids iterate sequentially);
* total traffic = read + write (8 MB at 2^20), ~roofline.

Non-TPU backends fall back to ``jax.lax.associative_scan``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["running_max"]

_BR = 64          # rows per grid step
_INT_MIN = -(2**31)


def _cummax_kernel(z_ref, y_ref, carry):
    z = z_ref[:]                                   # (BR, 128) int32
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BR, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_BR, 128), 0)
    t = pl.program_id(0)

    # inclusive cummax along lanes within each row
    k = 1
    while k < 128:
        sh = pltpu.roll(z, k, axis=1)
        z = jnp.maximum(z, jnp.where(lane >= k, sh, jnp.int32(_INT_MIN)))
        k *= 2
    # row maxima (rows are now cummax'ed, so max = last element)
    rowlast = jnp.max(z, axis=1, keepdims=True)    # (BR, 1)
    run = rowlast
    rr = row[:, :1]
    k = 1
    while k < _BR:
        sh = pltpu.roll(run, k, axis=0)
        run = jnp.maximum(run, jnp.where(rr >= k, sh, jnp.int32(_INT_MIN)))
        k *= 2
    # exclusive prefix over rows
    excl = jnp.where(rr >= 1, pltpu.roll(run, 1, axis=0), jnp.int32(_INT_MIN))
    z = jnp.maximum(z, excl)

    # carry across blocks (sequential grid)
    @pl.when(t == 0)
    def _():
        carry[0] = jnp.int32(_INT_MIN)

    c = carry[0]
    z = jnp.maximum(z, c)
    carry[0] = jnp.maximum(c, jnp.max(run))
    y_ref[:] = z


@functools.partial(jax.jit, static_argnames=("n",))
def _running_max_pallas(z2, n):
    nsteps = z2.shape[0] // _BR
    return pl.pallas_call(
        _cummax_kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((_BR, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BR, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(z2.shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(z2)


def _on_tpu():
    from particles_tpu.ops.guard import pallas_allowed

    return pallas_allowed() and jax.default_backend() in ("tpu", "axon")


_TILE = _BR * 128


def running_max(z):
    """Inclusive running maximum of a 1-D int32 array.

    Pallas streaming kernel on TPU for (N % 8192 == 0)-sized arrays;
    ``associative_scan(maximum)`` elsewhere (bit-identical result).
    """
    n = z.shape[0]
    if not (_on_tpu() and z.ndim == 1 and z.dtype == jnp.int32
            and n % _TILE == 0 and n >= _TILE):
        return jax.lax.associative_scan(jnp.maximum, z)
    out = _running_max_pallas(z.reshape(-1, 128), n)
    return out.reshape(-1)
