"""Particle- and run-sharded SMC over a JAX device mesh.

TPU-native replacement for the reference's parallelism story (SURVEY.md §2b):
the reference scales across CPU cores with a joblib process pool and no
inter-worker communication (``utils.py:158-202``); on TPU we scale along two
axes of a :class:`jax.sharding.Mesh`:

* ``runs`` — embarrassingly parallel replicates (the ``multiSMC`` axis):
  independent filters, zero collectives, pure throughput (DCN-safe).
* ``particles`` — one filter's N particles spread across chips (the
  interesting axis).  Per step the *only* cross-chip dependencies are
  (reference ``core.py:326-337``):

  - the log-sum-exp normaliser and ESS — scalar all-reduces, and
  - resampling — a global permutation of particles.

  We express the whole filter with ``jax.jit`` + sharding constraints and
  let GSPMD insert the collectives: reductions over the particle axis
  lower to ``psum``-style all-reduces on ICI, and the ancestor gather
  ``X[A]`` lowers to an all-to-all/collective-permute.  Between resampling
  events (adaptive ESS triggering), *no* communication happens apart from
  two scalar all-reduces per step — matching the communication lower bound
  of distributed particle filtering (Murray et al., PAPERS.md).

The entry points return results identical in distribution (and, given the
same key, bit-identical modulo reduction order) to the single-device engine:
sharding is a layout annotation, not an algorithm change.

Multichip caveat: GSPMD cannot partition a ``pallas_call``, so this
GSPMD path disables the engine's Pallas repeat kernel (plain
``jnp.repeat`` move, gathered by GSPMD).  For explicit distributed
resampling — per-shard z-form + a ``ppermute`` ring redistribution with
hand-placed collectives — use :mod:`particles_tpu.parallel.distributed`
(``run_shardmap_smc``), where each shard's local serve is Pallas-ready.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from particles_tpu import collectors as col
from particles_tpu import core
from particles_tpu import resampling as rs

__all__ = [
    "make_mesh",
    "particle_constrain",
    "run_sharded_smc",
    "run_sharded_multismc",
]


def make_mesh(n_devices=None, axis_names=("particles",), shape=None,
              devices=None):
    """Build a Mesh over the first ``n_devices`` devices.

    ``axis_names``/``shape`` allow 2-D meshes, e.g.
    ``make_mesh(8, ("runs", "particles"), (2, 4))``.
    """
    devs = list(jax.devices()) if devices is None else list(devices)
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),)
    import numpy as np

    dev_array = np.array(devs).reshape(shape)
    return Mesh(dev_array, axis_names)


def particle_constrain(mesh, axis="particles", batch_axes=()):
    """Constraint hook for the core engine: keep particles sharded on
    ``axis`` (leading particle dimension; extra leading batch axes may map
    to other mesh axes via ``batch_axes``)."""

    def constrain(X, lw):
        def c(a):
            spec = P(*batch_axes, axis, *([None] * (a.ndim - len(batch_axes) - 1)))
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, spec)
            )

        return jax.tree_util.tree_map(c, X), c(lw)

    return constrain


def run_sharded_smc(
    fk,
    N,
    key=None,
    mesh=None,
    axis="particles",
    qmc=False,
    resampling="systematic",
    ESSrmin=0.5,
    collect=None,
    store_history=False,
):
    """Run one particle filter with its N particles sharded over ``mesh``.

    Returns ``(result: SMCResult, hist)``; ``result.hist`` carries a
    ready-to-use history object (ParticleHistory for ``store_history=
    True``, rolling/partial objects for int/callable options — same as
    the single-device engine), while the second element keeps the raw
    stacked ``(X, A, lw)`` frames for back-compatibility (full history
    only).  N must be a multiple of the mesh axis size for an even layout
    (XLA pads otherwise).
    """
    key = key if key is not None else jax.random.key(0)
    summaries = col.Summaries(collect) if collect != "off" else None
    constrain = particle_constrain(mesh, axis)
    T = int(fk.T)
    hist_spec = core._hist_spec(store_history, T)

    @jax.jit
    def run(fk, key):
        return core._run_full(
            fk, key, N, T, qmc, resampling, ESSrmin, summaries,
            hist_spec, constrain,
        )

    from particles_tpu.ops import no_pallas

    with mesh, no_pallas():
        # trace inside no_pallas(): GSPMD cannot partition a pallas_call,
        # so every kernel router must take its XLA fallback here (the
        # engine's own use_pallas threading covers the repeat path; the
        # guard covers running_max / merge_rank / fused-z too)
        carry, outs, hist = run(fk, key)
    names = (
        [c.summary_name for c in summaries._collectors]
        if summaries is not None
        else []
    )
    sm = dict(zip(names, outs))
    res = core.SMCResult(carry.logLt, sm, X=carry.X, lw=carry.lw)
    if store_history is True:
        from particles_tpu.smoothing import ParticleHistory

        res.hist = ParticleHistory(fk, *hist, hilbert_ordered=qmc)
    elif isinstance(hist_spec, tuple):
        res.hist = core._windowed_hist_from_ring(store_history, hist, T)
    else:
        res.hist = None
    return res, (hist if store_history is True else None)


def run_sharded_multismc(
    fk,
    N,
    nruns,
    key=None,
    mesh=None,
    run_axis="runs",
    particle_axis="particles",
    resampling="systematic",
    ESSrmin=0.5,
):
    """``nruns`` independent filters vmapped over keys, each run sharded on
    ``run_axis`` and its particles sharded on ``particle_axis``.

    This is the 2-D scaling recipe: replicates ride the outer mesh axis
    with no communication (like the reference's process pool,
    utils.py:158-186), particles ride ICI collectives on the inner axis.
    Returns stacked per-run ``(logLts, lws)``.
    """
    key = key if key is not None else jax.random.key(0)
    keys = jax.random.split(key, nruns)
    T = int(fk.T)

    def single(fk, k):
        carry, _, _ = core._run_full(
            fk, k, N, T, False, resampling, ESSrmin, None, False, None
        )
        return carry.logLt, carry.lw

    def batched(fk, keys):
        logLts, lws = jax.vmap(single, in_axes=(None, 0))(fk, keys)
        # keep the run axis sharded across the mesh's run axis
        logLts = jax.lax.with_sharding_constraint(
            logLts, NamedSharding(mesh, P(run_axis))
        )
        lws = jax.lax.with_sharding_constraint(
            lws, NamedSharding(mesh, P(run_axis, particle_axis))
        )
        return logLts, lws

    from particles_tpu.ops import no_pallas

    run = jax.jit(batched)
    with mesh, no_pallas():  # see run_sharded_smc
        return run(fk, keys)
