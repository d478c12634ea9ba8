"""Ambient distributed-execution context for the SMC engine.

The TPU-native multichip design (SURVEY.md §2b) runs the SAME engine code
(`core._step0` / `core._step` / `core._run_full`) both single-device and
inside ``jax.shard_map`` over a particle-sharded mesh.  What changes under
sharding is not the algorithm but three primitives:

* weight reductions (log-normaliser, ESS, weighted moments) become
  cross-shard collectives (``pmax`` / ``psum`` over the particle axis),
* resampling becomes the ring redistribution
  (:func:`particles_tpu.parallel.distributed.ring_systematic_resample`),
* model-sampling keys are folded with the shard index (the carry key stays
  replicated so resampling uniforms and branch decisions agree everywhere).

Rather than threading a ``dist`` argument through every signature, the
engine and the numerics layer consult this module's *ambient context*: the
shard_map driver wraps the traced body in :func:`dist_context`, and —
because everything under ``jit``/``shard_map`` is traced exactly once —
the Python-level context cleanly parameterises the traced program.  No
context means single-device semantics, bit-identical to previous rounds.

The reference has no counterpart (its parallelism is a communication-free
joblib pool, utils.py:158-186).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import NamedTuple

__all__ = ["DistCtx", "dist_context", "local_context", "current"]


class DistCtx(NamedTuple):
    """Particle-axis sharding description seen by the engine at trace time.

    ``axis``: the shard_map mesh axis name the particle dimension rides on.
    ``D``: static number of shards (mesh axis size).  Arrays inside the
    context hold the per-shard slice (``N_local``); global particle counts
    are ``N_local * D``.
    """

    axis: str
    D: int


_state = threading.local()


def current():
    """The active :class:`DistCtx`, or None (single-device semantics)."""
    return getattr(_state, "ctx", None)


@contextmanager
def dist_context(axis, D):
    """Activate a distributed context while tracing a shard_map body."""
    prev = getattr(_state, "ctx", None)
    _state.ctx = DistCtx(str(axis), int(D))
    try:
        yield _state.ctx
    finally:
        _state.ctx = prev


@contextmanager
def local_context():
    """Temporarily SUPPRESS the ambient context (single-device semantics)
    while tracing strictly per-particle inner computations.

    SMC²'s inner particle filters are the motivating case: each
    theta-particle carries its own (Nx,) bootstrap filter whose weight
    reductions (``Weights``/``log_mean_exp`` over the Nx axis) are local
    to that theta by construction — under a live :func:`dist_context`
    the dist-aware numerics layer would turn them into cross-shard
    psums, silently summing INDEPENDENT inner filters across devices.
    Wrapping the vmapped inner-step call in ``local_context()`` restores
    single-device semantics for exactly that trace region.
    """
    prev = getattr(_state, "ctx", None)
    _state.ctx = None
    try:
        yield
    finally:
        _state.ctx = prev
