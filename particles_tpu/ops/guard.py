"""Trace-time guard: disable Pallas kernel routing under GSPMD sharding.

GSPMD cannot partition a ``pallas_call`` — if a kernel custom-call is
traced into a program whose operands carry sharding constraints, XLA
either crashes at partitioning time or silently replicates the operand
(wrong + slow).  The engine threads ``use_pallas=constrain is None``
through its own fast paths, but library code deeper in the call tree
(``running_max`` inside ``_monotone_z``, ``merge_rank_counts`` inside
``multinomial_z``, the fused systematic z kernel) routes on backend
alone.  This module provides the missing ambient switch: the GSPMD
drivers trace their programs inside :func:`no_pallas`, and every kernel
router consults :func:`pallas_allowed` in its routability gate.

This mirrors the ambient ``distctx`` used for collectives: a trace-time
(not run-time) context, so it composes with ``jax.jit`` as long as
tracing happens inside the ``with`` block — which it does for the
drivers, whose jitted closures are defined and first called inside it.

Note the shard_map path does NOT need this: inside ``shard_map`` each
shard's program is a plain single-device trace, where Pallas kernels
are legal and wanted (that is the point of the ring redistribution).
"""

from __future__ import annotations

import contextlib
import threading

__all__ = ["no_pallas", "pallas_allowed"]

_state = threading.local()


def pallas_allowed():
    """True unless tracing inside a :func:`no_pallas` block."""
    return getattr(_state, "depth", 0) == 0


@contextlib.contextmanager
def no_pallas():
    """Disable Pallas kernel routing for code traced inside this block."""
    _state.depth = getattr(_state, "depth", 0) + 1
    try:
        yield
    finally:
        _state.depth -= 1
