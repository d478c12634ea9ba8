"""On-line summary collectors.

Counterpart of reference ``collectors.py`` (collectors.py:215-449).  A
collector is a pure function of the per-step state view: inside the scanned
engine its outputs are stacked over time by ``lax.scan`` (no Python-list
mutation); in step-by-step mode the :class:`Summaries` object accumulates
host-side.  Defaults (always on unless ``collect='off'``): ESS, logLt and the
resampling flag (reference collectors.py:278-295).

The state view passed to ``collect`` mimics the attributes collectors read
from the reference ``SMC`` object: ``t, X, Xp, A, wgts, aux, W, rs_flag,
logLt, loglt, fk, N``.
"""

from __future__ import annotations

import jax.numpy as jnp

from particles_tpu import resampling as rs
from particles_tpu.utils.struct import Pytree

__all__ = [
    "Collector",
    "Summaries",
    "ESSs",
    "LogLts",
    "Rs_flags",
    "Moments",
    "default_collector_cls",
]


class Collector(Pytree):
    """Base class for collectors (reference collectors.py:234-271).

    Subclasses define ``summary_name`` and ``collect(view) -> pytree``;
    keyword arguments declared in class attribute ``signature`` are stored as
    attributes (mirroring the reference's signature/clone protocol).
    """

    signature = {}

    @property
    def summary_name(self):
        cn = self.__class__.__name__
        return cn[0].lower() + cn[1:] if cn[0].isupper() and cn[1:2].islower() else cn

    def __init__(self, **kwargs):
        params = dict(self.signature)
        params.update(kwargs)
        for k, v in params.items():
            setattr(self, k, v)

    def collect(self, view):
        raise NotImplementedError


class ESSs(Collector):
    """Effective sample size at each t (reference collectors.py:278-283)."""

    summary_name = "ESSs"

    def collect(self, view):
        return view.wgts.ESS


class LogLts(Collector):
    """Cumulative log-likelihood estimate at each t (collectors.py:285-288)."""

    summary_name = "logLts"

    def collect(self, view):
        return view.logLt


class Rs_flags(Collector):
    """Whether resampling happened at each t (collectors.py:290-293)."""

    summary_name = "rs_flags"

    def collect(self, view):
        return view.rs_flag


class Moments(Collector):
    """Weighted moments of the particle cloud at each t (collectors.py:301-322).

    Uses ``fk.default_moments`` unless a custom ``mom_func`` is provided.
    """

    summary_name = "moments"
    signature = {"mom_func": None}

    def collect(self, view):
        f = view.fk.default_moments if self.mom_func is None else self.mom_func
        return f(view.wgts.W, view.X)


default_collector_cls = [ESSs, LogLts, Rs_flags]


class Summaries:
    """Container of per-run summaries (reference collectors.py:215-231).

    After a run, each collector's stacked output is available as an
    attribute, e.g. ``smc.summaries.ESSs`` (a (T,) array), exactly like the
    reference (modulo array-vs-list).
    """

    def __init__(self, cols):
        self._collectors = [cls() for cls in default_collector_cls]
        if cols is not None:
            # cols is a list of collector *instances* (reference convention)
            self._collectors.extend(
                c if isinstance(c, Collector) else c() for c in cols
            )
        for col in self._collectors:
            setattr(self, col.summary_name, [])

    def collect_step(self, view):
        """Pure: returns the tuple of all collector outputs for this step."""
        return tuple(col.collect(view) for col in self._collectors)

    def assign_stacked(self, stacked):
        """Install scan-stacked outputs as attributes (scan mode)."""
        for col, out in zip(self._collectors, stacked):
            setattr(self, col.summary_name, out)

    def append_step(self, outputs):
        """Append one step's outputs (step-by-step mode)."""
        for col, out in zip(self._collectors, outputs):
            getattr(self, col.summary_name).append(out)

    def finalize_lists(self):
        """Stack host-accumulated lists into arrays where possible."""
        for col in self._collectors:
            val = getattr(self, col.summary_name)
            if isinstance(val, list) and val and isinstance(val[0], jnp.ndarray):
                try:
                    setattr(self, col.summary_name, jnp.stack(val))
                except (ValueError, TypeError):
                    pass
