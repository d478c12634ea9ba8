"""Single-run variance estimators based on genealogy tracking.

Counterpart of reference ``variance_estimators.py``: the Chan & Lai (2013) /
Lee & Whiteley (2018) estimators via eve variables (``var_estimate``
variance_estimators.py:93-130, numba ``_sum_over_branches`` :133-139 →
``segment_sum``-style scatter-add here), and the lag-based variant of
Olsson & Douc (2019) (:182-201).

Eve variables are collector state threaded through the scan (the reference's
``VarColMixin.update_B``, :142-147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from particles_tpu import collectors as col

__all__ = ["var_estimate", "Var", "Var_logLt", "Lag_based_var", "VarColMixin"]


def _sum_over_branches(w_phi, B):
    """sum_n (sum_{m: B[m]=n} w_phi[m])^2 — the numba kernel
    (variance_estimators.py:133-139) as a scatter-add (segment sum)."""
    N = w_phi.shape[0]
    s = jnp.zeros_like(w_phi).at[B].add(w_phi)
    return jnp.sum(s**2, axis=0)


def var_estimate(W, phi_x, B):
    """Chan & Lai (2013) genealogy-based variance estimate
    (reference variance_estimators.py:93-130).

    Returns 0 when the genealogy has fully coalesced (B constant), like the
    reference — but as a masked select (jit-compatible).
    """
    phi_x = jnp.asarray(phi_x)
    if phi_x.ndim == 2:
        m = jnp.sum(W[:, None] * phi_x, axis=0)
        w_phi = W[:, None] * (phi_x - m)
    else:
        m = jnp.sum(W * phi_x)
        w_phi = W * (phi_x - m)
    out = _sum_over_branches(w_phi, B)
    collapsed = jnp.all(B == B[0])  # all eve variables identical
    return jnp.where(collapsed, jnp.zeros_like(out), out)


class _EveMixin:
    """Eve-variable tracking as collector state
    (reference VarColMixin, variance_estimators.py:142-147)."""

    stateful = True

    def init(self, view):
        B = jnp.arange(view.N, dtype=jnp.int32)
        return B, self._fetch(view, B)

    def step(self, view, B):
        B = jnp.take(B, view.A)
        return B, self._fetch(view, B)


class Var(_EveMixin, col.Collector):
    """Variance estimates for a test function phi
    (reference variance_estimators.py:150-169)."""

    summary_name = "var"
    signature = {"phi": None}

    def test_func(self, x):
        return x if self.phi is None else self.phi(x)

    def _fetch(self, view, B):
        return var_estimate(view.wgts.W, self.test_func(view.X), B)


class Var_logLt(_EveMixin, col.Collector):
    """Variance estimate of the logLt estimator
    (reference variance_estimators.py:172-179)."""

    summary_name = "var_logLt"

    def _fetch(self, view, B):
        return _sum_over_branches(view.wgts.W, B)


class Lag_based_var(col.Collector):
    """Olsson & Douc (2019) lag-based variance estimates over a rolling
    window (reference variance_estimators.py:182-201).

    Returns, at each t, a (lag+1,) array whose element i is the estimate
    based on lag i (the reference returns a list).
    """

    summary_name = "lag_based_var"
    signature = {"phi": None, "lag": 5}
    stateful = True

    def test_func(self, x):
        return x if self.phi is None else self.phi(x)

    def _estimates(self, view, Abuf):
        # window genealogy: B[i] = slot-i ancestors of current particles.
        # Abuf holds the last `lag` ancestor vectors — exactly the rows
        # the backward composition consumes (a (lag+1)-row ring would
        # thread a dead row through every scan step)
        def body(B_next, A_t1):
            B_t = jnp.take(A_t1, B_next)
            return B_t, B_t

        B_last = jnp.arange(view.N, dtype=jnp.int32)
        _, B_rev = jax.lax.scan(body, B_last, Abuf[::-1])
        B = jnp.concatenate([B_rev[::-1], B_last[None]], axis=0)
        phi_x = self.test_func(view.X)
        ests = jax.vmap(lambda Bt: var_estimate(view.wgts.W, phi_x, Bt))(B)
        return ests[::-1]  # element i = lag-i estimate

    def init(self, view):
        Abuf = jnp.broadcast_to(
            jnp.arange(view.N, dtype=jnp.int32), (self.lag, view.N)
        ).copy()
        return Abuf, self._estimates(view, Abuf)

    def step(self, view, Abuf):
        Abuf = jnp.concatenate([Abuf[1:], view.A[None]], axis=0)
        return Abuf, self._estimates(view, Abuf)


# reference-name alias (variance_estimators.py:142-147)
VarColMixin = _EveMixin
