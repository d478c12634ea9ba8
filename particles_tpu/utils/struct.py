"""Pytree plumbing for model-like objects.

The reference library (nchopin/particles) represents models as plain Python
classes with mutable attribute dictionaries (e.g. ``StateSpaceModel.__init__``
merges ``default_params`` into ``self.__dict__``, state_space_models.py:213-216).
On TPU we need every model object — distributions, state-space models,
Feynman-Kac objects — to be a *JAX pytree* so that it can

* cross ``jit`` boundaries without retracing when only parameter *values*
  change (crucial for PMMH, where a fresh model is built every MCMC
  iteration),
* be ``vmap``-ed over a batch of parameter values (SMC², waste-free samplers),
* be carried through ``lax.scan`` / ``lax.cond``.

:class:`Pytree` is a tiny base class that auto-registers every subclass with
``jax.tree_util``.  Flattening rule:

* python ``int``, ``bool``, ``str``, ``None``, callables, and anything listed
  in the class attribute ``_static_fields`` go into hashable aux-data (they
  are *structure*: shapes, flags, function choices);
* everything else (floats, numpy/JAX arrays, nested pytrees) becomes a leaf.

This gives reference-style ergonomics (``StochVol(mu=-1., rho=.9)``) with
JAX-native semantics.
"""

from __future__ import annotations

import jax


def _is_static_value(v):
    """Values that are part of the pytree *structure* rather than data."""
    if v is None or isinstance(v, (bool, int, str, type)):
        return True
    if callable(v) and not isinstance(v, jax.Array):
        return True
    return False


class _Box:
    """Hashable wrapper marking a static aux value (identity-hashed fallback)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __hash__(self):
        try:
            return hash(self.v)
        except TypeError:
            return id(self.v)

    def __eq__(self, other):
        if not isinstance(other, _Box):
            return NotImplemented
        try:
            return bool(self.v == other.v)
        except Exception:
            return self.v is other.v


def _flatten(obj):
    d = obj.__dict__
    static_names = set(type(obj)._static_fields)
    dyn_keys, children, static_items = [], [], []
    for k in sorted(d):
        v = d[k]
        if k in static_names or _is_static_value(v):
            static_items.append((k, _Box(v)))
        else:
            dyn_keys.append(k)
            children.append(v)
    aux = (tuple(dyn_keys), tuple(static_items))
    return children, aux


def _unflatten(cls, aux, children):
    dyn_keys, static_items = aux
    obj = object.__new__(cls)
    obj.__dict__.update(zip(dyn_keys, children))
    obj.__dict__.update({k: b.v for k, b in static_items})
    return obj


class Pytree:
    """Base class: every subclass is automatically a registered JAX pytree.

    Subclasses may list attribute names in ``_static_fields`` to force them
    into (hashable) aux-data even when their value looks dynamic.
    """

    _static_fields: tuple = ()

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node(
            cls,
            _flatten,
            lambda aux, children, _cls=cls: _unflatten(_cls, aux, children),
        )

    def replace(self, **updates):
        """Return a copy of ``self`` with the given attributes replaced."""
        obj = object.__new__(type(self))
        obj.__dict__.update(self.__dict__)
        obj.__dict__.update(updates)
        return obj


class KwPytree(Pytree):
    """Pytree base whose ``__init__`` merges ``default_params`` with kwargs.

    Mirrors the parameter-merging behaviour of the reference
    ``StateSpaceModel`` (state_space_models.py:213-216): class-level
    ``default_params`` provide defaults, keyword arguments override them, and
    every parameter becomes an instance attribute (and a pytree leaf unless
    static).
    """

    default_params: dict = {}

    def __init__(self, **kwargs):
        params = dict(self.default_params)
        # Unknown kwargs are allowed (reference parity: users attach extra
        # attributes), but a near-miss of a declared parameter is almost
        # certainly a typo that would otherwise surface much later as an
        # AttributeError on the silently-kept default (e.g. MVStochVol
        # ``cov=`` instead of ``covX=``).
        if params:
            unknown = [k for k in kwargs if k not in params]
            if unknown:
                import difflib
                import warnings

                for k in unknown:
                    close = difflib.get_close_matches(k, params, n=1)
                    if close:
                        warnings.warn(
                            f"{type(self).__name__}: parameter {k!r} is not "
                            f"in default_params — did you mean {close[0]!r}?",
                            stacklevel=2,
                        )
        params.update(kwargs)
        self.__dict__.update(params)
