"""Utilities: timing, experiment multiplexing, pytree plumbing.

Counterpart of reference ``utils.py`` (timer decorator utils.py:81-89,
multiplexer utils.py:216-269, distinct_seeds utils.py:189-202).  On TPU the
multi-run parallelism story changes completely: instead of joblib process
pools with stratified seeds, runs are vmapped over ``jax.random.split`` keys
(embarrassingly parallel on-device) — see :func:`particles_tpu.core.multiSMC`.
"""

from __future__ import annotations

import functools
import itertools
import time

import jax

from particles_tpu.utils.struct import KwPytree, Pytree  # noqa: F401

__all__ = ["timer", "cartesian_args", "cartesian_lists", "add_to_dict",
           "multiplexer", "distinct_seeds", "distribute_work", "worker",
           "seeder", "Pytree", "KwPytree"]


def timer(method):
    """Decorator: store wall-clock time of ``method`` in ``self.cpu_time``.

    Parity with reference ``utils.timer`` (utils.py:81-89).  Forces the
    result to host so asynchronous dispatch does not hide device time —
    via value transfer, NOT ``jax.block_until_ready`` (which can return
    early on the axon TPU tunnel; see CLAUDE.md).
    """

    def _force(a):
        import numpy as np

        try:
            np.asarray(a)  # value transfer == real synchronisation
        except Exception:
            pass  # non-array leaf (e.g. typed PRNG key): nothing to force
        return a

    @functools.wraps(method)
    def timed_method(self, *args, **kwargs):
        starting_time = time.perf_counter()
        out = method(self, *args, **kwargs)
        target = out if out is not None else getattr(self, "logLt", None)
        if target is not None:
            jax.tree_util.tree_map(_force, target)
        self.cpu_time = time.perf_counter() - starting_time
        return out

    return timed_method


def add_to_dict(d, obj, key="output"):
    """Return a copy of dict ``d`` with ``obj`` stored under ``key``
    (reference utils.py:205-208)."""
    d = dict(d)
    d[key] = obj
    return d


def cartesian_args(args):
    """Expand dict/list-valued options into a list of flat option dicts.

    Mirrors the cartesian-product behaviour of the reference ``multiplexer``
    (utils.py:216-269): a value that is a list produces one run per element;
    a value that is a dict produces one run per (name, value) pair, with the
    *name* recorded in the output dict (so models can be labelled).
    Scalar values are broadcast.
    """
    fixed, varying = {}, {}
    for k, v in args.items():
        if isinstance(v, list):
            varying[k] = [(val, val) for val in v]
        elif isinstance(v, dict):
            varying[k] = [(name, val) for name, val in v.items()]
        else:
            fixed[k] = v
    if not varying:
        return [dict(fixed)], [dict(fixed)]
    names = list(varying)
    labels_list, values_list = [], []
    for combo in itertools.product(*(varying[k] for k in names)):
        labels = dict(fixed)
        values = dict(fixed)
        for k, (label, val) in zip(names, combo):
            labels[k] = label
            values[k] = val
        labels_list.append(labels)
        values_list.append(values)
    return labels_list, values_list


def cartesian_lists(d):
    """Turn a dict of lists into the list of dicts of their cartesian
    product (reference utils.py:92-107).

    ``cartesian_lists({'a': [0, 2], 'b': [3, 4]})`` returns
    ``[{'a': 0, 'b': 3}, {'a': 0, 'b': 4}, {'a': 2, 'b': 3},
    {'a': 2, 'b': 4}]``.
    """
    return [
        {k: v for k, v in zip(d.keys(), args)}
        for args in itertools.product(*d.values())
    ]


def worker(qin, qout, f):
    """Queue worker (reference utils.py:145-155): repeatedly pull
    ``(i, args)`` from ``qin`` and push ``(i, f(**args))`` to ``qout``
    until a ``(None, None)`` sentinel arrives."""
    while True:
        i, args = qin.get()
        if i is None and args is None:
            break
        qout.put((i, f(**args)))


def distribute_work(f, inputs, outputs=None, nprocs=1, out_key="output"):
    """Evaluate ``f(**i)`` for each dict ``i`` in ``inputs``
    (reference utils.py:158-186).

    Returns a list of dicts: each input dict (or the matching entry of
    ``outputs``) updated with the result under ``out_key`` (or merged, if
    the result is itself a dict).  The reference fans out over a joblib
    process pool for ``nprocs > 1``; here ``nprocs`` is accepted for API
    compatibility but work runs sequentially in-process — on TPU the
    scalable multi-run path is batching whole runs on-device
    (``multiSMC``/vmap), not host processes competing for one chip.
    """
    del nprocs
    if outputs is None:
        outputs = [dict(ip) for ip in inputs]
    res = []
    for ip, op in zip(inputs, outputs):
        out = f(**ip)
        op = dict(op)
        if isinstance(out, dict):
            op.update(out)
        else:
            op[out_key] = out
        res.append(op)
    return res


class seeder:
    """Wrap ``f`` so a ``seed`` keyword becomes an explicit PRNG ``key``
    (reference utils.py:205-213 seeds numpy's global RNG; jax has no
    global RNG, so ``seed`` is translated to ``key=jax.random.key(seed)``
    unless the caller already passed a key)."""

    def __init__(self, func):
        self.func = func
        functools.update_wrapper(self, func)

    def __call__(self, **kwargs):
        seed = kwargs.pop("seed", None)
        if seed is not None and "key" not in kwargs:
            kwargs["key"] = jax.random.key(seed)
        return self.func(**kwargs)


def multiplexer(f=None, nruns=1, seeding=None, key=None, nprocs=0,
                protected_args=None, **args):
    """Run function ``f`` over a cartesian product of options x ``nruns``
    replicates (reference ``utils.multiplexer``, utils.py:216-269).

    TPU-native differences: randomness is explicit — each call receives a
    distinct ``key`` keyword (replacing the reference's stratified
    ``distinct_seeds`` + joblib workers, utils.py:158-202); ``nprocs`` and
    ``seeding`` are accepted for API compatibility and ignored (replicates
    are independent device computations).  Any list-valued keyword produces
    one run per element; dict-valued keywords contribute their keys as
    labels.  Returns a list of dicts with the varying options, ``'run'``
    and ``'output'``.
    """
    import jax as _jax

    del seeding, nprocs
    if f is None:
        raise ValueError("multiplexer: you must provide a function f")
    protected = protected_args or {}
    labels_list, values_list = cartesian_args(args)
    key = key if key is not None else _jax.random.key(0)
    keys = _jax.random.split(key, nruns)
    results = []
    varying = [k for k, v in args.items() if isinstance(v, (list, dict))]
    for labels, values in zip(labels_list, values_list):
        for r in range(nruns):
            out = f(key=keys[r], **protected, **values)
            entry = {k: labels[k] for k in varying}
            entry["run"] = r
            entry["output"] = out
            results.append(entry)
    return results


def distinct_seeds(k):
    """k distinct PRNG seeds (reference utils.py:189-202 draws stratified
    seeds for joblib workers; with jax.random the right construction is
    key-splitting — provided for API compatibility)."""
    import numpy as _np

    rng = _np.random.default_rng(0)
    return rng.choice(2**31 - 1, size=k, replace=False)
