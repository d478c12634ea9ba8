"""Log-space weight numerics and resampling schemes (TPU-native).

Re-designed counterpart of the reference's ``particles/resampling.py``
(nchopin/particles): same public surface — an immutable :class:`Weights`
object, ``exp_and_normalise`` / ``essl`` / ``log_sum_exp`` / weighted-moment
helpers, and a string-keyed registry of resampling schemes
(``multinomial``, ``residual``, ``stratified``, ``systematic``, ``ssp``,
``killing``, ``idiotic``) — but everything is a pure, jittable JAX function.

Key differences from the reference, by design:

* Randomness is explicit: every scheme takes a ``jax.random`` key as first
  argument — ``resampling(scheme, key, W, M)`` instead of the reference's
  global-RNG ``resampling(scheme, W, M)`` (resampling.py:477-481).
* The numba two-pointer ``inverse_cdf`` kernel (resampling.py:484-509) is
  replaced by *offspring-count formulations* (see the counts registry
  below): pure arithmetic for systematic/stratified, a single ``lax.sort``
  merge-rank for multinomial/residual — no searchsorted, no random-index
  gather, both of which are order-of-magnitude slower on TPU.  Ancestors
  are recovered as ``repeat(arange(N), counts)`` when needed.
* ``ssp`` (resampling.py:630-677) is an inherently sequential pairwise
  process; here it is a ``lax.scan``.  It is exact but sequential — prefer
  ``systematic`` for large N on TPU (same support properties).
* ``M`` must be a static Python int under ``jit`` (it fixes output shape).

Weighted-moment helpers for "structured" particles (the reference's numpy
record arrays, resampling.py:361-438) operate on dict-of-array pytrees
instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from particles_tpu import distctx

__all__ = [
    "Weights",
    "exp_and_normalise",
    "essl",
    "log_sum_exp",
    "log_sum_exp_ab",
    "log_mean_exp",
    "wmean_and_var",
    "wmean_and_cov",
    "wmean_and_var_str_array",
    "wquantiles",
    "wquantiles_str_array",
    "resampling",
    "resampling_scheme",
    "rs_funcs",
    "inverse_cdf",
    "uniform_spacings",
    "multinomial",
    "multinomial_iid",
    "multinomial_once",
    "stratified",
    "systematic",
    "residual",
    "ssp",
    "killing",
    "idiotic",
    "MultinomialQueue",
]


# ---------------------------------------------------------------------------
# log-space numerics
# ---------------------------------------------------------------------------

def exp_and_normalise(lw):
    """Exponentiate then normalise log-weights, robustly.

    Parity with reference ``exp_and_normalise`` (resampling.py:138-163).
    """
    w = jnp.exp(lw - jnp.max(lw))
    return w / jnp.sum(w)


def essl(lw):
    """ESS (effective sample size) of log-weights (resampling.py:166-188)."""
    W = exp_and_normalise(lw)
    return 1.0 / jnp.sum(W * W)


def log_sum_exp(v):
    """log(sum(exp(v))), numerically stable (resampling.py:247-270)."""
    m = jnp.max(v)
    return m + jnp.log(jnp.sum(jnp.exp(v - m)))


def log_sum_exp_ab(la, lb):
    """log(exp(la) + exp(lb)) for scalars/arrays (resampling.py:273-288)."""
    big = jnp.maximum(la, lb)
    small = jnp.minimum(la, lb)
    return big + jnp.log1p(jnp.exp(small - big))


def _dist_max(v):
    """max over the particle axis — cross-shard under a dist context."""
    ctx = distctx.current()
    m = jnp.max(v)
    return jax.lax.pmax(m, ctx.axis) if ctx is not None else m


def _dist_sum(s):
    """Reduce an already-locally-summed value across shards (no-op
    single-device)."""
    ctx = distctx.current()
    return jax.lax.psum(s, ctx.axis) if ctx is not None else s


def log_mean_exp(v, W=None, lw=None):
    """log of the (possibly weighted) average of exp(v) (resampling.py:291-317).

    Pass ``lw`` (unnormalised log-weights) instead of ``W`` when available:
    ``logsumexp(v + lw) - logsumexp(lw)`` is exact in log space, whereas a
    normalised ``W`` has already lost every particle whose weight
    underflowed to 0 in f32 (lw spread > ~88).

    Under a :mod:`particles_tpu.distctx` context, ``v`` (and ``W``/``lw``)
    are the local shard slices and the mean/weighted-sum is global.
    """
    ctx = distctx.current()
    if W is None and lw is None:
        m = _dist_max(v)
        n = v.shape[0] * (ctx.D if ctx is not None else 1)
        return m + jnp.log(_dist_sum(jnp.sum(jnp.exp(v - m))) / n)
    # Stabilise by max(v + log w), NOT max(v) — in f32 the max-v particle
    # can carry ~zero weight (APF logeta is anti-correlated with the carry
    # weights), and then every w*exp(v - max v) term underflows and the
    # sum collapses to 0 -> -inf.  The reference runs float64 and never
    # sees this.
    s = v + (jnp.log(W) if lw is None else lw)
    m = _dist_max(s)
    out = m + jnp.log(_dist_sum(jnp.sum(jnp.exp(s - m))))
    if lw is None:
        return out
    ml = _dist_max(lw)
    return out - (ml + jnp.log(_dist_sum(jnp.sum(jnp.exp(lw - ml)))))


def wmean_and_var(W, x):
    """Weighted mean and variance along the particle axis (axis 0).

    Parity with reference ``wmean_and_var`` (resampling.py:320-338).
    Returns ``{'mean': m, 'var': v}``.  Under a dist context, ``W``/``x``
    are shard slices of globally-normalised weights and the moments are
    global (one ``psum`` per reduction).
    """
    if x.ndim == 1:
        m = _dist_sum(jnp.sum(W * x))
        m2 = _dist_sum(jnp.sum(W * x * x))
    else:
        Wc = W.reshape((-1,) + (1,) * (x.ndim - 1))
        m = _dist_sum(jnp.sum(Wc * x, axis=0))
        m2 = _dist_sum(jnp.sum(Wc * x * x, axis=0))
    return {"mean": m, "var": m2 - m * m}


def wmean_and_cov(W, x):
    """Weighted mean and covariance of (N, d) particles (resampling.py:341-358)."""
    m = _dist_sum(jnp.sum(W[:, None] * x, axis=0))
    xc = x - m
    cov = _dist_sum(jnp.einsum("n,ni,nj->ij", W, xc, xc))
    return m, cov


def wmean_and_var_str_array(W, x):
    """Per-field weighted mean/var for dict-of-arrays particles.

    TPU counterpart of the structured-array version (resampling.py:361-393):
    the reference's numpy record arrays become pytrees (dicts), so this is a
    ``tree_map``.
    """
    means = jax.tree_util.tree_map(lambda v: wmean_and_var(W, v)["mean"], x)
    variances = jax.tree_util.tree_map(lambda v: wmean_and_var(W, v)["var"], x)
    return {"mean": means, "var": variances}


def _wquantiles_1d(W, x, alphas):
    order = jnp.argsort(x)
    xs = x[order]
    cs = jnp.cumsum(W[order])
    cs = cs / cs[-1]
    idx = jnp.searchsorted(cs, jnp.asarray(alphas), side="left")
    return xs[jnp.clip(idx, 0, x.shape[0] - 1)]


def wquantiles(W, x, alphas=(0.25, 0.50, 0.75)):
    """Weighted quantiles (resampling.py:396-417); columns handled separately."""
    if x.ndim == 1:
        return _wquantiles_1d(W, x, alphas)
    return jnp.stack(
        [_wquantiles_1d(W, x[:, j], alphas) for j in range(x.shape[1])], axis=1
    )


def wquantiles_str_array(W, x, alphas=(0.25, 0.50, 0.75)):
    """Weighted quantiles per field of a dict-of-arrays (resampling.py:420-438)."""
    return jax.tree_util.tree_map(lambda v: wquantiles(W, v, alphas), x)


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class Weights:
    """Immutable container for N log-weights and derived quantities.

    Mirrors reference ``Weights`` (resampling.py:191-244): stores raw
    log-weights ``lw`` and precomputes normalised weights ``W``, effective
    sample size ``ESS`` and ``log_mean`` = log of the average (unnormalised)
    weight.  NaN log-weights are mapped to -inf (resampling.py:220).

    ``Weights()`` (no argument) represents equal weights, like the reference;
    inside jitted code always use a concrete ``lw`` (e.g. zeros).
    """

    __slots__ = ("lw", "W", "ESS", "log_mean")

    def __init__(self, lw=None, _derived=None):
        self.lw = lw
        if lw is None:
            self.W = None
            self.ESS = None
            self.log_mean = None
            return
        if _derived is not None:
            self.W, self.ESS, self.log_mean = _derived
            return
        lw = jnp.where(jnp.isnan(lw), -jnp.inf, jnp.asarray(lw))
        self.lw = lw
        ctx = distctx.current()
        if ctx is None:
            m = jnp.max(lw)
            w = jnp.exp(lw - m)
            s = jnp.sum(w)
            self.log_mean = m + jnp.log(s / lw.shape[0])
            self.W = w / s
            self.ESS = 1.0 / jnp.sum(self.W * self.W)
        else:
            # lw is the local shard slice; all derived quantities are
            # GLOBAL: W is the local slice of globally-normalised weights
            # (sums to 1 across shards), ESS/log_mean are replicated
            # scalars.  Two all-reduces (one max, one fused pair of sums).
            m = jax.lax.pmax(jnp.max(lw), ctx.axis)
            w = jnp.exp(lw - m)
            s, s2_pre = jnp.sum(w), jnp.sum(w * w)
            s, s2 = jax.lax.psum((s, s2_pre), ctx.axis)
            self.log_mean = m + jnp.log(s / (lw.shape[0] * ctx.D))
            self.W = w / s
            self.ESS = s * s / s2

    @property
    def N(self):
        return 0 if self.lw is None else self.lw.shape[0]

    def add(self, delta):
        """Return new Weights with lw incremented by ``delta``."""
        if self.lw is None:
            return Weights(lw=delta)
        return Weights(lw=self.lw + delta)

    def tree_flatten(self):
        if self.lw is None:
            return (), ("empty",)
        return (self.lw, self.W, self.ESS, self.log_mean), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        if aux == ("empty",):
            obj.lw = obj.W = obj.ESS = obj.log_mean = None
        else:
            obj.lw, obj.W, obj.ESS, obj.log_mean = children
        return obj


# ---------------------------------------------------------------------------
# resampling scheme registry
# ---------------------------------------------------------------------------

rs_funcs = {}

_RS_DOC = """

    Parameters
    ----------
    key : jax.random key
    W : (N,) array — normalised weights (>= 0, sum to one)
    M : int, optional (defaults to N; static under jit)

    Returns
    -------
    (M,) int32 array of ancestor indices in 0..N-1
"""


def resampling_scheme(func):
    """Decorator registering a resampling scheme by name (resampling.py:465-475)."""

    @functools.wraps(func)
    def wrapped(key, W, M=None):
        M = W.shape[0] if M is None else M
        return func(key, W, M)

    rs_funcs[func.__name__] = wrapped
    wrapped.__doc__ = (func.__doc__ or "") + _RS_DOC
    return wrapped


def resampling(scheme, key, W, M=None):
    """Dispatch a resampling scheme by name (resampling.py:477-481)."""
    try:
        return rs_funcs[scheme](key, W, M=M)
    except KeyError:
        raise ValueError(f"{scheme} is not a valid resampling scheme")


def inverse_cdf(su, W):
    """Ancestors via inverse CDF of W evaluated at sorted uniforms ``su``.

    Replaces the sequential numba two-pointer kernel
    (reference resampling.py:484-509) by cumsum + vectorised binary search:
    identical output (smallest j with cumsum(W)[j] >= su[n]), but O(M log N)
    fully-parallel work that XLA vectorises on the VPU.
    """
    cs = jnp.cumsum(W)
    A = jnp.searchsorted(cs, su, side="left")
    return jnp.clip(A, 0, W.shape[0] - 1).astype(jnp.int32)


def uniform_spacings(key, N):
    """N ordered uniforms in O(N) (resampling.py:512-537): normalised
    cumulative sums of exponentials."""
    z = jnp.cumsum(jax.random.exponential(key, (N + 1,)))
    return z[:-1] / z[-1]


@resampling_scheme
def multinomial(key, W, M):
    """Multinomial resampling (sorted output) — resampling.py:540-558.

    Computed via offspring counts + repeat (see the TPU performance note at
    the counts registry below); identical in distribution to
    ``inverse_cdf(uniform_spacings(key, M), W)``.
    """
    return counts_to_ancestors(multinomial_counts(key, W, M), M)


def _su_serve_chunks(su, cs1, M, prepped, want_anc=True):
    """Serve the sorted-query inverse CDF through the su-mode kernel in
    ``M // N`` contiguous chunks of N (the kernel serves N outputs from N
    sources; a sorted query stream of M = k*N splits into k sorted chunks
    against the SAME cumulative weights).  ``cs1`` is the monotone
    normalised cumsum with ``cs1[-1]`` pinned to 1.0.  Returns
    ``(served_cols, anc)`` with (M,) leading dims, or None when any
    chunk's plan is unavailable (callers fall back).

    This is what keeps ``multinomial_iid`` / ``multinomial_iid_values``
    on the kernel route for M a small multiple of N — the PaRIS
    collector's per-trial draw is M = Nparis*N, and the fallback it
    would otherwise take (counts + ``jnp.repeat`` at M=2^18) costs
    ~10-16 ms per trial on TPU.
    """
    from particles_tpu import ops
    from particles_tpu.ops import repeat_kernel as rk

    N = cs1.shape[0]
    outs, ancs = [[] for _ in prepped], []
    for c in range(M // N):
        plan = ops.make_repeat_plan_su(su[c * N:(c + 1) * N], cs1, N)
        if plan is None:
            return None
        served, anc = rk.repeat_with_plan_cols(plan, prepped,
                                               want_anc=want_anc)
        for o, s in zip(outs, served):
            o.append(s)
        if want_anc:
            ancs.append(anc)
    cat = (lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs))
    cols = [cat(o) for o in outs]
    return cols, (cat(ancs) if want_anc else None)


# largest M/N multiple served by chunked su-mode kernel calls (each chunk
# is one pallas_call; beyond this the merge-rank/repeat fallback wins)
_SU_CHUNK_MAX = 16


def multinomial_iid(key, W, M=None):
    """Multinomial resampling with IID (unsorted) output (resampling.py:561-571).

    Unsorted uniforms + searchsorted directly gives IID draws; no shuffle
    needed.

    On TPU at large M the M-point binary search is the slow primitive
    (``jnp.searchsorted`` ≈ 20 ms at M ~ 1e5 in a scan on v5e, the
    dominant cost of MCMC/rejection FFBS), so the fast path re-phrases
    the SAME lookup as sort + sorted-serve + unsort — all fast
    primitives: ``lax.sort`` the uniforms (carrying the permutation),
    serve the inverse CDF on the sorted stream through the su-mode
    repeat kernel (or merge-rank + the P=0 ancestor kernel), and route
    the results back with a second sort keyed on the permutation.
    Realisation-equivalent to ``searchsorted(cs, u, side='left')`` —
    ``i(j) = #{i: cs_i < u_j}`` tie-for-tie — up to ulp differences in
    the monotone normalised cumsum.
    """
    from particles_tpu import ops
    from particles_tpu.ops import repeat_kernel as rk

    M = W.shape[0] if M is None else M
    N = W.shape[0]
    u = jax.random.uniform(key, (M,))
    if rk._on_tpu() and M >= rk._C and N >= rk._C:
        iota = jnp.arange(M, dtype=jnp.int32)
        su, perm = jax.lax.sort((u, iota), num_keys=1)
        cs, cs_mono = _normalised_cumsum_mono(W)
        anc_sorted = None
        if cs_mono and M % N == 0 and M // N <= _SU_CHUNK_MAX:
            # fused inverse-CDF serve: the P=0 ancestor instantiation of
            # the su-mode plan (cs[-1] pinned above every u < 1), one
            # kernel call per N-sized chunk of the sorted query stream
            got = _su_serve_chunks(
                su, cs.at[-1].set(jnp.float32(1.0)), M, [])
            if got is not None:
                _, anc_sorted = got
        if anc_sorted is None:
            z = _merge_rank_counts(su, cs, M)
            z = z.at[-1].set(M)
            if not cs_mono:
                z = _monotone_z(z)
            anc_sorted = ops.ancestors_by_z(z, M)
        _, out = jax.lax.sort((perm, anc_sorted), num_keys=1)
        return out
    cs = jnp.cumsum(W)
    return jnp.clip(jnp.searchsorted(cs, u, side="left"), 0, W.shape[0] - 1).astype(
        jnp.int32
    )


# Largest N for which the integer-stream su-mode trick (``su = idx +
# 0.5``) is exact in f32: above 2^23 the ulp is 1.0, so an odd idx
# rounds to the integer ``idx + 1 == cs_idx`` and the serve is off by
# one.  :func:`take_sorted` / :func:`take_by_sort` fall back to plain
# gathers above it.
_SU_IDX_MAX = 1 << 23


def _serve_cols_prep(cols, N):
    """Prepare payload columns for a fused kernel serve: f32 (and other
    kernel-exact dtypes) pass through; int32 INDEX-valued columns (values
    in [0, N), N < 2^24 — e.g. ancestor vectors) ride an exact f32 view.
    Returns ``(prepped, restore)`` or ``None`` when some column cannot
    route."""
    from particles_tpu.ops import repeat_kernel as rk

    if N >= (1 << 24):
        return None
    prepped, restore = [], []
    for c in cols:
        if c.ndim != 1 or c.shape[0] != N:
            return None
        if c.dtype == jnp.int32:
            prepped.append(c.astype(jnp.float32))
            restore.append(lambda y: y.astype(jnp.int32))
        elif rk._leaf_routable(c, N):
            prepped.append(c)
            restore.append(lambda y: y)
        else:
            return None
    return prepped, restore


def take_sorted(idx, cols, _plan_cache=None):
    """``[c[idx] for c in cols]`` for a SORTED (nondecreasing) int32
    ``idx`` with ``len(idx) == len(c) == N``.

    A gather with sorted indices IS an inverse-CDF serve — ``Y[j] =
    X[i(j)]`` with ``i(j) = #{i: i < idx_j}`` — so it routes through the
    su-mode repeat kernel on integer-valued streams (``su = idx + 0.5``,
    ``cs = i + 1``: the half offset breaks ties, and ``idx + 0.5`` is
    exact f32 only for ``idx < 2^23`` — hence the ``_SU_IDX_MAX`` gate;
    above it an odd idx would round to the integer ``idx + 1 == cs_idx``
    and mis-serve by one): one fused pallas_call for ALL columns, versus
    one ~60M elem/s random ``jnp.take`` per column (VERDICT r4 task 3 —
    the FFBS backward pass's dominant cost).  Falls back to ``jnp.take``
    (non-TPU, N not a 1024-multiple — the su-plan's padding assumes
    cs <= 1 — unrouteable dtypes).
    """
    from particles_tpu import ops
    from particles_tpu.ops import repeat_kernel as rk

    N = idx.shape[0]
    prep = _serve_cols_prep(cols, N)
    if (prep is not None and rk._on_tpu() and N >= rk._C
            and N % rk._C == 0 and N <= _SU_IDX_MAX):
        prepped, restore = prep
        su = idx.astype(jnp.float32) + jnp.float32(0.5)
        cs = jnp.arange(1, N + 1, dtype=jnp.float32)
        plan = ops.make_repeat_plan_su(su, cs, N)
        if plan is not None:
            served, _ = rk.repeat_with_plan_cols(plan, prepped)
            return [r(y) for r, y in zip(restore, served)]
    return [jnp.take(c, idx, axis=0) for c in cols]


def take_by_sort(idx, cols):
    """``[c[idx] for c in cols]`` for ARBITRARY int32 ``idx`` (len N ==
    len(c)): sort the indices (carrying the unsort permutation), serve
    all columns with ONE fused :func:`take_sorted` kernel call, route the
    results back with a second multi-operand sort keyed on the
    permutation.  All fast primitives — ``lax.sort`` is ~2 ms at N=2^20
    where each random ``jnp.take`` is ~10 ms."""
    from particles_tpu.ops import repeat_kernel as rk

    N = idx.shape[0]
    prep = _serve_cols_prep(cols, N)
    if not (prep is not None and rk._on_tpu() and N >= rk._C
            and N % rk._C == 0 and N <= _SU_IDX_MAX):
        return [jnp.take(c, idx, axis=0) for c in cols]
    prepped, restore = prep
    iota = jnp.arange(N, dtype=jnp.int32)
    sidx, perm = jax.lax.sort((idx, iota), num_keys=1)
    served = take_sorted(sidx, prepped)
    out = jax.lax.sort((perm,) + tuple(served), num_keys=1)
    return [r(y) for r, y in zip(restore, out[1:])]


def multinomial_iid_values(key, W, cols, M=None):
    """:func:`multinomial_iid` PLUS the served values ``[c[A] for c in
    cols]`` — the proposal indices and the proposed particle values in
    one fused kernel call (the FFBS-MCMC proposal draw needs both; a
    separate ``X[prop]`` gather would cost more than the whole draw).

    Returns ``(A, values)``.  Realisation-equivalent to
    ``A = multinomial_iid(key, W, M)`` followed by ``[jnp.take(c, A) for
    c in cols]`` (the index stream is identical; values are served
    through the same plan).
    """
    from particles_tpu import ops
    from particles_tpu.ops import repeat_kernel as rk

    M = W.shape[0] if M is None else M
    N = W.shape[0]
    u = jax.random.uniform(key, (M,))
    prep = (_serve_cols_prep(cols, N)
            if M % N == 0 and M // N <= _SU_CHUNK_MAX else None)
    if prep is not None and rk._on_tpu() and M >= rk._C and N >= rk._C:
        prepped, restore = prep
        iota = jnp.arange(M, dtype=jnp.int32)
        su, perm = jax.lax.sort((u, iota), num_keys=1)
        cs, cs_mono = _normalised_cumsum_mono(W)
        if cs_mono:
            got = _su_serve_chunks(
                su, cs.at[-1].set(jnp.float32(1.0)), M, prepped)
            if got is not None:
                served, anc_sorted = got
                out = jax.lax.sort((perm, anc_sorted) + tuple(served),
                                   num_keys=1)
                return out[1], [r(y) for r, y in zip(restore, out[2:])]
        if M == N:
            # merge-rank fallback path: indices via the P=0 kernel,
            # values via the same z-plan
            z = _merge_rank_counts(su, cs, M)
            z = z.at[-1].set(M)
            if not cs_mono:
                z = _monotone_z(z)
            plan = ops.make_repeat_plan(z, M)
            if plan is not None:
                served, anc_sorted = rk.repeat_with_plan_cols(
                    plan, prepped, want_anc=True)
                out = jax.lax.sort((perm, anc_sorted) + tuple(served),
                                   num_keys=1)
                return out[1], [r(y) for r, y in zip(restore, out[2:])]
    A = multinomial_iid(key, W, M)
    return A, [jnp.take(c, A, axis=0) for c in cols]


def multinomial_once(key, W):
    """A single draw from the categorical distribution W (resampling.py:574-596)."""
    u = jax.random.uniform(key, ())
    cs = jnp.cumsum(W)
    return jnp.clip(jnp.searchsorted(cs, u), 0, W.shape[0] - 1).astype(jnp.int32)


@resampling_scheme
def stratified(key, W, M):
    """Stratified resampling (resampling.py:599-603), via offspring counts."""
    return counts_to_ancestors(stratified_counts(key, W, M), M)


@resampling_scheme
def systematic(key, W, M):
    """Systematic resampling (resampling.py:606-610), via offspring counts."""
    return counts_to_ancestors(systematic_counts(key, W, M), M)


@resampling_scheme
def residual(key, W, M):
    """Residual resampling (resampling.py:613-627).

    floor(M*W[n]) deterministic copies of each particle, then the remaining
    slots are filled with multinomial draws from the residual weights.  The
    number of deterministic slots is data-dependent, so on TPU we fill all M
    slots both ways and select with a mask (static shapes).
    """
    N = W.shape[0]
    MW = M * W
    intpart = jnp.floor(MW)
    sip = jnp.sum(intpart).astype(jnp.int32)  # deterministic slots (traced)
    res = MW - intpart
    sres = jnp.maximum(jnp.sum(res), 1e-30)
    # slot j < sip -> particle with cumulative intpart count > j
    cs_int = jnp.cumsum(intpart)
    slots = jnp.arange(M)
    det_A = jnp.clip(
        jnp.searchsorted(cs_int, slots, side="right"), 0, N - 1
    ).astype(jnp.int32)
    rnd_A = multinomial_iid(key, res / sres, M)
    return jnp.where(slots < sip, det_A, rnd_A)


@resampling_scheme
def ssp(key, W, M):
    """SSP (Srinivasan Sampling Process) resampling.

    Same properties as the reference implementation
    (resampling.py:630-677; Gerber, Chopin & Whiteley 2019): number of
    offspring of particle n is floor(M W_n) or floor(M W_n)+1, and the scheme
    is negatively associated.  The pairwise randomised-rounding recursion is
    inherently sequential; see :func:`ssp_counts` for the lax.scan
    formulation.  Where the reference raises on a round-off residual
    mismatch, we deterministically assign the remaining slot (cannot raise
    under jit).
    """
    return counts_to_ancestors(ssp_counts(key, W, M), M)


@resampling_scheme
def killing(key, W, M):
    """Killing resampling (resampling.py:680-697): particle n survives with
    probability W[n]/max(W); killed slots get IID multinomial draws.
    Defined only for M == N."""
    N = W.shape[0]
    if M != N:
        raise ValueError("killing resampling defined only for M=N")
    k1, k2 = jax.random.split(key)
    killed = jax.random.uniform(k1, (N,)) * jnp.max(W) >= W
    replacements = multinomial_iid(k2, W, N)
    return jnp.where(killed, replacements, jnp.arange(N, dtype=jnp.int32))


@resampling_scheme
def idiotic(key, W, M):
    """Idiotic resampling — testing only (resampling.py:700-706)."""
    a = multinomial_once(key, W)
    return jnp.full((M,), a, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# offspring-count formulations (the TPU fast path)
# ---------------------------------------------------------------------------
#
# TPU performance note (measured on v5e): `jnp.searchsorted` costs ~17 ms and
# a random-index gather ~27 ms per step at N=1e5 inside a scan, while the
# arithmetic counts formula + `jnp.repeat(x, counts, total_repeat_length=N)`
# costs ~2.4 ms.  For every scheme whose ancestor vector is sorted
# (multinomial/stratified/systematic/ssp/residual), resampling is therefore
# expressed as *offspring counts*: A = repeat(arange(N), counts), and the
# particle move X[A] = repeat(X, counts).  The SMC engine consumes these
# counts directly and never materialises A unless a collector asks for it.

rs_counts_funcs = {}


def resampling_counts_scheme(func):
    """Register the counts-based form of a resampling scheme."""
    rs_counts_funcs[func.__name__.replace("_counts", "")] = func
    return func


def resampling_counts(scheme, key, W, M=None):
    """Offspring counts for a sorted-ancestor scheme: (N,) int32 summing to M.

    ``A = jnp.repeat(jnp.arange(N), counts, total_repeat_length=M)`` gives
    the same ancestors as ``np.sort(resampling(scheme, ...))`` — bit-exact
    for the SAME key for multinomial/stratified/systematic/ssp (verified
    in tests).  ``residual`` is the exception: its two forms consume the
    key through different machinery (unsorted ``multinomial_iid`` on the
    residuals vs sorted spacings + merge-rank), so the same key yields a
    different — equally valid, identically distributed — draw.
    """
    M = W.shape[0] if M is None else M
    try:
        return rs_counts_funcs[scheme](key, W, M)
    except KeyError:
        raise ValueError(f"{scheme} has no counts-based (sorted) form")


def counts_to_ancestors(counts, M):
    """A[m] = smallest n with cumsum(counts)[n] > m, via repeat (no search).

    On TPU this routes through the Pallas visit kernel's payload-free
    (P=0) in-kernel ancestor instantiation (exact ints at any N):
    1.9 ms at N=2^20 — half a payload-riding serve, ~75x the XLA gather.
    """
    from particles_tpu.ops.repeat_kernel import ancestors_by_z

    return ancestors_by_z(jnp.cumsum(counts.astype(jnp.int32)), M)


rs_z_funcs = {}


def resampling_z_scheme(func):
    """Register the z-form (inclusive cumsum of offspring counts) of a
    resampling scheme."""
    rs_z_funcs[func.__name__.replace("_z", "")] = func
    return func


def resampling_z(scheme, key, W, M=None):
    """z-form of a sorted-ancestor scheme: (N,) int32 nondecreasing with
    z[-1] == M; z = cumsum(counts), and the resampling move is
    ``Y[j] = X[#{k: z_k <= j}]`` (the Pallas repeat kernel's native input).

    For systematic resampling z is *analytic* in cumsum(W) — no counts
    materialisation, no second cumsum, no search over N (this is the
    engine's fast path; see ops/repeat_kernel.py).
    """
    M = W.shape[0] if M is None else M
    if scheme in rs_z_funcs:
        return rs_z_funcs[scheme](key, W, M)
    counts = resampling_counts(scheme, key, W, M)
    return jnp.cumsum(counts.astype(jnp.int32))


def _monotone_z(z):
    """Enforce the nondecreasing z contract (running max).

    Pallas streaming kernel on TPU (~0.2 ms at 2^20 vs ~1.5 ms for
    XLA's associative_scan — measured round 3); associative_scan
    elsewhere.  See ops/cummax_kernel.py for why this is mandatory.
    """
    from particles_tpu.ops import running_max

    return running_max(z)


def _normalised_cumsum(W):
    cs = jnp.cumsum(W)
    return cs / cs[-1]


def _normalised_cumsum_mono(W):
    """Normalised cumulative weights plus a trace-time flag saying the
    result is monotone BY CONSTRUCTION.

    On TPU (aligned f32 W, Pallas allowed) this is the one-pass
    fixed-point kernel (ops/z_kernel.normalised_cumsum_exact): exact int
    cumsum, so downstream z-forms need no cummax wave.  Otherwise the
    XLA cumsum, whose parallel f32 association can dip — callers MUST
    apply :func:`_monotone_z` when the flag is False.
    """
    from particles_tpu.ops.z_kernel import normalised_cumsum_exact

    cs = normalised_cumsum_exact(W)
    if cs is not None:
        return cs, True
    return _normalised_cumsum(W), False


@resampling_z_scheme
def systematic_z(key, W, M):
    """Systematic z-form: z_i = #{j: (j+u)/M <= cs_i} = floor(M*cs_i - u)
    + 1.  Pure arithmetic in cumsum(W) — no search, no gather, and no
    separate counts cumsum (z IS the cumsum the repeat kernel consumes)."""
    from particles_tpu.ops.z_kernel import systematic_z_fused

    u = jax.random.uniform(key, ())
    z = systematic_z_fused(W, u, M)
    if z is not None:
        # fused streaming Pallas pass: exact int32 fixed-point cumsum +
        # affine floor transform — monotone BY CONSTRUCTION, so neither
        # the XLA cumsum (~0.66 ms at 2^20) nor the cummax wave is needed
        return z
    cs = _normalised_cumsum(W)
    z = jnp.clip(jnp.floor(M * cs - u).astype(jnp.int32) + 1, 0, M)
    z = z.at[-1].set(M)  # guard rounding at the top
    # XLA's parallel cumsum is not association-monotone: cs can dip by an
    # ulp, which here shows up as z dipping by 1 (a nonsense -1 offspring
    # count).  Enforce the documented nondecreasing contract (stratified_z
    # and multinomial_z already do).
    return _monotone_z(z)


@resampling_counts_scheme
def systematic_counts(key, W, M):
    """Systematic offspring counts = diff of the analytic z-form."""
    return jnp.diff(systematic_z(key, W, M),
                    prepend=jnp.zeros(1, jnp.int32))


@resampling_z_scheme
def stratified_z(key, W, M):
    """Stratified z-form: z_i = #{j: (j+u_j)/M <= cs_i}
    = k_i + 1[u_{k_i} <= frac_i], k_i = floor(M*cs_i).  The u-gather uses
    sorted indices (cheap on TPU)."""
    u = jax.random.uniform(key, (M,))
    cs, cs_mono = _normalised_cumsum_mono(W)
    g = M * cs
    k = jnp.floor(g).astype(jnp.int32)
    frac = g - k
    uk = jnp.take(u, jnp.clip(k, 0, M - 1))
    z = jnp.where(k >= M, M, k + (uk <= frac).astype(jnp.int32))
    z = jnp.clip(z, 0, M)
    z = z.at[-1].set(M)  # guard rounding at the top
    # monotone cs => monotone z: for cs_{i+1} >= cs_i either k is equal
    # (frac nondecreasing, so the shared-u indicator is nondecreasing) or
    # k_{i+1} > k_i (then z_{i+1} >= k_{i+1} >= k_i + 1 >= z_i)
    return z if cs_mono else _monotone_z(z)


@resampling_counts_scheme
def stratified_counts(key, W, M):
    """Stratified offspring counts = diff of the z-form."""
    return jnp.diff(stratified_z(key, W, M),
                    prepend=jnp.zeros(1, jnp.int32))


def _merge_rank_counts(su, cs, M):
    """z_i = #{j: su_j <= cs_i} for sorted su — the sorted-merge rank count
    at the core of every inverse-CDF resampling formulation.

    On TPU (float32, 1024-multiple N) this routes through a Pallas
    streaming-merge kernel (ops/merge_rank_kernel.py, ~2 ms at 2^20,
    bit-equal).  The XLA fallback uses two lax.sorts (no gather, no
    scatter): sort 1 merges the two sorted streams carrying origin flags;
    the running count of su entries at each cs position is then extracted
    by a *second* stable sort on the flag (a stream compaction: cs entries
    move to the front in order, carrying their counts as payload).  A
    scatter extraction (``at[target].max``) measures 2x slower than the
    compaction sort on v5e (22.3 vs 10.9 ms at N=2^20).
    """
    from particles_tpu.ops.merge_rank_kernel import merge_rank_counts

    z = merge_rank_counts(su, cs, M)
    if z is not None:
        return z
    N = cs.shape[0]
    both = jnp.concatenate([cs, su])
    is_cs = jnp.concatenate(
        [jnp.ones(N, jnp.int32), jnp.zeros(su.shape[0], jnp.int32)]
    )
    # two sort keys: on exact value ties, su (flag 0) sorts before cs
    # (flag 1) so that su_j == cs_i counts as su_j <= cs_i, matching
    # inverse_cdf's searchsorted(side='left') convention
    sorted_key, sorted_iscs = jax.lax.sort((both, is_cs), num_keys=2)
    n_su_before = jnp.cumsum(1 - sorted_iscs).astype(jnp.int32)
    front = (1 - sorted_iscs).astype(jnp.int32)  # cs -> key 0: sorts first
    _, z = jax.lax.sort((front, n_su_before), num_keys=1, is_stable=True)
    return jnp.clip(z[:N], 0, M)


@resampling_z_scheme
def multinomial_z(key, W, M):
    """Multinomial z-form ~ Multinomial(M, W): sorted uniforms (O(M)
    spacings construction) merged against cumsum(W) by the streaming
    merge-rank kernel (one sort on CPU fallback)."""
    su = uniform_spacings(key, M)
    cs, cs_mono = _normalised_cumsum_mono(W)
    z = _merge_rank_counts(su, cs, M)
    z = z.at[-1].set(M)
    # z_i = #{j: su_j <= cs_i} is monotone in i whenever cs is
    return z if cs_mono else _monotone_z(z)


@resampling_counts_scheme
def multinomial_counts(key, W, M):
    """Multinomial offspring counts = diff of the z-form."""
    return jnp.diff(multinomial_z(key, W, M),
                    prepend=jnp.zeros(1, jnp.int32))


@resampling_counts_scheme
def residual_counts(key, W, M):
    """Residual offspring counts: floor(M*W) deterministic + multinomial on
    the residual weights.

    The residual draw count ``sres = M - sum(floor(M W))`` is data-dependent;
    we exploit the spacings construction — the first k of
    ``cumsum(E)/cumsum(E)[k]`` are k sorted uniforms for *any* k — to draw a
    dynamic number of sorted uniforms with static shapes.
    """
    N = W.shape[0]
    MW = M * W
    intpart = jnp.floor(MW).astype(jnp.int32)
    sip = jnp.sum(intpart)
    res = MW - intpart
    sres = M - sip  # traced
    z_exp = jnp.cumsum(jax.random.exponential(key, (M + 1,)))
    denom = jnp.take(z_exp, jnp.clip(sres, 0, M))
    su = z_exp[:-1] / denom
    su = jnp.where(jnp.arange(M) < sres, su, 2.0)  # mask: never counted
    cs, cs_mono = _normalised_cumsum_mono(
        res / jnp.maximum(jnp.sum(res), 1e-30))
    zr = _merge_rank_counts(su, cs, M)
    zr = jnp.minimum(zr, sres)
    zr = zr.at[-1].set(jnp.clip(sres, 0, M))
    if not cs_mono:
        zr = _monotone_z(zr)
    res_counts = jnp.diff(zr, prepend=jnp.zeros(1, jnp.int32))
    return intpart + res_counts


@resampling_counts_scheme
def ssp_counts(key, W, M):
    """SSP offspring counts — the scan in :func:`ssp` natively produces
    counts; see its docstring for the algorithm.

    Eager calls on the CPU backend route to the native C++ kernel
    (``particles_tpu.native``) when available: the N-step sequential
    recursion as a single host loop, skipping the lax.scan's multi-second
    XLA-CPU compile.  Same uniform stream (the draw below); the host
    kernel scans in float64, so a realisation may differ from the jitted
    float32 scan at rare rounding ties (identical distribution).

    At N >= 8192 (``_SSP_BLOCKED_MIN``) the jitted path routes to the
    HIERARCHICAL tree pairing (:func:`_ssp_counts_blocked`): the
    sequential pairing is an (N-1)-step recursion — impractical on TPU
    beyond ~1e4 steps (sequential-dispatch floor; the reference's numba
    loop has no such constraint) and minutes of XLA-CPU compile at 1e6 —
    while the tree pairing is O(K log N) steps of dense (B, K) vector
    work and is ITSELF a valid SSP (any adapted pairing order preserves
    unbiasedness and the floor/ceil support; only the joint law differs
    from the sequential order).  Measured at N=2^20 on v5e (jitted scan
    chain, overhead-subtracted): ~0.8 ms/call at K=32 — comparable to
    the systematic z-path; a standalone round-trip call reads ~25 ms of
    tunnel latency, not device time.
    """
    N = W.shape[0]
    if (jax.default_backend() == "cpu"
            and not isinstance(W, jax.core.Tracer)
            and not isinstance(key, jax.core.Tracer)
            and N < _SSP_BLOCKED_MIN):
        from particles_tpu import native

        if native.AVAILABLE:
            import numpy as _np

            u_host = _np.asarray(jax.random.uniform(key, (N - 1,)))
            return jnp.asarray(
                native.ssp_counts(_np.asarray(W), int(M), u_host))
    if N >= _SSP_BLOCKED_MIN:
        return _ssp_counts_blocked(key, W, M)
    MW = M * W
    nr0 = jnp.floor(MW)
    xi0 = MW - nr0
    u = jax.random.uniform(key, (N - 1,))

    def body(carry, ku):
        i, j, xi, nr = carry
        k, uk = ku
        delta_i = jnp.minimum(xi[j], 1.0 - xi[i])
        delta_j = jnp.minimum(xi[i], 1.0 - xi[j])
        sum_delta = delta_i + delta_j
        pj = jnp.where(sum_delta > 0.0, delta_i / sum_delta, 0.0)
        swap = uk < pj
        i, j = jnp.where(swap, j, i), jnp.where(swap, i, j)
        delta = jnp.where(swap, delta_j, delta_i)
        grow = xi[j] < 1.0 - xi[i]
        xi = xi.at[i].add(jnp.where(grow, delta, 0.0))
        xi = xi.at[j].add(jnp.where(grow, 0.0, -delta))
        nr = nr.at[i].add(jnp.where(grow, 0.0, 1.0))
        nxt = k + 2
        return (jnp.where(grow, i, nxt), jnp.where(grow, nxt, j), xi, nr), None

    ks = jnp.arange(N - 1, dtype=jnp.int32)
    (i, j, xi, nr), _ = jax.lax.scan(
        body, (jnp.int32(0), jnp.int32(1), xi0, nr0), (ks, u)
    )
    last_ij = jnp.where(j == N, i, j)
    # exact round-off fix-up: land whatever is missing on the last active
    # index so the counts sum to M (the deterministic analog of ssp()'s
    # final-xi rounding)
    nr = nr.at[last_ij].add(M - jnp.sum(nr))
    return nr.astype(jnp.int32)


# N above which ssp_counts switches to the hierarchical tree pairing
# (_ssp_counts_blocked): the sequential pairing is an (N-1)-step lax.scan
# — impractical on TPU beyond ~1e4 (sequential dispatch floor) and
# minutes of XLA-CPU compile at 1e6
_SSP_BLOCKED_MIN = 8192
_SSP_K = 32  # block width of the tree pairing


def _ssp_counts_blocked(key, W, M, K=_SSP_K):
    """SSP offspring counts by HIERARCHICAL (tree) pairing — the
    TPU-scale formulation (SURVEY.md §2a item 2; reference numba loop
    ``resampling.py:630-677``).

    SSP's guarantees — unbiasedness ``E[counts_i] = M W_i``, support
    ``counts_i ∈ {floor(M W_i), ceil(M W_i)}`` and ``sum = M`` exactly —
    hold for ANY adapted pairing order (Gerber, Chopin & Whiteley 2019:
    each pairwise step is a martingale update of the fractional parts),
    so the pairing is a degree of freedom.  The reference pairs
    sequentially (an inherently serial N-step recursion); here the N
    fractional parts are paired within K-wide blocks — a (K-1)-step
    ``lax.scan`` whose body is dense (B, K) one-hot arithmetic, i.e.
    B = N/K independent SSP chains advanced in lockstep on the VPU — and
    each block's single surviving fractional value is promoted to the
    next level, giving ceil(log_K N) levels and O(K log_K N) sequential
    steps total (124 at N=2^20, K=32) instead of N-1 (~1e6).

    The joint law differs from the sequential pairing (a different valid
    SSP), which is why this is a separate function with an explicit
    routing threshold rather than a silent replacement at all N.
    """
    N = W.shape[0]
    MW = M * W
    nr = jnp.floor(MW)                      # global count accumulator
    phi = MW - nr                           # fractional parts, in [0, 1)
    idx = jnp.arange(N, dtype=jnp.int32)    # original index of each phi
    sub_iota = jnp.arange(K, dtype=jnp.int32)[:, None]  # (K, 1)

    def body(carry, ku):
        # the sequential ssp_counts body, vectorised over B blocks with
        # one-hot reads/writes — dense (K, B) VPU work, no scatters.  The
        # SHORT block axis K sits on sublanes and the LONG block-count
        # axis B on lanes ((B, K) would waste 7/8 of every (8, 128)
        # vector tile); strided blocks (reshape(K, B)) avoid a transpose
        i, j, x, nrl = carry                 # i, j (B,); x, nrl (K, B)
        k, uk = ku
        oh_i = sub_iota == i[None, :]
        oh_j = sub_iota == j[None, :]
        a = jnp.sum(jnp.where(oh_i, x, 0.0), axis=0)
        b = jnp.sum(jnp.where(oh_j, x, 0.0), axis=0)
        delta_i = jnp.minimum(b, 1.0 - a)
        delta_j = jnp.minimum(a, 1.0 - b)
        sum_delta = delta_i + delta_j
        pj = jnp.where(sum_delta > 0.0, delta_i / sum_delta, 0.0)
        swap = uk < pj
        i, j = jnp.where(swap, j, i), jnp.where(swap, i, j)
        oh_i = sub_iota == i[None, :]
        oh_j = sub_iota == j[None, :]
        a, b = jnp.where(swap, b, a), jnp.where(swap, a, b)
        delta = jnp.minimum(b, 1.0 - a)
        grow = b < 1.0 - a
        x = x + jnp.where(grow[None, :] & oh_i, delta[None, :], 0.0)
        x = x - jnp.where((~grow[None, :]) & oh_j, delta[None, :], 0.0)
        nrl = nrl + jnp.where((~grow[None, :]) & oh_i, 1.0, 0.0)
        nxt = jnp.int32(k + 2)
        i = jnp.where(grow, i, nxt)
        j = jnp.where(grow, nxt, j)
        return (i, j, x, nrl), None

    n = N
    first_level = True
    while n > 1:
        npad = -(-n // K) * K
        key, sub = jax.random.split(key)
        if npad > n:
            # zero fractional parts retire at 0 without a count and
            # without biasing anything; their idx slot receives 0.0
            phi = jnp.concatenate([phi, jnp.zeros(npad - n, phi.dtype)])
            idx = jnp.concatenate([idx, jnp.zeros(npad - n, jnp.int32)])
        B = npad // K
        # reshape(K, B): block b is the STRIDED set {b, B+b, 2B+b, ...} —
        # any disjoint partition is a valid pairing structure, and this
        # one needs no transpose to put B on the lane axis
        x = phi.reshape(K, B)
        nrl = jnp.zeros((K, B), nr.dtype)
        u = jax.random.uniform(sub, (K - 1, B))
        ks = jnp.arange(K - 1, dtype=jnp.int32)
        (i, j, x, nrl), _ = jax.lax.scan(
            body,
            (jnp.zeros(B, jnp.int32), jnp.ones(B, jnp.int32), x, nrl),
            (ks, u))
        s = jnp.where(j >= K, i, j)          # (B,) block survivors
        oh_s = sub_iota == s[None, :]
        phi = jnp.sum(jnp.where(oh_s, x, 0.0), axis=0)
        idx_blocks = idx.reshape(K, B)
        idx = jnp.sum(jnp.where(oh_s, idx_blocks, 0), axis=0)
        if first_level:
            nr = nr + nrl.reshape(-1)[:N]    # flat order == input order
            first_level = False
        else:
            nr = nr.at[idx_blocks.reshape(-1)].add(nrl.reshape(-1))
        n = B
    # final survivor: exact arithmetic forces its value to {0, 1}; land
    # the float residual deterministically so the counts sum to M (counts
    # and M are integers < 2^24, so the f32 sum below is exact)
    nr = nr.at[idx[0]].add(M - jnp.sum(nr))
    return nr.astype(jnp.int32)


class MultinomialQueue:
    """On-the-fly multinomial draws in amortised O(1) per draw.

    API-parity port of the reference helper (resampling.py:709-756) for
    host-side (non-jit) consumers such as interactive smoothing experiments.
    Inside jitted code, draw directly with :func:`multinomial_iid`.
    """

    def __init__(self, key, W, M=None):
        self.W = W
        self.M = W.shape[0] if M is None else M
        self.key = key
        self.j = 0
        self.enqueue()

    def enqueue(self):
        self.key, sub = jax.random.split(self.key)
        self.A = multinomial_iid(sub, self.W, self.M)

    def dequeue(self, k):
        """Return the next *k* multinomial draws."""
        if self.j + k <= self.M:
            out = self.A[self.j : self.j + k]
            self.j += k
        elif k <= self.M:
            nextra = self.j + k - self.M
            head = self.A[self.j :]
            self.enqueue()
            out = jnp.concatenate([head, self.A[:nextra]])
            self.j = nextra
        else:
            raise ValueError("MultinomialQueue: k must be <= M")
        return out
