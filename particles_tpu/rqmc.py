"""Randomised quasi-Monte Carlo sequences (Sobol, Halton, Latin hypercube).

Counterpart of reference ``rqmc.py`` (rqmc.py:14-21), which delegates to
``scipy.stats.qmc``.  JAX provides no QMC primitives, and SQMC needs RQMC
draws *inside* the compiled filter loop (one scrambled set per time step),
so Sobol is implemented natively:

* direction numbers from the standard Joe & Kuo (new-joe-kuo-6) table,
  bundled as package data for all 21201 dimensions
  (``data/sobol_joe_kuo.npz``, see ``tools/extract_sobol_table.py``;
  validated bit-exact against scipy in the tests);
* randomisation by **linear matrix scramble + digital shift** (Matousek's
  LMS, the scheme scipy's ``qmc.Sobol(scramble=True)`` uses, which the
  reference delegates to): each dimension's direction numbers are
  multiplied over GF(2) by a random lower-triangular bit matrix with unit
  diagonal, then the points are XOR-ed with a random 32-bit word.  The
  scramble transforms the (d, 32) direction-number table — not the (N, d)
  points — so its cost is independent of N and it runs inside the SQMC
  scan.  ``scramble="shift"`` gives the plain digital shift.

Also provides scrambled Halton and Latin hypercube for parity (including
fixing the reference's ``qmc.LatinHybercube`` typo, rqmc.py:21).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sobol", "halton", "latin", "sobol_unscrambled"]


_BITS = 32


@functools.lru_cache(maxsize=None)
def _joe_kuo_table():
    """Bundled Joe & Kuo new-joe-kuo-6 table (21201 dimensions): primitive
    polynomials and initial m-values, extracted by
    ``tools/extract_sobol_table.py`` (same public data scipy redistributes;
    the reference gets it via scipy, rqmc.py:14)."""
    from pathlib import Path

    path = Path(__file__).parent / "data" / "sobol_joe_kuo.npz"
    npz = np.load(path)
    return (np.asarray(npz["poly"], np.int64),
            np.asarray(npz["vinit"], np.int64))


MAX_SOBOL_DIM = 21201


@functools.lru_cache(maxsize=None)
def _direction_numbers(d):
    """(d, 32) uint32 array of direction numbers V_j (bit-reversed
    fractions), computed once in numpy at trace time.

    Vectorised over dimensions: the degree-s recurrence
    ``v_j = v_{j-s} ^ (v_{j-s} >> s) ^ XOR_k a_k v_{j-k}`` runs as 32
    column steps of (d,)-wide XORs, so even d ~ 2e4 expands in ms.
    """
    if d > MAX_SOBOL_DIM:
        raise ValueError(
            f"Sobol direction-number table covers {MAX_SOBOL_DIM} "
            f"dimensions, got d={d}"
        )
    V = np.zeros((d, _BITS), dtype=np.uint64)
    # dimension 1: van der Corput
    V[0] = np.uint64(1) << (np.uint64(_BITS - 1) - np.arange(_BITS, dtype=np.uint64))
    if d == 1:
        return V.astype(np.uint32)
    poly, vinit = _joe_kuo_table()
    p = poly[1:d]  # full primitive polynomial, e.g. x^2+x+1 -> 0b111
    s = np.array([int(x).bit_length() - 1 for x in p], np.int64)  # degree
    m = vinit[1:d].astype(np.uint64)  # (d-1, 18) initial m-values
    rows = np.arange(1, d)
    smax = int(s.max())
    cols = np.arange(_BITS)
    # initial columns j < s: V_j = m_j << (BITS-1-j)
    init = m[:, :_BITS] << np.uint64(_BITS - 1) - np.arange(
        min(_BITS, m.shape[1]), dtype=np.uint64
    )
    V[1:, : init.shape[1]] = np.where(cols[: init.shape[1]] < s[:, None],
                                      init, 0)
    for j in range(1, _BITS):  # degree >= 1 always, so column 0 is initial
        active = j >= s
        base = V[rows, np.maximum(j - s, 0)]
        val = base ^ (base >> s.astype(np.uint64))
        for k in range(1, min(j, smax)):
            # coefficient of x^{s-k} in the polynomial
            coef = ((p >> np.maximum(s - k, 0)) & 1).astype(bool)
            use = active & (k < s) & coef
            val = np.where(use, val ^ V[rows, j - k], val)
        V[rows, j] = np.where(active, val, V[rows, j])
    return V.astype(np.uint32)


def _sobol_ints(N, d, V=None, start=0, count=None):
    """(count, d) uint32 raw Sobol integers (rows [start, start+count) of
    the N-point sequence) via Gray-code XOR expansion, fully vectorised
    (32 static XOR terms).  ``start`` may be traced; ``count`` is static
    (defaults to N)."""
    if V is None:
        V = jnp.asarray(_direction_numbers(d))  # (d, 32)
    if count is None:
        count = N
    i = jnp.uint32(start) + jnp.arange(count, dtype=jnp.uint32)
    gray = i ^ (i >> 1)
    out = jnp.zeros((count, d), dtype=jnp.uint32)
    for j in range(_BITS):
        bit = ((gray >> j) & 1).astype(jnp.uint32)  # (N,)
        out = out ^ (bit[:, None] * V[None, :, j])
    return out


def _lms_direction_numbers(key, d):
    """Direction numbers after a random linear matrix scramble (Matousek).

    Each dimension gets an independent random lower-triangular 32x32 bit
    matrix L with unit diagonal ("lower-triangular" w.r.t. leading bits:
    output bit i depends only on input bits 0..i counted from the MSB, so
    leading-bit equidistribution — the digital-net property — is
    preserved).  Scrambling the direction numbers is equivalent to
    scrambling every point (GF(2) linearity) at 1/N-th the cost.
    """
    V = jnp.asarray(_direction_numbers(d))  # (d, 32)
    rb = jax.random.bits(key, (d, _BITS), dtype=jnp.uint32)  # row entropy
    i = jnp.arange(_BITS, dtype=jnp.uint32)
    diag = (jnp.uint32(1) << (jnp.uint32(_BITS - 1) - i))     # (32,)
    # row i may have 1s only at MSB positions 0..i; force the diagonal
    allowed = ~(diag - jnp.uint32(1))
    rows = (rb & allowed & ~diag) | diag                      # (d, 32)
    Vp = jnp.zeros_like(V)
    for b in range(_BITS):
        par = jax.lax.population_count(rows[:, b:b + 1] & V) & jnp.uint32(1)
        Vp = Vp | (par << jnp.uint32(_BITS - 1 - b))
    return Vp


def _bitreverse32(x):
    """Reverse the 32 bits of a uint32 array (5 butterfly steps)."""
    x = ((x & jnp.uint32(0x55555555)) << 1) | (
        (x & jnp.uint32(0xAAAAAAAA)) >> 1)
    x = ((x & jnp.uint32(0x33333333)) << 2) | (
        (x & jnp.uint32(0xCCCCCCCC)) >> 2)
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | (
        (x & jnp.uint32(0xF0F0F0F0)) >> 4)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | (
        (x & jnp.uint32(0xFF00FF00)) >> 8)
    return (x << 16) | (x >> 16)


def _owen_scramble_ints(ints, seeds):
    """Nested-uniform (Owen) scramble of Sobol integers, per dimension.

    Hash-based construction (Laine & Karras 2011; Burley 2020, "Practical
    hash-based Owen scrambling"): in the bit-reversed domain, additions
    and ``x ^= x * even`` only propagate information UPWARD, so after
    reversing back every output digit depends only on the MORE significant
    input digits — exactly the nested-uniform tree, with the per-node
    random flips supplied by the hash.  Unlike the linear LMS scramble
    this is nonlinear in GF(2) (a strictly larger randomisation family,
    stronger variance behaviour on non-smooth integrands); the cost is
    O(N d) elementwise uint32 ops on the points themselves.

    ``ints``: (N, d) uint32 raw Sobol integers; ``seeds``: (d,) uint32.
    """
    x = _bitreverse32(ints)
    s = seeds[None, :]
    # Burley's avalanche-quality update chain (all constants even)
    x = x + s
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return _bitreverse32(x)


def sobol_unscrambled(N, d):
    """Deterministic Sobol points in [0, 1)^d (for tests/debugging)."""
    ints = _sobol_ints(N, d)
    return ints.astype(jnp.float64 if jax.config.jax_enable_x64
                       else jnp.float32) * (2.0**-_BITS)


def _clamp(u):
    """Keep points strictly inside (0, 1) (reference clamps too, rqmc.py:9-11)."""
    eps = 1e-7
    return jnp.clip(u, eps, 1.0 - eps)


def safe_generate(N, d, engine_cls):
    """Generate N points from a scipy-style QMC engine, squeezed strictly
    inside (0, 1) (reference rqmc.py:8-12: ``0.5 + (1 - TOL)*(u - 0.5)``).

    ``engine_cls`` is instantiated as ``engine_cls(d)`` and must expose
    ``.random(N)`` (the ``scipy.stats.qmc`` protocol); a bare callable
    ``engine_cls(d)(N)`` is accepted too.  Host-side API-parity helper —
    the jit-capable TPU generators are :func:`sobol` / :func:`halton`.
    """
    import numpy as _np

    eng = engine_cls(d)
    u = eng.random(N) if hasattr(eng, "random") else eng(N)
    tol = 1e-10
    return 0.5 + (1.0 - tol) * (_np.asarray(u) - 0.5)


def sobol(key, N, d, scramble="lms_shift", start=0, count=None):
    """Scrambled Sobol points: (N, d) in (0, 1) (counterpart of reference
    ``sobol``, rqmc.py:14-15, whose scipy backend uses LMS + shift).

    ``scramble``: ``"lms_shift"`` (default, matches the reference's
    randomisation family), ``"owen"`` (nested-uniform Owen scrambling via
    the hash-based construction — a strictly stronger randomisation
    family, see :func:`_owen_scramble_ints`), or ``"shift"`` (digital
    shift only — cheaper, still valid RQMC).

    ``start``/``count`` select rows [start, start+count) of the sequence
    without generating the rest (``start`` may be traced) — under
    particle sharding each shard draws exactly its slice of ONE global
    point set.
    """
    if scramble == "lms_shift":
        k_lms, k_shift = jax.random.split(key)
        ints = _sobol_ints(N, d, V=_lms_direction_numbers(k_lms, d),
                           start=start, count=count)
    elif scramble == "owen":
        seeds = jax.random.bits(key, (d,), dtype=jnp.uint32)
        ints = _owen_scramble_ints(
            _sobol_ints(N, d, start=start, count=count), seeds)
        return _clamp((ints >> jnp.uint32(8)).astype(jnp.float32)
                      * (2.0 ** -(_BITS - 8)))
    elif scramble == "shift":
        k_shift = key
        ints = _sobol_ints(N, d, start=start, count=count)
    else:
        raise ValueError(f"unknown scramble: {scramble!r}")
    shift = jax.random.bits(k_shift, (d,), dtype=jnp.uint32)
    shifted = ints ^ shift[None, :]
    # top 24 bits convert to float32 exactly (no mantissa rounding), so
    # points never cross dyadic cell boundaries and the scrambled net's
    # stratification survives the float conversion bit-exactly
    return _clamp((shifted >> jnp.uint32(8)).astype(jnp.float32)
                  * (2.0 ** -(_BITS - 8)))


def sobol_sorted0(key, N, d, start=0, count=None):
    """LMS+shift-scrambled Sobol points generated DIRECTLY in the order
    sorted by coordinate 0 — no ``lax.sort`` (the SQMC engine's per-step
    u-sort, ~2.4 ms at N=2^20, becomes closed-form index arithmetic).

    ``start``/``count`` select a row slice [start, start+count) of the
    sorted (N, d) matrix without generating the rest — ``start`` may be a
    traced scalar (e.g. ``shard * N_local`` inside shard_map), ``count``
    must be static.  This is what makes the SQMC point set *shardable*:
    each device generates exactly its block of the globally-sorted set.

    Why this works: at N = 2^m the first coordinate is a (0, m, 1)-net —
    one point per dyadic cell [j/N, (j+1)/N) — so sorting by value is
    ordering by cell index, and the cell of the i-th point is GF(2)-LINEAR
    in the Gray-code bits g of i: ``cell = A g ^ s`` where A's columns are
    the top m bits of dimension 0's scrambled direction numbers and s is
    the top of the digital shift.  Unscrambled, those columns are the
    identity; the LMS matrix is unit-lower-triangular w.r.t. leading bits
    by construction, so A is unit-lower-triangular and inverts by forward
    substitution with STATIC control flow.  Every coordinate of the point
    in cell j is then the usual XOR expansion evaluated at
    ``g(j) = A^{-1}(j ^ s)`` — all elementwise bit arithmetic.

    Bit-identical to ``lax.sort``-ing the output of :func:`sobol` (same
    key): same point set, same order (cells are disjoint; the float
    conversion keeps the top 24 >= m bits).  Requires N a power of two
    (callers fall back to the sort-based path otherwise).
    """
    m = int(N).bit_length() - 1
    if N != (1 << m) or m > 24:
        raise ValueError("sobol_sorted0 requires N a power of 2 (<= 2^24)")
    k_lms, k_shift = jax.random.split(key)
    Vp = _lms_direction_numbers(k_lms, d)              # (d, 32) uint32
    shift = jax.random.bits(k_shift, (d,), dtype=jnp.uint32)

    # A[r, c] = bit r (from the top of the m-bit prefix) of Vp[0, c];
    # row masks a_r hold A[r, c] at bit position c (traced scalars)
    arows = [
        functools.reduce(
            lambda acc, c: acc
            | (((Vp[0, c] >> jnp.uint32(31 - r)) & jnp.uint32(1))
               << jnp.uint32(c)),
            range(m),
            jnp.uint32(0),
        )
        for r in range(m)
    ]
    # invert the unit-lower-triangular A over GF(2): row r of A^{-1} is
    # e_r ^ XOR_{c<r} A[r,c] * (A^{-1} row c)  (forward substitution)
    ainv = []
    for r in range(m):
        row = jnp.uint32(1 << r)
        for c in range(r):
            bit = (arows[r] >> jnp.uint32(c)) & jnp.uint32(1)
            row = row ^ (bit * ainv[c])
        ainv.append(row)

    if count is None:
        count = N
    j = jnp.uint32(start) + jnp.arange(count, dtype=jnp.uint32)
    y = j ^ (shift[0] >> jnp.uint32(32 - m))           # cell ^ shift-top
    # A's components are indexed top-first (component c = numeric bit
    # m-1-c of the cell): re-pack y's bits to match the row masks
    yrev = _bitreverse32(y) >> jnp.uint32(32 - m)
    out = jnp.zeros((count, d), dtype=jnp.uint32)
    for r in range(m):
        g_r = jax.lax.population_count(ainv[r] & yrev) & jnp.uint32(1)
        out = out ^ (g_r[:, None] * Vp[None, :, r])
    out = out ^ shift[None, :]
    return _clamp((out >> jnp.uint32(8)).astype(jnp.float32)
                  * (2.0 ** -(_BITS - 8)))


def _first_primes(d):
    primes = []
    n = 2
    while len(primes) < d:
        if all(n % p for p in primes):
            primes.append(n)
        n += 1
    return primes


def halton(key, N, d):
    """Randomised (shifted) Halton points (reference ``halton``, rqmc.py:17-18)."""
    primes = _first_primes(d)
    cols = []
    i = jnp.arange(N, dtype=jnp.float32)
    shifts = jax.random.uniform(key, (d,))
    for k, b in enumerate(primes):
        x = jnp.zeros(N, jnp.float32)
        f = 1.0 / b
        n = jnp.arange(N)
        # enough digits to cover N
        ndig = int(np.ceil(np.log(max(N, 2)) / np.log(b))) + 1
        for dig in range(ndig):
            x = x + (n // (b**dig) % b) * f / (b**dig)
        cols.append((x + shifts[k]) % 1.0)
    del i
    return _clamp(jnp.stack(cols, axis=1))


def latin(key, N, d):
    """Latin hypercube sample (reference ``latin``, rqmc.py:20-21 — note the
    reference's ``qmc.LatinHybercube`` typo makes its version unusable)."""
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (N, d))
    perms = jnp.stack(
        [jax.random.permutation(jax.random.fold_in(k2, j), N)
         for j in range(d)],
        axis=1,
    )
    return _clamp((perms + u) / N)
