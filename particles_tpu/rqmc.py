"""Randomised quasi-Monte Carlo sequences (Sobol, Halton, Latin hypercube).

Counterpart of reference ``rqmc.py`` (rqmc.py:14-21), which delegates to
``scipy.stats.qmc``.  JAX provides no QMC primitives, and SQMC needs RQMC
draws *inside* the compiled filter loop (one scrambled set per time step),
so Sobol is implemented natively:

* direction numbers from the standard Joe & Kuo (new-joe-kuo-6) table
  (first 21 dimensions hard-coded; validated against scipy in the tests);
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


# Joe & Kuo new-joe-kuo-6 table: (s, a, [m_1..m_s]) for dimensions 2..21
# (dimension 1 is the van der Corput sequence).
_JOE_KUO = [
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
    (5, 4, [1, 1, 5, 5, 5]),
    (5, 7, [1, 1, 7, 11, 19]),
    (5, 11, [1, 1, 5, 1, 1]),
    (5, 13, [1, 1, 1, 3, 11]),
    (5, 14, [1, 3, 5, 5, 31]),
    (6, 1, [1, 3, 3, 9, 7, 49]),
    (6, 13, [1, 1, 1, 15, 21, 21]),
    (6, 16, [1, 3, 1, 13, 27, 49]),
    (6, 19, [1, 1, 1, 15, 7, 5]),
    (6, 22, [1, 3, 1, 15, 13, 25]),
    (6, 25, [1, 1, 5, 5, 19, 61]),
    (7, 1, [1, 3, 7, 11, 23, 15, 103]),
    (7, 4, [1, 3, 7, 13, 13, 15, 69]),
]

_BITS = 32


@functools.lru_cache(maxsize=None)
def _direction_numbers(d):
    """(d, 32) uint32 array of direction numbers V_j (bit-reversed
    fractions), computed once in numpy at trace time."""
    if d - 1 > len(_JOE_KUO):
        # beyond the hard-coded table: borrow scipy's (30-bit) direction
        # numbers if available, left-aligned to our 32-bit convention
        try:
            from scipy.stats import qmc as _sq

            sv = np.asarray(_sq.Sobol(d, scramble=False)._sv, np.uint32)
            return (sv.astype(np.uint64) << np.uint64(2)).astype(np.uint32)
        except Exception as exc:  # pragma: no cover
            raise NotImplementedError(
                f"native Sobol table covers {len(_JOE_KUO) + 1} dimensions "
                f"and scipy fallback failed: {exc}"
            )
    V = np.zeros((d, _BITS), dtype=np.uint64)
    # dimension 1: van der Corput
    for j in range(_BITS):
        V[0, j] = 1 << (_BITS - 1 - j)
    for dim in range(1, d):
        s, a, m = _JOE_KUO[dim - 1]
        m = list(m)
        v = np.zeros(_BITS, dtype=np.uint64)
        for j in range(s):
            v[j] = np.uint64(m[j]) << np.uint64(_BITS - 1 - j)
        for j in range(s, _BITS):
            v[j] = v[j - s] ^ (v[j - s] >> np.uint64(s))
            for k in range(1, s):
                if (a >> (s - 1 - k)) & 1:
                    v[j] ^= v[j - k]
        V[dim] = v
    return V.astype(np.uint32)


def _sobol_ints(N, d, V=None):
    """(N, d) uint32 raw Sobol integers via Gray-code XOR expansion,
    fully vectorised (32 static XOR terms)."""
    if V is None:
        V = jnp.asarray(_direction_numbers(d))  # (d, 32)
    i = jnp.arange(N, dtype=jnp.uint32)
    gray = i ^ (i >> 1)
    out = jnp.zeros((N, d), dtype=jnp.uint32)
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


def sobol_unscrambled(N, d):
    """Deterministic Sobol points in [0, 1)^d (for tests/debugging)."""
    ints = _sobol_ints(N, d)
    return ints.astype(jnp.float64 if jax.config.jax_enable_x64
                       else jnp.float32) * (2.0**-_BITS)


def _clamp(u):
    """Keep points strictly inside (0, 1) (reference clamps too, rqmc.py:9-11)."""
    eps = 1e-7
    return jnp.clip(u, eps, 1.0 - eps)


def sobol(key, N, d, scramble="lms_shift"):
    """Scrambled Sobol points: (N, d) in (0, 1) (counterpart of reference
    ``sobol``, rqmc.py:14-15, whose scipy backend uses LMS + shift).

    ``scramble``: ``"lms_shift"`` (default, matches the reference's
    randomisation family) or ``"shift"`` (digital shift only — cheaper,
    still valid RQMC).
    """
    if scramble == "lms_shift":
        k_lms, k_shift = jax.random.split(key)
        ints = _sobol_ints(N, d, V=_lms_direction_numbers(k_lms, d))
    elif scramble == "shift":
        k_shift = key
        ints = _sobol_ints(N, d)
    else:
        raise ValueError(f"unknown scramble: {scramble!r}")
    shift = jax.random.bits(k_shift, (d,), dtype=jnp.uint32)
    shifted = ints ^ shift[None, :]
    # top 24 bits convert to float32 exactly (no mantissa rounding), so
    # points never cross dyadic cell boundaries and the scrambled net's
    # stratification survives the float conversion bit-exactly
    return _clamp((shifted >> jnp.uint32(8)).astype(jnp.float32)
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
