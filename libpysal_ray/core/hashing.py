"""Deterministic integer hashing used across the engine.

All randomness in the engine is derived from these stable integer mixers so
every stage is reproducible across runs, batch orders, and cluster sizes
(the reference pins determinism the same way — seeded numpy for tie-breaks,
scipy-order KNN ties; see /root/reference/libpysal/weights/spatial_lag.py:227).

Two families:

* ``splitmix64`` — fast 64-bit mixer (public-domain algorithm), vectorized
  over numpy uint64 arrays. Used for salting, jitter seeds, synthetic data.
* multiplicative 32-bit Knuth hashes — used for the deterministic geocode,
  because they are exactly reproducible in ANSI SQL (the DuckDB oracle):
  ``(id * C) % 2**32`` with odd constants.
"""

from __future__ import annotations

import numpy as np

# Knuth multiplicative constants (public, from TAOCP / Fibonacci hashing).
GEO_CX = np.uint64(2654435761)  # 2^32 / phi
GEO_CY = np.uint64(2246822519)  # xxhash prime 2
U32 = np.uint64(4294967296 - 1)  # mask 2^32-1
M32 = 4294967296  # modulus 2^32


def mul32(ids: np.ndarray, const: np.uint64) -> np.ndarray:
    """``(ids * const) mod 2**32`` as uint64 — SQL-reproducible hash."""
    a = ids.astype(np.uint64, copy=False)
    return (a * const) & U32


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return z


def hash_strings_u64(strs, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash of a sequence of strings (FNV-1a + splitmix)."""
    out = np.empty(len(strs), dtype=np.uint64)
    fnv_offset = np.uint64(0xCBF29CE484222325)
    fnv_prime = np.uint64(0x100000001B3)
    for i, s in enumerate(strs):
        h = fnv_offset ^ np.uint64(seed)
        for b in s.encode("utf-8"):
            h = (h ^ np.uint64(b)) * fnv_prime
        out[i] = h
    return splitmix64(out)
