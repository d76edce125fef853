"""Shared deterministic hashing helpers (no dependencies, no RNG state)."""

from __future__ import annotations


def splitmix64(x: int) -> int:
    """splitmix64 finalizer — the repo's one seed-expansion primitive
    (minhash coefficients, LSH hyperplanes, test fixtures). Keep the
    single definition: the generated DuckDB oracles embed constants
    derived from it, so a fork would silently desynchronize engines."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)
