"""Collision-free pseudo-random uint32 sequence via quadratic residues.

Capability parity with the reference's generator
(pkg/randomsequence/randomseq.go:18-37): for prime p = 4294967291
(p ≡ 3 mod 4), x -> x^2 mod p is a bijection on quadratic residues; mapping
x <= p/2 to x^2 mod p and x > p/2 to p - x^2 mod p permutes [0, p).
Used for deterministic, collision-free synthetic document ids.
"""

from __future__ import annotations

import numpy as np

P = 4294967291  # largest prime below 2^32, p % 4 == 3


def quadratic_permutation(x: np.ndarray) -> np.ndarray:
    """Permute uint64 values in [0, P) collision-free."""
    x = np.asarray(x, dtype=np.uint64)
    sq = (x * x) % np.uint64(P)
    out = np.where(x <= np.uint64(P // 2), sq, np.uint64(P) - sq)
    return out.astype(np.uint64)


def permuted_ids(start: int, count: int, rounds: int = 2) -> np.ndarray:
    """``count`` unique pseudo-random ids for indices [start, start+count).

    Two permutation rounds with an offset between them de-correlates
    sequential inputs (same trick as the reference docs suggest).
    """
    ids = np.arange(start, start + count, dtype=np.uint64) % np.uint64(P)
    for r in range(rounds):
        ids = quadratic_permutation((ids + np.uint64(0x5BF03635)) % np.uint64(P))
    return ids
