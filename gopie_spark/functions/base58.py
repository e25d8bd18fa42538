"""Base58 (Bitcoin alphabet) codec, vectorized over uint64 arrays.

Capability parity with the reference encoder/decoder
(pkg/base58/base58.go:33-67); used for synthetic short-URL path segments.
"""

from __future__ import annotations

import numpy as np

ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_CHARS = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)
_INDEX = {c: i for i, c in enumerate(ALPHABET)}


def base58_encode(values) -> np.ndarray:
    """uint64 array -> numpy array of str."""
    x = np.asarray(values, dtype=np.uint64).copy()
    n = x.size
    # max base58 digits for uint64 is 11
    digits = np.zeros((n, 11), dtype=np.uint8)
    for pos in range(10, -1, -1):
        digits[:, pos] = (x % np.uint64(58)).astype(np.uint8)
        x //= np.uint64(58)
    out = []
    chars = _CHARS[digits]
    for i in range(n):
        row = digits[i]
        nz = np.nonzero(row)[0]
        start = nz[0] if nz.size else 10
        out.append(chars[i, start:].tobytes().decode())
    return np.array(out, dtype=object)


def base58_decode(values) -> np.ndarray:
    """iterable of str -> uint64 array."""
    out = np.zeros(len(values), dtype=np.uint64)
    for i, s in enumerate(values):
        acc = 0
        for ch in s:
            acc = acc * 58 + _INDEX[ch]
        out[i] = acc
    return out
