"""Hash kernel parity tests: vectorized NumPy vs scalar references + official vectors."""

import numpy as np
import pytest

from gopie_spark.kernels import hashes
from tests import reference_impls as ref

RNG = np.random.default_rng(42)


def _random_byte_strings(n=500, maxlen=40):
    out = []
    for _ in range(n):
        ln = int(RNG.integers(0, maxlen))
        out.append(bytes(RNG.integers(0, 256, size=ln, dtype=np.uint8)))
    # force edge cases
    out += [b"", b"\x00", b"a" * 7, b"a" * 8, b"a" * 9, b"a" * 16, b"a" * 64]
    return out


# Official SipHash-2-4 test vectors (reference C implementation, public):
# key = 00 01 02 ... 0f, message i = bytes 0..i-1, little-endian outputs.
SIP_OFFICIAL_KEY = bytes(range(16))
SIP_OFFICIAL_VECTORS = [
    0x726FDB47DD0E0E31, 0x74F839C593DC67FD, 0x0D6C8009D9A94F5A,
    0x85676696D7FB7E2D, 0xCF2794E0277187B7, 0x18765564CD99A68D,
    0xCBC9466E58FEE3CE, 0xAB0200F58B01D137,
]


def test_siphash_scalar_matches_official_vectors():
    for i, expect in enumerate(SIP_OFFICIAL_VECTORS):
        msg = bytes(range(i))
        assert ref.siphash24(SIP_OFFICIAL_KEY, msg) == expect, f"len={i}"


def test_siphash_vectorized_matches_official_vectors(monkeypatch):
    monkeypatch.setattr(hashes, "SIP_K0",
                        np.uint64(int.from_bytes(SIP_OFFICIAL_KEY[:8], "little")))
    monkeypatch.setattr(hashes, "SIP_K1",
                        np.uint64(int.from_bytes(SIP_OFFICIAL_KEY[8:], "little")))
    msgs = [bytes(range(i)) for i in range(len(SIP_OFFICIAL_VECTORS))]
    got = hashes.siphash24_values(msgs)
    assert got.tolist() == SIP_OFFICIAL_VECTORS


def test_siphash_vectorized_matches_scalar_gopie_key():
    msgs = _random_byte_strings()
    got = hashes.siphash24_values(msgs)
    want = [ref.siphash24(ref.GOPIE_SIP_KEY, m) for m in msgs]
    assert got.tolist() == want


def test_fnv1_32_matches_scalar():
    msgs = _random_byte_strings()
    got = hashes.fnv1_32_values(msgs)
    want = [ref.fnv1_32(m) for m in msgs]
    assert got.tolist() == want


def test_fnv1_64_matches_scalar():
    msgs = _random_byte_strings()
    got = hashes.fnv1_64_values(msgs)
    want = [ref.fnv1_64(m) for m in msgs]
    assert got.tolist() == want


def test_fnv_known_values():
    # FNV-1 spec examples: fnv1_32("a") = 0x050c5d7e, fnv1_64("a") = 0xaf63bd4c8601b7be
    assert hashes.fnv1_32_values(["a"])[0] == 0x050C5D7E
    assert hashes.fnv1_64_values(["a"])[0] == 0xAF63BD4C8601B7BE
    # empty string hashes to the offset basis
    assert hashes.fnv1_32_values([""])[0] == 2166136261
    assert hashes.fnv1_64_values([b""])[0] == 14695981039346656037


def test_string_and_bytes_inputs_agree():
    strings = ["hello", "wörld", "", "日本語"]
    as_bytes = [s.encode("utf-8") for s in strings]
    for fn in (hashes.fnv1_32_values, hashes.fnv1_64_values,
               hashes.siphash24_values):
        assert fn(strings).tolist() == fn(as_bytes).tolist()


def test_pandas_and_arrow_inputs():
    import pandas as pd
    import pyarrow as pa
    vals = ["alpha", "beta", "", "gamma delta"]
    want = hashes.fnv1_64_values(vals).tolist()
    assert hashes.fnv1_64_values(pd.Series(vals)).tolist() == want
    assert hashes.fnv1_64_values(pa.array(vals)).tolist() == want
    chunked = pa.chunked_array([vals[:2], vals[2:]])
    assert hashes.fnv1_64_values(chunked).tolist() == want


def test_sliced_arrow_array_offsets():
    import pyarrow as pa
    vals = ["aa", "bb", "cc", "dd", "ee"]
    arr = pa.array(vals).slice(1, 3)
    got = hashes.fnv1_32_values(arr).tolist()
    want = hashes.fnv1_32_values(vals[1:4]).tolist()
    assert got == want


def test_mix64_is_bijective_sample():
    x = np.arange(10000, dtype=np.uint64)
    y = hashes.mix64(x)
    assert len(np.unique(y)) == len(x)
