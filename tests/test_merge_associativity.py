"""F5 merge-associativity gate (BASELINE.md "Merge gate").

For every mergeable sketch: (A ⊎ B) ⊎ C == A ⊎ (B ⊎ C), byte-equal states,
across round-robin / hash / skewed partition splits of the same input, and
any split order equals the serial single-partition build.
"""

import numpy as np
import pytest

from gopie_spark.kernels import (CMS, HLL, BloomBit, BloomCounting,
                                 BloomScalable, MinHash, SimHash, Theta)
from gopie_spark.kernels.hashes import fnv1_64_values


def _zipf_tokens(n=10_000, vocab=1_000, seed=42):
    rng = np.random.default_rng(seed)
    ids = rng.zipf(1.2, size=n) % vocab
    return [f"token-{i}" for i in ids]


TOKENS = _zipf_tokens()


def _splits(values, n_parts, mode):
    idx = np.arange(len(values))
    if mode == "roundrobin":
        parts = [idx[i::n_parts] for i in range(n_parts)]
    elif mode == "hash":
        h = fnv1_64_values(values) % np.uint64(n_parts)
        parts = [idx[h == np.uint64(i)] for i in range(n_parts)]
    elif mode == "skew":
        cut = int(len(values) * 0.9)
        rest = np.array_split(idx[cut:], max(1, n_parts - 1))
        parts = [idx[:cut]] + list(rest)
    return [[values[i] for i in p] for p in parts]


def _state_bytes(sketch, state):
    return sketch.serialize(state)


SKETCHES = [
    ("hll", HLL(p=12)),
    ("hll_fnv", HLL(p=12, hash_name="fnv1_32")),
    ("cms", CMS(width=2719, depth=7)),
    ("bloom_bit", BloomBit(m=1 << 14, k=6)),
    ("bloom_counting", BloomCounting(m=1 << 14, k=6)),
    ("minhash", MinHash(k=64)),
    ("simhash", SimHash()),
    ("theta", Theta(k=256)),  # k < distinct(TOKENS) so the trim tier merges
]


def _build(sketch, values):
    st = sketch.zero()
    if values:
        sketch.update(st, values)
    return st


@pytest.mark.parametrize("name,sketch", SKETCHES)
@pytest.mark.parametrize("mode", ["roundrobin", "hash", "skew"])
@pytest.mark.parametrize("n_parts", [2, 3, 8, 32])
def test_split_equals_serial(name, sketch, mode, n_parts):
    serial = _state_bytes(sketch, _build(sketch, TOKENS))
    parts = _splits(TOKENS, n_parts, mode)
    states = [_build(sketch, p) for p in parts]
    merged = states[0]
    for s in states[1:]:
        merged = sketch.merge(merged, s)
    assert _state_bytes(sketch, merged) == serial


@pytest.mark.parametrize("name,sketch", SKETCHES)
def test_associativity_byte_equal(name, sketch):
    a_vals, b_vals, c_vals = _splits(TOKENS, 3, "skew")
    build = lambda v: _build(sketch, v)
    left = sketch.merge(sketch.merge(build(a_vals), build(b_vals)), build(c_vals))
    right = sketch.merge(build(a_vals), sketch.merge(build(b_vals), build(c_vals)))
    assert _state_bytes(sketch, left) == _state_bytes(sketch, right)
    # commutativity
    swapped = sketch.merge(sketch.merge(build(b_vals), build(a_vals)), build(c_vals))
    assert _state_bytes(sketch, swapped) == _state_bytes(sketch, left)


def test_scalable_bloom_split_union_semantics():
    """Scalable Bloom merge is level-wise OR: not byte-identical to a serial
    build (levels fill differently), but exact on membership of the union
    and associative/commutative byte-wise among merge orders."""
    bf = BloomScalable(n0=500, p=0.01)
    parts = _splits([f"u{i}" for i in range(4000)], 3, "roundrobin")
    a, b, c = (_build(bf, p) for p in parts)

    def ser(st):
        return bf.serialize(st)

    left = bf.merge(bf.merge(bf.deserialize(ser(a)), bf.deserialize(ser(b))),
                    bf.deserialize(ser(c)))
    right = bf.merge(bf.deserialize(ser(a)),
                     bf.merge(bf.deserialize(ser(b)), bf.deserialize(ser(c))))
    assert ser(left) == ser(right)
    assert bf.exist(left, [f"u{i}" for i in range(4000)]).all()
