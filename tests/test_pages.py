"""Pages source: determinism + byte-identical extract_text invariant."""

import numpy as np
import pandas as pd
import pytest

from gopie_spark.functions.base58 import base58_decode, base58_encode
from gopie_spark.functions.jumphash import jump_hash
from gopie_spark.functions.randomsequence import permuted_ids
from gopie_spark.sources.pages import (_chunk, _vocab, extract_text,
                                       extract_text_series, generate_pages,
                                       with_extracted_text)


@pytest.fixture(scope="module")
def sample_pdf():
    rng = np.random.default_rng(42)
    return _chunk(rng, _vocab(rng), 0, 500)


def test_extract_text_inverts_generator(sample_pdf):
    for _, row in sample_pdf.iterrows():
        assert extract_text(row["html"]) == row["text"]


def test_vectorized_extraction_matches_scalar(sample_pdf):
    vec = extract_text_series(sample_pdf["html"])
    ser = sample_pdf["html"].map(extract_text)
    assert (vec == ser).all()


def test_extract_text_edge_cases():
    assert extract_text(b"<html><body>plain</body></html>") == "plain"
    assert extract_text(b"a &amp;lt; b") == "a &lt; b"  # no double decode
    assert extract_text(b"<p>a</p><!-- hidden --><p>b</p>") == "a b"
    assert extract_text(b"<script>x<1</script>ok") == "ok"
    assert extract_text(b"") == ""
    assert extract_text("café <b>au</b> lait".encode()) == "café au lait"


def test_entity_tokens_roundtrip():
    from gopie_spark.sources.pages import _ENTITY_TOKENS, _escape
    s = pd.Series([" ".join(_ENTITY_TOKENS)], dtype="string")
    html = ("<html><head><title>t</title></head><body><p>"
            + _escape(s)[0] + "</p></body></html>").encode()
    assert extract_text(html) == " ".join(_ENTITY_TOKENS)


def test_generator_deterministic(tmp_path):
    d1 = generate_pages(str(tmp_path / "a"), 2000, n_files=4, seed=7)
    d2 = generate_pages(str(tmp_path / "b"), 2000, n_files=4, seed=7)
    import pyarrow.parquet as pq
    t1 = pq.read_table(d1).to_pandas().sort_values("url").reset_index(drop=True)
    t2 = pq.read_table(d2).to_pandas().sort_values("url").reset_index(drop=True)
    assert t1["url"].tolist() == t2["url"].tolist()
    assert t1["text"].tolist() == t2["text"].tolist()


def test_pages_shape_and_skew(sample_pdf):
    assert list(sample_pdf.columns) == ["url", "warc_ts", "html", "text", "lang"]
    # lang skew: en dominates
    vc = sample_pdf["lang"].value_counts(normalize=True)
    assert vc.index[0] == "en" and vc.iloc[0] > 0.3
    # some duplicate urls exist by construction
    assert sample_pdf["url"].nunique() < len(sample_pdf)


def test_spark_extraction_invariant(spark, tmp_path):
    out = generate_pages(str(tmp_path / "pages"), 1000, n_files=2, seed=11)
    df = spark.read.parquet(out)
    bad = (with_extracted_text(df)
           .filter("extracted_text != text").count())
    assert bad == 0
    assert df.count() == 1000


def test_permuted_ids_unique():
    ids = permuted_ids(1, 100_000)
    assert len(np.unique(ids)) == 100_000


def test_base58_roundtrip():
    vals = np.array([0, 1, 57, 58, 123456789, 2 ** 63], dtype=np.uint64)
    enc = base58_encode(vals)
    assert base58_decode(enc).tolist() == vals.tolist()
    # parity spot-checks with the Bitcoin alphabet
    assert base58_encode(np.array([0], dtype=np.uint64))[0] == "1"
    assert base58_encode(np.array([57], dtype=np.uint64))[0] == "z"
    assert base58_encode(np.array([58], dtype=np.uint64))[0] == "21"


def test_jump_hash_properties():
    keys = np.arange(10_000, dtype=np.uint64)
    b4 = jump_hash(keys, 4)
    assert set(np.unique(b4)) <= set(range(4))
    # balance: each bucket within 20% of fair share
    counts = np.bincount(b4, minlength=4)
    assert (abs(counts - 2500) < 500).all()
    # monotone stability: moving 4 -> 5 buckets only moves keys INTO bucket 4
    b5 = jump_hash(keys, 5)
    moved = b4 != b5
    assert (b5[moved] == 4).all()
    # known single-bucket case
    assert (jump_hash(keys[:10], 1) == 0).all()
