"""gopie_spark — a PySpark-native distributed sketch / approximate-aggregation engine.

A from-scratch rebuild of the analytics capabilities of the Go library
``andy2046/gopie`` (reference at /root/reference, see SURVEY.md) as
Arrow-vectorized, mergeable sketch aggregations over Spark DataFrames:

- ``kernels``   — pure NumPy sketch kernels (HLL, Count-Min, Bloom x3,
                  t-digest, KLL, MinHash, SimHash) + vectorized hashes
                  (FNV-1 32/64, SipHash-2-4) with estimate parity to the
                  reference semantics.
- ``operators`` — Spark-side surface: two-level (partial/final) sketch
                  aggregation over DataFrames, membership filters, dedup,
                  similarity search, text stats, windowed sketches.
- ``sources``   — deterministic synthetic Common-Crawl-style pages table
                  and multimodal binary-column plumbing.
- ``functions`` — scalar helpers (base58, bitflag, jumphash, sequence ids).
- ``plans``     — session builder, checkpoint/resume with per-partition
                  lineage, salting.
- ``streaming`` — Structured Streaming micro-batch sketch builds.

Nothing in here is a port: the reference is row-at-a-time Go; this engine
is batch-vectorized NumPy driven by Spark's partial/final aggregation
model (sketch blobs, not rows, cross the shuffle).
"""

__version__ = "0.1.0"
