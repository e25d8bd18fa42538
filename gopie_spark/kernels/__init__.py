"""Pure-NumPy sketch kernels (no Spark imports here).

Each sketch module exposes a small class with the uniform lifecycle
(SURVEY.md §3.1):

    zero()                      -> state
    update(state, values, ...)  -> state   (batch, vectorized)
    merge(a, b)                 -> state   (associative + commutative)
    serialize(state) / deserialize(blob)
    <finalizers>                (count / estimate / exist / quantile)
"""

from gopie_spark.kernels.hll import HLL
from gopie_spark.kernels.cms import CMS
from gopie_spark.kernels.bloom import BloomBit, BloomCounting, BloomScalable
from gopie_spark.kernels.tdigest import TDigest
from gopie_spark.kernels.kll import KLL
from gopie_spark.kernels.minhash import MinHash, SimHash
from gopie_spark.kernels.wminhash import WeightedMinHash
from gopie_spark.kernels.countsketch import CountSketch
from gopie_spark.kernels.misragries import MisraGries
from gopie_spark.kernels.ams import AMS
from gopie_spark.kernels.theta import Theta
from gopie_spark.kernels.freqdir import FreqDir
from gopie_spark.kernels.ddsketch import DDSketch
from gopie_spark.kernels.cuckoo import CuckooFilter
from gopie_spark.kernels.slidinghll import SlidingHLL
from gopie_spark.kernels.windowcms import WindowCMS
from gopie_spark.kernels.exactstats import ExactStats

__all__ = [
    "HLL", "CMS", "BloomBit", "BloomCounting", "BloomScalable",
    "TDigest", "KLL", "MinHash", "SimHash", "MisraGries", "AMS",
    "Theta", "FreqDir", "DDSketch", "WeightedMinHash", "CountSketch",
    "CuckooFilter", "SlidingHLL", "WindowCMS", "ExactStats",
    "sketch_from_blob",
]


def sketch_from_blob(blob: bytes):
    """Reconstruct the right kernel (with its parameters) from any
    state blob via the codec kind tag — the self-describing-state
    property that lets persisted sketch tables (operators/cube.py)
    be reopened without out-of-band schema knowledge."""
    from gopie_spark.kernels import codec

    kind, _ = codec.unpack(blob)
    by_kind = {
        codec.KIND_HLL: HLL,
        codec.KIND_CMS: CMS,
        codec.KIND_BLOOM_COUNTING: BloomCounting,
        codec.KIND_BLOOM_BIT: BloomBit,
        codec.KIND_BLOOM_SCALABLE: BloomScalable,
        codec.KIND_TDIGEST: TDigest,
        codec.KIND_KLL: KLL,
        codec.KIND_MINHASH: MinHash,
        codec.KIND_SIMHASH: SimHash,
        codec.KIND_MISRAGRIES: MisraGries,
        codec.KIND_AMS: AMS,
        codec.KIND_THETA: Theta,
        codec.KIND_FREQDIR: FreqDir,
        codec.KIND_DDSKETCH: DDSketch,
        codec.KIND_WMINHASH: WeightedMinHash,
        codec.KIND_COUNTSKETCH: CountSketch,
        codec.KIND_CUCKOO: CuckooFilter,
        codec.KIND_SLIDING_HLL: SlidingHLL,
        codec.KIND_WINDOW_CMS: WindowCMS,
        codec.KIND_EXACTSTATS: ExactStats,
    }
    if kind not in by_kind:
        raise ValueError(f"unknown sketch kind {kind}")
    return by_kind[kind].from_blob(blob)
