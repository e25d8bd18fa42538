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
from gopie_spark.kernels.misragries import MisraGries
from gopie_spark.kernels.ams import AMS
from gopie_spark.kernels.theta import Theta

__all__ = [
    "HLL", "CMS", "BloomBit", "BloomCounting", "BloomScalable",
    "TDigest", "KLL", "MinHash", "SimHash", "MisraGries", "AMS",
    "Theta",
]
