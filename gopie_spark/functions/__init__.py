"""Scalar / encoding functions (SURVEY.md §2.4)."""

from gopie_spark.functions.base58 import base58_encode, base58_decode
from gopie_spark.functions.bitflag import (set_flag, clear_flag, toggle_flag,
                                           has_flag)
from gopie_spark.functions.jumphash import jump_hash, jump_hash_str
from gopie_spark.functions.randomsequence import quadratic_permutation
from gopie_spark.functions.sequence import iceflake_ids

__all__ = [
    "base58_encode", "base58_decode",
    "set_flag", "clear_flag", "toggle_flag", "has_flag",
    "jump_hash", "jump_hash_str", "quadratic_permutation", "iceflake_ids",
]
