"""Bit-flag column operations (capability parity: pkg/bitflag/bitflag.go:10-93).

Thin wrappers over Spark's built-in bitwise expressions — set/clear/
toggle/test single-bit flags in an integer column stay entirely inside
whole-stage codegen (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _mask(bit: int) -> Column:
    return F.lit(1 << bit)


def set_flag(col: Column, bit: int) -> Column:
    return col.bitwiseOR(_mask(bit))


def clear_flag(col: Column, bit: int) -> Column:
    return col.bitwiseAND(~(1 << bit))


def toggle_flag(col: Column, bit: int) -> Column:
    return col.bitwiseXOR(_mask(bit))


def has_flag(col: Column, bit: int) -> Column:
    return col.bitwiseAND(_mask(bit)) != F.lit(0)
