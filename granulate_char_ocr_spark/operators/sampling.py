"""Deterministic corpus sampling — the training-pipeline subsetting ops.

Spark's native ``sample()``/``sampleBy()`` draw from a per-partition RNG, so
results change with partitioning and can't be oracle-checked across engines.
These operators sample by KEY HASH instead: a row is kept iff
``md5(key) mod 100 < pct`` — the same decision on any engine, any
partitioning, any cluster size, and stable across reruns (the property a
resumable 100 TB pipeline actually needs: re-sampling after a retry must
select the same rows). md5 is the portable hash (bit-identical in Spark and
DuckDB); the first 8 hex digits give a uniform 32-bit draw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column) -> Column:
    """Uniform, engine-portable 0-99 bucket from the row key."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )


def hash_sample(df: DataFrame, key_col: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, decided by key hash (deterministic, join-stable:
    two tables sampled on the same key keep the SAME keys, so sampled fact
    and dimension stay joinable — a per-row RNG cannot promise that)."""
    return df.filter(_bucket(F.col(key_col)) < pct)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum hash sampling (e.g. downsample dominant languages,
    keep the tail): ``rates`` maps stratum value → keep percentage."""
    pct = F.lit(default_pct)
    for value, p in rates.items():
        pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(pct)
    return df.filter(_bucket(F.col(key_col)) < pct)
