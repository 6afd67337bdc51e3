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


def _draw32(key: Column) -> Column:
    """The module's ONE portability-critical primitive: a uniform 32-bit
    integer draw from the row key (first 8 md5 hex digits — bit-identical
    in Spark and DuckDB). Every sampling decision derives from it."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def _bucket(key: Column) -> Column:
    """Uniform, engine-portable 0-99 bucket from the row key."""
    return _draw32(key) % 100


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


def temperature_resample(
    df: DataFrame, key_col: str, strata_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-based stratum rebalancing (the XLM-R / mC4 multilingual
    recipe): keep each stratum at a rate proportional to ``count^(alpha-1)``
    so expected kept counts scale as ``count^alpha`` — alpha=1 keeps the
    natural distribution, alpha->0 equalizes strata. Rates are normalized
    so the stratum they favor most keeps 100% (for alpha<1 that is the
    SMALLEST stratum: dominant strata are downsampled, the tail is kept
    whole). Output adds a ``rate`` column (rounded 9dp so the pow/division
    result is engine-portable).

    A NULL stratum is a stratum like any other (counted, weighted, and
    matched null-safely), not silently dropped.

    Deterministic like everything in this module: the per-row draw is the
    same md5 32-bit primitive (_draw32) the other ops use, mapped to
    [0,1), so retries and other engines keep the same rows. Scale shape:
    stratum counts and the max weight are two tiny aggregates broadcast
    back; the corpus itself is one filter pass.
    """
    if "rate" in df.columns:
        raise ValueError("input already has a 'rate' column (the output name)")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_c"))
    weights = counts.select(
        strata_col, F.pow(F.col("_c").cast("double"), alpha - 1).alias("_w")
    )
    wmax = weights.agg(F.max("_w").alias("_wmax"))
    rates = (
        weights.crossJoin(F.broadcast(wmax))
        .select(
            F.col(strata_col).alias("_strata"),
            F.round(F.col("_w") / F.col("_wmax"), 9).alias("rate"),
        )
    )
    u = _draw32(F.col(key_col)).cast("double") / F.lit(4294967296.0)
    return (
        df.join(
            F.broadcast(rates),
            F.col(strata_col).eqNullSafe(F.col("_strata")),
        )
        .drop("_strata")
        .filter(u < F.col("rate"))
    )
