"""Temporal join operators Spark's join syntax lacks: as-of join and
point-in-interval range join. Both are expressed as compositions of
built-in DataFrame ops (one shuffle each, no cross join, no UDF), so
Catalyst/AQE still own the physical plan.

As-of join (``asof_join``): for every left row, the latest right row at
or before it (pandas ``merge_asof`` / kdb ``aj`` semantics). The naive
relational spelling is a non-equi theta join — a broadcast-nested-loop
or cartesian plan that dies at scale. The scalable formulation used here
is union-the-sides + one ordered window: tag rows, sort each key group
by the as-of axis, and carry the right payload forward with
``last(ignorenulls=True)``. One exchange on the key columns total,
whatever the table sizes.

Range join (``range_join``): points joined to intervals that contain
them. The naive spelling is again a non-equi join. Here intervals are
exploded onto a fixed bucket grid and the join becomes an equi-join on
(key, bucket) plus a residual filter — the standard interval-bucketing
trick (Flink interval joins, Spark's own range-join hints). The explode
factor is ``interval_len / bucket_width + 1``, so callers pick a width
near the typical interval length (factor ~2).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    values: Sequence[str],
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row's ``values`` columns from
    the latest right ``on`` <= left ``on`` (direction='backward',
    inclusive; 'forward' takes the earliest right >= left), matching on
    the ``by`` key columns. Unmatched left rows keep nulls — left-outer
    semantics, one output row per left row. Also emits ``on + suffix``:
    the matched right row's axis value (null when unmatched).

    ``on`` must be orderable; with ``tolerance`` (maximum |left - right|
    axis distance, matches outside it nulled) it must be numeric — feed
    timestamps through ``unix_millis`` first. If the right side can hold
    duplicate (by, on) pairs, pre-aggregate it: which duplicate wins is
    otherwise plan-dependent (DuckDB's ASOF has the same caveat).

    Null handling matches a relational equi-join: right rows with a null
    ``by`` key are dropped up front (equality never matches null), so
    null-keyed left rows come back unmatched rather than paired with each
    other.

    Scale shape: unionByName (no shuffle) then ONE exchange on ``by``
    with an in-partition sort — no non-equi join anywhere, so this stays
    a hash-exchange + window at any size. Heavily skewed ``by`` keys
    serialize within the key, as any per-key ordered scan must."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction!r}")
    by, values = list(by), list(values)
    r_on = on + suffix
    reserved = (
        {"_is_left", "_asof_payload", r_on}
        | {v + suffix for v in values}
    )
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"left columns collide with asof outputs: {clash}")
    if "_on" in values:
        raise ValueError("'_on' is reserved inside the asof payload")

    tagged_l = left.withColumn("_is_left", F.lit(1))
    r_valid = right
    for k in by:
        r_valid = r_valid.where(F.col(k).isNotNull())
    # the whole right row travels as ONE struct so a match is atomic: a
    # null payload field in the latest matching row stays null instead of
    # being backfilled from an older row (pandas merge_asof semantics)
    tagged_r = r_valid.select(
        *by,
        F.struct(F.col(on).alias("_on"), *[F.col(v) for v in values]).alias(
            "_asof_payload"
        ),
    ).withColumn("_is_left", F.lit(0))
    both = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    axis = F.coalesce(F.col(on), F.col("_asof_payload._on"))
    order = axis.asc() if direction == "backward" else axis.desc()
    # right rows sort before left rows at equal axis values -> inclusive
    w = (
        Window.partitionBy(*by)
        .orderBy(order, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        "_c", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    matched_on = F.col("_c._on")
    in_tol = (
        F.lit(True)
        if tolerance is None
        else F.abs(F.col(on) - matched_on) <= F.lit(tolerance)
    )
    return carried.where(F.col("_is_left") == 1).select(
        *left.columns,
        *[
            F.when(in_tol, F.col(f"_c.{v}")).alias(v + suffix)
            for v in values
        ],
        F.when(in_tol, matched_on).alias(r_on),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: str,
    start_on: str,
    end_on: str,
    by: Sequence[str],
    bucket_width: int,
) -> DataFrame:
    """Inner join of point rows to every interval row that contains them:
    same ``by`` keys and ``start_on <= point_on < end_on`` (half-open, the
    convention that tiles time windows without double-counting). Output
    carries all columns of both inputs (names must not collide). The
    axis columns must be integers (epoch millis, not raw timestamps).

    Scale shape: each interval explodes onto the ``bucket_width`` grid it
    overlaps (``len/width + 1`` rows — pick width near the typical
    interval length), each point computes its single bucket, and the join
    is a plain equi-join on ``by`` + bucket that AQE can re-plan like any
    other, followed by the residual containment filter. Empty intervals
    (end <= start) vanish in the explode, matching the inner-join
    contract. Null ``by`` keys never match (plain equi-join semantics).
    """
    by = list(by)
    taken = {"_bucket"} & (set(points.columns) | set(intervals.columns))
    if taken:
        raise ValueError("inputs must not carry a '_bucket' column")
    grid = F.explode(
        F.sequence(
            F.floor(F.col(start_on) / bucket_width),
            F.floor((F.col(end_on) - 1) / bucket_width),
        )
    )
    iv = intervals.where(F.col(start_on) < F.col(end_on)).select(
        "*", grid.alias("_bucket")
    )
    pt = points.select(
        "*", F.floor(F.col(point_on) / bucket_width).alias("_bucket")
    )
    return (
        pt.join(iv, by + ["_bucket"])
        .where(
            (F.col(point_on) >= F.col(start_on))
            & (F.col(point_on) < F.col(end_on))
        )
        .drop("_bucket")
    )
