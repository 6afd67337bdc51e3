"""As-of join and bucketed range join (operators/temporal.py): hand-checked
semantics plus the plan shapes that make them scale (one exchange, no
nested-loop/cartesian join)."""

import pytest
from pyspark.sql import functions as F

from granulate_char_ocr_spark.operators import temporal


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [(1, "A", 3), (2, "A", 7), (3, "A", 1), (4, "B", 5), (5, "C", 2)],
        "trade_id bigint, sym string, ms bigint",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [("A", 2, 10.0), ("A", 3, 11.0), ("A", 6, 12.0), ("B", 9, 20.0)],
        "sym string, ms bigint, px double",
    )


# ------------------------------------------------------------------ asof


def test_asof_backward_inclusive(spark, trades, quotes):
    out = {
        r["trade_id"]: (r["px_asof"], r["ms_asof"])
        for r in temporal.asof_join(
            trades, quotes, on="ms", by=["sym"], values=["px"]
        ).collect()
    }
    assert out[1] == (11.0, 3)  # equal ts matches (inclusive)
    assert out[2] == (12.0, 6)  # latest of several earlier quotes
    assert out[3] == (None, None)  # before every quote -> null
    assert out[4] == (None, None)  # key exists, only later quotes
    assert out[5] == (None, None)  # key absent from right side
    assert len(out) == 5  # left-outer: one row per left row


def test_asof_forward(spark, trades, quotes):
    out = {
        r["trade_id"]: r["ms_asof"]
        for r in temporal.asof_join(
            trades, quotes, on="ms", by=["sym"], values=["px"],
            direction="forward",
        ).collect()
    }
    assert out[1] == 3  # inclusive at equal ts
    assert out[2] is None  # nothing after ms=7 for A
    assert out[3] == 2  # earliest following quote
    assert out[4] == 9


def test_asof_tolerance(spark, trades, quotes):
    out = {
        r["trade_id"]: (r["px_asof"], r["ms_asof"])
        for r in temporal.asof_join(
            trades, quotes, on="ms", by=["sym"], values=["px"], tolerance=1
        ).collect()
    }
    assert out[1] == (11.0, 3)  # delta 0 kept
    assert out[2] == (12.0, 6)  # delta 1 kept
    assert out[3] == (None, None)


def test_asof_single_exchange(spark, trades, quotes):
    plan = _plan(
        temporal.asof_join(trades, quotes, on="ms", by=["sym"], values=["px"])
    )
    assert plan.count("Exchange") == 1, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_bad_direction(spark, trades, quotes):
    with pytest.raises(ValueError):
        temporal.asof_join(
            trades, quotes, on="ms", by=["sym"], values=["px"],
            direction="nearest",
        )


# ------------------------------------------------------------ range_join


@pytest.fixture()
def intervals(spark):
    return spark.createDataFrame(
        [
            (10, "A", 0, 10),
            (11, "A", 5, 6),
            (12, "A", 7, 7),  # empty (end <= start) -> matches nothing
            (13, "B", 0, 100),  # spans many buckets
        ],
        "iv_id bigint, sym string, lo bigint, hi bigint",
    )


@pytest.fixture()
def points(spark):
    return spark.createDataFrame(
        [(1, "A", 0), (2, "A", 5), (3, "A", 9), (4, "A", 10), (5, "B", 42)],
        "pt_id bigint, sym string, ms bigint",
    )


def test_range_join_containment(spark, points, intervals):
    got = {
        (r["pt_id"], r["iv_id"])
        for r in temporal.range_join(
            points, intervals, "ms", "lo", "hi", by=["sym"], bucket_width=8
        ).collect()
    }
    assert got == {
        (1, 10),  # lo inclusive
        (2, 10),
        (2, 11),  # one point, two containing intervals
        (3, 10),
        # (4, 10) excluded: hi exclusive
        (5, 13),  # interval spanning several buckets still matches
    }


def test_range_join_no_nested_loop(spark, points, intervals):
    plan = _plan(
        temporal.range_join(
            points, intervals, "ms", "lo", "hi", by=["sym"], bucket_width=8
        )
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_range_join_bucket_width_irrelevant_to_result(spark, points, intervals):
    rows = lambda w: {
        (r["pt_id"], r["iv_id"])
        for r in temporal.range_join(
            points, intervals, "ms", "lo", "hi", by=["sym"], bucket_width=w
        ).collect()
    }
    assert rows(1) == rows(8) == rows(1000)


# ------------------------------------------------- gate entries (events)


def test_gate_entries_run_nonempty(spark):
    from granulate_char_ocr_spark import driver_queries as dq

    df = dq.QUERIES["asof_last_purchase_events"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0


def test_purchases_72h_matches_duckdb(spark):
    """purchases_within_72h_events left the 50-entry gate window in r4
    (for page_metadata_docs) — the bucketed range join keeps its exact
    DuckDB parity here."""
    import duckdb

    from granulate_char_ocr_spark import driver_queries as dq

    sf = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in dq.purchases_within_72h_events(spark, sf).collect()
    }
    assert got
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    con.execute("SET TimeZone = 'UTC'")
    want = {tuple(r) for r in con.execute(dq.PURCHASES_72H_SQL).fetchall()}
    assert got == want


def test_asof_gate_matches_duckdb(spark):
    import duckdb

    from granulate_char_ocr_spark import driver_queries as dq

    sf = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in dq.QUERIES["asof_last_purchase_events"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    con.execute("SET TimeZone = 'UTC'")
    want = {
        tuple(r)
        for r in con.execute(
            dq.ORACLES["asof_last_purchase_events"]
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------- review-finding regressions


def test_asof_null_payload_is_atomic(spark):
    """A null payload field in the LATEST matching right row must come
    through as null — not backfilled from an older right row (pandas
    merge_asof / DuckDB ASOF semantics)."""
    left = spark.createDataFrame([("A", 6)], "sym string, ms bigint")
    right = spark.createDataFrame(
        [("A", 3, 10.0), ("A", 5, None)], "sym string, ms bigint, px double"
    )
    [r] = temporal.asof_join(
        left, right, on="ms", by=["sym"], values=["px"]
    ).collect()
    assert r["ms_asof"] == 5 and r["px_asof"] is None


def test_asof_null_by_keys_never_match(spark):
    """Equi-join semantics: null by-keys on either side never pair up."""
    left = spark.createDataFrame(
        [(1, None, 6), (2, "A", 6)], "id bigint, sym string, ms bigint"
    )
    right = spark.createDataFrame(
        [(None, 3, 10.0), ("A", 4, 11.0)], "sym string, ms bigint, px double"
    )
    out = {
        r["id"]: r["px_asof"]
        for r in temporal.asof_join(
            left, right, on="ms", by=["sym"], values=["px"]
        ).collect()
    }
    assert out == {1: None, 2: 11.0}


def test_asof_rejects_colliding_left_columns(spark, trades, quotes):
    with pytest.raises(ValueError, match="collide"):
        temporal.asof_join(
            trades.withColumn("px_asof", F.lit(0.0)),
            quotes,
            on="ms",
            by=["sym"],
            values=["px"],
        )


def test_range_join_rejects_bucket_column(spark, points, intervals):
    with pytest.raises(ValueError, match="_bucket"):
        temporal.range_join(
            points.withColumn("_bucket", F.lit(0)),
            intervals,
            "ms",
            "lo",
            "hi",
            by=["sym"],
            bucket_width=8,
        )
