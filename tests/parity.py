"""Shared DuckDB-parity harness for gate-demoted queries (PARITY.md):
every entry rotated out of the 50-entry driver window keeps an EXACT
oracle compare here — the same normalize/compare the driver-gate
replica (tools/check_oracles.py) runs, not a weaker set-equality."""

import os
import sys

import duckdb

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from check_oracles import TABLES, compare  # noqa: E402

SF = "/root/testdata/sf0.001"


def assert_parity(spark, fn, oracle_sql: str, sf: str = SF) -> None:
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    errs = compare(
        fn.__name__, fn(spark, sf).toPandas(), con.execute(oracle_sql).df()
    )
    assert not errs, errs
