"""Co-located bucketed joins and partition pruning — the storage-layout
levers for the 100 TB posture, proven at the plan level.

* Bucketing: pre-bucketing the span stream and the recognized-results table
  on media_ref lets the result join run with ZERO exchanges (the regime where
  the media store is too big to broadcast and rebuilt repeatedly).
* Partition pruning: the extracted output is partitioned by bucket (the
  resume unit); a bucket-filtered read must prune at the scan, not filter
  after it.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df, mode="formatted"):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spans = spark.range(2000).select(
            F.concat(F.lit("ref_"), (F.col("id") % 200).cast("string")).alias(
                "media_ref"
            ),
            F.col("id").alias("offset"),
        )
        rec = spark.range(200).select(
            F.concat(F.lit("ref_"), F.col("id").cast("string")).alias("media_ref"),
            F.lit("WORD").alias("text"),
        )
        for name, df in (("b_spans", spans), ("b_rec", rec)):
            (
                df.write.bucketBy(4, "media_ref")
                .sortBy("media_ref")
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
        joined = spark.table("b_spans").join(spark.table("b_rec"), "media_ref")
        plan = _plan(joined, "simple")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_spans")
        spark.sql("DROP TABLE IF EXISTS b_rec")


def test_partition_pruned_read_of_extracted_output(spark, tmp_path):
    from granulate_char_ocr_spark.plans import resume
    from granulate_char_ocr_spark.sources.synthetic import corpus_spark

    docs, media, _ = corpus_spark(spark, 40, seed=5)
    out = str(tmp_path / "out")
    resume.run_with_resume(spark, docs, media, out, n_buckets=4)

    pruned = spark.read.parquet(out + "/extracted").filter(F.col("bucket") == 2)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    # the bucket predicate must appear as a partition filter, not a post-scan
    # data filter
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "bucket" in pf_line, pf_line
    assert pruned.count() > 0
