"""Physical-plan assertions: the optimizations we claim must be visible
in the executed plans (pushdown, broadcast, column pruning)."""

from __future__ import annotations


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def test_cnf_filter_pushes_down(spark, tmp_path):
    """The CNF pre-scan filter must reach the parquet scan as
    PushedFilters, and the scan must read only referenced columns."""
    from pyspark.sql import functions as F

    from trck_spark.sideinputs import cnf_to_spark_condition

    src = str(tmp_path / "ev.parquet")
    spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("event_type"),
        F.lit("x").alias("unused_wide_column"),
    ).write.parquet(src)
    df = spark.read.parquet(src)
    cond = cnf_to_spark_condition(
        {
            "clauses": [
                [{"field": "event_type", "value": "1", "op": "equal"}],
                [{"field": "event_type", "value": "2", "op": "notequal"}],
            ]
        },
        df.columns,
    )
    out = df.filter(cond).select("id")
    plan = _formatted_plan(out)
    assert "PushedFilters: [" in plan
    # the EqualNullSafe term must be pushed, not just IsNotNull
    assert "EqualNullSafe(event_type,1)" in plan.replace(" ", "").replace(
        "[", ""
    ) or "EqualNullSafe" in plan
    # column pruning: the unused wide column must not be read
    read_schema = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ][0]
    assert "unused_wide_column" not in read_schema


def test_small_dim_join_broadcasts(spark):
    from trck_spark.queries import q_revenue_by_segment

    plan = _formatted_plan(
        q_revenue_by_segment(spark, "/root/testdata/sf0.001")
    )
    assert "BroadcastHashJoin" in plan


def test_fast_path_has_no_python_operator(spark):
    """Simple counter programs must compile to a plan with no Python
    evaluation operator (mapInPandas would show as MapInPandas /
    ArrowEvalPython / BatchEvalPython)."""
    from trck_spark.queries import q_trck_count_clicks

    plan = _formatted_plan(
        q_trck_count_clicks(spark, "/root/testdata/sf0.001")
    )
    for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan
