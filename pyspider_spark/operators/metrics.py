"""Metrics & lineage (M1-M5 in SURVEY.md §2.5).

The reference keeps in-memory counter trees with 5m/1h/1d ring windows
(libs/counter.py) pickled every 60s. Re-expressed: every round appends
exact per-(round, project, metric) rows to an append-only ``metrics``
table; windowed views are ordinary ``window()`` aggregations over
``round_ts`` — persistence is the table itself (M4), and the same rows are
the per-partition lineage the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspider_spark.types import METRICS_SCHEMA


def round_metrics(
    spark: SparkSession,
    round_no: int,
    now: float,
    per_project: dict[str, dict[str, float]],
) -> DataFrame:
    """Build metric rows: ``per_project[project][metric] = value``."""
    rows = [
        (round_no, now, project, metric, float(value))
        for project, metrics in per_project.items()
        for metric, value in metrics.items()
    ]
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def outcome_metrics(processed_wave: DataFrame) -> dict[str, dict[str, float]]:
    """M1/M3 deltas for one round: selected/success/failed/retry counts and
    avg fetch/process time per project — one partial-agg pass, tiny result."""
    rows = (
        processed_wave.groupBy("project")
        .agg(
            F.count("*").alias("selected"),
            F.sum(F.when(F.col("process_ok"), 1).otherwise(0)).alias("success"),
            F.sum(F.when(~F.col("process_ok"), 1).otherwise(0)).alias("failed_or_retry"),
            F.avg("fetch_time").alias("fetch_time_avg"),
            F.sum("n_follows").alias("follows"),
        )
        .collect()
    )
    return {
        r["project"]: {
            "selected": r["selected"],
            "success": r["success"],
            "failed_or_retry": r["failed_or_retry"],
            "fetch_time_avg": r["fetch_time_avg"] or 0.0,
            "follows": r["follows"] or 0,
        }
        for r in rows
    }


def windowed_counters(metrics: DataFrame, duration: str = "5 minutes") -> DataFrame:
    """M2: tumbling-window sums per (project, metric) — the 5m/1h/1d ring
    buffers as plain window aggregation."""
    return (
        metrics.withColumn("ts", F.timestamp_seconds("round_ts"))
        .groupBy(F.window("ts", duration).alias("w"), "project", "metric")
        .agg(F.sum("value").alias("value_sum"), F.avg("value").alias("value_avg"))
        .select("w.start", "w.end", "project", "metric", "value_sum", "value_avg")
    )


def partition_lineage(df: DataFrame, round_no: int, now: float, stage: str) -> DataFrame:
    """Per-partition lineage rows (north rule): (round, stage, partition_id,
    rows) via spark_partition_id — records which partition produced what."""
    return (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .select(
            F.lit(round_no).cast("int").alias("round_no"),
            F.lit(now).alias("round_ts"),
            F.lit(stage).alias("project"),
            F.concat(F.lit("lineage_partition_"), F.col("pid")).alias("metric"),
            F.col("count").cast("double").alias("value"),
        )
    )
