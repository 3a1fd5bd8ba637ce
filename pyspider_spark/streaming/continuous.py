"""Continuous crawl mode: Structured Streaming drives the scheduling
rounds (SURVEY.md §1.6/§3.1 — the reference is a 0.1s-loop daemon; its
semantics quantize into rounds, so continuous mode = a rate-source ticker
whose foreachBatch body IS the batch round step).

Why foreachBatch instead of a stateful streaming query: the round step
needs MERGE-style upserts into the frontier and a cross-round driver-side
budget — exactly the pattern Structured Streaming documents foreachBatch
for (arbitrary stateful sinks). Watermark/window analytics over the
metrics stream are ordinary streaming aggregations (M2).

At scale: the same code runs with a real trigger interval; the frontier
store commit per micro-batch gives exactly-once round semantics (Iceberg
commit or manifest flip inside foreachBatch).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspider_spark.plans.round import RoundConfig, RoundState, run_round


@dataclass
class StreamingCrawl:
    """Wraps the round step as a foreachBatch body over a rate ticker."""

    spark: SparkSession
    documents: DataFrame
    config: RoundConfig
    robots: DataFrame | None = None
    state: RoundState | None = None
    rounds_run: int = 0

    def _on_tick(self, _batch_df: DataFrame, _batch_id: int) -> None:
        if self.state is None:
            return
        out = run_round(self.state, self.documents, self.config, self.robots)
        new_frontier = out.state.frontier.localCheckpoint(eager=True)
        out.state.frontier = new_frontier
        if out.state.postponed is not None:
            # bounded driver transfer: small sets collect, big ones stay
            # distributed (same cap as the batch loop)
            from pyspider_spark.plans.crawl import bound_postponed

            out.state.postponed = bound_postponed(
                self.spark, out.state.postponed, out.postponed_count
            )
        out.unpersist()
        self.state = out.state
        self.rounds_run += 1

    def start(self, state: RoundState, ticks_per_second: int = 1, queue_name: str = "crawl-ticker"):
        """Start the ticker; each micro-batch advances one scheduling round."""
        self.state = state
        ticker = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", ticks_per_second)
            .load()
        )
        return (
            ticker.writeStream.queryName(queue_name)
            .foreachBatch(self._on_tick)
            .trigger(processingTime="0 seconds")
            .start()
        )


def streaming_metrics_counters(
    spark: SparkSession, metrics_stream: DataFrame, duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """M2 in streaming form: windowed counters with a watermark for late
    metric rows (the reference's 5m/1h/1d ring buffers as a streaming agg).
    ``metrics_stream`` = readStream over the metrics table/log."""
    return (
        metrics_stream.withColumn("ts", F.timestamp_seconds("round_ts"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "project", "metric")
        .agg(F.sum("value").alias("value_sum"), F.avg("value").alias("value_avg"))
        .select("w.start", "w.end", "project", "metric", "value_sum", "value_avg")
    )
