"""Single-task debug helper (SURVEY §3.3 — the reference's 'one mode').

The reference ships ``pyspider one`` and the webui debugger
(/root/reference/pyspider/libs/run.py one-mode, webui/debug.py, and the
scheduler's single-task path scheduler.py:1014-1178): run ONE url through
fetch + process and inspect (track, follows, result) without standing up
the full project loop. The Spark-first analogue drives a wave-of-1
through the very same ``run_round`` DAG the crawl uses — same select,
config join, fetch kernel, extraction, routing — so what you debug is
exactly what production runs; only the frontier is one row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspider_spark.plans.crawl import bootstrap
from pyspider_spark.plans.round import RoundConfig, run_round
from pyspider_spark.types import SUCCESS


@dataclass
class TaskDebugReport:
    """What the reference's debugger panes show for one task."""

    task: dict | None  # the processed wave row (fetch+process columns)
    track: dict | None  # the status pack (track.fetch / track.process)
    result: object  # the on_result payload (None if none emitted)
    follows: list[str]  # canonicalized follow URLs routed into the frontier
    status: int | None  # the task's frontier status after the round
    frontier: DataFrame  # post-round frontier (task + routed follows)

    @property
    def ok(self) -> bool:
        return self.status == SUCCESS


def run_task(
    spark: SparkSession,
    url: str,
    config: RoundConfig,
    documents: DataFrame | None = None,
    robots: DataFrame | None = None,
    redirects: DataFrame | None = None,
    project: str | None = None,
    priority: int = 0,
) -> TaskDebugReport:
    """Debug ONE url end-to-end through the standard round DAG.

    ``documents`` is the simulated-fetch corpus (required unless
    ``config.fetch_mode == 'real'``, which hits the wire instead).
    ``project`` defaults to the first configured project. Returns the
    collected (task, track, result, follows, status) plus the post-round
    frontier DataFrame for ad-hoc inspection."""
    if project is None:
        project = next(iter(config.projects))
    if documents is None and config.fetch_mode != "real":
        raise ValueError("documents corpus required unless fetch_mode='real'")
    seeds = spark.createDataFrame(
        [(project, url, priority, 0.0)],
        "project string, url string, priority int, exetime double",
    )
    state = bootstrap(spark, seeds, config)
    out = run_round(state, documents, config, robots=robots, redirects=redirects)

    rows = out.processed.collect()  # wave of 1 — a one-row collect
    task = rows[0].asDict(recursive=True) if rows else None
    track = task.get("track") if task else None
    res_rows = out.results.collect()
    result = res_rows[0].asDict(recursive=True) if res_rows else None
    frontier = out.state.frontier
    seed_taskid = task["taskid"] if task else None
    follows: list[str] = []
    status: int | None = None
    if seed_taskid is not None:
        per_task = frontier.select("taskid", "url", "status").collect()
        follows = sorted(r["url"] for r in per_task if r["taskid"] != seed_taskid)
        status = next(
            (r["status"] for r in per_task if r["taskid"] == seed_taskid), None
        )
    out.unpersist()
    return TaskDebugReport(
        task=task, track=track, result=result,
        follows=follows, status=status, frontier=frontier,
    )
