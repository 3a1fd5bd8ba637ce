"""Crawl loop: iterated rounds, checkpoint/resume, exhaustion bench.

``crawl(...)`` = ``for round in ...: state = run_round(state)`` with two
persistence modes:
  - memory mode (tests/bench): frontier localCheckpoint()ed per round to
    truncate lineage (an iterated self-join plan grows exponentially
    otherwise);
  - store mode: every round writes a frontier snapshot + appends results/
    metrics, then flips the manifest — kill the process at any round and
    ``resume()`` continues from the last committed round with identical
    final state (north rule: checkpoint-resumable).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from pyspider_spark.operators import politeness
from pyspider_spark.operators.frontier import (
    candidates_from_seeds,
    merge_candidates,
    route_candidates,
)
from pyspider_spark.operators.metrics import round_metrics
from pyspider_spark.plans.round import RoundConfig, RoundOutput, RoundState, run_round
from pyspider_spark.sources.store import SnapshotStore
from pyspider_spark.types import FRONTIER_SCHEMA


@dataclass
class CrawlReport:
    rounds: int
    selected_total: int
    results_total: int
    frontier: DataFrame
    results: DataFrame | None


def bootstrap(spark: SparkSession, seeds: DataFrame, config: RoundConfig) -> RoundState:
    """Round -1: seeds become the initial frontier (scheduler.on_new_request
    for each seed; all unseen ⇒ plain inserts)."""
    empty = spark.createDataFrame([], FRONTIER_SCHEMA)
    cands = merge_candidates(candidates_from_seeds(seeds, config.start_time))
    upserts, _ = route_candidates(empty, cands, config.start_time, round_no=0)
    return RoundState(frontier=upserts, budget=politeness.BudgetState(), round_no=0)


def crawl(
    spark: SparkSession,
    seeds: DataFrame,
    documents: DataFrame,
    config: RoundConfig,
    robots: DataFrame | None = None,
    max_rounds: int = 1000,
    store: SnapshotStore | None = None,
    collect_results: bool = True,
    on_round=None,
    use_bloom: bool = False,
    bloom_expected: int = 1 << 20,
) -> CrawlReport:
    state = bootstrap(spark, seeds, config)
    bloom = None
    if use_bloom:
        from pyspider_spark.operators.urlseen import ShardedBloom

        bloom = ShardedBloom(n_shards=16, expected_per_shard=max(1024, bloom_expected // 16))
        bloom.add_df(state.frontier)
    return _loop(
        spark, state, documents, config, robots, max_rounds, store, collect_results, on_round,
        bloom=bloom,
    )


def resume(
    spark: SparkSession,
    store: SnapshotStore,
    documents: DataFrame,
    config: RoundConfig,
    robots: DataFrame | None = None,
    max_rounds: int = 1000,
    collect_results: bool = True,
) -> CrawlReport:
    """Continue from the last committed snapshot (manifest flip is atomic,
    so this is always a consistent round boundary)."""
    manifest = store.read_manifest()
    if manifest is None:
        raise ValueError("nothing to resume: no manifest committed")
    state = RoundState(
        frontier=store.read_frontier(manifest["round_no"]),
        budget=politeness.BudgetState.from_dict(manifest["budget_state"]),
        round_no=manifest["round_no"] + 1,
    )
    return _loop(spark, state, documents, config, robots, max_rounds, store, collect_results, None)


def _loop(
    spark, state, documents, config, robots, max_rounds, store, collect_results, on_round,
    bloom=None,
) -> CrawlReport:
    selected_total = 0
    results_total = 0
    all_results: DataFrame | None = None

    for _ in range(max_rounds):
        out: RoundOutput = run_round(state, documents, config, robots, bloom=bloom)
        n_selected = sum(out.selected_counts.values())
        selected_total += n_selected

        new_frontier = out.state.frontier.localCheckpoint(eager=True)
        out.state.frontier = new_frontier
        if bloom is not None:
            # fold this round's (possibly) new taskids into the URL-seen set;
            # re-adding known ids is a no-op, so the whole round delta is safe
            bloom.add_df(new_frontier.where(new_frontier.round_no == out.state.round_no - 1))
        if out.state.postponed is not None:
            out.state.postponed = out.state.postponed.localCheckpoint(eager=True)
            if out.state.postponed.isEmpty():
                out.state.postponed = None

        round_results = out.results.localCheckpoint(eager=True)
        n_results = round_results.count()
        results_total += n_results
        if collect_results:
            all_results = (
                round_results if all_results is None else all_results.unionByName(round_results)
            )

        if store is not None:
            store.write_frontier(new_frontier, out.state.round_no - 1)
            store.append(round_results, "results")
            store.append(
                round_metrics(
                    spark, out.state.round_no - 1, config.clock(out.state.round_no - 1), out.metrics
                ),
                "metrics",
            )
            store.commit_round(out.state.round_no - 1, state.budget.to_dict())
            out.state.frontier = store.read_frontier(out.state.round_no - 1)

        out.wave.unpersist()
        out.processed.unpersist()
        if on_round is not None:
            on_round(out)
        state = out.state

        if n_selected == 0:
            break

    return CrawlReport(
        rounds=state.round_no,
        selected_total=selected_total,
        results_total=results_total,
        frontier=state.frontier,
        results=all_results,
    )
