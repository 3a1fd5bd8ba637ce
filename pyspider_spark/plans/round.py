"""One scheduling round as a single DataFrame DAG (SURVEY.md §3.1).

Reference loop (scheduler.run_once, scheduler.py:661-671) quantized:

    frontier ──release(F3/F4)──► ready ──quota(F6/F8)──► wave(F1)
        │                                        │
        │                       robots(X5) → fetch-join(X1/X7/X8)
        │                                        │
        │                     process(P1/P7) ──► outcomes(F13-F15)
        │                                        │ links(P3/P4/P6)
        ├──◄─ MERGE outcomes (left join, wave-sized right ⇒ broadcast)
        └──◄─ MERGE routed candidates (F2/F12 → F5/F9/F10/F19)

The five reference queues disappear; the round boundary is the only
barrier; a store commit (Iceberg snapshot / parquet manifest flip) is the
transactional handoff. Per-round shuffle budget: ONE frontier-wide
full-outer merge (the MERGE INTO) + partial aggs; the outcome merge
broadcasts (wave-sized); everything else is wave-sized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspider_spark.operators import politeness
from pyspider_spark.operators.extract import extract_links, process_wave
from pyspider_spark.operators.fetch import (
    build_track,
    conditional_gate,
    resolve_redirects,
    robots_gate,
    simulated_fetch,
)
from pyspider_spark.operators.frontier import (
    apply_outcomes,
    merge_candidates,
    merge_frontier,
    queue_sizes,
    release_ready,
    route_candidates,
    select_wave,
)
from pyspider_spark.operators.results import results_from_wave
from pyspider_spark.types import LOOP_LIMIT


@dataclass
class RoundConfig:
    projects: dict[str, dict]  # project -> {rate, burst, retries, retry_delay, ...}
    loop_limit: int = LOOP_LIMIT
    round_interval: float = 1.0
    start_time: float = 1_700_000_000.0  # fixed epoch: determinism (no wall clock)
    pause_fsm: bool = False  # F18 auto-pause (needs per-task outcome feed)
    events: bool = False  # F16 cronjob ticks + F17 on_finished injection
    conditional_get: bool = False  # X4: 304 short-circuit on unchanged recrawls
    max_redirects: int = 5  # X2 hop budget

    def clock(self, round_no: int) -> float:
        return self.start_time + round_no * self.round_interval


@dataclass
class RoundState:
    frontier: DataFrame
    budget: politeness.BudgetState = field(default_factory=politeness.BudgetState)
    postponed: DataFrame | None = None
    round_no: int = 0
    projects_state: "ProjectsState | None" = None

    def runtime(self) -> "ProjectsState":
        from pyspider_spark.operators.projects import ProjectsState

        if self.projects_state is None:
            self.projects_state = ProjectsState()
        return self.projects_state


@dataclass
class RoundOutput:
    state: RoundState
    wave: DataFrame
    processed: DataFrame
    results: DataFrame
    selected_counts: dict[str, int]
    metrics: dict[str, dict[str, float]]
    cached: tuple = ()  # DataFrames to unpersist once the round is committed

    def unpersist(self) -> None:
        self.wave.unpersist()
        self.processed.unpersist()
        for df in self.cached:
            df.unpersist()


def run_round(
    state: RoundState,
    documents: DataFrame,
    config: RoundConfig,
    robots: DataFrame | None = None,
    extra_candidates: DataFrame | None = None,
    bloom=None,
    synthetic_wave: DataFrame | None = None,
    redirects: DataFrame | None = None,
) -> RoundOutput:
    round_no = state.round_no
    now = config.clock(round_no)

    # F3/F4: release time-queue arrivals + expired leases
    f = release_ready(state.frontier, now)

    # F6/F8: per-project wave quotas (driver-side small state)
    qsizes = queue_sizes(f, now)
    quotas = politeness.round_quotas(
        state.budget, config.projects, qsizes, now, config.loop_limit
    )
    if config.pause_fsm:
        # F18: paused projects select nothing (cronjob / new requests keep
        # working — only the quota is gated, scheduler.py:489-492)
        rt = state.runtime()
        for p in list(quotas):
            if rt.is_paused(p, now):
                quotas[p] = 0
    max_per_host = {
        p: cfg.get("max_per_host_per_round", 1 << 30) for p, cfg in config.projects.items()
    }

    # F1/F8: select + lease
    wave = select_wave(f, quotas, now, round_no, max_per_host).persist()
    selected_counts = {
        r["project"]: r["count"] for r in wave.groupBy("project").count().collect()
    }
    politeness.consume(state.budget, selected_counts)

    # F16/P9: synthetic tasks (cronjob, messages) join the fetch wave but
    # never touch the frontier and never consume tokens
    wave_all = (
        wave.withColumn("is_synthetic", F.lit(False)).unionByName(
            synthetic_wave.withColumn("is_synthetic", F.lit(True))
        )
        if synthetic_wave is not None
        else wave.withColumn("is_synthetic", F.lit(False))
    )

    # X5 → X2 → X1/X7/X8 → X4 → P1/P7
    gated = robots_gate(wave_all, robots)
    if redirects is not None:
        gated = resolve_redirects(gated, redirects, config.max_redirects)
        fetched = simulated_fetch(gated, documents, now, url_col="resolved_url")
    else:
        fetched = simulated_fetch(gated, documents, now)
    if config.conditional_get:
        fetched = conditional_gate(fetched)
    processed = process_wave(fetched).withColumn("track", build_track(now)).persist()

    # F13-F15: outcomes back into the frontier (wave-sized ⇒ broadcast merge)
    retry_delay = next(iter(config.projects.values())).get("retry_delay") if config.projects else None
    outcome_rows = apply_outcomes(
        processed.where(~F.col("is_synthetic")), now, round_no, retry_delay
    )
    f2 = merge_frontier(f, outcome_rows, keys_subset=True)

    # P3/P4/P6 → F11/F12 → F5/F9/F10/F19: follows + postponed replays
    cands = extract_links(processed, round_no)
    if state.postponed is not None:
        cands = cands.unionByName(state.postponed)
    if extra_candidates is not None:
        cands = cands.unionByName(extra_candidates)
    # persist: consumed by route (via the frontier checkpoint), the bloom
    # split, and the postponed collect — without the cache each consumer
    # would re-run the extraction DAG (incl. the canonicalize Arrow UDF)
    merged_cands = merge_candidates(cands).persist()
    inqueue_limits = {
        p: cfg.get("inqueue_limit", 0) for p, cfg in config.projects.items()
    }
    if bloom is not None:
        # URL-seen prefilter: bloom negatives are DEFINITELY new ⇒ plain
        # inserts, no frontier join; positives take the exact route join
        # (which also resolves restart rules). Sound: no false negatives.
        definitely_new, maybe_seen = bloom.split_candidates(merged_cands)
        bloom_inserts, _ = route_candidates(
            f2.limit(0), definitely_new, now, round_no,
            inqueue_limits=inqueue_limits, queued_counts=qsizes,
        )
        updates, inserts, postponed = route_candidates(
            f2, maybe_seen, now, round_no,
            inqueue_limits=inqueue_limits, queued_counts=qsizes, split=True,
        )
        inserts = inserts.unionByName(bloom_inserts)
    else:
        updates, inserts, postponed = route_candidates(
            f2, merged_cands, now, round_no,
            inqueue_limits=inqueue_limits, queued_counts=qsizes, split=True,
        )
    # no frontier-wide shuffle anywhere in the round: `updates` keys all
    # exist (wave-scale ⇒ broadcast left-merge), `inserts` are guaranteed
    # new (plain union) — the Iceberg analogue is MERGE matched-only +
    # append, touching only affected partitions
    new_frontier = merge_frontier(f2, updates, keys_subset=True).unionByName(inserts)

    results = results_from_wave(processed, now)
    metrics = {
        p: {
            "selected": float(n),
            "quota": float(quotas.get(p, 0)),
            "queue_size": float(qsizes.get(p, 0)),
        }
        for p, n in {**{q: 0 for q in quotas}, **selected_counts}.items()
    }

    new_state = RoundState(
        frontier=new_frontier,
        budget=state.budget,
        postponed=postponed,
        round_no=round_no + 1,
        projects_state=state.projects_state,
    )
    return RoundOutput(
        new_state, wave, processed, results, selected_counts, metrics, cached=(merged_cands,)
    )
