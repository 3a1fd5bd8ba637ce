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

import time
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
    # X1: 'simulated' joins the documents corpus; 'real' runs the
    # mapInPandas HTTP kernel (operators/fetch_real) — everything
    # downstream of FETCHED_COLS is shared between the modes
    fetch_mode: str = "simulated"
    fetch_threads: int = 16  # per-partition HTTP concurrency in real mode
    # hot-host skew salting in the select rank (north rule): S-way
    # two-phase per-host top-k; 1 disables (exact either way — see
    # frontier.select_wave). Default OFF: an interleaved corpus-scale A/B
    # (BENCH/BASELINE.md §3d, 3 trials/arm at the 1.6M wave) measured the
    # 16-way salt 2.0x slower on a UNIFORM host distribution — the extra
    # shuffle+rank pass only pays when one host dominates a partition
    # (the regime test_select_wave_salted_equals_unsalted pins); set 16
    # for skewed crawls.
    select_salt_buckets: int = 1
    # X5 live mode (real fetch only): fetch each new host's /robots.txt
    # once per TTL window instead of requiring a rules table
    # (tornado_fetcher.py:289-324; cache = operators/robots_live)
    robots_live: bool = False
    robots_user_agent: str | None = None  # robots fetch UA (default kernel UA)

    def clock(self, round_no: int) -> float:
        return self.start_time + round_no * self.round_interval


@dataclass
class RoundState:
    frontier: DataFrame
    budget: politeness.BudgetState = field(default_factory=politeness.BudgetState)
    postponed: DataFrame | None = None
    round_no: int = 0
    projects_state: "ProjectsState | None" = None
    # per-project ACTIVE+LEASED counts, maintained INCREMENTALLY from each
    # round's own deltas (inserted - finished + restarts) — the frontier is
    # never re-aggregated per round (None ⇒ recount once, e.g. on resume)
    qsizes: dict[str, int] | None = None
    # robots_live mode: the per-host rules cache (a DataFrame handle, not
    # driver rows); rebuilt lazily after resume — it is only a cache
    robots_cache: object | None = None

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
    results_count: int = 0  # from the round's single stats job
    postponed_count: int = 0
    routed_count: int = 0  # frontier rows inserted/updated this round
    fin_picks: dict[str, int] | None = None  # events mode: 'on_finished' selects
    # pause_fsm mode: {project: (total outcomes, newest-100 in newest-first
    # order)} from the round's single stats job — the F18 feed
    fsm_outcomes: dict[str, tuple[int, list[bool]]] | None = None
    # per-phase wall seconds: 'build' = python/py4j DAG construction,
    # 'stats' = the round's single collect job (fixed-cost diagnostics —
    # BENCH/BASELINE.md §3c decomposition, now measured on every run)
    timing: dict[str, float] = field(default_factory=dict)

    def unpersist(self) -> None:
        self.wave.unpersist()
        self.processed.unpersist()
        for df in self.cached:
            df.unpersist()


def fsm_outcome_feed(processed: DataFrame, keep: int = 100) -> DataFrame:
    """F18 feed, distributed AND bounded (VERDICT r03 item 1): the FSM only
    ever inspects the newest ``keep``=100 outcomes per project (deque
    maxlen=100, scheduler.py:51-102) plus the total count. Rank-filter to
    those 100 BEFORE collect_list, so the aggregation buffer holds ≤100
    structs by construction — never the whole per-project wave (at a
    1.6M-URL single-project wave the old plan array_sort'ed a multi-MB
    array in ONE buffer). The window sort is distributed and spillable; the
    total count rides the same window partitioning, no extra shuffle.

    Returns one row per project: (tag='fsm', project, n=total outcomes,
    outcomes=newest-``keep`` in newest-first order) — union-compatible with
    the round's single stats job."""
    from pyspark.sql import Window

    w_rank = Window.partitionBy("project").orderBy(F.desc("wave_rank"))
    w_all = Window.partitionBy("project")
    return (
        processed.select("project", "wave_rank", F.col("process_ok").alias("ok"))
        .withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_n", F.count("*").over(w_all))
        .where(F.col("_rn") <= keep)
        .groupBy("project")
        .agg(
            F.max("_n").cast("long").alias("n"),
            F.reverse(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("wave_rank"), F.col("ok")))
                    ),
                    lambda s: s.ok,
                )
            ).alias("outcomes"),
        )
        .select(F.lit("fsm").alias("tag"), "project", "n", "outcomes")
    )


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
    _t_start = time.perf_counter()

    # F3/F4: release time-queue arrivals + expired leases
    f = release_ready(state.frontier, now)

    # F6/F8: per-project wave quotas (driver-side small state). Queue
    # sizes are carried incrementally across rounds — the full-frontier
    # aggregation runs only when the state has none (bootstrap/resume);
    # release/lease transitions never change ACTIVE∪LEASED membership, so
    # end-of-previous-round counts equal start-of-this-round counts.
    qsizes = state.qsizes if state.qsizes is not None else queue_sizes(f, now)
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

    # F1/F8: select + lease; F20: project crawl_config merged into every
    # selected task at select time, task values winning (synthetic tasks
    # bypass the queue and therefore the merge, like the reference)
    from pyspider_spark.operators.projects import join_crawl_config

    wave = join_crawl_config(
        select_wave(f, quotas, now, round_no, max_per_host,
                    salt_buckets=config.select_salt_buckets),
        config.projects,
    ).persist()

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
    if config.robots_live and config.fetch_mode == "real":
        from pyspider_spark.operators.robots_live import RobotsCache

        if state.robots_cache is None:
            state.robots_cache = RobotsCache(
                wave.sparkSession,
                **({"user_agent": config.robots_user_agent}
                   if config.robots_user_agent else {}),
            )
        # only hosts of tasks that opted into the gate fetch robots.txt;
        # the request reuses the task's origin (scheme + port — the host
        # column alone drops both)
        from pyspider_spark.operators.robots_live import origin_of

        opted = wave_all.where(F.coalesce(F.col("fetch").robots_txt, F.lit(False)))
        live = state.robots_cache.rules_for(
            opted.select("host", origin_of(F.col("url")).alias("origin")), now
        )
        if robots is None:
            robots = live
        else:
            # a table-provided rules DF carries fetched_at; the live cache
            # view doesn't — align on the gate's 3 columns before the union
            robots = robots.select("host", "path_prefix", "allow").unionByName(live)
    gated = robots_gate(wave_all, robots)
    if config.fetch_mode == "real":
        from pyspider_spark.operators.fetch_real import real_fetch_stage

        # real HTTP follows its own redirects in-kernel with the config
        # hop budget (X2); a wire 304 from replayed validators is this
        # mode's not_modified (X4) — the simulated emulation gate below
        # must NOT also run, or every successful recrawl would 304
        fetched = real_fetch_stage(
            gated, max_threads=config.fetch_threads,
            max_redirects=config.max_redirects,
            replay_conditional=config.conditional_get,
        )
    elif redirects is not None:
        gated = resolve_redirects(gated, redirects, config.max_redirects)
        fetched = simulated_fetch(gated, documents, now, url_col="resolved_url")
    else:
        fetched = simulated_fetch(gated, documents, now)
    if config.conditional_get and config.fetch_mode != "real":
        fetched = conditional_gate(fetched)
    # cache slimming: everything downstream of process_wave needs only the
    # LINK spans' (text, offset) — result/title/counts were just computed
    # into their own columns — so the persisted wave drops the full span
    # structs (~half the cached bytes; memory bandwidth is the measured
    # single-box bottleneck, BENCH/BASELINE.md §3b)
    pw = process_wave(fetched)
    processed = (
        pw
        .withColumn("track", build_track(now, wire_meta="resp_etag" in pw.columns))
        .drop("resp_etag", "resp_last_modified")
        .withColumn(
            "link_spans",
            F.transform(
                F.filter(F.col("content_spans"), lambda s: s.kind == F.lit("link")),
                lambda s: F.struct(s.text.alias("text"), s.offset.alias("offset")),
            ),
        )
        .drop("content_spans")
        .persist()
    )

    # F13-F15: outcomes back into the frontier (wave-sized ⇒ broadcast
    # merge); retry ladders resolve PER PROJECT (scheduler.py:918)
    outcome_rows = apply_outcomes(
        processed.where(~F.col("is_synthetic")), now, round_no,
        retry_delays_by_project={
            p: cfg.get("retry_delay") for p, cfg in config.projects.items()
            if cfg.get("retry_delay")
        } or None,
    )
    # persisted for the round (unpersists with the cached set): the route
    # join reads f2 from every split branch and the checkpoint merge reads
    # it again — ~5 evaluations of the release projection + broadcast
    # outcome merge per round otherwise (measured 66.3 -> ~52 s at the 20k
    # crawl bench, checkpoint phase 5.2 -> 2.6 s). At corpus scale the one
    # cache fill replaces the same number of full-frontier recomputes, so
    # cached-bytes traffic is neutral-to-better there too.
    f2 = merge_frontier(f, outcome_rows, keys_subset=True).persist()

    # P3/P4/P6 → F11/F12 → F5/F9/F10/F19: follows + postponed replays;
    # candidates carry each project's CURRENT itag (dynamic updates make
    # every re-emitted link restart its SUCCESS task via F10)
    itags = {p: cfg.get("itag") for p, cfg in config.projects.items() if cfg.get("itag")}
    cands = extract_links(processed, round_no, itags or None)
    if state.postponed is not None:
        cands = cands.unionByName(state.postponed)
    if extra_candidates is not None:
        cands = cands.unionByName(extra_candidates)
    # persist: consumed by route (via the frontier checkpoint), the bloom
    # split, and the postponed collect — without the cache each consumer
    # would re-run the extraction DAG (incl. the canonicalize Arrow UDF)
    # F19 headroom is cut ONCE here, before any bloom split — cutting
    # inside each route call would grant up to 2x the configured headroom
    # (one full allowance per leg)
    inqueue_limits = {
        p: cfg.get("inqueue_limit", 0) for p, cfg in config.projects.items()
    }
    merged_cands = merge_candidates(cands)
    headrooms = {
        p: max(0, int(lim) - int(qsizes.get(p, 0)))
        for p, lim in inqueue_limits.items()
        if lim and lim > 0
    }
    if headrooms:
        from pyspider_spark.operators.frontier import inqueue_headroom_cut

        merged_cands = inqueue_headroom_cut(merged_cands, headrooms, "project", ("seq",))
    merged_cands = merged_cands.persist()
    if bloom is not None:
        # URL-seen prefilter: bloom negatives are DEFINITELY new ⇒ plain
        # inserts, no frontier join; positives take the exact route join
        # (which also resolves restart rules). Sound: no false negatives.
        # Both split halves persist (and unpersist with the round): the
        # probe UDF + route join otherwise re-run once per downstream
        # branch — updates, inserts, postponed and the stats union each
        # pulled their own evaluation (measured ~4x the probe per round)
        definitely_new, maybe_seen = bloom.split_candidates(merged_cands)
        definitely_new = definitely_new.persist()
        maybe_seen = maybe_seen.persist()
        split_cached = (definitely_new, maybe_seen)
        # definitely-new rows take the dedicated insert projection — the
        # empty-frontier route join was pure plan-construction overhead
        # (equivalence pinned by test_route_inserts_equals_empty_frontier_route)
        from pyspider_spark.operators.frontier import route_inserts

        bloom_inserts = route_inserts(
            definitely_new, now, round_no, with_qdelta=True
        )
        updates, inserts, postponed = route_candidates(
            f2, maybe_seen, now, round_no, split=True, with_qdelta=True,
        )
        inserts = inserts.unionByName(bloom_inserts)
    else:
        split_cached = ()
        updates, inserts, postponed = route_candidates(
            f2, merged_cands, now, round_no, split=True, with_qdelta=True,
        )
    # persist the wave-sized route outputs: both the stats job and the
    # frontier checkpoint consume them — without the cache the checkpoint
    # re-runs the route joins the stats job just computed
    updates = updates.persist()
    inserts = inserts.persist()
    postponed = postponed.persist()
    # no frontier-wide shuffle anywhere in the round: `updates` keys all
    # exist (wave-scale ⇒ broadcast left-merge), `inserts` are guaranteed
    # new (plain union) — the Iceberg analogue is MERGE matched-only +
    # append, touching only affected partitions
    new_frontier = merge_frontier(f2, updates, keys_subset=True).unionByName(
        inserts.drop("_q_delta")
    )

    results = results_from_wave(processed, now)

    # ---- the round's SINGLE driver job: every per-round count folded into
    # one union-of-partial-aggs collect (selected, finished, queue deltas,
    # postponed, results, on_finished picks) — no separate frontier agg,
    # no per-metric jobs (VERDICT r01: per-round barrier tax)
    from pyspider_spark.types import FAILED, SUCCESS

    # each branch contributes THIN (tag, project, w) rows; ONE groupBy
    # aggregates them all — a single exchange of pre-combined partials
    # instead of seven per-branch shuffles (the per-round stats job is a
    # measured fixed cost, BENCH/BASELINE.md §3c; fewer stages also means
    # less Catalyst analysis in the round's DAG build)
    def _thin(df: DataFrame, tag: str, sum_col: str | None = None) -> DataFrame:
        w = F.lit(1).cast("long") if sum_col is None else F.col(sum_col).cast("long")
        return df.select(F.lit(tag).alias("tag"), F.col("project"), w.alias("w"))

    thin_parts = [
        _thin(wave, "selected"),
        _thin(outcome_rows.where(F.col("status").isin(SUCCESS, FAILED)), "done"),
        _thin(inserts, "inserted"),
        _thin(updates, "updated"),
        _thin(updates, "upd_delta", "_q_delta"),
        _thin(postponed, "postponed"),
        _thin(results, "results"),
    ]
    if config.events:
        thin_parts.append(_thin(wave.where(F.col("taskid") == "on_finished"), "fin_picks"))
    thin = thin_parts[0]
    for part in thin_parts[1:]:
        thin = thin.unionByName(part)
    stats_df = (
        thin.groupBy("tag", "project")
        .agg(F.sum("w").cast("long").alias("n"))
        .select("tag", "project", "n",
                F.lit(None).cast("array<boolean>").alias("outcomes"))
    )
    if config.pause_fsm:
        stats_df = stats_df.unionByName(fsm_outcome_feed(processed))
    stats: dict[str, dict[str, int]] = {}
    fsm_outcomes: dict[str, tuple[int, list[bool]]] = {}
    _t_built = time.perf_counter()
    for r in stats_df.collect():
        if r["tag"] == "fsm":
            fsm_outcomes[r["project"]] = (int(r["n"]), list(r["outcomes"] or []))
        else:
            stats.setdefault(r["tag"], {})[r["project"]] = int(r["n"])

    selected_counts = stats.get("selected", {})
    politeness.consume(state.budget, selected_counts)
    new_qsizes = dict(qsizes)
    for p in set(stats.get("done", {})) | set(stats.get("inserted", {})) | set(
        stats.get("upd_delta", {})
    ):
        new_qsizes[p] = (
            new_qsizes.get(p, 0)
            - stats.get("done", {}).get(p, 0)
            + stats.get("inserted", {}).get(p, 0)
            + stats.get("upd_delta", {}).get(p, 0)
        )

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
        postponed=postponed if sum(stats.get("postponed", {}).values()) else None,
        round_no=round_no + 1,
        projects_state=state.projects_state,
        qsizes=new_qsizes,
        robots_cache=state.robots_cache,
    )
    return RoundOutput(
        new_state, wave, processed, results, selected_counts, metrics,
        # unpersisted once the round commits; postponed is safe to drop
        # there because _loop eagerly materializes the replay set
        # (bound_postponed) before out.unpersist()
        cached=(merged_cands, updates, inserts, postponed, f2, *split_cached),
        results_count=sum(stats.get("results", {}).values()),
        postponed_count=sum(stats.get("postponed", {}).values()),
        routed_count=sum(stats.get("inserted", {}).values())
        + sum(stats.get("updated", {}).values()),
        fin_picks=stats.get("fin_picks") if config.events else None,
        fsm_outcomes=fsm_outcomes if config.pause_fsm else None,
        timing={
            "build": round(_t_built - _t_start, 3),
            "stats": round(time.perf_counter() - _t_built, 3),
        },
    )
