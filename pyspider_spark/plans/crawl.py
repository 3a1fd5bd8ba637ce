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

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# per-round lineage-truncation checkpoints store SERIALIZED (+lz4, via
# spark.rdd.compress) instead of deserialized JVM objects (the
# localCheckpoint default is MEMORY_AND_DISK_DESER): the frontier
# checkpoint is pure cache traffic, and memory bandwidth — not CPU — is
# the measured single-box bottleneck (BENCH/BASELINE.md §3b)
CKPT_LEVEL = StorageLevel.MEMORY_AND_DISK  # (useDisk, useMemory, serialized)

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
    # cumulative per-phase wall seconds across all rounds: build (py4j/
    # Catalyst DAG construction), stats (the single per-round collect),
    # ckpt (frontier lineage truncation), filter (URL-seen add), store
    # (log appends + manifest commit) — the §3c fixed-cost decomposition,
    # measured on every crawl instead of ad-hoc instrumentation
    timings: dict[str, float] | None = None


def _config_itags(config: RoundConfig) -> dict[str, str] | None:
    itags = {p: c.get("itag") for p, c in config.projects.items() if c.get("itag")}
    return itags or None


# postponed rows (a force_update colliding with a LEASED task) are rare —
# collecting them to the driver is normally the cheapest lineage
# truncation for the next round's replay. But "rare" is workload-shaped,
# not guaranteed: past this cap the truncation stays distributed
# (VERDICT r04 item 5 — bounded driver transfer by construction).
POSTPONED_COLLECT_CAP = 10_000


def bound_postponed(spark, postponed: DataFrame, count: int) -> DataFrame | None:
    """Materialize the round's postponed set for next-round replay with a
    BOUNDED driver transfer: small sets collect (cheapest truncation of a
    tiny DataFrame's lineage), anything past POSTPONED_COLLECT_CAP
    checkpoints distributedly instead — the driver never ships an
    arbitrarily large replay set through itself."""
    if count <= 0:
        return None
    if count <= POSTPONED_COLLECT_CAP:
        rows = postponed.collect()
        return spark.createDataFrame(rows, postponed.schema) if rows else None
    return postponed.localCheckpoint(eager=True, storageLevel=CKPT_LEVEL)


def group_has_delete(group) -> bool:
    """Membership test for the 'delete' group, tokenizing on non-word runs
    like the reference's projectdb.split_group (re.split(r"\\W+")): 'foo
    delete', 'foo, delete' and 'delete' all match; 'not-deleted' does not."""
    import re

    return "delete" in re.split(r"\W+", str(group or "").lower())


def delete_projects(state, config, doomed, bloom=None, all_results=None,
                    pending_extra=None, pending_syn=None):
    """Drop every trace of the doomed projects at a round boundary
    (scheduler.py:630-647 _check_delete + taskdb/resultdb.drop): frontier
    rows, POSTPONED force_update replays and pending synthetic/reseed
    candidates (which would otherwise re-insert orphan rows for a project
    with no config/quota entry and skew qsizes), queue accounting,
    politeness bucket, FSM runtime, collected results, and — in cuckoo
    URL-seen mode — the project's filter entries (unlearn).

    Returns the updated (all_results, pending_extra, pending_syn)."""
    can_unlearn = bloom is not None and getattr(
        bloom, "supports_delete", hasattr(bloom, "delete_df")
    )
    for p in doomed:
        if can_unlearn:
            # unlearn ONLY taskids no other project still holds — a URL
            # shared across projects must stay seen (the filter is
            # taskid-keyed, one stored copy per taskid)
            gone = state.frontier.where(F.col("project") == p).select("taskid")
            kept = state.frontier.where(F.col("project") != p).select("taskid")
            bloom.delete_df(gone.join(kept, "taskid", "left_anti"))
        state.frontier = state.frontier.where(F.col("project") != p)
        if state.postponed is not None:
            state.postponed = state.postponed.where(F.col("project") != p)
        if pending_extra is not None:
            pending_extra = pending_extra.where(F.col("project") != p)
        if pending_syn is not None:
            pending_syn = pending_syn.where(F.col("project") != p)
        config.projects.pop(p, None)
        if state.qsizes is not None:
            state.qsizes.pop(p, None)
        state.budget.buckets.pop(p, None)
        if state.projects_state is not None:
            state.projects_state.runtimes.pop(p, None)
        if all_results is not None:
            # memory-mode resultdb drop; in store mode historical appended
            # rounds are immutable — the drop applies to the live view, as
            # with the reference's resultdb.drop
            all_results = all_results.where(F.col("project") != p)
    if doomed and can_unlearn:
        # soundness repair: with idempotent inserts two distinct taskids
        # that alias to the same (bucket, fingerprint) share ONE stored
        # copy, so the delete above may have unlearned a surviving
        # project's taskid too — and a false negative would double-insert
        # on the definitely-new fast path. Re-adding the whole surviving
        # frontier (idempotent ⇒ no-op except for exactly the aliased
        # losers) restores the no-false-negative guarantee. O(frontier)
        # vectorized hashing once per delete event — rare, admin-triggered.
        bloom.add_df(state.frontier.select("taskid"))
    return all_results, pending_extra, pending_syn


def _make_urlseen(spark, urlseen_filter: str, bloom_expected: int,
                  urlseen_path: str | None):
    """Construct the URL-seen prefilter named by ``urlseen_filter``:
    driver-held 'bloom'/'cuckoo', or parquet-resident 'stored-bloom'/
    'stored-cuckoo' (the 10^10-key posture — requires ``urlseen_path``)."""
    from pyspider_spark.operators.urlseen import (
        ShardedBloom,
        ShardedCuckoo,
        StoredFilter,
    )

    if urlseen_filter in ("bloom", "cuckoo"):
        cls = {"bloom": ShardedBloom, "cuckoo": ShardedCuckoo}[urlseen_filter]
        return cls(n_shards=16, expected_per_shard=max(1024, bloom_expected // 16))
    if urlseen_filter in ("stored-bloom", "stored-cuckoo"):
        if not urlseen_path:
            raise ValueError(f"urlseen_filter={urlseen_filter!r} requires urlseen_path")
        return StoredFilter(
            spark, urlseen_path, kind=urlseen_filter.split("-", 1)[1],
            n_shards=16, expected_per_shard=max(1024, bloom_expected // 16),
        )
    raise ValueError(
        f"urlseen_filter must be bloom|cuckoo|stored-bloom|stored-cuckoo,"
        f" got {urlseen_filter!r}"
    )


# above this many delta rows the URL-seen fold stays on the distributed
# shard-shuffled build; below it the ids collect (<~10 MB) and fold
# driver-side through the same kernels — a per-round shuffle job is
# seconds of fixed cost that dwarfs a small round's actual work
SMALL_DELTA_IDS = 100_000


def _filter_add(bloom, df: DataFrame, through_round: int | None,
                taskid_col: str = "taskid", n_rows: int | None = None) -> None:
    """add_df, stamping persistent filters with the round their state is
    consistent through (driver-held filters take no tag — they are
    rebuilt on resume anyway). When the caller knows the delta is small
    (``n_rows``, free from the round's stats job) and the filter is
    driver-held, the ids fold driver-side instead of through a shuffle
    job."""
    if getattr(bloom, "persistent", False):
        tag = None if through_round is None else {"through_round": int(through_round)}
        bloom.add_df(df, taskid_col=taskid_col, tag=tag)
    elif (
        n_rows is not None
        and n_rows <= SMALL_DELTA_IDS
        and hasattr(bloom, "add_ids")
    ):
        bloom.add_ids([r[0] for r in df.select(taskid_col).collect()])
    else:
        bloom.add_df(df, taskid_col=taskid_col)


def bootstrap(spark: SparkSession, seeds: DataFrame, config: RoundConfig) -> RoundState:
    """Round -1: seeds become the initial frontier (scheduler.on_new_request
    for each seed; all unseen ⇒ plain inserts)."""
    empty = spark.createDataFrame([], FRONTIER_SCHEMA)
    cands = merge_candidates(
        candidates_from_seeds(seeds, config.start_time, itags=_config_itags(config))
    )
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
    redirects: DataFrame | None = None,
    project_updates: dict[int, dict[str, dict]] | None = None,
    urlseen_filter: str = "bloom",
    urlseen_path: str | None = None,
) -> CrawlReport:
    """``project_updates``: {round_no: {project: config_delta}} — the
    quantized _update_projects lifecycle (scheduler.py:206-259): before the
    given round, the delta (rate, status, itag, retry_delay, crawl_config,
    ...) deep-merges into the project's config. An itag change makes every
    subsequently re-emitted candidate restart its SUCCESS task (F10); a
    delta with ``"reseed": True`` additionally re-issues the project's
    seeds (the 'run'/on_start analogue), cascading the recrawl. A delta
    that leaves the project with status STOP and 'delete' in its group is
    the project-delete trigger (scheduler.py:630-647 _check_delete,
    quantized to the round boundary instead of the 24h DELETE_TIME wait):
    the project's frontier rows, queue accounting, politeness bucket, and
    collected results drop, and in cuckoo URL-seen mode its taskids are
    unlearned so a re-created project re-crawls them.

    ``urlseen_filter``: 'bloom' (default) or 'cuckoo' — which URL-seen
    prefilter ``use_bloom=True`` builds. Both split candidates identically;
    the cuckoo additionally supports deletion (project delete). The
    'stored-bloom' / 'stored-cuckoo' variants (require ``urlseen_path``)
    keep the filter in versioned parquet instead of driver memory — the
    10^10-key posture: no process ever holds more than one shard's bytes,
    and the filter survives restarts (resume catches up from its
    through_round tag instead of rebuilding)."""
    state = bootstrap(spark, seeds, config)
    bloom = None
    if use_bloom:
        bloom = _make_urlseen(spark, urlseen_filter, bloom_expected, urlseen_path)
        # untagged: round 0's own inserts also carry round_no=0, so this
        # pre-loop add does NOT yet cover "everything through round 0" —
        # the first tagged add lands after round 0's snapshot commits
        _filter_add(bloom, state.frontier, through_round=None)
    return _loop(
        spark, state, documents, config, robots, max_rounds, store, collect_results, on_round,
        bloom=bloom, redirects=redirects, project_updates=project_updates, seeds=seeds,
    )


def resume(
    spark: SparkSession,
    store: SnapshotStore,
    documents: DataFrame,
    config: RoundConfig,
    robots: DataFrame | None = None,
    max_rounds: int = 1000,
    collect_results: bool = True,
    use_bloom: bool = False,
    bloom_expected: int = 1 << 20,
    urlseen_filter: str = "bloom",
    urlseen_path: str | None = None,
    project_updates: dict[int, dict[str, dict]] | None = None,
    seeds: DataFrame | None = None,
) -> CrawlReport:
    """Continue from the last committed snapshot (manifest flip is atomic,
    so this is always a consistent round boundary). With ``use_bloom`` a
    driver-held prefilter is rebuilt from the recovered frontier (one
    distributed pass — the filter is a cache, not state, so it is never
    checkpointed); a STORED filter reopens its committed parquet version
    and catches up only the frontier rows newer than its through_round
    tag — after a mid-round crash that delta is one round's inserts, not
    a 10^10-row rebuild. Without a filter a resumed frontier falls back
    to exact-anti-join-only routing (correct, but loses the fast path)."""
    manifest = store.read_manifest()
    if manifest is None:
        raise ValueError("nothing to resume: no manifest committed")
    state = RoundState(
        frontier=store.read_frontier(manifest["round_no"]),
        budget=politeness.BudgetState.from_dict(manifest["budget_state"]),
        round_no=manifest["round_no"] + 1,
    )
    bloom = None
    if use_bloom:
        bloom = _make_urlseen(spark, urlseen_filter, bloom_expected, urlseen_path)
        last = int(manifest["round_no"])
        tag = getattr(bloom, "tag", None) if getattr(bloom, "persistent", False) else None
        through = tag.get("through_round", -1) if tag else -1
        if not getattr(bloom, "persistent", False) or getattr(bloom, "version", 0) == 0 or through < 0:
            # driver-held (always rebuilt), empty, or untagged stored state
            # (crash before the meta landed, or post-delete): full
            # idempotent catch-up over the recovered frontier
            _filter_add(bloom, state.frontier, through_round=last)
        elif through < last:
            # stored filter is consistent through `through`; add only the
            # rounds it missed (idempotent — updated rows re-add as no-ops)
            delta = state.frontier.where(F.col("round_no") > through)
            _filter_add(bloom, delta, through_round=last)
        # through == last: filter already covers the snapshot — no pass at all
    return _loop(
        spark, state, documents, config, robots, max_rounds, store, collect_results,
        None, bloom=bloom, project_updates=project_updates, seeds=seeds,
    )


def _loop(
    spark, state, documents, config, robots, max_rounds, store, collect_results, on_round,
    bloom=None, redirects=None, project_updates=None, seeds=None,
) -> CrawlReport:
    selected_total = 0
    results_total = 0
    all_results: DataFrame | None = None
    pending_extra: DataFrame | None = None
    pending_syn: DataFrame | None = None
    idle_rounds = 0
    # with events on, an idle queue must keep ticking until the on_finished
    # wait counter (FAIL_PAUSE_NUM rounds) matures — scheduler.py:541-561
    max_idle = 12 if config.events else 0
    import time as _time

    timings = {"build": 0.0, "stats": 0.0, "ckpt": 0.0, "filter": 0.0, "store": 0.0}

    for _ in range(max_rounds):
        if project_updates and state.round_no in project_updates:
            from pyspider_spark.operators.frontier import candidates_from_seeds

            deltas = project_updates[state.round_no]
            reseed_projects = []
            for p, delta in deltas.items():
                cfg_p = config.projects.setdefault(p, {})
                for k, v in delta.items():
                    if k == "reseed":
                        if v:
                            reseed_projects.append(p)
                    elif k == "crawl_config" and isinstance(cfg_p.get(k), dict):
                        cfg_p[k] = {**cfg_p[k], **v}
                    else:
                        cfg_p[k] = v
            # project delete (scheduler.py:630-647 _check_delete): STOP'd
            # project in group 'delete' → drop its tasks, results, counters.
            # The reference waits DELETE_TIME (24h) after the last update;
            # the batch analogue applies it at this round boundary.
            doomed = [
                p for p, c in list(config.projects.items())
                if c.get("status") == "STOP" and group_has_delete(c.get("group"))
            ]
            if doomed:
                all_results, pending_extra, pending_syn = delete_projects(
                    state, config, doomed, bloom=bloom, all_results=all_results,
                    pending_extra=pending_extra, pending_syn=pending_syn,
                )
            if reseed_projects and seeds is not None:
                re_cands = candidates_from_seeds(
                    seeds.where(F.col("project").isin(reseed_projects)),
                    config.clock(state.round_no),
                    itags=_config_itags(config),
                    # the reference 'run' button re-issues on_start WITH
                    # force_update — without it a bare reseed would be a
                    # silent no-op against already-SUCCESS seed tasks
                    force_update=True,
                )
                pending_extra = (
                    re_cands if pending_extra is None
                    else pending_extra.unionByName(re_cands)
                )
        out: RoundOutput = run_round(
            state, documents, config, robots, bloom=bloom,
            extra_candidates=pending_extra, synthetic_wave=pending_syn,
            redirects=redirects,
        )
        pending_extra = None
        pending_syn = None
        n_selected = sum(out.selected_counts.values())
        selected_total += n_selected
        for k, v in out.timing.items():
            timings[k] += v
        _t_ck = _time.perf_counter()

        # truncate frontier lineage each round: the round DAG references the
        # previous frontier several times (merge lhs, route old-side), so an
        # un-truncated plan tree grows ~3^k — batching checkpoints was tried
        # and overflows plan analysis; per-round truncation is structural.
        # In store mode the parquet snapshot write + read-back IS the
        # truncation — no separate eager localCheckpoint disk/memory write.
        if store is not None:
            store.write_frontier(out.state.frontier, out.state.round_no - 1)
            new_frontier = store.read_frontier(out.state.round_no - 1)
        else:
            new_frontier = out.state.frontier.localCheckpoint(eager=True, storageLevel=CKPT_LEVEL)
        out.state.frontier = new_frontier
        timings["ckpt"] += _time.perf_counter() - _t_ck
        _t_fl = _time.perf_counter()
        if bloom is not None:
            # fold this round's (possibly) new taskids into the URL-seen set;
            # re-adding known ids is a no-op, so the whole round delta is
            # safe. Runs AFTER the snapshot commit, so a stored filter's
            # through_round tag is never ahead of a readable snapshot.
            _filter_add(
                bloom,
                new_frontier.where(new_frontier.round_no == out.state.round_no - 1),
                through_round=out.state.round_no - 1,
                # delta rows = this round's inserts + updates, already
                # counted by the stats job — picks the driver-side
                # small-batch fold when the round is small
                n_rows=out.routed_count,
            )
        timings["filter"] += _time.perf_counter() - _t_fl
        if out.state.postponed is not None:
            # the count came free with the round's stats job; transfer is
            # capped — large sets stay distributed (bound_postponed)
            out.state.postponed = bound_postponed(
                spark, out.state.postponed, out.postponed_count
            )
        else:
            out.state.postponed = None

        results_total += out.results_count  # counted by the round stats job
        if collect_results:
            round_results = out.results.localCheckpoint(eager=True, storageLevel=CKPT_LEVEL)
            all_results = (
                round_results
                if all_results is None
                else all_results.unionByName(round_results)
            )
        else:
            round_results = out.results if store is not None else None

        if store is not None:
            _t_st = _time.perf_counter()
            store.append(round_results, "results", round_no=out.state.round_no - 1)
            store.append(
                round_metrics(
                    spark, out.state.round_no - 1, config.clock(out.state.round_no - 1), out.metrics
                ),
                "metrics",
                round_no=out.state.round_no - 1,
            )
            store.commit_round(out.state.round_no - 1, state.budget.to_dict())
            timings["store"] += _time.perf_counter() - _t_st

        if config.pause_fsm:
            # F18 feed: per-project newest-100 outcomes + counts came back
            # with the round's single stats job — O(#projects) driver state,
            # never an O(wave) collect
            rt = out.state.runtime()
            for p, (n, newest_first) in (out.fsm_outcomes or {}).items():
                rt.record_outcomes_newest(p, newest_first, n)

        if config.events:
            # F16 cronjob ticks → synthetic wave (bypasses the frontier,
            # scheduler.py:433-448); F17 on_finished → a real force_update
            # task (scheduler.py:549-561) — both enter the NEXT round
            from pyspider_spark.operators.frontier import (
                synthetic_candidates,
                synthetic_wave,
            )

            from pyspider_spark.operators.projects import min_tick_of

            rt = out.state.runtime()
            for p, cfg_p in config.projects.items():
                rt.ensure(p, min_tick_of(cfg_p))
            now = config.clock(out.state.round_no - 1)
            cron_items = [
                {"project": p, "taskid": "_on_cronjob", "url": "data:,_on_cronjob",
                 "callback": "_on_cronjob", "save": f'{{"tick": {tick}}}'}
                for p, tick in rt.cronjob_ticks(now, config.start_time)
            ]
            pending_syn = synthetic_wave(
                spark, cron_items, out.state.round_no, config.clock(out.state.round_no)
            )
            # 'on_finished' picks don't count as real selects
            # (scheduler.py:528-529: `if taskid != 'on_finished'`);
            # counted by the round's single stats job
            fin_picks = out.fin_picks or {}
            fin_items = []
            for p in config.projects:
                real_selected = out.selected_counts.get(p, 0) - fin_picks.get(p, 0)
                if rt.on_finished_due(
                    p, real_selected, int(out.metrics.get(p, {}).get("queue_size", 0))
                ):
                    fin_items.append(
                        {"project": p, "taskid": "on_finished", "url": "data:,on_finished",
                         "callback": "on_finished", "priority": 9}
                    )
            pending_extra = synthetic_candidates(spark, fin_items, out.state.round_no)

        out.unpersist()
        if on_round is not None:
            on_round(out)
        state = out.state

        idle = (
            n_selected == 0 and pending_extra is None and pending_syn is None
            # a round that routed new/restarted tasks (or postponed a
            # replay) has made something selectable — not idle yet
            and out.routed_count == 0 and out.postponed_count == 0
            # a scheduled future project update can wake the crawl back up
            and not (project_updates and any(k >= state.round_no for k in project_updates))
        )
        idle_rounds = idle_rounds + 1 if idle else 0
        if idle_rounds > max_idle:
            break

    return CrawlReport(
        rounds=state.round_no,
        selected_total=selected_total,
        results_total=results_total,
        frontier=state.frontier,
        results=all_results,
        timings={k: round(v, 2) for k, v in timings.items()},
    )
