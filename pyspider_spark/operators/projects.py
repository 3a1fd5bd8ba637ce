"""Project runtime state: cronjob ticks (F16), on_finished events (F17),
auto-pause FSM (F18) — driver-side O(#projects) state, like the budget.

Reference semantics re-expressed (not copied):
  - cronjob: scheduler.py:419-449 — every elapsed tick where
    ``tick % min_tick == 0`` injects a synthetic '_on_cronjob' task
    (data: URL, SUCCESS-path, never persisted to the frontier).
  - on_finished: scheduler.py:541-561 — when a project that had selected
    tasks drains, wait FAIL_PAUSE_NUM idle loops, then inject an
    'on_finished' task (priority 9, age 0, force_update).
  - pause FSM: scheduler.py:51-102 — last FAIL_PAUSE_NUM=10 completed
    (non-select) tasks all failed ⇒ paused for PAUSE_TIME=300s ⇒
    'checking': next UNPAUSE_CHECK_NUM=3 all fail ⇒ paused again, any
    success ⇒ unpaused. The recent-outcome window is fed per round from
    the wave results (newest first), replacing the in-memory
    active_tasks deque.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAIL_PAUSE_NUM = 10
PAUSE_TIME = 5 * 60
UNPAUSE_CHECK_NUM = 3


def join_crawl_config(wave: DataFrame, project_configs: dict[str, dict]) -> DataFrame:
    """F20: merge each project's ``crawl_config`` into the selected wave,
    task values winning — base_handler.task_join_crawl_config semantics
    (base_handler.py:227-253: scalar fields via setdefault, dict fields
    config-base-then-task-update), applied at select time like
    scheduler.on_select_task (scheduler.py:1002-1004).

    Supported config keys (the FETCH_TYPE surface): ``headers`` (deep
    merge, task keys win), ``method``, ``data``, ``timeout``, ``save``,
    ``robots_txt`` (each fills only NULL task fields). The config table is
    O(#projects) ⇒ broadcast join, no wave shuffle. Projects without a
    crawl_config pass through untouched (no-op when none have one).
    """
    ccs = {
        p: cfg.get("crawl_config")
        for p, cfg in project_configs.items()
        if cfg.get("crawl_config")
    }
    if not ccs:
        return wave
    spark = wave.sparkSession
    def _headers(cc: dict) -> dict | None:
        # X6: a config-level user_agent becomes the User-Agent header base
        # (explicit headers — config or task — still win, matching the
        # fetcher's default-UA-then-update order, tornado_fetcher.py:224-229)
        h = dict(cc.get("headers") or {})
        if cc.get("user_agent") and "User-Agent" not in h:
            h["User-Agent"] = cc["user_agent"]
        return h or None

    rows = [
        (p, _headers(cc), cc.get("method"), cc.get("data"),
         cc.get("timeout"), cc.get("save"), cc.get("robots_txt"),
         cc.get("proxy"), cc.get("use_gzip"), cc.get("max_redirects"))
        for p, cc in ccs.items()
    ]
    cc = F.broadcast(spark.createDataFrame(
        rows,
        "project string, cc_headers map<string,string>, cc_method string, "
        "cc_data string, cc_timeout int, cc_save string, cc_robots_txt boolean, "
        "cc_proxy string, cc_use_gzip boolean, cc_max_redirects int",
    ))
    joined = wave.join(cc, "project", "left")
    f = F.col("fetch")
    # deep merge: config pairs are the base, task pairs win (reference
    # does dict(config); update(task))
    from pyspider_spark.functions.maps import map_override

    merged_headers = map_override(F.col("cc_headers"), f.headers)
    merged = (
        f.withField("headers", merged_headers)
        .withField("method", F.coalesce(f.method, F.col("cc_method")))
        .withField("data", F.coalesce(f.data, F.col("cc_data")))
        .withField("timeout", F.coalesce(f.timeout, F.col("cc_timeout")))
        .withField("save", F.coalesce(f.save, F.col("cc_save")))
        .withField("robots_txt", F.coalesce(f.robots_txt, F.col("cc_robots_txt")))
    )
    fetch_fields = [sf.name for sf in wave.schema["fetch"].dataType.fields]
    if "proxy" in fetch_fields:
        # X6: config-level proxy/gzip fill unset task fields (withField on
        # structs that carry them — legacy narrow test structs pass through)
        merged = merged.withField(
            "proxy", F.coalesce(f.proxy, F.col("cc_proxy"))
        ).withField("use_gzip", F.coalesce(f.use_gzip, F.col("cc_use_gzip")))
    if "max_redirects" in fetch_fields:
        # X2: per-project redirect budget fills unset task budgets
        merged = merged.withField(
            "max_redirects", F.coalesce(f.max_redirects, F.col("cc_max_redirects"))
        )
    return joined.withColumn("fetch", merged).drop(
        "cc_headers", "cc_method", "cc_data", "cc_timeout", "cc_save",
        "cc_robots_txt", "cc_proxy", "cc_use_gzip", "cc_max_redirects",
    )


def min_tick_of(cfg: dict) -> int:
    """F16: a project's cronjob tick interval. The reference derives
    ``min_tick`` as the GCD of all ``@every`` intervals declared by the
    handler (base_handler.py:100-119: ``min_tick = gcd(min_tick, each.tick)``
    starting from 0) so the scheduler dispatches '_on_cronjob' no more often
    than needed. Here the project config declares the intervals as
    ``every: [seconds, ...]``; an explicit ``min_tick`` key still wins (the
    pre-round-4 hand-set knob, and an escape hatch)."""
    if cfg.get("min_tick") is not None:
        return int(cfg["min_tick"])
    from math import gcd

    tick = 0
    for every in cfg.get("every") or []:
        tick = gcd(tick, int(every))
    return tick


@dataclass
class ProjectRuntime:
    min_tick: int = 0
    # pause FSM
    paused: bool | str = False  # False | True | 'checking'
    paused_time: float = 0.0
    recent: deque = field(default_factory=lambda: deque(maxlen=100))  # newest first
    unpause_marker: int = 0  # outcomes seen count at pause->checking flip
    outcomes_seen: int = 0
    # on_finished
    selected_tasks: bool = False
    finished_wait: int = 0
    finished_sent: bool = False


@dataclass
class ProjectsState:
    runtimes: dict[str, ProjectRuntime] = field(default_factory=dict)
    last_tick: int = 0

    def ensure(self, project: str, min_tick: int = 0) -> ProjectRuntime:
        rt = self.runtimes.setdefault(project, ProjectRuntime())
        rt.min_tick = min_tick
        return rt

    # -- F16 ------------------------------------------------------------------
    def cronjob_ticks(self, now: float, start_time: float) -> list[tuple[str, int]]:
        """Synthetic '_on_cronjob' injections: one per elapsed whole-second
        tick per project where tick % min_tick == 0. Returns
        [(project, tick)]."""
        out: list[tuple[str, int]] = []
        current = int(now - start_time)
        while self.last_tick < current:
            self.last_tick += 1
            for name, rt in self.runtimes.items():
                if rt.min_tick > 0 and self.last_tick % rt.min_tick == 0:
                    out.append((name, self.last_tick))
        return out

    # -- F18 ------------------------------------------------------------------
    def record_outcomes(self, project: str, outcomes: list[bool]) -> None:
        """Feed this round's completed-task outcomes (pick order ⇒ newest
        appended last; deque keeps newest first like active_tasks)."""
        rt = self.ensure(project)
        for ok in outcomes:
            rt.recent.appendleft(ok)
            rt.outcomes_seen += 1

    def record_outcomes_newest(
        self, project: str, newest_first: list[bool], total_n: int
    ) -> None:
        """Distributed-feed variant: the round's stats job pre-truncates to
        the newest 100 outcomes (newest first — all the deque can retain)
        and carries the full count separately. Equivalent to
        record_outcomes over the complete pick-order list."""
        rt = self.ensure(project)
        for ok in reversed(newest_first):  # oldest-of-the-fresh first
            rt.recent.appendleft(bool(ok))
        rt.outcomes_seen += int(total_n)

    def is_paused(self, project: str, now: float) -> bool:
        rt = self.ensure(project)
        if FAIL_PAUSE_NUM <= 0:
            return False
        if rt.paused is False:
            fail_cnt = 0
            for ok in rt.recent:
                if ok:
                    break
                fail_cnt += 1
                if fail_cnt >= FAIL_PAUSE_NUM:
                    break
            if fail_cnt >= FAIL_PAUSE_NUM:
                rt.paused = True
                rt.paused_time = now
        elif rt.paused is True and rt.paused_time + PAUSE_TIME < now:
            rt.paused = "checking"
            rt.unpause_marker = rt.outcomes_seen
        elif rt.paused == "checking":
            new_n = rt.outcomes_seen - rt.unpause_marker
            fresh = list(rt.recent)[:new_n]
            cnt = fail_cnt = 0
            for ok in reversed(fresh):  # oldest-first among the fresh ones
                cnt += 1
                if ok:
                    cnt = max(cnt, UNPAUSE_CHECK_NUM)
                    break
                fail_cnt += 1
            if cnt >= UNPAUSE_CHECK_NUM:
                if fail_cnt == cnt:
                    rt.paused = True
                    rt.paused_time = now
                else:
                    rt.paused = False
        return rt.paused is True

    # -- F17 ------------------------------------------------------------------
    def on_finished_due(self, project: str, selected: int, queue_size: int) -> bool:
        """Track drain state; True when the on_finished event fires."""
        rt = self.ensure(project)
        if selected:
            rt.selected_tasks = True
            rt.finished_wait = 0
            return False
        if queue_size == 0 and rt.selected_tasks:
            if rt.finished_wait < FAIL_PAUSE_NUM:
                rt.finished_wait += 1
            else:
                rt.selected_tasks = False
                rt.finished_wait = 0
                return True
        return False
