"""Pure-Python reference simulation (the ordering/URL-seen golden model).

Transcribes the *semantics* of the reference scheduler (heap comparator,
merge-on-put, token bucket, retry ladder, restart rules — task_queue.py /
scheduler.py / token_bucket.py), quantized to the same round clock and the
same deterministic seq composition as the Spark engine, so golden tests can
assert EXACT wave-by-wave equality (FIXTURES.md §6 `ordering_golden`).

This is test oracle code: it may collect/loop freely — it never runs on
real data sizes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspider_spark.functions.urlkit import canonicalize_url
from pyspider_spark.operators.frontier import RETRY_CHANNEL, SEQ_RANK_SHIFT, SEQ_ROUND_SHIFT
from pyspider_spark.types import ACTIVE, BAD, FAILED, LEASED, PROCESSING_TIMEOUT, SUCCESS

import hashlib


def md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def host_of(url: str) -> str | None:
    from urllib.parse import urlparse

    return (urlparse(url).hostname or None) if not url.startswith("data:") else None


def path_of(url: str) -> str:
    from urllib.parse import urlparse

    return urlparse(url).path or "/"


def make_seq(round_no: int, wave_rank: int, channel: int) -> int:
    return ((round_no + 1) << SEQ_ROUND_SHIFT) + (wave_rank << SEQ_RANK_SHIFT) + channel


@dataclass
class SimTask:
    taskid: str
    url: str
    host: str | None
    priority: int = 0
    retries: int = 3
    retried: int = 0
    exetime: float = 0.0
    age: int = -1
    itag: str | None = None
    force_update: bool = False
    auto_recrawl: bool = False
    cancel: bool = False
    status: int = ACTIVE
    seq: int = 0
    lease_until: float | None = None
    lastcrawltime: float | None = None
    # last-upsert round + fetch code, mirroring the engine's round_no stamp
    # (route_candidates / apply_outcomes) and track.fetch.status_code — so
    # the sim's final frontier can oracle the flagship projection exactly
    round_no: int = 0
    status_code: int | None = None


@dataclass
class SimBucket:
    rate: float
    burst: float
    tokens: float = -1.0
    last: float = 0.0

    def __post_init__(self):
        if self.tokens < 0:
            self.tokens = self.burst

    def refill(self, now: float) -> float:
        if self.tokens >= self.burst:
            self.last = now
            return self.tokens
        add = self.rate * (now - self.last)
        if add > 1:
            self.tokens = min(self.tokens + add, self.burst)
            self.last = now
        return self.tokens


@dataclass
class Candidate:
    url: str
    priority: int = 0
    exetime: float = 0.0
    seq: int = 0
    age: int = -1
    itag: str | None = None
    force_update: bool = False
    auto_recrawl: bool = False
    cancel: bool = False
    retries: int = 3


@dataclass
class SimConfig:
    rate: float = 1e9
    burst: float = 1e9
    loop_limit: int = 1000
    round_interval: float = 1.0
    start_time: float = 1_700_000_000.0
    retry_delay: dict = field(
        default_factory=lambda: {0: 30, 1: 3600, 2: 21600, 3: 43200, "": 86400}
    )
    max_per_host: int = 1 << 30
    inqueue_limit: int = 0
    robots_enabled: bool = True

    def clock(self, round_no: int) -> float:
        return self.start_time + round_no * self.round_interval


class ReferenceSim:
    """Single-project reference-semantics crawl over an in-memory corpus."""

    def __init__(self, corpus: dict[str, list[tuple]], config: SimConfig,
                 robots_deny_prefix: str = "/private"):
        # corpus: canonical url -> spans [(kind, text, media_ref, offset), ...]
        self.corpus = corpus
        self.cfg = config
        self.tasks: dict[str, SimTask] = {}
        self.bucket = SimBucket(rate=config.rate, burst=config.burst, last=config.start_time)
        self.postponed: list[Candidate] = []
        self.waves: list[list[str]] = []  # taskids in pick order, per round
        self.robots_deny_prefix = robots_deny_prefix

    # -- seeding ------------------------------------------------------------
    def seed(self, seeds: list[tuple[str, int, float]]) -> None:
        """seeds: (url, priority, exetime); seq = rank by (priority desc,
        canonical url asc), mirroring frontier.candidates_from_seeds."""
        canon = [(canonicalize_url(u), p, e) for (u, p, e) in seeds]
        ordered = sorted(canon, key=lambda t: (-t[1], t[0]))
        now = self.cfg.start_time
        for i, (url, priority, exetime) in enumerate(ordered, start=1):
            self._on_request(
                Candidate(url=url, priority=priority, exetime=exetime, seq=i), now, 0
            )

    # -- request routing (scheduler.on_request / task_queue.put) -------------
    def _queued(self, t: SimTask) -> bool:
        return t.status in (ACTIVE, LEASED)

    def _on_request(self, c: Candidate, now: float, round_no: int = 0) -> None:
        if self.cfg.inqueue_limit:
            qsize = sum(1 for t in self.tasks.values() if self._queued(t))
            if qsize >= self.cfg.inqueue_limit:
                return
        taskid = md5(c.url)
        old = self.tasks.get(taskid)
        if old is None:
            routed_exe = c.exetime if c.exetime > now else 0.0
            self.tasks[taskid] = SimTask(
                taskid=taskid, url=c.url, host=host_of(c.url), priority=c.priority,
                retries=c.retries, exetime=routed_exe, age=c.age, itag=c.itag,
                force_update=c.force_update, auto_recrawl=c.auto_recrawl,
                status=ACTIVE, seq=c.seq, round_no=round_no,
            )
            return
        # old exists
        if old.status == LEASED and c.force_update:
            self.postponed.append(c)
            return
        if self._queued(old) and not c.force_update:
            return
        restart = (
            (c.itag is not None and c.itag != old.itag)
            or (c.age >= 0 and c.age + (old.lastcrawltime or 0) < now)
            or c.force_update
        )
        if not restart:
            return
        if c.cancel:
            old.status = BAD
            old.round_no = round_no
            return
        routed_exe = c.exetime if c.exetime > now else 0.0
        if self._queued(old):  # merge-on-put: max prio, min exetime, old seq
            old.priority = max(old.priority, c.priority)
            old.exetime = min(routed_exe, old.exetime)
            old.age, old.itag = c.age, c.itag
            old.auto_recrawl, old.retries = c.auto_recrawl, c.retries
            old.status = ACTIVE
        else:  # fresh queue entry
            old.priority, old.exetime, old.seq = c.priority, routed_exe, c.seq
            old.age, old.itag = c.age, c.itag
            old.auto_recrawl, old.retries = c.auto_recrawl, c.retries
            old.retried = 0
            old.status = ACTIVE
        old.lease_until = None
        old.round_no = round_no

    # -- one round ------------------------------------------------------------
    def run_round(self, round_no: int, extra_candidates: list[Candidate] | None = None) -> list[str]:
        now = self.cfg.clock(round_no)
        # F3/F4 release
        for t in self.tasks.values():
            if t.status == LEASED and (t.lease_until or 0) < now:
                t.status, t.exetime, t.lease_until = ACTIVE, 0.0, None
            if t.status == ACTIVE and 0 < t.exetime <= now:
                t.exetime = 0.0

        # quotas: same fair-share function the Spark engine uses
        from pyspider_spark.operators.politeness import fair_share_limits

        qsize = sum(1 for t in self.tasks.values() if self._queued(t))
        share = fair_share_limits({"bench": qsize}, self.cfg.loop_limit)["bench"]
        tokens = self.bucket.refill(now)
        quota = max(0, min(share, int(tokens)))

        # F1/F8 selection: global (priority desc, seq asc) with per-host cap
        ready = sorted(
            (t for t in self.tasks.values() if t.status == ACTIVE and t.exetime <= now),
            key=lambda t: (-t.priority, t.seq),
        )
        wave: list[SimTask] = []
        host_counts: dict[str | None, int] = {}
        for t in ready:
            if len(wave) >= quota:
                break
            hc = host_counts.get(t.host, 0)
            if hc >= self.cfg.max_per_host:
                continue
            host_counts[t.host] = hc + 1
            wave.append(t)
        self.bucket.tokens -= len(wave)

        picked = [t.taskid for t in wave]
        self.waves.append(picked)

        # lease
        for t in wave:
            t.status, t.lease_until = LEASED, now + PROCESSING_TIMEOUT

        # fetch + process + outcomes + follows
        candidates: list[Candidate] = []
        for rank, t in enumerate(wave, start=1):
            spans = self.corpus.get(t.url)
            denied = self.cfg.robots_enabled and path_of(t.url).startswith(
                self.robots_deny_prefix
            )
            ok = spans is not None and not denied
            # mirror simulated_fetch's code + the engine's round stamp
            t.status_code = 403 if denied else (200 if spans is not None else 404)
            t.round_no = round_no
            if ok:
                self._on_done(t, now)
                for kind, text, media_ref, offset in spans:
                    if kind == "link":
                        candidates.append(
                            Candidate(
                                url=canonicalize_url(text, t.url),
                                seq=make_seq(round_no, rank, offset),
                            )
                        )
            else:
                self._on_failed(t, now, round_no, rank)

        # postponed replays + extras, then F12 batch dedup, then routing
        replay, self.postponed = self.postponed, []
        candidates.extend(replay)
        if extra_candidates:
            candidates.extend(extra_candidates)
        batch: dict[str, Candidate] = {}
        order: dict[str, int] = {}
        for c in sorted(candidates, key=lambda c: c.seq):
            tid = md5(c.url)
            if tid in batch:
                if not c.force_update:
                    continue
                keep_seq = order[tid]
                batch[tid] = c
                order[tid] = keep_seq
            else:
                batch[tid] = c
                order[tid] = c.seq
        for tid, c in batch.items():
            c.seq = order[tid]
            self._on_request(c, now, round_no)
        return picked

    def _on_done(self, t: SimTask, now: float) -> None:
        t.lastcrawltime = now
        t.lease_until = None
        if t.auto_recrawl and t.age >= 0:
            t.status = ACTIVE
            t.exetime = now + t.age
        else:
            t.status = SUCCESS

    def _on_failed(self, t: SimTask, now: float, round_no: int, rank: int) -> None:
        rd = self.cfg.retry_delay
        delay = float(rd.get(t.retried, rd.get("", 86400)))
        if t.auto_recrawl and t.age >= 0:
            delay = min(delay, float(t.age))
        else:
            if t.retried >= t.retries:
                delay = -1.0
            elif t.age >= 0 and delay > t.age:
                delay = float(t.age)
        t.lease_until = None
        t.lastcrawltime = now
        if delay < 0:
            t.status = FAILED
        else:
            t.status = ACTIVE
            t.retried += 1
            t.exetime = now + delay
            t.seq = make_seq(round_no, rank, RETRY_CHANNEL)

    # -- driver ---------------------------------------------------------------
    def crawl(self, max_rounds: int = 100) -> None:
        for r in range(max_rounds):
            picked = self.run_round(r)
            if not picked:
                break

    def url_seen(self) -> set[str]:
        return {t.url for t in self.tasks.values()}

    def statuses(self) -> dict[str, int]:
        return {t.taskid: t.status for t in self.tasks.values()}
