"""Politeness: per-project token bucket + fair-share select quotas (F6/F8).

Reference semantics (re-expressed, not copied):
  - token bucket: /root/reference/pyspider/scheduler/token_bucket.py:15-55 —
    ``tokens += rate * (now - last)`` applied only when the refill exceeds 1
    token, capped at ``burst``; a task can be selected while tokens >= 1 and
    each selection consumes 1 (task_queue.py:227-242). Quantized to rounds:
    a project's wave quota is ``floor(tokens_after_refill)``.
  - weighted fair select: scheduler.py:463-566 — per-project limit =
    ``LOOP_LIMIT * qsize / total_qsize`` clamped to [LOOP_LIMIT/10,
    LOOP_LIMIT/3]; projects with weight<1 (or when total<1) get the min.

The bucket state is *driver-side* by design: it is O(#projects) rows — the
only data the 10^10-row frontier design ever collects to the driver is this
table plus per-project ready counts (a groupBy().count() of the frontier).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspider_spark.types import LOOP_LIMIT


@dataclass
class Bucket:
    rate: float = 1.0
    burst: float = 10.0
    tokens: float = field(default=-1.0)
    last_update: float = 0.0

    def __post_init__(self) -> None:
        if self.tokens < 0:
            self.tokens = self.burst

    def refill(self, now: float) -> float:
        if self.tokens >= self.burst:
            self.last_update = now
            return self.tokens
        add = self.rate * (now - self.last_update)
        if add > 1:
            self.tokens = min(self.tokens + add, self.burst)
            self.last_update = now
        return self.tokens

    def consume(self, n: float) -> None:
        self.tokens -= n


@dataclass
class BudgetState:
    """Per-project buckets carried across rounds; serializable for
    checkpoint/resume (plans/crawl.py persists it next to the frontier
    snapshot)."""

    buckets: dict[str, Bucket] = field(default_factory=dict)

    def ensure(self, project: str, rate: float, burst: float, now: float) -> Bucket:
        b = self.buckets.get(project)
        if b is None:
            b = Bucket(rate=rate, burst=burst, last_update=now)
            self.buckets[project] = b
        else:
            b.rate, b.burst = rate, burst
        return b

    def to_dict(self) -> dict:
        return {
            p: {"rate": b.rate, "burst": b.burst, "tokens": b.tokens, "last": b.last_update}
            for p, b in self.buckets.items()
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BudgetState":
        st = cls()
        for p, v in d.items():
            st.buckets[p] = Bucket(
                rate=v["rate"], burst=v["burst"], tokens=v["tokens"], last_update=v["last"]
            )
        return st


def fair_share_limits(
    ready_counts: dict[str, int], loop_limit: int = LOOP_LIMIT
) -> dict[str, int]:
    """scheduler.py:500-522 — qsize-weighted share with min/max clamps."""
    min_limit = int(loop_limit / 10.0)
    max_limit = int(loop_limit / 3.0)
    total = sum(ready_counts.values())
    limits: dict[str, int] = {}
    for project, weight in ready_counts.items():
        if total < 1 or weight < 1:
            limits[project] = min_limit
        else:
            share = int((1.0 * weight / total) * loop_limit)
            limits[project] = min(max(share, min_limit), max_limit)
    return limits


def round_quotas(
    state: BudgetState,
    project_configs: dict[str, dict],
    queue_sizes: dict[str, int],
    now: float,
    loop_limit: int = LOOP_LIMIT,
) -> dict[str, int]:
    """Wave quota per project for this round = min(fair share, floor(tokens)).

    ``queue_sizes`` is the reference's task_queue.size() (priority + time +
    processing ⇒ status in {ACTIVE, LEASED}) per project, computed as one
    small groupBy on the frontier.
    """
    limits = fair_share_limits(queue_sizes, loop_limit)
    quotas: dict[str, int] = {}
    for project, cfg in project_configs.items():
        if cfg.get("status", "RUNNING") not in ("RUNNING", "DEBUG"):
            quotas[project] = 0
            continue
        bucket = state.ensure(project, cfg.get("rate", 1.0), cfg.get("burst", 10.0), now)
        tokens = bucket.refill(now)
        quotas[project] = max(0, min(limits.get(project, int(loop_limit / 10.0)), int(tokens)))
    return quotas


def consume(state: BudgetState, selected_counts: dict[str, int]) -> None:
    for project, n in selected_counts.items():
        if project in state.buckets:
            state.buckets[project].consume(n)
