"""Custom stateful streaming operators (SURVEY §2.7 streaming analogues):
the token-bucket politeness gate (F6) as an ``applyInPandasWithState``
operator over a task stream.

Batch mode quantizes the bucket into per-round quotas (driver-side,
operators/politeness.py). In continuous mode the same semantics run as a
keyed stateful operator: state per project = (tokens, last_ts); each
micro-batch refills by ``rate * dt`` (capped at ``burst``, and only when
the refill exceeds one token — token_bucket.py:37-44 semantics,
re-expressed) and admits tasks in seq order while tokens last. Admitted
rows are emitted; over-budget rows are dropped (the frontier re-offers
them next round, so dropping is safe — same as batch mode's quota cut).

State is one row of two doubles per project — GroupState sized O(#projects),
the streaming twin of the driver-side BudgetState.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "tokens double, last_ts double"


def make_politeness_gate(rates: dict[str, tuple[float, float]]):
    """Returns the applyInPandasWithState function for the gate.

    ``rates``: project -> (rate, burst). The returned function is also
    directly unit-testable with a fake GroupState.
    """

    def gate(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        project = key[0]
        rate, burst = rates.get(project, (1.0, 10.0))
        if state.exists:
            tokens, last_ts = state.get
        else:
            tokens, last_ts = float(burst), 0.0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            now = float(pdf["event_ts"].max())
            if tokens < burst:
                add = rate * (now - last_ts)
                if add > 1:  # reference: refill only in whole-ish steps
                    tokens = min(tokens + add, burst)
                    last_ts = now
            else:
                last_ts = now
            pdf = pdf.sort_values("seq")
            admit = min(len(pdf), int(tokens))
            tokens -= admit
            if admit > 0:
                yield pdf.iloc[:admit]
        state.update((float(tokens), float(last_ts)))

    return gate


def politeness_gate_stream(
    tasks: DataFrame, rates: dict[str, tuple[float, float]]
) -> DataFrame:
    """Apply the stateful gate to a streaming task DataFrame with columns
    (project, taskid, seq, event_ts)."""
    return tasks.groupBy("project").applyInPandasWithState(
        make_politeness_gate(rates),
        outputStructType=tasks.schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
