"""applyInPandasWithState politeness gate (F6 streaming twin): unit-test
the state function directly, then drive a real streaming query with a
deterministic file source + availableNow trigger."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyspider_spark.streaming.stateful import (
    STATE_SCHEMA,
    make_politeness_gate,
    politeness_gate_stream,
)


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _batch(project, seqs, ts):
    return pd.DataFrame(
        {"project": project, "taskid": [f"t{s}" for s in seqs],
         "seq": seqs, "event_ts": float(ts)}
    )


def test_gate_admits_burst_then_throttles():
    gate = make_politeness_gate({"p": (2.0, 3.0)})
    st = FakeState()
    # batch 1 at t=0: fresh bucket = burst 3 tokens -> admit 3 of 5
    out = list(gate(("p",), [_batch("p", [1, 2, 3, 4, 5], 0.0)], st))
    assert [r for pdf in out for r in pdf["seq"]] == [1, 2, 3]
    assert st.get[0] == 0.0  # tokens spent
    # batch 2 at t=2: refill 2*2=4 capped at burst 3 -> admit 3
    out = list(gate(("p",), [_batch("p", [6, 7, 8, 9], 2.0)], st))
    assert [r for pdf in out for r in pdf["seq"]] == [6, 7, 8]
    # batch 3 at t=2.4: refill 0.8 <= 1 token -> no refill, admit 0
    out = list(gate(("p",), [_batch("p", [10], 2.4)], st))
    assert out == [] or sum(len(p) for p in out) == 0


def test_gate_admits_in_seq_order():
    gate = make_politeness_gate({"p": (1.0, 2.0)})
    st = FakeState()
    out = list(gate(("p",), [_batch("p", [30, 10, 20], 0.0)], st))
    assert [r for pdf in out for r in pdf["seq"]] == [10, 20]  # lowest seq first


def test_gate_streaming_query_end_to_end(spark, tmp_path):
    src = str(tmp_path / "tasks")
    rows = [("p", f"t{i}", i, 0.0) for i in range(10)] + [
        ("q", f"u{i}", i, 0.0) for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "project string, taskid string, seq long, event_ts double"
    )
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    gated = politeness_gate_stream(stream, {"p": (1.0, 5.0), "q": (1.0, 10.0)})
    q = (
        gated.writeStream.format("memory").queryName("gate_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT project, seq FROM gate_test").collect()
    by_p = {}
    for r in got:
        by_p.setdefault(r["project"], []).append(r["seq"])
    assert sorted(by_p["p"]) == [0, 1, 2, 3, 4]  # burst 5 admitted
    assert sorted(by_p["q"]) == [0, 1, 2, 3]  # under budget: all pass
