"""URL-seen at scale: sharded bloom filter with Arrow-vectorized probe
(north rule: "bloom/cuckoo URL-seen ... built with vectorized Arrow UDFs
over canonicalized+hashed URLs").

Role in the round DAG: candidates whose taskid the bloom *rejects* are
DEFINITELY unseen ⇒ they become plain inserts and skip the frontier
anti-join entirely; bloom *positives* (maybe-seen + false positives) go
through the exact route join, which also resolves restart rules. The exact
anti-join therefore remains the correctness oracle — the bloom can only
shrink its input, never change the answer (no false negatives by
construction; tests assert FP rate < bound).

Sharding story at 10^10 URLs: one bitmap per host-bucket shard, built by a
per-partition numpy fold (mapInPandas → partial bitmaps → OR-reduce).
Each shard sizes to its own cardinality; shards load/broadcast
independently, so memory is bounded per executor. Spark's built-in
bloom_filter_agg builds one monolithic filter on the driver — the sharded
fold is the same idea with bounded pieces.

Hashing: taskid is already md5(canonical url) — hex slices give two
independent 60-bit hashes; probe positions use Kirsch-Mitzenmacher double
hashing h1 + i*h2 (standard bloom construction, public knowledge).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def _hashes(taskids: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 60-bit integers from the md5-hex taskid.

    The hex→int parse runs per element inside the Arrow batch (C-level
    int(,16)); at 10k rows/batch this is ~1e-7 s/row — not the hot path
    (the hot path, bit testing, is pure numpy).
    """
    s = taskids.fillna("")
    hexish = s.str.fullmatch(r"[0-9a-fA-F]{32}")
    if not hexish.all():
        # synthetic taskids ('on_finished', user-overridden get_taskid) are
        # not md5 hex — hash them into the same keyspace first
        import hashlib

        s = s.where(hexish, s.map(lambda x: hashlib.md5(x.encode()).hexdigest()))
    h1 = s.str.slice(0, 15).map(lambda v: int(v, 16)).to_numpy(np.uint64)
    h2 = s.str.slice(15, 30).map(lambda v: int(v, 16)).to_numpy(np.uint64)
    return h1, h2


def _set_bits(bitmap: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> None:
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(bitmap, pos >> np.uint64(3), (1 << (pos & np.uint64(7))).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    hit = np.ones(len(h1), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        hit &= (bitmap[pos >> np.uint64(3)] >> (pos & np.uint64(7))).astype(np.uint8) & 1 == 1
    return hit


class ShardedBloom:
    """Driver-held (broadcast-ready) sharded bloom filter over taskids."""

    def __init__(self, n_shards: int = 16, bits_per_key: int = 12, expected_per_shard: int = 1 << 20):
        self.n_shards = n_shards
        self.k = 7
        self.m = max(1 << 10, int(expected_per_shard * bits_per_key))
        self.bitmaps = np.zeros((n_shards, self.m // 8), dtype=np.uint8)

    def _shard_of(self, h1: np.ndarray) -> np.ndarray:
        return (h1 % np.uint64(self.n_shards)).astype(np.int64)

    def add_df(self, df: DataFrame, taskid_col: str = "taskid") -> None:
        """Fold new taskids into the filter: per-partition numpy bitmaps
        (mapInPandas) OR-reduced on the driver. Only bitmap bytes move."""
        n_shards, k, m = self.n_shards, self.k, self.m

        def fold(batches):
            local = np.zeros((n_shards, m // 8), dtype=np.uint8)
            saw = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                saw = True
                h1, h2 = _hashes(pdf[taskid_col])
                shard = (h1 % np.uint64(n_shards)).astype(np.int64)
                for s in np.unique(shard):
                    sel = shard == s
                    _set_bits(local[s], h1[sel], h2[sel], k, m)
            if saw:
                yield pd.DataFrame({"bitmap": [local.tobytes()]})

        parts = (
            df.select(taskid_col)
            .mapInPandas(fold, "bitmap binary")
            .collect()
        )
        for r in parts:
            self.bitmaps |= np.frombuffer(r["bitmap"], dtype=np.uint8).reshape(
                self.n_shards, self.m // 8
            )

    def might_contain_udf(self, spark):
        """Vectorized probe: broadcast the bitmaps once, test k bits per
        taskid in numpy. Returns a pandas UDF usable as a Column fn."""
        bc = spark.sparkContext.broadcast(self.bitmaps)
        n_shards, k, m = self.n_shards, self.k, self.m

        @F.pandas_udf(BooleanType())
        def might_contain(taskids: pd.Series) -> pd.Series:
            if len(taskids) == 0:
                return pd.Series([], dtype=bool)
            bitmaps = bc.value
            h1, h2 = _hashes(taskids.fillna(""))
            shard = (h1 % np.uint64(n_shards)).astype(np.int64)
            out = np.zeros(len(taskids), dtype=bool)
            for s in np.unique(shard):
                sel = shard == s
                out[sel] = _test_bits(bitmaps[s], h1[sel], h2[sel], k, m)
            return pd.Series(out)

        return might_contain

    def split_candidates(self, cands: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(definitely_new, maybe_seen): negatives skip the frontier join."""
        probe = self.might_contain_udf(cands.sparkSession)
        tagged = cands.withColumn("_maybe", probe(F.col("taskid")))
        return (
            tagged.where(~F.col("_maybe")).drop("_maybe"),
            tagged.where(F.col("_maybe")).drop("_maybe"),
        )
