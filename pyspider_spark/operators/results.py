"""Result accumulation & views (R1-R5 in SURVEY.md §2.4).

Reference: result_worker.py:27-42 (upsert by (project, taskid)),
resultdb.py:26-39 (select w/ pagination), libs/result_dump.py (common-field
inference + json/csv dump), scheduler.py:738-780 (active-task merge view).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def results_from_wave(processed_wave: DataFrame, now: float) -> DataFrame:
    """R1/P13: non-empty results become result rows (append; the dedup view
    below restores upsert semantics without rewriting history — at scale an
    append-only Iceberg table + a latest-wins view beats per-row MERGE)."""
    return processed_wave.where(F.col("result").isNotNull()).select(
        F.col("taskid"),
        F.col("project"),
        F.col("url"),
        F.col("result"),
        F.lit(now).alias("updatetime"),
    )


def latest_results(results: DataFrame) -> DataFrame:
    """R1 upsert semantics over the append-only log: latest write per
    (project, taskid) wins."""
    w = Window.partitionBy("project", "taskid").orderBy(F.desc("updatetime"))
    return results.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def select_results(
    results: DataFrame, project: str, fields: list[str] | None = None,
    offset: int = 0, limit: int = 20,
) -> DataFrame:
    """R2: select w/ pagination (the reference pages by updatetime order —
    resultdb.py:29-35). Scale shape: a distributed top-(offset+limit)
    first (orderBy+limit compiles to TakeOrderedAndProject — no global
    sort), THEN the rank-slice window over only those <= offset+limit
    rows — the global window never sees the full result set."""
    w = Window.orderBy(F.desc("updatetime"), F.asc("taskid"))
    top = (
        latest_results(results.where(F.col("project") == project))
        .orderBy(F.desc("updatetime"), F.asc("taskid"))
        .limit(offset + limit)
    )
    df = (
        top.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > offset)
        .drop("_rn")
    )
    return df.select(*fields) if fields else df


def common_fields(results: DataFrame, sample: int = 30) -> list[str]:
    """R3: intersect key-sets of the first `sample` JSON results
    (libs/result_dump.py:16-43)."""
    rows = results.select("result").where(F.col("result").startswith("{")).head(sample)
    keys: set[str] | None = None
    for r in rows:
        try:
            d = json.loads(r["result"])
        except ValueError:
            continue
        if isinstance(d, dict):
            keys = set(d) if keys is None else keys & set(d)
    return sorted(keys or [])


def _others_udf(fields: list[str]):
    """Spill column for csv dumps: the result keys NOT among the common
    fields, re-serialized as one JSON object (result_dump.py:112-127
    'others'). Arrow-batched pandas UDF — this is the export path, not the
    crawl hot path; exact key-set arithmetic over arbitrary JSON beats a
    lossy from_json(map<string,string>) coercion."""
    from pyspark.sql.types import StringType

    common = set(fields)

    @F.pandas_udf(StringType())
    def others(result: pd.Series) -> pd.Series:
        out = []
        for r in result:
            try:
                d = json.loads(r) if r else None
            except ValueError:
                d = None
            if not isinstance(d, dict):
                out.append(json.dumps(d, ensure_ascii=False))
            else:
                out.append(
                    json.dumps(
                        {k: v for k, v in d.items() if k not in common},
                        ensure_ascii=False,
                    )
                )
        return pd.Series(out)

    return others


def dump_results(results: DataFrame, path: str, fmt: str = "json") -> None:
    """R4: dump in json / txt / csv (result_dump.py:46-133): txt is
    url<TAB>result-json lines; csv gets one column per common field plus
    the '...' spill column holding the non-common keys as JSON."""
    latest = latest_results(results)
    if fmt == "json":
        latest.select("taskid", "project", "url", "result", "updatetime").write.mode(
            "overwrite"
        ).json(path)
        return
    if fmt == "txt":
        latest.select(
            F.concat_ws("\t", F.col("url"), F.col("result")).alias("value")
        ).write.mode("overwrite").text(path)
        return
    fields = common_fields(latest)
    cols = [F.get_json_object("result", f"$.{f}").alias(f) for f in fields]
    latest.select(
        F.col("url"), *cols, _others_udf(fields)(F.col("result")).alias("...")
    ).write.mode("overwrite").option("header", True).csv(path)


def active_tasks_view(frontier: DataFrame, limit: int = 100) -> DataFrame:
    """R5: most recently updated tasks across projects (global top-k by
    updatetime — scheduler.py:738-780). orderBy+limit compiles to
    TakeOrderedAndProject: no global sort materialization."""
    return frontier.orderBy(F.desc("updatetime"), F.asc("taskid")).limit(limit).select(
        "project", "taskid", "url", "status", "updatetime", "lastcrawltime"
    )
