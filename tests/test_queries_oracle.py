"""Local replica of the driver's correctness gate: every SQL-expressible
queries() entry must match its oracle_sql() in DuckDB at sf0.01 — row
count, column names, and order-insensitive values. Rows-only entries are
smoke-checked (runnable, stable schema, >= 0 rows)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    """Type-strict like the driver's value hash: an int64 3549 and a
    float64 3549.0 must NOT compare equal (DuckDB HUGEINT sums come back
    as float64 — the query/oracle must cast, not the harness)."""
    import numpy as np

    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, (bool, np.bool_)):
                vals.append(f"b:{v}")
            elif isinstance(v, (float, np.floating)):
                vals.append(f"f:{v:.6g}")
            elif isinstance(v, (int, np.integer)):
                vals.append(f"i:{v}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    got = QUERIES[name](spark, SF).toPandas()
    want = duck.execute(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = normalize(got), normalize(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b][:5]
    assert g == w, f"{name}: value mismatch, first diffs: {mismatches}"


def test_every_query_is_oracled():
    """VERDICT r03 item 9: zero rows-only queries remain — keep it that way
    (a new queries() entry without an oracle_sql() fails here, loudly,
    instead of silently weakening the driver gate)."""
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert missing == [], f"queries without oracles: {missing}"
