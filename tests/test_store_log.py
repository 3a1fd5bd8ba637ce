"""Exactly-once append logs (ADVICE r01): rows appended by a round that
crashed before its manifest commit must be invisible to read_log, so a
resumed run can re-append them without double counting."""

from pyspider_spark.sources.store import SnapshotStore


def test_uncommitted_append_invisible(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"), spark)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")

    store.append(df, "results", round_no=0)
    store.commit_round(0, budget_state={})
    # crash window: round 1 written but never committed
    store.append(df, "results", round_no=1)

    got = store.read_log("results")
    assert got.count() == 2  # only round 0's rows visible

    # resume re-runs round 1: OVERWRITES the orphan, then commits —
    # exactly-once, no double count
    store.append(df, "results", round_no=1)
    store.commit_round(1, budget_state={})
    assert store.read_log("results").count() == 4


def test_read_log_before_any_commit_is_empty(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"), spark)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    store.append(df, "metrics", round_no=0)  # no commit yet
    got = store.read_log("metrics")
    assert got.count() == 0
    assert got.columns == ["id", "v"]


def test_legacy_plain_appends_survive_round_mode(spark, tmp_path):
    """ADVICE r02: a store that mixed plain append() with per-round
    appends must not silently lose the earlier top-level rows once any
    round_* directory exists."""
    store = SnapshotStore(str(tmp_path / "store"), spark)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")

    store.append(df, "results")  # legacy: top-level part files
    store.append(df, "results", round_no=0)
    store.commit_round(0, budget_state={})

    assert store.read_log("results").count() == 4  # legacy 2 + round-0 2

def test_uncommitted_plain_append_stays_invisible(spark, tmp_path):
    """ADVICE r03: a plain append() that crashed before any commit must NOT
    leak into read_log of a round-mode store — only legacy files recorded
    by a commit_round are committed data."""
    store = SnapshotStore(str(tmp_path / "store"), spark)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")

    store.append(df, "results", round_no=0)
    store.commit_round(0, budget_state={})
    # crash window: a plain append AFTER the last commit — uncommitted
    store.append(df, "results")

    assert store.read_log("results").count() == 2  # round 0 only

    # the next commit picks the plain rows up (they're part of its snapshot)
    store.append(df, "results", round_no=1)
    store.commit_round(1, budget_state={})
    assert store.read_log("results").count() == 6
