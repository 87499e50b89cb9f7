"""Harness lock hygiene (r15 — VERDICT r14 finding #1 / ask #1).

The r14 bench record was lost to an orphaned writer-lock entry: a
SIGKILLed prior harness run left ``/tmp/cdp_*__lock.d/<owner>.json``
looking live for its full 900 s lease, and the next bench crashed on it
in warmup with no per-query isolation. Three defenses now exist, each
pinned here:

1. ``__spark_entry__._fresh_tmp`` resets a tmp table's data dir AND its
   ``__lock.d`` / ``__history`` siblings — a planted unexpired orphan
   lock no longer blocks the row.
2. ``scripts/clean_tmp.sweep`` deletes ``cdp_*`` debris whose newest
   mtime is older than the lock lease (nothing that old can belong to a
   live writer — live writers heartbeat every lease/3 s).
3. ``bench.merge_detail`` carries an errored row's committed floor
   forward (isolated failure ≠ dropped from the headline set), and
   ``_retry_on_lock_conflict`` only treats read-races on the op's OWN
   target as transient (ADVICE r14: a mistyped source path must fail
   loudly, not burn the wait budget).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from config_driven_pyspark_spark.operators import table as T


# ---------------------------------------------------------------------------
# 1. _fresh_tmp clears an orphaned unexpired lock entry
# ---------------------------------------------------------------------------

def _plant_orphan_lock(base: str) -> str:
    """Create an UNEXPIRED foreign lock entry for table ``base`` —
    exactly the state a SIGKILLed harness leaves behind."""
    lock_dir = base + "__lock.d"
    os.makedirs(lock_dir, exist_ok=True)
    entry = os.path.join(lock_dir, "deadbeefcafe.json")
    with open(entry, "w") as fh:
        json.dump({"owner": "deadbeefcafe", "scope": None}, fh)
    return entry


def test_orphan_lock_blocks_then_fresh_tmp_unblocks(spark, tmp_path):
    import __spark_entry__ as entry_mod

    base = str(tmp_path / "cdp_hyg_target")
    seed = spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id * 2 AS DOUBLE) AS v"
    )
    seed.write.mode("overwrite").parquet(base)
    _plant_orphan_lock(base)

    batch = spark.range(0, 10).selectExpr(
        "id AS k", "CAST(id * 7 AS DOUBLE) AS v"
    )
    # without the reset, the orphan looks live for its whole lease and
    # the op fails loudly (no wait conf set in the test session)
    with pytest.raises(Exception, match="lock|Lock|writer"):
        T.merge_upsert(batch, base, ["k"])

    # the bench-row setup contract: reset data dir + BOTH siblings
    entry_mod._fresh_tmp(base)
    assert not os.path.exists(base + "__lock.d")
    assert not os.path.exists(base + "__history")
    seed.write.mode("overwrite").parquet(base)
    stats = T.merge_upsert(batch, base, ["k"])
    assert stats["n_after"] == 100 and stats["n_updated"] == 10
    got = spark.read.parquet(base)
    assert got.count() == 100
    assert got.filter("k = 3 AND v = 21.0").count() == 1


# ---------------------------------------------------------------------------
# 2. clean_tmp.sweep
# ---------------------------------------------------------------------------

def test_clean_tmp_sweeps_stale_keeps_fresh(tmp_path):
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts"),
    )
    from clean_tmp import sweep

    stale = tmp_path / "cdp_stale_table"
    stale_lock = tmp_path / "cdp_stale_table__lock.d"
    fresh = tmp_path / "cdp_fresh_table"
    other = tmp_path / "not_cdp_dir"
    for d in (stale, stale_lock, fresh, other):
        d.mkdir()
        (d / "x.json").write_text("{}")
    old = time.time() - 3600
    for d in (stale, stale_lock, other):
        for p in (d, d / "x.json"):
            os.utime(p, (old, old))

    removed = sweep(age_seconds=900, tmp_dir=str(tmp_path), verbose=False)
    assert str(stale) in removed and str(stale_lock) in removed
    assert not stale.exists() and not stale_lock.exists()
    # fresh entries and non-cdp entries survive
    assert fresh.exists() and other.exists()
    assert str(fresh) not in removed and str(other) not in removed


def test_clean_tmp_newest_mtime_guards_live_tables(tmp_path):
    """A table whose dir inode is old but whose lock entry heartbeats
    (fresh mtime DEEP inside) must NOT be swept."""
    from clean_tmp import sweep

    live = tmp_path / "cdp_live_table__lock.d"
    live.mkdir()
    beat = live / "owner.json"
    beat.write_text("{}")
    old = time.time() - 7200
    os.utime(live, (old, old))  # stale dir inode, fresh entry inside
    removed = sweep(age_seconds=900, tmp_dir=str(tmp_path), verbose=False)
    assert removed == []
    assert beat.exists()


# ---------------------------------------------------------------------------
# 3a. merge_detail: isolated per-query errors keep the committed floor
# ---------------------------------------------------------------------------

def test_merge_detail_errored_row_keeps_floor():
    old = {
        "runs": {"qa": [2.0, 1.5], "qb": [0.5]},
        "min": {"qa": 1.5, "qb": 0.5},
        "fingerprint": {"qa": "fp-a", "qb": "fp-b"},
        "repeat_base": 2, "sf": 0.1, "total": 2.0,
    }
    new = {
        "runs": {"qb": [0.4]},
        "min": {"qb": 0.4},
        "errors": {"qa": "timed: RuntimeError('orphan lock')"},
        "fingerprint": {"qa": "fp-a", "qb": "fp-b"},
        "repeat_base": 2, "sf": 0.1, "total": 0.4,
    }
    merged = bench.merge_detail(old, new)
    # the errored row's committed history and floor survive untouched
    assert merged["min"]["qa"] == 1.5
    assert merged["runs"]["qa"] == [2.0, 1.5]
    assert merged["min"]["qb"] == 0.4
    assert merged["total"] == round(1.5 + 0.4, 3)


def test_merge_detail_errored_row_with_changed_code_resets():
    """Error + fingerprint change: the old floor belongs to code that no
    longer exists — it must NOT be carried forward."""
    old = {
        "runs": {"qa": [1.5]},
        "min": {"qa": 1.5},
        "fingerprint": {"qa": "fp-old"},
        "repeat_base": 2, "sf": 0.1, "total": 1.5,
    }
    new = {
        "runs": {},
        "min": {},
        "errors": {"qa": "timed: AnalysisException(...)"},
        "fingerprint": {"qa": "fp-new"},
        "repeat_base": 2, "sf": 0.1, "total": 0.0,
    }
    merged = bench.merge_detail(old, new)
    assert "qa" not in merged["min"]
    assert "qa" not in merged["runs"]


# ---------------------------------------------------------------------------
# 3b. _retry_on_lock_conflict transient scoping (ADVICE r14)
# ---------------------------------------------------------------------------

def test_retry_ignores_foreign_path_errors(spark, tmp_path):
    """A FileNotFound-class error that does NOT reference the op's own
    target path raises immediately even with the wait budget set."""
    base = str(tmp_path / "cdp_retry_target")
    os.makedirs(base, exist_ok=True)
    calls = {"n": 0}

    @T._retry_on_lock_conflict
    def op(spark, target_path):
        calls["n"] += 1
        raise RuntimeError(
            "FileNotFoundException: /some/other/mistyped/source.parquet"
        )

    spark.conf.set("spark.cdp.lock.wait_seconds", "5")
    try:
        t0 = time.monotonic()
        with pytest.raises(RuntimeError):
            op(spark, base)
        assert calls["n"] == 1  # no retry: the error is not ours
        assert time.monotonic() - t0 < 2.0
    finally:
        spark.conf.unset("spark.cdp.lock.wait_seconds")


def test_retry_retries_own_target_read_race(spark, tmp_path):
    """A read-race error ON the target (path referenced, base still
    exists) retries until it clears."""
    base = str(tmp_path / "cdp_retry_own")
    os.makedirs(base, exist_ok=True)
    calls = {"n": 0}

    @T._retry_on_lock_conflict
    def op(spark, target_path):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                f"FAILED_READ_FILE: file:{target_path}/part-0000.parquet "
                "vanished during listing"
            )
        return "ok"

    spark.conf.set("spark.cdp.lock.wait_seconds", "30")
    try:
        assert op(spark, base) == "ok"
        assert calls["n"] == 3
    finally:
        spark.conf.unset("spark.cdp.lock.wait_seconds")


def test_retry_gone_target_base_fails_loudly(spark, tmp_path):
    """If the target base itself is GONE, that is not a competitor's
    swap racing the read — no retry."""
    base = str(tmp_path / "cdp_retry_gone")  # never created
    calls = {"n": 0}

    @T._retry_on_lock_conflict
    def op(spark, target_path):
        calls["n"] += 1
        raise RuntimeError(f"PATH_NOT_FOUND: {target_path}")

    spark.conf.set("spark.cdp.lock.wait_seconds", "5")
    try:
        with pytest.raises(RuntimeError):
            op(spark, base)
        assert calls["n"] == 1
    finally:
        spark.conf.unset("spark.cdp.lock.wait_seconds")
