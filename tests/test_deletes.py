"""Deletion vectors (operators/deletes.py): merge-on-read DELETE,
DV-aware reads (live / scan_table / time travel / CDF), materialization,
and the rewriting-op absorb contract.

The reference (timkins666/config-driven-pyspark) has no mutable-table
story; these semantics pin the Delta/Iceberg-v2 deletion-vector model
re-expressed over plain parquet + the engine's swap machinery.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from config_driven_pyspark_spark.operators.deletes import (
    _dv_root,
    _list_dv,
    delete_where_dv,
    has_live_deletes,
    materialize_deletes,
    read_table,
)
from config_driven_pyspark_spark.operators.history import (
    enable_table_history,
    read_table_version,
    table_changes,
    table_current_version,
    table_history,
    vacuum_table_history,
)
from config_driven_pyspark_spark.operators.table import (
    delete_where,
    merge_upsert,
    scan_table,
)


def _mk(spark, path, n=40, parts=4, partition_by=True):
    df = (
        spark.range(0, n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % parts).cast("int").alias("p"),
            (F.col("id") * 10).alias("v"),
        )
    )
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy("p")
    w.parquet(path)
    return ["p"] if partition_by else None


def _ids(df):
    return sorted(r["k"] for r in df.select("k").collect())


def test_dv_delete_unpartitioned_live_read(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=20, partition_by=False)
    res = delete_where(spark, path, "k % 5 = 0", mode="merge_on_read")
    assert res == {
        "n_before": 20, "n_matched": 4, "n_after": 16, "rewrite": "dv",
    }
    # no data file was touched: the raw read still has every row …
    assert spark.read.parquet(path).count() == 20
    # … the logical read doesn't
    assert _ids(read_table(spark, path)) == [
        k for k in range(20) if k % 5 != 0
    ]
    assert has_live_deletes(spark, path)


def test_dv_delete_zero_match_writes_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=10, partition_by=False)
    res = delete_where(spark, path, "k > 999", mode="merge_on_read")
    assert res["rewrite"] == "none"
    assert not has_live_deletes(spark, path)


def test_dv_deletes_accumulate_and_count_logically(spark, tmp_path):
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=30)
    r1 = delete_where_dv(spark, path, "k < 10", pb)
    assert (r1["n_before"], r1["n_matched"]) == (30, 10)
    # second delete probes the LOGICAL state: k<12 matches only 10,11
    r2 = delete_where_dv(spark, path, "k < 12", pb)
    assert (r2["n_before"], r2["n_matched"], r2["n_after"]) == (20, 2, 18)
    assert _ids(read_table(spark, path)) == list(range(12, 30))
    assert len(_list_dv(spark, _dv_root(path))) == 2


def test_dv_bytes_scale_with_deleted_rows_not_partition(spark, tmp_path):
    """The headline property: a tiny delete writes tombstone bytes, not
    a partition rewrite."""
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=4000, parts=2)

    def du(root):
        total = 0
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                total += os.path.getsize(os.path.join(dirpath, f))
        return total

    part_bytes = du(f"{path}/p=0")
    delete_where_dv(spark, path, "k = 42", pb)
    dv_bytes = du(f"{path}/_deletes")
    assert dv_bytes < part_bytes  # tombstones ≪ one partition
    assert read_table(spark, path).count() == 3999
    # and the data files are byte-identical (mtimes/sizes untouched)
    assert spark.read.parquet(path).count() == 4000


def test_dv_materialize_partition_scoped(spark, tmp_path):
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=40, parts=4)
    delete_where_dv(spark, path, "k in (1, 5, 9)", pb)  # all p=1
    before_p0 = sorted(os.listdir(f"{path}/p=0"))
    res = materialize_deletes(spark, path, pb)
    assert res["rewrite"] == "partition"
    assert res["n_tombstones"] == 3
    # untouched partitions keep their exact files
    assert sorted(os.listdir(f"{path}/p=0")) == before_p0
    # vectors are gone (unversioned → deleted), raw read is now logical
    assert not has_live_deletes(spark, path)
    assert spark.read.parquet(path).count() == 37
    assert materialize_deletes(spark, path, pb)["rewrite"] == "none"


def test_dv_scan_table_honors_tombstones(spark, tmp_path):
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=40, parts=4)
    delete_where_dv(spark, path, "k = 17", pb)
    got = scan_table(spark, path, pb, key_between={"k": (10, 20)})
    assert _ids(got) == [k for k in range(10, 21) if k != 17]


def test_dv_versioned_time_travel_and_cdf(spark, tmp_path):
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    enable_table_history(spark, path, pb)
    res = delete_where_dv(spark, path, "k in (2, 4)", pb)  # version 1
    assert res["rewrite"] == "dv"
    assert table_current_version(spark, path) == 1
    # time travel: v0 still sees the rows, v1 doesn't
    assert _ids(read_table_version(spark, path, 0)) == list(range(20))
    assert _ids(read_table_version(spark, path, 1)) == [
        k for k in range(20) if k not in (2, 4)
    ]
    # CDF reports honest deletes, scoped to the tombstoned partition
    ch = table_changes(spark, path, 0, 1, keys=["k"]).collect()
    assert sorted((r["k"], r["_change_type"]) for r in ch) == [
        (2, "delete"), (4, "delete"),
    ]
    # DESCRIBE HISTORY shows the dv commit
    hist = {r["version"]: (r["op"], r["mode"])
            for r in table_history(spark, path).collect()}
    assert hist[1] == ("delete", "dv")


def test_dv_versioned_materialize_keeps_old_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    enable_table_history(spark, path, pb)
    delete_where_dv(spark, path, "k in (2, 4)", pb)        # v1
    materialize_deletes(spark, path, pb)                    # v2
    assert table_current_version(spark, path) == 2
    assert not has_live_deletes(spark, path)
    # archived vectors still serve the old versions
    assert _ids(read_table_version(spark, path, 0)) == list(range(20))
    assert 2 not in _ids(read_table_version(spark, path, 1))
    assert _ids(read_table_version(spark, path, 1)) == _ids(
        read_table_version(spark, path, 2)
    )
    # materialization is a physical no-op logically: CDF v1→v2 is empty
    assert table_changes(spark, path, 1, 2, keys=["k"]).count() == 0
    from config_driven_pyspark_spark.operators.deletes import (
        _dv_archive_root,
    )

    # keep_last=1 keeps entry v2 → version 1 is STILL readable (v2
    # holds its pre-state), so the archived vector must survive
    vacuum_table_history(spark, path, keep_last=1)
    assert len(_list_dv(spark, _dv_archive_root(path))) == 1
    assert 2 not in _ids(read_table_version(spark, path, 1))
    # dropping every entry leaves only the current version readable —
    # nothing can need the vector anymore and vacuum reaps it
    vacuum_table_history(spark, path, keep_last=0)
    assert _list_dv(spark, _dv_archive_root(path)) == []


def test_dv_restore_resurrects_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    enable_table_history(spark, path, pb)
    delete_where_dv(spark, path, "k in (2, 4)", pb)  # v1
    from config_driven_pyspark_spark.operators.history import restore_table

    res = restore_table(spark, path, 0)
    assert res["restored_version"] == 0
    assert _ids(read_table(spark, path)) == list(range(20))
    assert not has_live_deletes(spark, path)


def test_rewriting_op_absorbs_pending_vectors(spark, tmp_path):
    """A merge after a merge-on-read delete must not resurrect rows."""
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    delete_where_dv(spark, path, "k in (2, 4)", pb)
    batch = spark.createDataFrame(
        [(100, 0, 1000), (3, 1, 999)], "k long, p int, v long"
    )
    merge_upsert(batch, path, ["k"], partition_by=pb)
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert 2 not in got and 4 not in got     # not resurrected
    assert got[100] == 1000 and got[3] == 999
    assert not has_live_deletes(spark, path)


def test_dv_copy_on_write_delete_absorbs_first(spark, tmp_path):
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    delete_where_dv(spark, path, "k = 2", pb)
    res = delete_where(spark, path, "k = 3", pb)  # CoW path
    assert res["n_before"] == 19  # logical count, post-DV
    assert _ids(spark.read.parquet(path)) == [
        k for k in range(20) if k not in (2, 3)
    ]


def test_dv_partitioned_table_requires_partition_by(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=10, parts=2)
    with pytest.raises(ValueError, match="hive-partitioned"):
        delete_where_dv(spark, path, "k = 1", None)
    with pytest.raises(ValueError, match="does not match"):
        delete_where_dv(spark, path, "k = 1", ["nope"])


def test_dv_full_materialize_versioned_self_heals(spark, tmp_path):
    """Unpartitioned + versioned: the FULL swap carries `_deletes` into
    the retained dir; archival must still land the vectors where old
    versions find them."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=20, partition_by=False)
    enable_table_history(spark, path, None)
    delete_where_dv(spark, path, "k < 5", None)   # v1
    materialize_deletes(spark, path, None)        # v2, full mode
    assert _ids(read_table_version(spark, path, 0)) == list(range(20))
    assert _ids(read_table_version(spark, path, 1)) == list(range(5, 20))
    assert _ids(spark.read.parquet(path)) == list(range(5, 20))


def test_dv_pipeline_stages(spark, tmp_path):
    from config_driven_pyspark_spark.pipeline import Pipeline

    path = str(tmp_path / "t")
    _mk(spark, path, n=20, partition_by=False)
    out = Pipeline.from_config([
        {"stage": "table_read", "path": path},
        {"stage": "table_delete", "path": path, "where": "k < 15",
         "mode": "merge_on_read"},
        {"stage": "dv_materialize", "path": path},
    ]).run(spark)
    assert _ids(out) == list(range(15, 20))
    assert _ids(spark.read.parquet(path)) == list(range(15, 20))


def test_crashed_dv_staging_is_reaped(spark, tmp_path):
    """A crashed dv delete's staging dir (never published, never
    applied) is age-gated GC'd by the next delete/materialize — young
    staging (a live writer's) survives."""
    import os
    import time

    from config_driven_pyspark_spark.operators.deletes import (
        _dv_root,
        _gc_dv_staging,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, n=10, partition_by=False)
    delete_where_dv(spark, path, "k = 1", None)
    young = f"{_dv_root(path)}/staging-young"
    old = f"{_dv_root(path)}/staging-old"
    os.makedirs(young)
    os.makedirs(old)
    past = time.time() - 3600
    os.utime(old, (past, past))
    _gc_dv_staging(spark, path)
    assert not os.path.exists(old)
    assert os.path.exists(young)
    # and the live vector was untouched
    assert _ids(read_table(spark, path)) == [k for k in range(10) if k != 1]


# --- merge_upsert(delete_mode="merge_on_read") -------------------------


def test_merge_delete_only_batch_writes_vector(spark, tmp_path):
    """A delete-only CDC batch touches ZERO data files: the merge
    becomes one deletion vector."""
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    batch = spark.createDataFrame(
        [(2, 0, 20, True), (5, 1, 50, True)],
        "k long, p int, v long, is_del boolean",
    )
    stats = merge_upsert(
        batch, path, ["k"], delete_col="is_del",
        delete_mode="merge_on_read", partition_by=pb,
    )
    assert stats["rewrite"] == "dv", stats
    assert stats["n_deleted"] == 2 and stats["n_after"] == 18
    assert spark.read.parquet(path).count() == 20  # no file rewritten
    assert _ids(read_table(spark, path)) == [
        k for k in range(20) if k not in (2, 5)
    ]


def test_merge_mixed_batch_upserts_then_vectors(spark, tmp_path):
    """Mixed batch: upserts rewrite their partitions FIRST, then the
    delete rows tombstone against the post-merge files — including a
    delete in a partition the upsert just rewrote."""
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    batch = spark.createDataFrame(
        [
            (3, 1, 999, False),   # update in p=1
            (100, 0, 1000, False),  # insert into p=0
            (5, 1, 50, True),     # delete in p=1 (the rewritten one)
            (4, 0, 40, True),     # delete in p=0 (also rewritten)
        ],
        "k long, p int, v long, is_del boolean",
    )
    stats = merge_upsert(
        batch, path, ["k"], delete_col="is_del",
        delete_mode="merge_on_read", partition_by=pb,
    )
    assert stats["rewrite"] == "partition", stats
    assert stats["n_deleted"] == 2 and stats["n_inserted"] == 1
    got = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    assert got[3] == 999 and got[100] == 1000
    assert 5 not in got and 4 not in got
    assert len(got) == 19  # 20 - 2 deletes + 1 insert
    assert has_live_deletes(spark, path)
    # materialization converges physical to logical
    materialize_deletes(spark, path, pb)
    assert spark.read.parquet(path).count() == 19


def test_merge_delete_mode_validations(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=10, partition_by=False)
    batch = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError, match="needs delete_col"):
        merge_upsert(batch, path, ["k"], delete_mode="merge_on_read")
    with pytest.raises(ValueError, match="unknown delete_mode"):
        merge_upsert(batch, path, ["k"], delete_col="d",
                     delete_mode="nope")
    b2 = spark.createDataFrame([(1, 1, True)], "k long, v long, d boolean")
    with pytest.raises(ValueError, match="incompatible"):
        merge_upsert(b2, path, ["k"], delete_col="d",
                     delete_mode="merge_on_read",
                     when_not_matched_by_source="delete")


def test_merge_dv_bootstrap_falls_back(spark, tmp_path):
    """Missing target: nothing to tombstone — the day-zero bootstrap
    runs the normal path on the batch's non-delete rows."""
    path = str(tmp_path / "missing")
    batch = spark.createDataFrame(
        [(1, 10, False), (2, 20, True)], "k long, v long, is_del boolean"
    )
    stats = merge_upsert(
        batch, path, ["k"], delete_col="is_del",
        delete_mode="merge_on_read",
    )
    assert stats["n_inserted"] == 1
    assert _ids(spark.read.parquet(path)) == [1]


# ---------------------------------------------------------------------------
# late-DV swap guard (r15 — ADVICE r14 medium): a deletion vector that
# commits AFTER an op listed/absorbed pending vectors but BEFORE its swap
# lock must abort the swap retryably — the staged-count check cannot see
# it (a DV write changes no data files) and proceeding would resurrect
# the tombstoned rows into newly named files, permanently orphaning the
# vector (silent un-delete, data-loss-grade for GDPR erasure).
# ---------------------------------------------------------------------------

def test_swap_aborts_when_dv_lands_in_planning_window(spark, tmp_path):
    from unittest import mock

    from config_driven_pyspark_spark.operators import deletes as D

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    # simulate the race deterministically: the vector is already live,
    # but the merge's PLANNING listing (the r16 fold's vector
    # discovery) "loses" to it and sees an empty set — exactly the
    # state a racer's commit in the planning window produces. The
    # swap's under-lock listing then shows a vector the fold never
    # absorbed → retryable abort.
    delete_where_dv(spark, path, "k in (2, 4)", pb)
    batch = spark.createDataFrame([(3, 1, 999)], "k long, p int, v long")
    real = D._list_dv
    state = {"blanked": 0}

    def racy_list(s, root):
        out = real(s, root)
        if root == _dv_root(path) and state["blanked"] < 1:
            state["blanked"] += 1
            return []
        return out

    with mock.patch.object(D, "_list_dv", racy_list):
        with pytest.raises(IOError, match="deletion vector"):
            merge_upsert(batch, path, ["k"], partition_by=pb)
    assert state["blanked"] == 1
    # the abort left the snapshot untouched: vector still live, rows
    # still logically deleted, and the unpatched re-run (what the
    # bounded retry does) folds the vector into its own rewrite and
    # succeeds
    assert has_live_deletes(spark, path)
    merge_upsert(batch, path, ["k"], partition_by=pb)
    got = _ids(spark.read.parquet(path))
    assert 2 not in got and 4 not in got
    assert not has_live_deletes(spark, path)


def test_materialize_aborts_on_vector_beyond_absorbed_set(spark, tmp_path):
    """dv_materialize passes its absorbed entry names as dv_expected;
    a LIVE listing with anything extra (a racer's vector) must abort."""
    from config_driven_pyspark_spark.operators import table as T

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    delete_where_dv(spark, path, "k = 2", pb)
    live = [e["name"] for e in _list_dv(spark, _dv_root(path))]
    assert len(live) == 1
    df = spark.read.parquet(path)
    n = df.count()
    # expected set missing the live vector -> retryable conflict
    with pytest.raises(IOError, match="deletion vector"):
        T._stage_verify_swap(
            df, path, n, pb, "(guard test)", op="dv_materialize",
            dv_expected=[],
        )
    # expected set == live listing -> the swap proceeds
    staged = T._stage_verify_swap(
        df, path, n, pb, "(guard test)", op="dv_materialize",
        dv_expected=live,
    )
    assert staged == n


def test_late_dv_conflict_is_retryable(spark, tmp_path):
    """The guard raises _LockConflict, so the opt-in wait budget
    re-runs the op from scratch and it self-heals: the retry's fresh
    planning sees the vector and folds it into its own rewrite."""
    from config_driven_pyspark_spark.operators import deletes as D

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    delete_where_dv(spark, path, "k = 4", pb)
    batch = spark.createDataFrame([(5, 1, 555)], "k long, p int, v long")
    real = D._list_dv
    state = {"blanked": 0}

    def racy_list(s, root):
        # first planning listing "loses the race" (sees no vector);
        # every later listing — the swap check, the retry — is real
        out = real(s, root)
        if root == _dv_root(path) and state["blanked"] < 1:
            state["blanked"] += 1
            return []
        return out

    from unittest import mock

    spark.conf.set("spark.cdp.lock.wait_seconds", "30")
    try:
        with mock.patch.object(D, "_list_dv", racy_list):
            merge_upsert(batch, path, ["k"], partition_by=pb)
    finally:
        spark.conf.unset("spark.cdp.lock.wait_seconds")
    assert state["blanked"] == 1
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert 4 not in got and got[5] == 555
    assert not has_live_deletes(spark, path)


def test_merge_dv_same_key_in_both_slices_rejected(spark, tmp_path):
    """Docstring contract (ADVICE r14): a key in BOTH the upsert and
    delete slices of one merge_on_read batch is a duplicate key row —
    rejected loudly before either phase, never a silent delete-wins."""
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    batch = spark.createDataFrame(
        [(3, 1, 999, False), (3, 1, 0, True)],
        "k long, p int, v long, is_del boolean",
    )
    with pytest.raises(ValueError, match="duplicate key"):
        merge_upsert(
            batch, path, ["k"], partition_by=pb,
            delete_col="is_del", delete_mode="merge_on_read",
        )


# ---------------------------------------------------------------------------
# deletion-vector coalesce (r15 — VERDICT r14 ask #3): a tombstone
# trickle must not accumulate unbounded read-side vector fan-in
# ---------------------------------------------------------------------------

def test_dv_trickle_coalesce_caps_fanin_at_one_vector(spark, tmp_path):
    """~50 trickle deletes -> coalesce -> reads touch ONE vector dir."""
    from config_driven_pyspark_spark.operators.deletes import (
        coalesce_deletes,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, n=200, parts=1, partition_by=False)
    for i in range(50):
        delete_where_dv(spark, path, f"k = {i * 3}", None)
    assert len(_list_dv(spark, _dv_root(path))) == 50
    res = coalesce_deletes(spark, path)
    assert res["n_vectors_in"] == 50 and res["n_vectors_out"] == 1
    assert res["n_tombstones"] == 50
    live = _list_dv(spark, _dv_root(path))
    assert len(live) == 1  # reads now list/union exactly one dir
    got = _ids(read_table(spark, path))
    assert got == [k for k in range(200) if k % 3 != 0 or k >= 150]


def test_dv_coalesce_noop_below_threshold(spark, tmp_path):
    from config_driven_pyspark_spark.operators.deletes import (
        coalesce_deletes,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, n=20, parts=1, partition_by=False)
    delete_where_dv(spark, path, "k = 2", None)
    res = coalesce_deletes(spark, path)
    assert res["n_vectors_out"] == 0 and res["version"] is None
    assert len(_list_dv(spark, _dv_root(path))) == 1


def test_dv_coalesce_versioned_preserves_time_travel(spark, tmp_path):
    """Versioned coalesce commits like a delete: inputs archived with
    the coalesce version, every older version reads unchanged, the CDF
    diff across the coalesce version is empty, and a later materialize
    + vacuum still behave."""
    from config_driven_pyspark_spark.operators.deletes import (
        coalesce_deletes,
    )

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=40, parts=2)
    enable_table_history(spark, path, pb)
    delete_where_dv(spark, path, "k = 2", pb)   # v1
    delete_where_dv(spark, path, "k = 5", pb)   # v2
    delete_where_dv(spark, path, "k = 8", pb)   # v3
    res = coalesce_deletes(spark, path, pb)     # v4
    assert res["version"] == 4 and res["n_tombstones"] == 3
    assert len(_list_dv(spark, _dv_root(path))) == 1
    # every version reads the state its deletes left
    assert _ids(read_table_version(spark, path, 0)) == list(range(40))
    assert 2 not in _ids(read_table_version(spark, path, 1))
    assert _ids(read_table_version(spark, path, 2)) == [
        k for k in range(40) if k not in (2, 5)
    ]
    expect = [k for k in range(40) if k not in (2, 5, 8)]
    assert _ids(read_table_version(spark, path, 3)) == expect
    assert _ids(read_table_version(spark, path, 4)) == expect
    assert _ids(read_table(spark, path)) == expect
    # the coalesce is logically invisible: CDF across v4 is empty
    assert table_changes(spark, path, 3, 4).count() == 0
    # and a later materialize absorbs the coalesced vector normally
    materialize_deletes(spark, path, pb)
    assert not has_live_deletes(spark, path)
    assert _ids(spark.read.parquet(path)) == expect
    assert _ids(read_table_version(spark, path, 2)) == [
        k for k in range(40) if k not in (2, 5)
    ]


def test_dv_housekeeping_knobs(spark, tmp_path):
    """table_delete's coalesce_after/materialize_after bound the
    trickle from inside the config pipeline."""
    from config_driven_pyspark_spark import Pipeline

    path = str(tmp_path / "t")
    _mk(spark, path, n=100, parts=1, partition_by=False)
    for i in range(4):
        Pipeline([
            {"stage": "table_read", "path": path},
            {"stage": "table_delete", "path": path,
             "where": f"k = {i}", "mode": "merge_on_read",
             "coalesce_after": 3},
        ]).run(spark)
    # 3rd delete tripped the coalesce (3 -> 1), 4th added one more
    assert len(_list_dv(spark, _dv_root(path))) == 2
    # materialize_after takes precedence and clears everything
    Pipeline([
        {"stage": "table_read", "path": path},
        {"stage": "table_delete", "path": path,
         "where": "k = 50", "mode": "merge_on_read",
         "coalesce_after": 3, "materialize_after": 3},
    ]).run(spark)
    assert not has_live_deletes(spark, path)
    assert _ids(spark.read.parquet(path)) == [
        k for k in range(100) if k not in (0, 1, 2, 3, 50)
    ]


def test_dv_coalesce_stage(spark, tmp_path):
    from config_driven_pyspark_spark import Pipeline

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    delete_where_dv(spark, path, "k = 2", pb)
    delete_where_dv(spark, path, "k = 4", pb)
    out = Pipeline([
        {"stage": "dv_coalesce", "path": path, "partition_by": pb},
    ]).run(spark)
    assert len(_list_dv(spark, _dv_root(path))) == 1
    assert sorted(r["k"] for r in out.select("k").collect()) == [
        k for k in range(20) if k not in (2, 4)
    ]


def test_dv_coalesce_archives_reaped_by_vacuum(spark, tmp_path):
    """The coalesce's archived input vectors carry the coalesce version
    as their materialization tag, so vacuum reaps them exactly when no
    readable version predates the coalesce — same lifecycle as
    materialize's archives."""
    from config_driven_pyspark_spark.operators.deletes import (
        _dv_archive_root, coalesce_deletes,
    )

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=40, parts=2)
    enable_table_history(spark, path, pb)
    delete_where_dv(spark, path, "k = 2", pb)   # v1
    delete_where_dv(spark, path, "k = 5", pb)   # v2
    res = coalesce_deletes(spark, path, pb)     # v3, archives 2 inputs
    assert res["version"] == 3
    assert len(_list_dv(spark, _dv_archive_root(path))) == 2
    # keep_last=1 keeps entry v3, whose retained pre-state makes v2
    # still READABLE (floor = min(keep) - 1 = 2 < mat 3) — the
    # archived inputs must survive
    vacuum_table_history(spark, path, keep_last=1)
    assert len(_list_dv(spark, _dv_archive_root(path))) == 2
    expect = [k for k in range(40) if k not in (2, 5)]
    assert _ids(read_table(spark, path)) == expect
    # dropping every entry lifts the floor past the coalesce version —
    # nothing can read below it, the archived inputs are reaped
    vacuum_table_history(spark, path, keep_last=0)
    assert len(_list_dv(spark, _dv_archive_root(path))) == 0
    assert _ids(read_table(spark, path)) == expect


def test_single_pass_delete_aborts_on_late_vector(spark, tmp_path):
    """r15 single-pass delete: a vector published between the tombstone
    staging and the lock must abort retryably — n_before/n_matched were
    observed against the earlier vector set — with the staging removed
    and the snapshot untouched; a plain re-run succeeds."""
    from unittest import mock

    from config_driven_pyspark_spark.operators import deletes as D

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    real = D._list_dv
    state = {"calls": 0}

    def racy_list(s, root):
        out = real(s, root)
        state["calls"] += 1
        if state["calls"] >= 3 and root == _dv_root(path):
            # the under-lock re-listing sees a racer's vector the
            # pre-staging listing (call #1/#2) did not
            out = out + [{"name": "dv_v000000_s2_deadbeef",
                          "version": 0, "nseg": 2, "mat": None}]
        return out

    with mock.patch.object(D, "_list_dv", racy_list):
        with pytest.raises(IOError, match="changed while this delete"):
            delete_where_dv(spark, path, "k in (2, 4)", pb)
    # abort left nothing behind: no vector, no staging debris, rows live
    assert not has_live_deletes(spark, path)
    assert not [
        d for d in os.listdir(_dv_root(path)) if d.startswith("staging-")
    ]
    assert _ids(read_table(spark, path)) == list(range(20))
    stats = delete_where_dv(spark, path, "k in (2, 4)", pb)
    assert stats["n_matched"] == 2
    assert _ids(read_table(spark, path)) == [
        k for k in range(20) if k not in (2, 4)
    ]


def test_single_pass_delete_aborts_on_replaced_file(spark, tmp_path):
    """r15/r16 single-pass delete: a referenced data file replaced
    between the tombstone staging and the lock fails the under-lock
    data-file fingerprint check (every mutating op swaps whole
    partition dirs with job-unique part names), aborting retryably
    with the snapshot untouched."""
    import glob
    import shutil

    from config_driven_pyspark_spark.operators import table as T

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    real_lock = T._WriterLock
    state = {"fired": False}

    class RacyLock(real_lock):
        def __enter__(self):
            out = super().__enter__()
            if not state["fired"]:
                state["fired"] = True
                # simulate a concurrent swap of partition p=0: its part
                # file names all change (job-unique names)
                for f in glob.glob(f"{path}/p=0/part-*"):
                    shutil.move(
                        f, f"{os.path.dirname(f)}/swapped-"
                        f"{os.path.basename(f)[5:]}"
                    )
            return out

    from unittest import mock

    with mock.patch.object(T, "_WriterLock", RacyLock):
        with pytest.raises(IOError, match="committed while this delete"):
            delete_where_dv(spark, path, "k in (2, 4)", pb)
    assert not has_live_deletes(spark, path)
    assert not [
        d for d in os.listdir(_dv_root(path)) if d.startswith("staging-")
    ]
    # the "swap" above renamed files, not rows — the table still holds
    # every row and a clean re-run deletes exactly the matched ones
    assert _ids(spark.read.parquet(path)) == list(range(20))
    stats = delete_where_dv(spark, path, "k in (2, 4)", pb)
    assert stats["n_matched"] == 2
    assert _ids(read_table(spark, path)) == [
        k for k in range(20) if k not in (2, 4)
    ]


def test_single_pass_delete_aborts_on_new_partition_commit(spark, tmp_path):
    """r16 (ADVICE r15 high #1): a concurrent commit that ADDS
    predicate-matching rows in a partition dir the staged tombstones
    reference NO files in (here: a brand-new dir) must abort — the old
    per-referenced-file existence check could not see it, so the delete
    would publish stale counts while the new matching rows survive.
    The whole-table data-file fingerprint catches any such commit."""
    import glob
    import shutil
    from unittest import mock

    from config_driven_pyspark_spark.operators import table as T

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    real_lock = T._WriterLock
    state = {"fired": False}

    class RacyLock(real_lock):
        def __enter__(self):
            out = super().__enter__()
            if not state["fired"]:
                state["fired"] = True
                # simulate a concurrent commit creating partition p=2
                # (valid parquet — a copied data file; the partition
                # value comes from the dir name)
                src = glob.glob(f"{path}/p=0/part-*")[0]
                os.makedirs(f"{path}/p=2")
                shutil.copy(src, f"{path}/p=2/{os.path.basename(src)}")
            return out

    with mock.patch.object(T, "_WriterLock", RacyLock):
        with pytest.raises(IOError, match="committed while this delete"):
            delete_where_dv(spark, path, "k in (2, 4)", pb)
    assert not has_live_deletes(spark, path)
    assert not [
        d for d in os.listdir(_dv_root(path)) if d.startswith("staging-")
    ]
    # the re-run sees the racer's rows and tombstones ALL matches —
    # including any copies now living in p=2 (the copied part file
    # holds whatever slice of p=0 the seed write put in it)
    pre_ids = _ids(spark.read.parquet(path))
    stats = delete_where_dv(spark, path, "k in (2, 4)", pb)
    assert stats["n_matched"] == sum(1 for k in pre_ids if k in (2, 4))
    assert stats["n_matched"] >= 2
    assert _ids(read_table(spark, path)) == [
        k for k in pre_ids if k not in (2, 4)
    ]


def test_single_pass_delete_restages_under_lock_above_cap(
    spark, tmp_path, monkeypatch
):
    """r16 (ADVICE r15 high #2): above the fingerprint file cap the
    delete RE-STAGES its tombstones under the lock, so a
    count-preserving rewrite in the window (same matched count, new
    job-unique names — the case the old count-only re-probe passed)
    can never publish tombstones against dead file names: the
    published vector is computed from the locked live state and the
    rows are really gone."""
    import glob
    import shutil
    from unittest import mock

    from config_driven_pyspark_spark.operators import deletes as D
    from config_driven_pyspark_spark.operators import table as T

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    monkeypatch.setattr(D, "_DV_FILE_CAP", 0)  # force the fallback
    real_lock = T._WriterLock
    state = {"fired": False}

    class RacyLock(real_lock):
        def __enter__(self):
            out = super().__enter__()
            if not state["fired"]:
                state["fired"] = True
                # count-preserving rewrite: every p=0 file re-named
                # (rows identical — exactly what a compaction or an
                # unrelated-column update produces)
                for f in glob.glob(f"{path}/p=0/part-*"):
                    shutil.move(
                        f, f"{os.path.dirname(f)}/swapped-"
                        f"{os.path.basename(f)[5:]}"
                    )
            return out

    with mock.patch.object(T, "_WriterLock", RacyLock):
        stats = delete_where_dv(spark, path, "k in (2, 4)", pb)
    assert stats["n_matched"] == 2 and stats["n_after"] == 18
    # the vector references the LIVE (renamed) files: the rows are
    # logically gone, not silently surviving against dead names
    assert _ids(read_table(spark, path)) == [
        k for k in range(20) if k not in (2, 4)
    ]
    assert spark.read.parquet(path).count() == 20  # still no rewrite


# ---------------------------------------------------------------------------
# r16 merge fold (VERDICT r15 #1): pending vectors absorb into the
# merge's OWN rewrite — no separate materialize_deletes pass
# ---------------------------------------------------------------------------


def test_merge_folds_pending_vectors_versioned_scoped(spark, tmp_path):
    """A merge over pending vectors absorbs them in its own swap: no
    separate dv_materialize version, vectors archived re-tagged with
    the MERGE's version, time travel below it still applies them, and
    CDF across the merge reports only the merge's own changes."""
    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    enable_table_history(spark, path, pb)
    delete_where_dv(spark, path, "k in (2, 4)", pb)     # v1
    batch = spark.createDataFrame(
        [(3, 1, 999), (100, 0, 1000)], "k long, p int, v long"
    )
    stats = merge_upsert(batch, path, ["k"], partition_by=pb)  # v2
    assert stats["rewrite"] == "partition", stats
    assert stats["n_before"] == 18  # logical count, post-DV
    # ONE version for the merge — no interposed materialize commit
    assert table_current_version(spark, path) == 2
    assert not has_live_deletes(spark, path)
    # the fold's rewrite physically absorbed the tombstones
    assert _ids(spark.read.parquet(path)) == sorted(
        [k for k in range(20) if k not in (2, 4)] + [100]
    )
    # time travel: v0 pre-delete; v1 applies the ARCHIVED vectors
    assert _ids(read_table_version(spark, path, 0)) == list(range(20))
    assert _ids(read_table_version(spark, path, 1)) == [
        k for k in range(20) if k not in (2, 4)
    ]
    # CDF across the merge: only the merge's own changes — the
    # absorbed tombstones are invisible (they committed at v1)
    chg = table_changes(spark, path, 1, 2, keys=["k"])
    types = {
        (r["k"], r["_change_type"])
        for r in chg.select("k", "_change_type").collect()
    }
    assert (100, "insert") in types
    assert (3, "update_postimage") in types
    assert not any(k in (2, 4) for k, _t in types)
    # and the v0 -> v1 diff still reports the deletes
    d01 = table_changes(spark, path, 0, 1, keys=["k"])
    assert sorted(
        r["k"] for r in d01.filter("_change_type = 'delete'").collect()
    ) == [2, 4]


def test_merge_folds_pending_vectors_versioned_full(spark, tmp_path):
    """Unpartitioned + versioned: the merge's FULL swap carries
    `_deletes` into the retained dir; archival from there (flagged
    dv_absorbed in the manifest) keeps old versions reading through
    the vectors."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=20, partition_by=False)
    enable_table_history(spark, path, None)
    delete_where_dv(spark, path, "k < 5", None)   # v1
    batch = spark.createDataFrame(
        [(100, 0, 1000)], "k long, p int, v long"
    )
    merge_upsert(batch, path, ["k"])              # v2, full swap
    assert table_current_version(spark, path) == 2
    assert not has_live_deletes(spark, path)
    assert _ids(read_table_version(spark, path, 0)) == list(range(20))
    assert _ids(read_table_version(spark, path, 1)) == list(range(5, 20))
    assert _ids(spark.read.parquet(path)) == list(range(5, 20)) + [100]


def test_merge_fold_skips_separate_materialize_pass(spark, tmp_path):
    """The fold's whole point: materialize_deletes is NOT invoked by a
    merge over pending vectors — the absorb happens inside the merge's
    own staged write."""
    from unittest import mock

    from config_driven_pyspark_spark.operators import deletes as D
    from config_driven_pyspark_spark.operators import table as T

    path = str(tmp_path / "t")
    pb = _mk(spark, path, n=20, parts=2)
    delete_where_dv(spark, path, "k in (2, 4)", pb)
    batch = spark.createDataFrame([(3, 1, 999)], "k long, p int, v long")
    with mock.patch.object(
        D, "materialize_deletes",
        side_effect=AssertionError("fold must not materialize"),
    ):
        merge_upsert(batch, path, ["k"], partition_by=pb)
    assert not has_live_deletes(spark, path)
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert 2 not in got and 4 not in got and got[3] == 999
