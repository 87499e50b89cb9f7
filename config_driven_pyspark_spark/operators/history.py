"""Table versioning: time travel, RESTORE, history, vacuum — over the
plain-parquet snapshots maintained by ``operators/table.py``.

Capability gap vs the reference (SURVEY.md §2C table maintenance):
Delta/Iceberg/Hudi expose ``VERSION AS OF`` reads, ``RESTORE TABLE``
and ``DESCRIBE HISTORY`` on top of their commit logs. The reference
engine (timkins666/config-driven-pyspark) has no mutable-table story at
all; this module provides the same user surface engine-native, reusing
the atomic-swap machinery every mutating table op already runs through.

Design — retention is the swap's backup directory, kept instead of
deleted:

- ``enable_table_history(path)`` drops ``<path>__history/_enabled``.
  From then on EVERY mutating op (merge/scd2/incremental_agg/compact/
  delete/update/restore) retains what it replaced: the swap's backup
  directory — the whole pre-swap snapshot for a full rewrite, ONLY the
  moved-aside partition directories for a partition-scoped one — is
  renamed (never copied) into ``__history/v<N>`` and described by a
  ``_manifest.json`` (op, mode, replaced/created partition dirs, staged
  row count). Retained bytes therefore equal REPLACED bytes, exactly
  Delta's cost model: storage grows with churn, not with table size,
  and retention adds zero data copies to the write path.
- Version ``N`` is the table state AFTER the swap that wrote entry
  ``v<N>``; entry ``v<N>`` holds the pre-state of what that swap
  replaced. Version 0 is the state when history was enabled.
- ``read_table_version(path, W)`` reconstructs version ``W`` without
  touching data files: walk entries ``N`` in ``(W .. current]``
  ascending; the FIRST entry naming a partition dir resolves it (the
  oldest change after ``W`` carries the state at ``W``); a dir first
  CREATED by entry ``N`` is absent at ``W``; a full-mode entry resolves
  everything at once; dirs no entry names are read live. The result is
  a plain union of parquet scans — Catalyst prunes and pushes into
  every branch.
- Crash honesty: a ``v<N>.pending`` marker is created BEFORE the
  swap's first rename and removed only after the manifest commits. A
  crash in between leaves a permanent gap — ``read_table_version``
  REFUSES versions older than any gap rather than silently
  reconstructing state the crashed swap may have changed. In-process
  failures roll back and remove their marker.
- ``restore_table(path, W)`` materializes version ``W`` through the
  same verified full swap — so a restore is itself a new version and
  the pre-restore state stays reachable (Delta RESTORE semantics).
- ``TIMESTAMP AS OF``: manifests record a wall-clock commit time and
  the ``_enabled`` doc records the enable moment, so
  ``resolve_timestamp_version`` maps a timestamp to the highest
  version committed at or before it (Delta semantics); the
  ``time_travel`` / ``table_restore`` stages accept ``timestamp`` and
  per-version CDF can emit ``_commit_timestamp``.
- ``vacuum_table_history(path, keep_last=k)`` drops the oldest entries
  (whole-directory deletes); reconstruction needs every entry newer
  than the target, so readability truncates contiguously from the
  bottom — never holes.

Scale: begin/commit are O(1) FS renames + one tiny JSON per swap
regardless of table size; reading version ``W`` lists ``__history``
once (one RPC per retained version, bounded by ``keep_last``) and
plans one parquet scan per resolved root.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

_ENABLED_FILE = "_enabled"
_MANIFEST_FILE = "_manifest.json"
# per-row expansion bound for the keyless CDF multiset diff (ADVICE
# r15): a row's net multiplicity explodes in chunks of this many, so
# no single row ever materializes an array ∝ its duplicate count
_KEYLESS_CDF_CHUNK = 65_536
_V_RE = re.compile(r"^v(\d+)(\.pending)?$")


def _hist_root(base: str) -> str:
    return f"{base.rstrip('/')}__history"


def _read_small(jvm, fs, path_str: str) -> bytes | None:
    from config_driven_pyspark_spark.operators.table import _local_path

    lp = _local_path(fs, path_str)
    if lp is not None:  # local fast path (r16): 1 syscall vs 4 py4j RPCs
        try:
            with open(lp, "rb") as fh:
                return fh.read()
        except (FileNotFoundError, IsADirectoryError, NotADirectoryError):
            return None
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        try:
            return bytes(
                jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        except Exception:
            out = []
            b = stream.read()
            while b != -1:
                out.append(b)
                b = stream.read()
            return bytes(out)
    finally:
        stream.close()


def _write_small(jvm, fs, path_str: str, data: bytes) -> None:
    """tmp-write + atomic replace: readers see the old file or the new
    one, never a torn write. Local fast path mirrors
    ``table._small_write`` (os.replace + stale-``.crc`` hygiene)."""
    import os as _os

    from config_driven_pyspark_spark.operators.table import _local_path

    lp = _local_path(fs, path_str)
    if lp is not None:
        d, name = _os.path.split(lp)
        _os.makedirs(d or "/", exist_ok=True)
        tmp = f"{lp}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        for side in (f"{d}/.{name}.crc", f"{d}/.{name}.tmp.crc"):
            try:
                _os.remove(side)
            except OSError:
                pass
        _os.replace(tmp, lp)
        return
    Path = jvm.org.apache.hadoop.fs.Path
    final = Path(path_str)
    tmp = Path(path_str + ".tmp")
    fs.mkdirs(final.getParent())
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    fs.delete(final, False)
    fs.rename(tmp, final)


def _scan_entries(jvm, fs, hist: str) -> tuple[dict[int, dict], set[int]]:
    """One listing of ``__history``: ``{version: manifest}`` for
    complete entries + the set of INCOMPLETE version numbers (a
    ``.pending`` marker or a version dir without a manifest — crash
    debris whose pre-state may be partial or lost)."""
    from config_driven_pyspark_spark.operators.table import _local_path

    complete: dict[int, dict] = {}
    dirs: set[int] = set()
    pending: set[int] = set()
    lp = _local_path(fs, hist)
    if lp is not None:
        # local fast path (r16): one scandir replaces listStatus plus
        # 2-3 py4j attribute RPCs per entry
        import os as _os

        try:
            with _os.scandir(lp) as it:
                entries = [(e.name, e.is_dir()) for e in it]
        except (FileNotFoundError, NotADirectoryError):
            return complete, set()
    else:
        Path = jvm.org.apache.hadoop.fs.Path
        hist_p = Path(hist)
        if not fs.exists(hist_p):
            return complete, set()
        entries = [
            (st.getPath().getName(), st.isDirectory())
            for st in fs.listStatus(hist_p)
        ]
    for name, is_dir in entries:
        m = _V_RE.match(name)
        if not m:
            continue
        n = int(m.group(1))
        if m.group(2):
            pending.add(n)
        elif is_dir:
            dirs.add(n)
    for n in dirs:
        raw = _read_small(jvm, fs, f"{hist}/v{n}/{_MANIFEST_FILE}")
        doc = None
        if raw is not None:
            try:
                doc = json.loads(raw.decode())
            except ValueError:
                doc = None
        if doc is not None and n not in pending:
            complete[n] = doc
        else:
            pending.add(n)
    return complete, pending


def history_enabled(spark: SparkSession, target_path: str) -> bool:
    from config_driven_pyspark_spark.operators.table import _fs

    jvm, fs = _fs(spark, target_path)
    return fs.exists(
        jvm.org.apache.hadoop.fs.Path(
            f"{_hist_root(target_path)}/{_ENABLED_FILE}"
        )
    )


def enable_table_history(
    spark: SparkSession,
    target_path: str,
    partition_by: list[str] | None = None,
) -> None:
    """Start retaining versions for the snapshot at ``target_path``.
    The current state becomes version 0; nothing is copied. The
    partition layout is pinned — every later mutating op must use the
    same ``partition_by`` (the scoped-swap machinery already enforces
    the on-disk layout; history additionally needs it to interpret
    entry directories). Idempotent; re-enabling after
    ``disable_table_history`` starts a fresh v0."""
    from config_driven_pyspark_spark.operators.table import _fs

    import time as _time

    jvm, fs = _fs(spark, target_path)
    # enabled_ts anchors TIMESTAMP AS OF: version 0's commit time is
    # the moment history started (timestamps before it cannot resolve)
    doc = {
        "partition_by": list(partition_by or []),
        "enabled_ts": _time.time(),
    }
    _write_small(
        jvm, fs,
        f"{_hist_root(target_path)}/{_ENABLED_FILE}",
        json.dumps(doc).encode(),
    )


def disable_table_history(spark: SparkSession, target_path: str) -> None:
    """Drop retention AND every retained version (whole-directory
    delete). Mutating ops go back to deleting their backups."""
    from config_driven_pyspark_spark.operators.table import _fs

    jvm, fs = _fs(spark, target_path)
    fs.delete(
        jvm.org.apache.hadoop.fs.Path(_hist_root(target_path)), True
    )


def _enabled_doc(jvm, fs, base: str) -> dict | None:
    raw = _read_small(jvm, fs, f"{_hist_root(base)}/{_ENABLED_FILE}")
    if raw is None:
        return None
    try:
        return json.loads(raw.decode())
    except ValueError:
        return None


def begin_retention(
    spark: SparkSession,
    base: str,
    partition_by: list[str] | None,
) -> int | None:
    """Called by the swap BEFORE its first rename. Returns the version
    number this swap will create (``.pending`` marker dropped so a
    crash leaves a trace and never a silently-wrong history), or None
    when history is not enabled for this table."""
    from config_driven_pyspark_spark.operators.table import _fs

    jvm, fs = _fs(spark, base)
    doc = _enabled_doc(jvm, fs, base)
    if doc is None:
        return None
    pinned = doc.get("partition_by", [])
    if list(partition_by or []) != pinned:
        raise ValueError(
            f"table history for {base!r} was enabled with partition_by="
            f"{pinned} but this operation uses {list(partition_by or [])}"
            " — history entries would be uninterpretable; disable and "
            "re-enable history to change the layout"
        )
    hist = _hist_root(base)
    complete, incomplete = _scan_entries(jvm, fs, hist)
    # allocate above the persisted high-water mark, not just the
    # surviving entries: vacuum may have dropped every entry (idle
    # table + age bound, or keep_last=0) and REUSING a version number
    # would silently corrupt downstream time-travel/CDF cursors (Delta
    # never reuses versions — ADVICE r12).  The mark itself is bumped
    # at commit_retention / vacuum time, NOT here: persisting it before
    # an in-process abort would leave a permanent numbering hole the
    # floor logic must treat as a lost entry.
    high = int(doc.get("high_water", 0))
    version = max(0, high, *complete, *incomplete) + 1
    Path = jvm.org.apache.hadoop.fs.Path
    # CAS allocation (r13): the pending marker's atomic createNewFile
    # IS the compare-and-set — when two disjoint-scope writers race,
    # the loser's create fails and it takes the next number, so
    # concurrent versioned writers can never share a version. (While
    # one swap is in flight, versions below its pending number refuse
    # transiently — the same honest gap semantics a crash leaves,
    # except the marker clears at commit.)
    for _ in range(1000):
        if fs.createNewFile(Path(f"{hist}/v{version}.pending")):
            return version
        version += 1
    raise IOError(
        f"could not allocate a history version for {base!r} after "
        "1000 attempts — lock directory storm? inspect "
        f"{hist}/v*.pending"
    )


def abort_retention(spark: SparkSession, base: str, version: int) -> None:
    """In-process failure after ``begin_retention``: the swap rolled
    every rename back, so the pending marker is removable — no gap."""
    from config_driven_pyspark_spark.operators.table import _fs

    jvm, fs = _fs(spark, base)
    fs.delete(
        jvm.org.apache.hadoop.fs.Path(
            f"{_hist_root(base)}/v{version}.pending"
        ),
        False,
    )


def _nullable_schema(dt):
    """Recursively relax nullability — a manifest-recorded schema is
    applied to files written by MANY swaps whose staged nullability may
    have differed; reading a null-bearing file through a non-nullable
    user schema is the classic silent-wrong-results trap, while
    nullable-everywhere merely matches what parquet inference reports."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    if isinstance(dt, StructType):
        return StructType([
            StructField(f.name, _nullable_schema(f.dataType), True,
                        f.metadata)
            for f in dt.fields
        ])
    if isinstance(dt, ArrayType):
        return ArrayType(_nullable_schema(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(
            _nullable_schema(dt.keyType), _nullable_schema(dt.valueType),
            True,
        )
    return dt


def _manifest_schema(complete: dict[int, dict], version: int):
    """The table schema AS OF ``version``, reconstructed from recorded
    manifests (r16): version v's schema is the schema staged by the
    swap that created v (schema changes always force FULL rewrites, so
    every live file at v conforms); mode-``dv`` commits touch no data
    files and inherit v-1's. Returns None — callers fall back to
    parquet inference — when the chain reaches a manifest without a
    recorded schema (pre-r16 entry) or a vacuumed version."""
    from pyspark.sql.types import StructType

    v = version
    while v > 0:
        man = complete.get(v)
        if man is None:
            return None
        js = man.get("schema")
        if js:
            try:
                return StructType.fromJson(json.loads(js))
            except Exception:  # unparseable → behave like an old entry
                return None
        if man.get("mode") != "dv":
            return None
        v -= 1
    return None


def commit_retention(
    spark: SparkSession,
    base: str,
    version: int,
    backup: str | None,
    *,
    op: str,
    mode: str,
    replaced: list[str],
    created: list[str],
    rows_staged: int,
    dv_dirs: list[str] | None = None,
    dv_absorbed: list[str] | None = None,
    schema_json: str | None = None,
) -> None:
    """Called by the swap where it would otherwise DELETE its backup:
    rename the backup into ``__history/v<N>`` (no backup — a pure-
    insert scoped swap — makes an empty entry), write the manifest,
    clear the pending marker. Rename-only: retention never copies
    data."""
    from config_driven_pyspark_spark.operators.table import _fs

    jvm, fs = _fs(spark, base)
    Path = jvm.org.apache.hadoop.fs.Path
    hist = _hist_root(base)
    vdir = Path(f"{hist}/v{version}")
    if backup is not None and fs.exists(Path(backup)):
        fs.mkdirs(vdir.getParent())
        if not fs.rename(Path(backup), vdir):
            raise IOError(
                f"could not retain pre-swap backup {backup!r} as "
                f"history version {version} of {base!r}"
            )
    else:
        fs.mkdirs(vdir)
    import time as _time

    manifest = {
        "version": version,
        "op": op,
        "mode": mode,
        "replaced": sorted(replaced),
        "created": sorted(created),
        "rows_staged": int(rows_staged),
        # wall-clock commit time (sub-second float so consecutive
        # commits stay distinguishable), consumed by age-based vacuum
        # and TIMESTAMP AS OF resolution — deliberately absent from
        # table_history output so the report stays deterministic/
        # oracle-able
        "ts": _time.time(),
    }
    if dv_dirs is not None:
        # deletion-vector commits (mode "dv") replace no directories;
        # the partitions holding tombstoned rows are recorded here so
        # CDF / restore scoping still knows where the change lives
        manifest["dv_dirs"] = sorted(dv_dirs)
    if dv_absorbed:
        # this rewrite ABSORBED the named pending vectors (r16 merge
        # fold / dv_materialize): a crash between a full-mode swap and
        # the archive rename leaves them inside the retained version
        # dir — _applicable_dv self-heals from this flag
        manifest["dv_absorbed"] = sorted(dv_absorbed)
    if schema_json is not None:
        # the STAGED schema = the table schema at this version (r16):
        # read_table_version / table_changes read historical roots with
        # it instead of paying a parquet schema-inference pass per root
        manifest["schema"] = schema_json
    _write_small(
        jvm, fs, f"{hist}/v{version}/{_MANIFEST_FILE}",
        json.dumps(manifest).encode(),
    )
    fs.delete(Path(f"{hist}/v{version}.pending"), False)
    # persist the high-water mark so vacuum can never reset the
    # counter (monotonic versions even after every entry is dropped).
    # Two CONCURRENT committers can race this read-modify-write; a
    # lost update only leaves high_water below a committed version,
    # which is harmless — allocation also takes max over the surviving
    # entries, and vacuum re-bumps from everything it observes.
    doc = _enabled_doc(jvm, fs, base) or {}
    if version > int(doc.get("high_water", 0)):
        doc["high_water"] = version
        _write_small(
            jvm, fs, f"{hist}/{_ENABLED_FILE}",
            json.dumps(doc).encode(),
        )


def _versions(
    spark: SparkSession, base: str
) -> tuple[dict[int, dict], int, int, list[str]]:
    """(complete entries, current version, readable floor,
    partition_by). Floor = the newest incomplete-or-missing version —
    reconstruction below it would need an entry that is gone."""
    from config_driven_pyspark_spark.operators.table import _fs

    jvm, fs = _fs(spark, base)
    doc = _enabled_doc(jvm, fs, base)
    if doc is None:
        raise ValueError(
            f"table history is not enabled for {base!r} — call "
            "enable_table_history first (and note versions only exist "
            "for swaps that ran after enabling)"
        )
    complete, incomplete = _scan_entries(jvm, fs, _hist_root(base))
    # the persisted high-water keeps `current` (and the floor) honest
    # after a vacuum dropped every entry: the table is still at version
    # N, reading N is a live read, N-1 and below stay refused
    current = max(0, int(doc.get("high_water", 0)),
                  *complete, *incomplete)
    floor = 0
    for n in range(current, 0, -1):
        if n not in complete:
            floor = n
            break
    return complete, current, floor, doc.get("partition_by", [])


def table_current_version(spark: SparkSession, target_path: str) -> int:
    return _versions(spark, target_path.rstrip("/"))[1]


def commit_timestamps(
    spark: SparkSession, target_path: str
) -> dict[int, float]:
    """``{version: commit epoch-seconds}`` for every surviving entry,
    plus version 0 mapped to the enable_table_history moment. Entries
    written before timestamp support are absent (their manifests carry
    no ``ts``)."""
    from config_driven_pyspark_spark.operators.table import _fs

    base = target_path.rstrip("/")
    jvm, fs = _fs(spark, base)
    doc = _enabled_doc(jvm, fs, base)
    if doc is None:
        raise ValueError(
            f"table history is not enabled for {base!r} — call "
            "enable_table_history first"
        )
    complete, _incomplete = _scan_entries(jvm, fs, _hist_root(base))
    out: dict[int, float] = {}
    if doc.get("enabled_ts") is not None:
        out[0] = float(doc["enabled_ts"])
    for n, man in complete.items():
        if man.get("ts") is not None:
            out[n] = float(man["ts"])
    return out


def _parse_timestamp(ts) -> float:
    """Epoch seconds from an int/float, or an ISO-8601 string (naive
    strings are UTC — manifest commit times are ``time.time()``)."""
    if isinstance(ts, bool):
        raise ValueError(f"not a timestamp: {ts!r}")
    if isinstance(ts, (int, float)):
        return float(ts)
    from datetime import datetime, timezone

    try:
        dt = datetime.fromisoformat(str(ts))
    except ValueError as e:
        raise ValueError(
            f"cannot parse timestamp {ts!r} — pass epoch seconds or an "
            "ISO-8601 string (naive strings are interpreted as UTC)"
        ) from e
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def resolve_timestamp_version(
    spark: SparkSession, target_path: str, timestamp
) -> int:
    """``TIMESTAMP AS OF`` → version: the highest version whose commit
    time is at or before ``timestamp`` (Delta semantics). Version 0's
    time is the ``enable_table_history`` moment; earlier timestamps
    raise. Vacuumed entries took their commit times with them — a
    timestamp that can only be ordered against vacuumed versions
    refuses rather than guessing (the subsequent read would refuse
    those versions anyway)."""
    base = target_path.rstrip("/")
    t = _parse_timestamp(timestamp)
    ts_by_v = commit_timestamps(spark, base)
    complete, current, _floor, _pb = _versions(spark, base)
    t0 = ts_by_v.get(0)
    if t0 is not None and t < t0:
        from datetime import datetime, timezone

        iso = datetime.fromtimestamp(t0, tz=timezone.utc).isoformat()
        raise ValueError(
            f"timestamp is before {base!r}'s history begins "
            f"(enabled {iso}) — nothing to read"
        )
    missing = [n for n in complete if n not in ts_by_v]
    if missing:
        raise ValueError(
            f"history entries {sorted(missing)} of {base!r} predate "
            "timestamp support (no commit time recorded) — use "
            "VERSION AS OF for this table"
        )
    if complete and min(complete) > 1 and t < ts_by_v[min(complete)]:
        # the timestamp falls among vacuumed entries: their commit
        # times are gone, so WHICH dropped version it maps to is
        # unknowable — and every candidate is below the readable floor
        raise ValueError(
            f"timestamp predates the oldest surviving history entry of "
            f"{base!r} (older entries were vacuumed) — unreadable"
        )
    if not complete and current > 0:
        raise ValueError(
            f"every history entry of {base!r} was vacuumed — commit "
            "times are gone; use VERSION AS OF (only the current "
            f"version {current} is readable)"
        )
    best = 0
    for n in sorted(complete):
        if ts_by_v[n] <= t:
            best = n
    return best


def read_table_version(
    spark: SparkSession,
    target_path: str,
    version: int,
    _only_dirs: set[str] | None = None,
) -> DataFrame:
    """The snapshot at ``target_path`` AS OF ``version`` — a plain
    DataFrame unioning live partition directories (never changed since)
    with retained pre-state directories, at zero data copies. Raises
    for versions below the readable floor (vacuumed or lost to a
    crashed swap) or above the current version. ``_only_dirs``
    (internal, :func:`table_changes`) restricts a partitioned read to
    the named partition directories."""
    base = target_path.rstrip("/")
    complete, current, floor, partition_by = _versions(spark, base)
    if version > current or version < 0:
        raise ValueError(
            f"{base!r} is at version {current}; cannot read version "
            f"{version}"
        )
    if version < floor:
        raise ValueError(
            f"versions below {floor} of {base!r} are unreadable (entry "
            f"v{floor} was vacuumed, lost to a crashed swap, or a "
            "concurrent swap is in flight — retry if writers are live)"
        )
    from config_driven_pyspark_spark.operators.table import (
        _fs,
        _list_partition_dirs,
    )

    hist = _hist_root(base)
    resolved: dict[str, tuple[str, list[str]] | None] = {}
    full_from: int | None = None
    for n in sorted(k for k in complete if k > version):
        man = complete[n]
        if man["mode"] == "full":
            full_from = n
            break
        root = f"{hist}/v{n}"
        for d in man["replaced"]:
            resolved.setdefault(d, (root, [d]))
        for d in man["created"]:
            resolved.setdefault(d, None)

    sources: list[tuple[str, list[str]]] = []
    by_root: dict[str, list[str]] = {}
    for d, src in resolved.items():
        if src is None:
            continue
        by_root.setdefault(src[0], []).append(d)
    for root, dirs in sorted(by_root.items()):
        sources.append((root, sorted(dirs)))
    if full_from is not None:
        # the full entry is the whole snapshot as of `full_from - 1`;
        # any dir already resolved by an OLDER scoped entry wins, the
        # rest come from here — and nothing live is older than this
        root = f"{hist}/v{full_from}"
        if partition_by:
            dirs = [
                d
                for d in _list_partition_dirs(
                    spark, root, len(partition_by)
                )
                if d not in resolved
            ]
            if dirs:
                sources.append((root, sorted(dirs)))
        else:
            sources.append((root, []))
    else:
        if partition_by:
            live = [
                d
                for d in _list_partition_dirs(
                    spark, base, len(partition_by)
                )
                if d not in resolved
            ]
            if live:
                sources.append((base, sorted(live)))
        else:
            sources.append((base, []))

    if _only_dirs is not None and partition_by:
        sources = [
            (root, [d for d in dirs if d in _only_dirs])
            for root, dirs in sources
        ]
        sources = [s for s in sources if s[1]]

    # deletion vectors (operators/deletes.py): a version-W read honors
    # exactly the tombstones committed at or before W — rows a later
    # merge-on-read delete removed are still visible at W, and the
    # anti join is applied PER FRAME (while ``_metadata`` is still
    # resolvable on the raw scan), matching files by the rename-stable
    # rel path wherever retention moved them
    from config_driven_pyspark_spark.operators.deletes import (
        _applicable_dv,
        apply_deletion_vectors,
    )

    dv = _applicable_dv(spark, base, version, manifests=complete)
    frames: list[DataFrame] = []
    for root, dirs in sources:
        # recorded-manifest schema (r16): the live base holds the
        # CURRENT version's files; root __history/v<n> holds the
        # pre-state of swap n, i.e. version n-1's files. A miss (old
        # manifest, vacuumed chain) falls back to parquet inference.
        if root == base:
            sch = _manifest_schema(complete, current)
        else:
            sch = _manifest_schema(
                complete, int(root.rsplit("/v", 1)[1]) - 1
            )
        reader = spark.read.option("basePath", root)
        if sch is not None:
            reader = reader.schema(sch)
        if dirs:
            frame = reader.parquet(*[f"{root}/{d}" for d in dirs])
        else:
            frame = reader.parquet(root)
        if dv is not None:
            frame = apply_deletion_vectors(frame, dv[0], dv[1])
        frames.append(frame)
    if not frames:
        # every partition dir was created after `version` — the table
        # was empty; shape the empty frame like the live snapshot
        sch = _manifest_schema(complete, current)
        reader = spark.read.schema(sch) if sch is not None else spark.read
        return reader.parquet(base).limit(0)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def table_history(spark: SparkSession, target_path: str) -> DataFrame:
    """DESCRIBE HISTORY: one row per retained version (op, rewrite
    mode, replaced/created partition-dir counts, staged-scope row count)."""
    complete, _cur, _floor, _pb = _versions(
        spark, target_path.rstrip("/")
    )
    rows = [
        (
            int(n),
            str(m["op"]),
            str(m["mode"]),
            len(m["replaced"]),
            len(m["created"]),
            int(m["rows_staged"]),
        )
        for n, m in sorted(complete.items())
    ]
    return spark.createDataFrame(
        rows,
        "version bigint, op string, mode string, n_replaced int, "
        "n_created int, rows_staged bigint",
    )


def table_changes(
    spark: SparkSession,
    target_path: str,
    from_version: int,
    to_version: int | None = None,
    keys: list[str] | None = None,
    per_version: bool = False,
    include_timestamp: bool = False,
) -> DataFrame:
    """Change Data Feed: the rows that changed between two versions —
    the Delta ``table_changes`` surface. The diff is computed ONLY over
    the partition directories the intervening swaps actually touched
    (union of each entry's replaced+created sets), so a single-partition
    merge on a 10⁵-partition table diffs one directory, not the table.

    Without ``keys``: multiset semantics — rows in ``to`` but not
    ``from`` tagged ``_change_type='insert'``, the reverse ``'delete'``
    (an updated row appears as one of each).

    With ``keys`` (must be unique per version — the merge family's own
    invariant): Delta CDF semantics — unmatched new keys ``insert``,
    unmatched old keys ``delete``, matched-but-different rows emit an
    ``update_preimage`` / ``update_postimage`` pair, identical rows are
    silent. Comparison is null-safe over all shared columns.

    ``per_version=True`` attributes every change to the swap that made
    it: the range decomposes into consecutive (N-1, N) diffs, each
    tagged ``_commit_version = N`` — Delta CDF's per-commit stream.
    ``include_timestamp=True`` (per-version only — the net range diff
    has no single commit per row) adds Delta CDF's third column,
    ``_commit_timestamp``, from the entry's manifest commit time
    (NULL for pre-upgrade entries without one). Note wall-clock values
    are inherently non-deterministic across replays — keep the column
    out of value-hashed comparisons.
    Each step's diff is scoped to ITS OWN entry's touched partitions,
    so the total cost is Σ per-version churn, not versions × table. A
    row updated twice appears once per updating version (the net diff
    collapses it); the net rows equal the plain range diff applied in
    order."""
    base = target_path.rstrip("/")
    if include_timestamp and not per_version:
        raise ValueError(
            "include_timestamp requires per_version=True — the net "
            "range diff collapses multiple commits per row, so no "
            "single commit time applies"
        )
    if per_version:
        complete, current, floor, _pb = _versions(spark, base)
        to_v = current if to_version is None else to_version
        if not (0 <= from_version <= to_v <= current):
            raise ValueError(
                f"need 0 <= from_version <= to_version <= {current} "
                f"(got {from_version}..{to_v})"
            )
        if from_version < floor:
            raise ValueError(
                f"versions below {floor} of {base!r} are unreadable "
                f"(entry v{floor} was vacuumed, lost to a crashed swap, "
                "or a concurrent swap is in flight — retry if writers "
                "are live)"
            )

        def _stamp(df: DataFrame, n: int | None) -> DataFrame:
            if not include_timestamp:
                return df
            ts = complete.get(n, {}).get("ts") if n is not None else None
            return df.withColumn(
                "_commit_timestamp",
                F.timestamp_seconds(F.lit(ts).cast("double")),
            )

        out = None
        for n in range(from_version + 1, to_v + 1):
            step = _stamp(
                table_changes(spark, base, n - 1, n, keys)
                .withColumn("_commit_version", F.lit(n).cast("int")),
                n,
            )
            out = step if out is None else out.unionByName(step)
        if out is None:  # empty range
            return _stamp(
                table_changes(
                    spark, base, from_version, from_version, keys
                ).withColumn("_commit_version", F.lit(None).cast("int")),
                None,
            )
        return out
    complete, current, floor, partition_by = _versions(spark, base)
    if to_version is None:
        to_version = current
    if not (0 <= from_version <= to_version <= current):
        raise ValueError(
            f"need 0 <= from_version <= to_version <= {current} "
            f"(got {from_version}..{to_version})"
        )
    if from_version < floor:
        raise ValueError(
            f"versions below {floor} of {base!r} are unreadable (entry "
            f"v{floor} was vacuumed, lost to a crashed swap, or a "
            "concurrent swap is in flight — retry if writers are live)"
        )
    scope: set[str] | None = None
    if partition_by and from_version < to_version:
        scope = set()
        for n in range(from_version + 1, to_version + 1):
            man = complete[n]
            if man["mode"] == "full":
                scope = None  # a full rewrite may have touched anything
                break
            if man["mode"] == "dv" and man.get("dv_dirs") is None:
                # a deletion vector whose touched-partition set exceeded
                # the scoping cap — could have tombstoned anywhere
                scope = None
                break
            scope |= set(man["replaced"]) | set(man["created"])
            scope |= set(man.get("dv_dirs") or [])
    old = read_table_version(spark, base, from_version, _only_dirs=scope)
    new = read_table_version(spark, base, to_version, _only_dirs=scope)
    # align schemas across evolution (a column added between versions
    # reads as NULL on the old side)
    for c in new.columns:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
    for c in old.columns:
        if c not in new.columns:
            new = new.withColumn(c, F.lit(None).cast(old.schema[c].dataType))
    cols = new.columns
    old = old.select(*cols)
    new = new.select(*cols)
    if from_version == to_version:
        return new.limit(0).withColumn("_change_type", F.lit("insert"))

    if not keys:
        # multiset diff in ONE pass over each side (r15, guide §1.2):
        # the old exceptAll pair read both version frames twice (and
        # each frame is itself a union of retained dirs + DV anti
        # joins). Signed counts give the same multiset: a row with
        # net count d surfaces as d inserts (d > 0) or -d deletes.
        w = new.withColumn("__w", F.lit(1)).unionByName(
            old.withColumn("__w", F.lit(-1))
        )
        g = (
            w.groupBy(*cols)
            .agg(F.sum("__w").alias("__d"))
            .filter(F.col("__d") != 0)
        )
        # bounded two-level expansion (ADVICE r15 — r16): a single
        # sequence sized by a row's whole net multiplicity builds one
        # in-memory array ∝ |d| (hundreds of MB for a bulk delete of
        # heavily duplicated rows) and a cast to int silently overflows
        # past 2^31. Chunk it instead: an outer sequence over
        # ceil(|d|/CHUNK) chunk indexes, an inner sequence of at most
        # CHUNK per chunk — long arithmetic throughout, per-row array
        # bytes bounded by CHUNK regardless of the multiplicity.
        CHUNK = _KEYLESS_CDF_CHUNK
        return (
            g.select(
                *cols,
                F.when(F.col("__d") > 0, F.lit("insert"))
                .otherwise(F.lit("delete")).alias("_change_type"),
                F.abs(F.col("__d")).cast("long").alias("__n"),
            )
            .select(
                *cols, "_change_type", "__n",
                F.explode(
                    F.sequence(
                        F.lit(0).cast("long"),
                        F.floor((F.col("__n") - 1) / F.lit(CHUNK)),
                    )
                ).alias("__c"),
            )
            .select(
                *cols, "_change_type",
                F.explode(
                    F.sequence(
                        F.lit(1).cast("long"),
                        F.least(
                            F.lit(CHUNK).cast("long"),
                            F.col("__n") - F.col("__c") * F.lit(CHUNK),
                        ),
                    )
                ).alias("__i"),
            )
            .drop("__i")
        )

    for k in keys:
        if k not in cols:
            raise ValueError(f"key column {k!r} not in the table")
    non_keys = [c for c in cols if c not in keys]
    # literal presence markers BEFORE the join: on the missing side of
    # a full outer join every column reads NULL, including these — the
    # only side-presence test that survives NULL key values
    o = old.withColumn("__o_present", F.lit(True)).alias("o")
    n = new.withColumn("__n_present", F.lit(True)).alias("n")
    cond = None
    for k in keys:
        c = o[k].eqNullSafe(n[k])
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    o_present = o["__o_present"].isNotNull()
    n_present = n["__n_present"].isNotNull()
    same = None
    for c in non_keys:
        e = o[c].eqNullSafe(n[c])
        same = e if same is None else same & e
    if same is None:
        same = F.lit(True)
    # ONE execution of the join (r15, guide §1.2): the old four-branch
    # union (insert/delete/pre/post each filtering the same join)
    # re-executed the full-outer join once per branch — classify each
    # joined row instead and explode the update pair
    def _row(side, tag: str):
        return F.struct(
            *[side[c].alias(c) for c in cols],
            F.lit(tag).alias("_change_type"),
        )

    arr = (
        F.when(~o_present, F.array(_row(n, "insert")))
        .when(~n_present, F.array(_row(o, "delete")))
        .otherwise(
            F.array(
                _row(o, "update_preimage"), _row(n, "update_postimage")
            )
        )
    )
    return (
        j.filter(~o_present | ~n_present | ~same)
        .select(F.explode(arr).alias("__r"))
        .select("__r.*")
    )


def stage_table_changes(
    df, spec: dict, spark: SparkSession | None = None
):
    """``{"stage": "table_changes", "path": ..., "from_version": V,
    "to_version": W?, "keys": [...]?, "per_version": bool?,
    "include_timestamp": bool?}`` — source-like CDF read. Timestamps
    work too (Delta's ``startingTimestamp``/``endingTimestamp``):
    ``from_timestamp``/``to_timestamp`` resolve through
    :func:`resolve_timestamp_version` (exactly one of version/timestamp
    per bound)."""
    s = spark if spark is not None else df.sparkSession
    base = spec["path"]

    def bound(vkey: str, tkey: str, required: bool):
        has_v = spec.get(vkey) is not None
        has_t = spec.get(tkey) is not None
        if has_v and has_t:
            raise ValueError(
                f"table_changes needs at most one of {vkey} / {tkey}"
            )
        if has_t:
            return resolve_timestamp_version(s, base, spec[tkey])
        if has_v:
            return int(spec[vkey])
        if required:
            raise ValueError(
                f"table_changes needs {vkey} or {tkey}"
            )
        return None

    return table_changes(
        s,
        base,
        bound("from_version", "from_timestamp", required=True),
        bound("to_version", "to_timestamp", required=False),
        list(spec["keys"]) if spec.get("keys") else None,
        bool(spec.get("per_version", False)),
        bool(spec.get("include_timestamp", False)),
    )


def read_changes_cursor(
    spark: SparkSession, checkpoint: str
) -> int | None:
    """Last PROCESSED version recorded at ``checkpoint`` (None before
    the first successful batch)."""
    from config_driven_pyspark_spark.operators.table import _fs

    jvm, fs = _fs(spark, checkpoint)
    raw = _read_small(
        jvm, fs, f"{checkpoint.rstrip('/')}/cursor.json"
    )
    if raw is None:
        return None
    try:
        doc = json.loads(raw.decode())
    except ValueError:
        return None
    v = doc.get("version")
    return int(v) if v is not None else None


def _write_changes_cursor(
    spark: SparkSession, checkpoint: str, version: int
) -> None:
    from config_driven_pyspark_spark.operators.table import _fs

    jvm, fs = _fs(spark, checkpoint)
    _write_small(
        jvm, fs, f"{checkpoint.rstrip('/')}/cursor.json",
        json.dumps({"version": int(version)}).encode(),
    )


def consume_table_changes(
    spark: SparkSession,
    target_path: str,
    checkpoint: str,
    process,
    keys: list[str] | None = None,
    per_version: bool = True,
    include_timestamp: bool = False,
    max_versions_per_batch: int | None = None,
    start_version: int | None = None,
) -> dict:
    """Streaming CDF consumption (r13 — VERDICT r12 ask #5): the Delta
    streaming-source idiom — a version-checkpointed incremental pump —
    in engine-native foreachBatch form. Each call processes the
    versions committed since the last successful call as one or more
    micro-batches: ``process(df, from_version, to_version)`` receives
    the distributed ``table_changes`` frame for ``(from .. to]`` and
    the cursor advances ONLY after it returns, so a crash redelivers
    the uncommitted batch (at-least-once; an idempotent sink — a keyed
    ``merge`` — makes the pipeline exactly-once end-to-end, exactly
    the Delta + foreachBatch recipe).

    First call: ``start_version`` anchors the cursor (``0`` = replay
    all retained history); default is the CURRENT version — consume
    only changes from now on, Delta's ``startingVersion: latest``.
    ``max_versions_per_batch`` bounds a backlog into multiple
    micro-batches (each still scoped to its versions' touched
    partitions — cost ∝ churn, never versions × table). A cursor below
    the readable floor (vacuumed entries) refuses honestly rather than
    silently skipping changes.

    Why not a PySpark DataSource stream reader: executor-side
    ``read()`` has no SparkSession (the diff would have to be
    reimplemented row-at-a-time in Arrow), and the Simple driver-side
    variant materializes every batch on the driver — both are the
    anti-scale path. The pump keeps each batch a real distributed
    DataFrame. Returns ``{"batches", "from_version", "to_version"}``."""
    base = target_path.rstrip("/")
    _complete, current, floor, _pb = _versions(spark, base)
    cursor = read_changes_cursor(spark, checkpoint)
    if cursor is None:
        cursor = current if start_version is None else int(start_version)
        if not (0 <= cursor <= current):
            raise ValueError(
                f"start_version must be in [0, {current}] "
                f"(got {cursor})"
            )
        # persist the anchor IMMEDIATELY: a zero-pending first call
        # must still pin where the stream starts, or changes committed
        # before the next call would be silently skipped
        _write_changes_cursor(spark, checkpoint, cursor)
    if cursor < floor:
        raise ValueError(
            f"changes cursor {cursor} of {base!r} is below the "
            f"readable floor {floor} (entries were vacuumed) — the "
            "stream cannot resume without losing changes; reprocess "
            "from a full snapshot"
        )
    if max_versions_per_batch is not None and max_versions_per_batch < 1:
        raise ValueError("max_versions_per_batch must be >= 1")
    n_batches = 0
    first = cursor
    while cursor < current:
        to_v = current
        if max_versions_per_batch is not None:
            to_v = min(current, cursor + max_versions_per_batch)
        df = table_changes(
            spark, base, cursor, to_v, keys,
            per_version=per_version,
            include_timestamp=include_timestamp,
        )
        process(df, cursor, to_v)
        _write_changes_cursor(spark, checkpoint, to_v)
        cursor = to_v
        n_batches += 1
    return {
        "batches": n_batches,
        "from_version": first,
        "to_version": cursor,
    }


def _exactly_once_append(
    spark: SparkSession, sink_path: str, batch: DataFrame, to_v: int
) -> bool:
    """Idempotent parquet append for the CDF pump (r14 — VERDICT r13
    ask #5, exactly-once end-to-end): each micro-batch's files land
    under version-deterministic names (``batch-v<to_v>-<i>``) and the
    sink's ``_last_batch_id`` marker commits the version LAST. Every
    crash window replays safely:

    - crash before any rename: redelivery overwrites the hidden
      inflight dir and starts over;
    - crash mid-rename (or after renames but before the marker):
      marker < ``to_v``, so redelivery PURGES this version's
      deterministic names and rewrites them — same rows, no
      duplicates;
    - crash after the marker: redelivery sees ``to_v <= marker`` and
      skips, so the cursor can re-advance without re-appending.

    Returns False when the batch was already committed (skipped)."""
    from config_driven_pyspark_spark.operators.table import (
        _fs,
        _read_batch_marker,
        _write_batch_marker,
    )

    base = sink_path.rstrip("/")
    marker = _read_batch_marker(spark, base)
    if marker is not None and to_v <= marker:
        return False
    jvm, fs = _fs(spark, base)
    Path = jvm.org.apache.hadoop.fs.Path
    prefix = f"batch-v{to_v:09d}-"
    if fs.exists(Path(base)):
        for st in fs.listStatus(Path(base)):
            if st.getPath().getName().startswith(prefix):
                fs.delete(st.getPath(), True)
    # hidden inflight dir (dot prefix = invisible to parquet readers of
    # the sink); the rename below publishes whole files atomically
    tmp = f"{base}/.inflight-v{to_v}"
    batch.write.mode("overwrite").parquet(tmp)
    i = 0
    for st in fs.listStatus(Path(tmp)):
        name = st.getPath().getName()
        if st.isDirectory() or name.startswith(("_", ".")):
            continue
        ext = name.split(".", 1)[1] if "." in name else "parquet"
        if not fs.rename(
            st.getPath(), Path(f"{base}/{prefix}{i:05d}.{ext}")
        ):
            raise IOError(
                f"could not publish CDF batch file {name!r} into "
                f"{base!r} — redeliver the batch (the marker has not "
                "advanced)"
            )
        i += 1
    fs.delete(Path(tmp), True)
    _write_batch_marker(spark, base, to_v)
    return True


def stage_changes_stream(
    df, spec: dict, spark: SparkSession | None = None,
    batch_stages_fn=None,
):
    """``{"stage": "changes_stream", "path": ..., "checkpoint": ...,
    "keys": [...]?, "per_version": bool?, "include_timestamp": bool?,
    "max_versions_per_batch": N?, "start_version": V?,
    "stages": [...]?, "sink": {"format": "parquet", "path": ...,
    "mode": "append"?}}`` — the incremental CDF pump as a pipeline
    stage: every pending version batch runs through the optional
    sub-pipeline ``stages`` (compiled by the Pipeline into
    ``batch_stages_fn``) and lands in ``sink`` (append by default —
    the stream accumulates), the cursor advancing after each batch.
    Passes the input frame through (or, when it opens a pipeline,
    returns the sink contents)."""
    s = spark if spark is not None else df.sparkSession
    sink = spec.get("sink")
    if not sink or not sink.get("path"):
        raise ValueError("changes_stream needs sink.path")
    if spec.get("stages") and batch_stages_fn is None:
        raise ValueError(
            "changes_stream `stages` need the Pipeline to compile "
            "them — run through Pipeline.from_config/from_yaml "
            "(direct stage_changes_stream calls must pass "
            "batch_stages_fn)"
        )

    def process(batch, _from_v, to_v):
        if batch_stages_fn is not None:
            batch = batch_stages_fn(batch)
        fmt = sink.get("format", "parquet")
        mode = sink.get("mode", "append")
        if fmt == "parquet" and mode == "append":
            # exactly-once: version-deterministic file names + the
            # sink marker committing last (see _exactly_once_append);
            # a crash between sink success and the cursor write can no
            # longer double-apply on redelivery
            _exactly_once_append(s, sink["path"], batch, to_v)
        else:
            # non-parquet / overwrite sinks keep the plain write:
            # at-least-once, exactly-once only if the sink itself is
            # idempotent (e.g. a keyed merge downstream)
            batch.write.mode(mode).format(fmt).save(sink["path"])

    consume_table_changes(
        s,
        spec["path"],
        spec["checkpoint"],
        process,
        keys=list(spec["keys"]) if spec.get("keys") else None,
        per_version=bool(spec.get("per_version", True)),
        include_timestamp=bool(spec.get("include_timestamp", False)),
        max_versions_per_batch=(
            int(spec["max_versions_per_batch"])
            if spec.get("max_versions_per_batch") is not None else None
        ),
        start_version=(
            int(spec["start_version"])
            if spec.get("start_version") is not None else None
        ),
    )
    if df is None:
        return s.read.parquet(sink["path"])
    return df


def restore_table(
    spark: SparkSession, target_path: str, version: int | None = None,
    timestamp=None,
) -> dict:
    """RESTORE TABLE ... TO VERSION AS OF / TIMESTAMP AS OF:
    materialize ``version`` (or the version :func:`resolve_timestamp_
    version` maps ``timestamp`` to — exactly one of the two) through
    the same verified swap every merge uses — the restore itself
    becomes a new version, so the pre-restore state stays reachable.

    PARTITION-SCOPED when possible: the manifests between ``version``
    and current name exactly the partition directories that diverged
    (union of replaced+created), so only those are rewritten from
    version-``version`` content — dirs created since are deleted,
    untouched partition files stay byte-identical and restore cost is
    ∝ churn, not table size. A full-mode entry in the range (or a
    touched set past the scoped-partition cap) falls back to the full
    rewrite. Restoring to the current version is a no-op
    (``rewrite: "none"``). The ``_key_stats`` sidecar is dropped (its
    entries describe the replaced state) and restored partitions do
    not carry batch markers (the restored content predates them)."""
    from config_driven_pyspark_spark.operators.table import (
        _MAX_SCOPED_PARTITIONS,
        _delete_key_stats,
        _recover_crashed_swap,
        _stage_verify_swap,
    )

    base = target_path.rstrip("/")
    if (version is None) == (timestamp is None):
        raise ValueError(
            "restore_table needs exactly one of version / timestamp"
        )
    if timestamp is not None:
        version = resolve_timestamp_version(spark, base, timestamp)
    _recover_crashed_swap(spark, base)
    from config_driven_pyspark_spark.operators.deletes import (
        has_live_deletes,
        materialize_deletes,
    )

    if has_live_deletes(spark, base):
        # pending merge-on-read deletes: absorb them first so the
        # restore's rewrite starts from materialized files and never
        # leaves live vectors referencing files it replaced
        _c0, _cur0, _f0, pb0 = _versions(spark, base)
        materialize_deletes(spark, base, pb0 or None)
    complete, current, floor, partition_by = _versions(spark, base)
    if version == current:
        return {
            "restored_version": version,
            "new_version": current,
            "n_rows": None,
            "rewrite": "none",
        }
    scope: set[str] | None = None
    if partition_by and floor <= version <= current:
        scope = set()
        for n_v in range(version + 1, current + 1):
            man = complete.get(n_v)
            if man is None or man["mode"] == "full":
                scope = None
                break
            if man["mode"] == "dv" and man.get("dv_dirs") is None:
                scope = None
                break
            scope |= set(man["replaced"]) | set(man["created"])
            scope |= set(man.get("dv_dirs") or [])
        if scope is not None and len(scope) > _MAX_SCOPED_PARTITIONS:
            scope = None
    df = read_table_version(spark, base, version, _only_dirs=scope)
    n = df.count()
    _stage_verify_swap(
        df,
        base,
        n,
        partition_by or None,
        f"(restore of version {version}"
        + (" — rows in the diverged partitions)" if scope is not None
           else ")"),
        touched_dirs=sorted(scope) if scope is not None else None,
        op="restore",
    )
    _delete_key_stats(spark, base)
    return {
        "restored_version": version,
        "new_version": current + 1,
        "n_rows": n,
        "rewrite": "full" if scope is None else "partition",
    }


def vacuum_table_history(
    spark: SparkSession,
    target_path: str,
    keep_last: int | None = None,
    older_than_seconds: int | None = None,
) -> dict:
    """Drop the oldest retained versions — keep the ``keep_last``
    newest complete entries, and/or drop entries whose commit time is
    more than ``older_than_seconds`` ago (Delta's retention-period
    shape; at least one bound required, both combine as "drop what
    violates either"). Entries are chronological, so both rules select
    an oldest-first prefix and reconstruction truncates contiguously —
    versions at or above the oldest surviving entry minus one stay
    readable (a wall-clock regression between commits is guarded: the
    keep set is expanded to a contiguous suffix before anything is
    deleted). Whole-directory deletes; stale pending markers older
    than the survivors clear too. The persisted high-water version is
    bumped first, so dropping every entry never resets the version
    counter — numbers are monotonic for the table's lifetime, like
    Delta's."""
    if keep_last is None and older_than_seconds is None:
        raise ValueError(
            "vacuum needs keep_last and/or older_than_seconds"
        )
    if keep_last is not None and keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    if older_than_seconds is not None and older_than_seconds < 0:
        raise ValueError("older_than_seconds must be >= 0")
    import time as _time

    from config_driven_pyspark_spark.operators.table import _fs

    base = target_path.rstrip("/")
    jvm, fs = _fs(spark, base)
    Path = jvm.org.apache.hadoop.fs.Path
    hist = _hist_root(base)
    complete, incomplete = _scan_entries(jvm, fs, hist)
    keep = set(complete)
    if keep_last is not None:
        keep &= set(sorted(complete)[-keep_last:]) if keep_last else set()
    if older_than_seconds is not None:
        # pre-upgrade manifests without ts count as infinitely old —
        # they are by construction the oldest entries
        min_ts = _time.time() - older_than_seconds
        keep &= {n for n in complete
                 if complete[n].get("ts", 0) >= min_ts}
    if keep:
        # contiguity guard: manifest timestamps are normally monotonic,
        # but a wall-clock regression between commits could make the
        # age rule keep a non-contiguous set — deleting a mid-range
        # entry would strand every KEPT entry below the hole
        # (reconstruction needs all entries newer than the target).
        # Expand to the contiguous suffix: keep everything at or above
        # the oldest kept entry (always the safe direction — ADVICE
        # r12).
        lowest = min(keep)
        keep = {n for n in complete if n >= lowest}
    # bump the persisted high-water to everything ever observed (incl.
    # crash-debris numbers) BEFORE deleting, so the version counter can
    # never move backwards no matter what this vacuum drops
    doc = _enabled_doc(jvm, fs, base) or {}
    observed = max(0, int(doc.get("high_water", 0)),
                   *complete, *incomplete)
    if observed > int(doc.get("high_water", 0)):
        doc["high_water"] = observed
        _write_small(
            jvm, fs, f"{hist}/{_ENABLED_FILE}",
            json.dumps(doc).encode(),
        )
    cutoff = min(keep) if keep else max({0, *complete, *incomplete}) + 1
    dropped = 0
    for n in sorted(complete):
        if n in keep:
            continue
        fs.delete(Path(f"{hist}/v{n}"), True)
        dropped += 1
    for n in sorted(incomplete):
        if n < cutoff:
            fs.delete(Path(f"{hist}/v{n}"), True)
            fs.delete(Path(f"{hist}/v{n}.pending"), False)
    # archived deletion vectors (operators/deletes.py): a vector
    # materialized at version M is consulted only by reads of versions
    # BELOW M — once the readable floor reaches M, nothing can need it
    from config_driven_pyspark_spark.operators.deletes import (
        _dv_archive_root,
        _list_dv,
    )

    floor_after = (min(keep) - 1) if keep else max(
        0, int(doc.get("high_water", 0)), *complete, *incomplete
    )
    arch = _dv_archive_root(base)
    for e in _list_dv(spark, arch):
        if e["mat"] is not None and e["mat"] <= floor_after:
            fs.delete(Path(f"{arch}/{e['name']}"), True)
    return {"dropped": dropped, "kept": len(keep)}


def stage_enable_history(
    df, spec: dict, spark: SparkSession | None = None
):
    """``{"stage": "enable_history", "path": ...,
    "partition_by": [...]?}`` — source-like switch-on; the current
    snapshot becomes version 0 and every later mutating stage retains
    what it replaces. Passes the input frame through (or reads the
    table when it opens a pipeline)."""
    s = spark if spark is not None else df.sparkSession
    enable_table_history(
        s, spec["path"],
        list(spec["partition_by"]) if spec.get("partition_by") else None,
    )
    if df is None:
        return s.read.parquet(spec["path"].rstrip("/"))
    return df


def stage_time_travel(df, spec: dict, spark: SparkSession | None = None):
    """``{"stage": "time_travel", "path": ..., "version": W}`` or
    ``{..., "timestamp": epoch-seconds | ISO-8601}`` — source-like read
    of a retained version (``TIMESTAMP AS OF`` resolves to the highest
    version committed at or before the timestamp)."""
    s = spark if spark is not None else df.sparkSession
    has_v = spec.get("version") is not None
    has_t = spec.get("timestamp") is not None
    if has_v == has_t:
        raise ValueError(
            "time_travel needs exactly one of version / timestamp"
        )
    version = (
        int(spec["version"]) if has_v
        else resolve_timestamp_version(s, spec["path"], spec["timestamp"])
    )
    return read_table_version(s, spec["path"], version)


def stage_table_history(df, spec: dict, spark: SparkSession | None = None):
    """``{"stage": "table_history", "path": ...}``."""
    s = spark if spark is not None else df.sparkSession
    return table_history(s, spec["path"])


def stage_table_restore(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "table_restore", "path": ..., "version": W}`` or
    ``{..., "timestamp": ...}`` — restores, then (like merge/compact
    stages) returns the input frame so pipelines can chain; pass
    ``"return": "table"`` to read the restored snapshot instead."""
    stats = restore_table(
        df.sparkSession, spec["path"],
        int(spec["version"]) if spec.get("version") is not None else None,
        spec.get("timestamp"),
    )
    if spec.get("return") == "table":
        return df.sparkSession.read.parquet(spec["path"].rstrip("/"))
    _ = stats
    return df
