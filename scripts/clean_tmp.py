"""Sweep stale ``cdp_*`` harness debris out of the tmp dir.

The bench and oracle harnesses build their scratch tables at FIXED
``$TMPDIR/cdp_*`` paths shared by every harness process. A SIGKILLed run
leaves orphaned state behind — most dangerously a writer-lock entry in a
``cdp_*__lock.d`` sibling that looks live for its full 900 s lease and
poisons the next run (the r14 BENCH crash: VERDICT r14 finding #1).
Per-row setup now resets its own three dirs (``_fresh_tmp`` in
``__spark_entry__.py``), and this sweeper is the belt to that suspender:
invoked at bench start (and usable standalone), it deletes every
``cdp_*`` entry whose newest mtime is older than the writer-lock lease —
nothing that old can belong to a live harness process, because live
writers heartbeat their lock entries every lease/3 seconds.

Usage::

    python scripts/clean_tmp.py            # sweep entries older than lease
    python scripts/clean_tmp.py --all      # sweep every cdp_* entry
    python scripts/clean_tmp.py --age 60   # custom age threshold (seconds)
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import tempfile
import time

# must match operators/table.py::_LOCK_LEASE_SECONDS — import avoided so
# the sweeper works without pyspark on the path
LEASE_SECONDS = 900


def _newest_mtime(path: str) -> float:
    """Newest mtime anywhere under ``path`` (the dir itself counts).

    A lock entry heartbeats by touching its own file, so the newest
    mtime under a live table's lock dir is always fresh; checking only
    the top-level dir would mis-age a table whose directory inode was
    created hours ago but is actively written."""
    newest = 0.0
    try:
        newest = os.lstat(path).st_mtime
    except OSError:
        return newest
    for root, dirs, files in os.walk(path):
        for name in files + dirs:
            try:
                ts = os.lstat(os.path.join(root, name)).st_mtime
            except OSError:
                continue
            if ts > newest:
                newest = ts
    return newest


def sweep(age_seconds: float = LEASE_SECONDS, tmp_dir: str | None = None,
          verbose: bool = True) -> list[str]:
    """Delete ``cdp_*`` entries under ``tmp_dir`` whose newest mtime is
    older than ``age_seconds``. Returns the paths removed."""
    tmp = tmp_dir or tempfile.gettempdir()
    now = time.time()
    removed: list[str] = []
    for path in sorted(glob.glob(os.path.join(tmp, "cdp_*"))):
        if now - _newest_mtime(path) <= age_seconds:
            continue
        if os.path.isdir(path) and not os.path.islink(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except OSError:
                pass
        removed.append(path)
        if verbose:
            print(f"swept {path}")
    return removed


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--all", action="store_true",
                    help="sweep every cdp_* entry regardless of age")
    ap.add_argument("--age", type=float, default=LEASE_SECONDS,
                    help=f"age threshold in seconds (default {LEASE_SECONDS})")
    args = ap.parse_args()
    removed = sweep(0.0 if args.all else args.age)
    print(f"{len(removed)} entries swept")


if __name__ == "__main__":
    main()
