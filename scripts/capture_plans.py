#!/usr/bin/env python
"""Capture .explain('formatted') + a driver-action profile for declared
queries into plans/<tag>/<query>_<suffix>.txt (judge-auditable evidence
for optimization rounds).

Usage: python scripts/capture_plans.py <tag> <suffix> q1 q2 ...
e.g.   python scripts/capture_plans.py r15 before q_merge_dv q_stream_dv

The action profile wraps DataFrameWriter.parquet / DataFrame.count /
DataFrame.collect with a caller tag (engine file:line), so the committed
file records how many Spark actions each lifecycle query issues and
where — the quantity the swap/probe optimizations change, which the
final SELECT's physical plan cannot show.
"""
from __future__ import annotations

import io
import os
import sys
import time
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from config_driven_pyspark_spark import build_session  # noqa: E402

tag, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", tag,
)
os.makedirs(out_dir, exist_ok=True)

acc: dict[str, float] = {}
cnt: dict[str, int] = {}

try:
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pre-4.x layout
    from pyspark.sql import DataFrame
from pyspark.sql.readwriter import DataFrameWriter

_orig_parquet = DataFrameWriter.parquet
_orig_count = DataFrame.count
_orig_collect = DataFrame.collect


def _caller_tag() -> str:
    for fr in reversed(traceback.extract_stack(limit=30)):
        fn = fr.filename
        if "config_driven_pyspark_spark" in fn:
            rel = fn.split("config_driven_pyspark_spark/")[-1]
            return f"{rel}:{fr.lineno}:{fr.name}"
        if "__spark_entry__" in fn:
            return f"entry:{fr.lineno}:{fr.name}"
    return "other"


def _timed(orig, kind):
    def wrapped(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **k)
        finally:
            key = f"{kind} @ {_caller_tag()}"
            acc[key] = acc.get(key, 0.0) + (time.perf_counter() - t0)
            cnt[key] = cnt.get(key, 0) + 1
    return wrapped


DataFrameWriter.parquet = _timed(_orig_parquet, "write.parquet")
DataFrame.count = _timed(_orig_count, "count")
DataFrame.collect = _timed(_orig_collect, "collect")

spark = build_session(
    app_name=f"plans-{tag}-{suffix}",
    master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    confs={
        "spark.driver.memory": "32g",
        "spark.ui.enabled": "false",
        "spark.cdp.lock.wait_seconds": "120",
    },
)
spark.sparkContext.setLogLevel("ERROR")
queries = entry.queries()

for name in names:
    acc.clear()
    cnt.clear()
    t0 = time.perf_counter()
    df = queries[name](spark, sf_dir)
    build_s = time.perf_counter() - t0
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    act_s = time.perf_counter() - t1
    lines = [
        f"# {name} @ {os.path.basename(sf_dir)} — {suffix}",
        f"# build(df)={build_s:.2f}s  noop-action={act_s:.2f}s  "
        f"total={build_s + act_s:.2f}s",
        "",
        "## driver actions during build (engine call sites)",
    ]
    for key, dt in sorted(acc.items(), key=lambda kv: -kv[1]):
        lines.append(f"#   {dt:7.2f}s  x{cnt[key]:<3d} {key}")
    lines += ["", "## final DataFrame physical plan", "", buf.getvalue()]
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {path}", file=sys.stderr)
    spark.catalog.clearCache()

spark.stop()
