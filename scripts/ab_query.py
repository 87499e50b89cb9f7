#!/usr/bin/env python
"""Interleaved A/B timing for one driver query across two checkouts.

Usage:
    python scripts/ab_query.py <query> <dir_a> <dir_b> [rounds] [timed_per_jvm]

Alternates FRESH JVMs between the two repo checkouts (A B A B ...), so
host drift contaminates both arms equally — the PLANS.md A/B convention
that separates code regressions from session/host noise.  Each JVM
warms the query once at sf0.001 (codegen cache) then times
``timed_per_jvm`` passes at $SPARK_GRAFT_SF_DIR (default sf0.1) with the
bench's noop sink + cache-clear isolation.  Prints per-JVM spreads and
the per-arm minima.  Run with NOTHING else on the host.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
repo = sys.argv[1]; qname = sys.argv[2]; timed = int(sys.argv[3])
os.chdir(repo); sys.path.insert(0, repo)
import __spark_entry__ as entry
from config_driven_pyspark_spark import build_session
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = build_session(
    app_name="ab-query", master=f"local[{cpus}]",
    shuffle_partitions=int(cpus),
    confs={"spark.driver.memory": os.environ.get(
        "SPARK_GRAFT_DRIVER_MEM", "32g"), "spark.ui.enabled": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
q = entry.queries()[qname]
if os.path.isdir(warm):
    q(spark, warm).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache(); spark._jvm.System.gc()
runs = []
for _ in range(timed):
    t = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t, 3))
    spark.catalog.clearCache(); spark._jvm.System.gc()
try:
    spark.stop()
except Exception:
    pass
print("ABRESULT " + json.dumps(runs), flush=True)
"""


def one_jvm(repo: str, query: str, timed: int) -> list[float]:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, query, str(timed)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"no ABRESULT from {repo}")


def main() -> None:
    query, dir_a, dir_b = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    timed = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    spreads: dict[str, list[list[float]]] = {"A": [], "B": []}
    for i in range(rounds):
        for arm, repo in (("A", dir_a), ("B", dir_b)):
            runs = one_jvm(repo, query, timed)
            spreads[arm].append(runs)
            print(f"round {i} arm {arm} ({repo}): {runs}", flush=True)
    mins = {
        arm: min(min(r) for r in spreads[arm]) for arm in ("A", "B")
    }
    print(json.dumps({
        "query": query, "a": dir_a, "b": dir_b,
        "spreads": spreads, "min_a": mins["A"], "min_b": mins["B"],
        "ratio_a_over_b": round(mins["A"] / mins["B"], 3),
    }, indent=1))


if __name__ == "__main__":
    main()
