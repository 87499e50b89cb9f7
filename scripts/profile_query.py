#!/usr/bin/env python
"""cProfile a declared query's DRIVER side — attributes the wall-clock
that the action profile (scripts/capture_plans.py) cannot see: py4j FS
round-trips, streaming-engine machinery, plan building, lock/history
bookkeeping. Cumulative time per engine function tells where the
untracked seconds of a lifecycle query go (guide §1.1).

Usage: python scripts/profile_query.py <query> [sf_dir] [top_n]
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from config_driven_pyspark_spark import build_session  # noqa: E402

qname = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 60

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = build_session(
    app_name="profile-query",
    master=f"local[{cpus}]",
    shuffle_partitions=int(cpus),
    confs={
        "spark.driver.memory": "16g",
        "spark.ui.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
q = entry.queries()[qname]

# warm pass (codegen/JIT) at the smallest SF so the profile measures the
# steady-state driver cost, not one-time compilation
warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
if os.path.isdir(warm):
    q(spark, warm).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

prof = cProfile.Profile()
prof.enable()
q(spark, sf_dir).write.format("noop").mode("overwrite").save()
prof.disable()

buf = io.StringIO()
st = pstats.Stats(prof, stream=buf)
st.sort_stats("cumulative").print_stats(top_n)
out = buf.getvalue()
# drop the boilerplate preamble lines for readability
print(out)
try:
    spark.stop()
except Exception:
    pass
