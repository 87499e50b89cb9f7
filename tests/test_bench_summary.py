"""Pin the bench stdout summary under the driver's tail-capture window.

The driver keeps the LAST 2,000 characters of bench.py's merged
stdout+stderr and parses the final line as JSON.  Rounds 6-8 all lost the
record (``parsed: null``) to lines that outgrew that window; the summary
is now a fixed-field JSON with no per-query map (spreads live only in the
committed ``bench_runs_latest.json``).  This test makes query-count growth
structurally unable to break the record again.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_summary_line_fits_tail_window():
    # worst plausible values: huge total, fractional sf, 5-digit query count
    line = bench.summary_line(999999.999, 0.001, 99999)
    assert len(line) < 1900, f"summary line {len(line)} chars >= 1900"
    parsed = json.loads(line)
    assert parsed["metric"] == "total_query_seconds"
    assert parsed["unit"] == "sec"
    assert set(parsed) == {"metric", "value", "unit", "sf", "n_queries"}


def test_summary_line_has_no_per_query_map():
    line = bench.summary_line(12.3, 0.1, len(bench.HEADLINE))
    assert "queries" not in json.loads(line)
    # even at 10x today's headline count the fixed-field line cannot grow
    assert len(line) < 200
