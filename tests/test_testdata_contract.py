"""Schema contract for the driver-owned testdata.

Every query in ``__spark_entry__.py`` assumes these column names and types.
If the driver regenerates a parquet with a different encoding (as happened
between rounds 1 and 2, when ``events.ts`` flipped from physical INT64
nanos to logical TIMESTAMP_MICROS), this file fails loudly in ONE place
with a readable diff instead of 12 scattered analysis errors.

``events.ts`` is deliberately allowed to be *either* an integer (nanos era)
or a timestamp — ``_events_stages`` adapts at runtime; the contract only
pins that it stays within that pair.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyarrow.types as pat
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

EXPECTED = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [("n_nationkey", "int32"), ("n_name", "string"),
               ("n_regionkey", "int32")],
    "customer": [("c_custkey", "int64"), ("c_name", "string"),
                 ("c_nationkey", "int32"), ("c_acctbal", "double"),
                 ("c_mktsegment", "string")],
    "supplier": [("s_suppkey", "int64"), ("s_name", "string"),
                 ("s_nationkey", "int32"), ("s_acctbal", "double")],
    "part": [("p_partkey", "int64"), ("p_name", "string"),
             ("p_brand", "string"), ("p_type", "string"),
             ("p_size", "int32"), ("p_retailprice", "double")],
    "orders": [("o_orderkey", "int64"), ("o_custkey", "int64"),
               ("o_orderstatus", "string"), ("o_totalprice", "double"),
               ("o_orderdate", "timestamp[us]"),
               ("o_orderpriority", "string")],
    "lineitem": [("l_orderkey", "int64"), ("l_partkey", "int64"),
                 ("l_suppkey", "int64"), ("l_linenumber", "int32"),
                 ("l_quantity", "double"), ("l_extendedprice", "double"),
                 ("l_discount", "double"), ("l_tax", "double"),
                 ("l_returnflag", "string"), ("l_linestatus", "string"),
                 ("l_shipdate", "timestamp[us]")],
    "events": [("event_id", "int64"), ("ts", None),  # None = flexible, below
               ("user_id", "int64"), ("event_type", "string"),
               ("value", "double"), ("props", "string")],
    "documents": [("doc_id", "int64"), ("text", "string"),
                  ("lang", "string"), ("source", "string"),
                  ("n_chars", "int64")],
    "embeddings": [("vec_id", "int64"),
                   ("embedding", "list<element: float>"),
                   ("label", "int32")],
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_matches_contract(table):
    path = f"{SF_DIR}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"testdata missing: {path}")
    schema = pq.read_schema(path)
    actual = [(f.name, str(f.type)) for f in schema]
    expected = EXPECTED[table]
    assert [n for n, _ in actual] == [n for n, _ in expected], (
        f"{table}: column names drifted.\n  expected {expected}\n  actual   {actual}"
    )
    for (name, want), (_, got) in zip(expected, actual):
        if want is None:
            continue
        assert got == want, (
            f"{table}.{name}: type drifted: expected {want!r}, got {got!r}. "
            "Update the queries (and this contract) together."
        )


def test_events_ts_is_integer_or_timestamp():
    """The pair of encodings _events_stages knows how to load."""
    path = f"{SF_DIR}/events.parquet"
    if not os.path.exists(path):
        pytest.skip(f"testdata missing: {path}")
    ts = pq.read_schema(path).field("ts").type
    assert pat.is_integer(ts) or pat.is_timestamp(ts), (
        f"events.ts has encoding {ts!r}; _events_stages only adapts to "
        "INT64-nanos or TIMESTAMP — extend the loader before using it."
    )
