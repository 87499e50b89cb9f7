"""Data-quality expectations: CHECK-constraint enforcement over any
frame — report / fail / drop / quarantine.

Capability gap vs the reference (SURVEY.md §2C): production pipelines
gate ingests on declared invariants (Delta CHECK constraints, DLT
expectations, Great Expectations). The reference has no validation
surface; this module provides the four standard dispositions
engine-native, composable in front of any sink or merge stage:

- ``report``: one row per constraint with its violation count — one
  map-side-combinable aggregate pass, never a pass per constraint.
- ``fail``: same single pass; raise with every constraint's count if
  any violation exists (the CI / contract-test disposition).
- ``drop``: keep only rows satisfying every constraint — one filter,
  fully pushdown-eligible (Catalyst sees a plain AND of predicates).
- ``quarantine``: split the frame; invalid rows land in a parquet
  side-table with a ``_violations`` array naming each failed
  constraint (the DLT pattern — nothing is silently lost, the main
  flow stays clean), valid rows flow on. The side-table APPENDS by
  default so repeated runs / streaming micro-batches accumulate
  violators instead of clobbering the previous batch's
  (``quarantine_mode="overwrite"`` opts back into replace-per-run).

NULL semantics are strict like Delta's CHECK (and unlike bare SQL
CHECK): a constraint passes only when its expression IS TRUE — an
expression evaluating to NULL is a violation, because "unknown" is not
a quality guarantee.

``unique`` constraints (key-set uniqueness, e.g. ``[["id"],
["region", "name"]]``) are aggregate-level: they need a shuffle per
key set (count vs distinct count over a null-safe struct) and appear
in ``report``/``fail`` modes. They are NOT row-local, so ``drop``/
``quarantine`` reject them — which copy of a duplicate is "the bad
row" is a dedup policy question (``operators/dedup.py``), not a
row-level constraint.

Scale: ``report``/``fail`` cost one aggregate job for ALL row-local
constraints plus one map-side-combining groupBy per unique key set —
split jobs, because several DISTINCTs in one aggregate make Catalyst
Expand the input one replica per distinct group (A/B at 10× rows:
2.15× slower); ``drop`` folds into the scan; ``quarantine`` evaluates
the constraint expressions once per branch over the same source scan
(two passes — kept deliberately: persisting a 100 TB frame to split
it would cost more than the second scan; put a filter upstream if the
quarantine rate is high). No collects beyond the one-row report."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _violation(expr: str):
    # strict CHECK: pass only when IS TRUE; NULL is a violation
    return ~F.coalesce(F.expr(expr), F.lit(False))


def expectation_report(
    df: DataFrame,
    constraints: dict[str, str],
    unique: list[list[str]] | None = None,
) -> DataFrame:
    """``(constraint, n_violations, n_rows)`` per declared constraint.
    Row-local constraints share ONE aggregate pass; each ``unique``
    key set adds ``unique(<cols>)`` with the duplicate-row surplus
    (count minus distinct count — 0 means unique)."""
    if not constraints and not unique:
        raise ValueError("expectation_report needs constraints or unique")
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = list(constraints or {})
    for name, expr in (constraints or {}).items():
        aggs.append(
            F.sum(_violation(expr).cast("long")).alias(f"__v_{name}")
        )
    row = df.agg(*aggs).collect()[0]
    n = int(row["__n"])
    out = [(name, int(row[f"__v_{name}"]), n) for name in names]
    for cols in unique or []:
        # one partial-aggregating groupBy per key set, NOT count_distinct
        # inside the shared agg: several DISTINCTs in one aggregate make
        # Catalyst Expand the input (one replica per distinct group —
        # A/B at sf1: 2.15× slower than split jobs). groupBy+count
        # map-side combines to one row per key before the wire; NULL
        # keys form a legitimate (single) group, which grouping gives
        # for free
        surplus = (
            df.groupBy(*[F.col(c) for c in cols])
            .count()
            .agg((F.sum("count") - F.count(F.lit(1))).alias("s"))
            .collect()[0]["s"]
        )
        out.append(
            (f"unique({', '.join(cols)})", int(surplus or 0), n)
        )
    return spark.createDataFrame(
        out, "constraint string, n_violations bigint, n_rows bigint"
    )


def enforce_expectations(
    df: DataFrame,
    constraints: dict[str, str],
    mode: str = "fail",
    quarantine_path: str | None = None,
    unique: list[list[str]] | None = None,
    tolerance: float = 0.0,
    quarantine_mode: str = "append",
) -> DataFrame:
    """Apply ``constraints`` with the chosen disposition; returns the
    surviving frame (``report`` returns the report instead).
    ``tolerance`` (``fail`` mode only) is the per-constraint violation
    FRACTION the gate absorbs before raising — the DLT
    expect-with-threshold shape for noisy feeds where a handful of bad
    rows is expected but a broken upstream (violations spiking past
    the threshold) must stop the pipeline. ``quarantine_mode`` is the
    side-table write mode: ``"append"`` (default — successive runs and
    streaming micro-batches accumulate, honoring the nothing-is-
    silently-lost contract) or ``"overwrite"`` (replace per run)."""
    if mode not in ("report", "fail", "drop", "quarantine"):
        raise ValueError(
            "mode must be 'report', 'fail', 'drop' or 'quarantine'"
        )
    if quarantine_mode not in ("append", "overwrite"):
        raise ValueError(
            "quarantine_mode must be 'append' or 'overwrite'"
        )
    if not (0.0 <= tolerance < 1.0):
        raise ValueError("tolerance must be in [0, 1)")
    if tolerance and mode != "fail":
        raise ValueError(
            "tolerance only applies to mode='fail' — drop/quarantine "
            "already dispose of every violator, and report just counts"
        )
    if mode in ("drop", "quarantine"):
        if unique:
            raise ValueError(
                "unique constraints are aggregate-level — which copy of "
                "a duplicate to keep is a dedup policy (operators/"
                "dedup.py); use mode='report'/'fail' for uniqueness"
            )
        if not constraints:
            raise ValueError(f"mode={mode!r} needs constraints")
    if mode == "report":
        return expectation_report(df, constraints, unique)
    if mode == "fail":
        rep = expectation_report(df, constraints, unique).collect()
        n = rep[0]["n_rows"] if rep else 0
        bad = {
            r["constraint"]: r["n_violations"]
            for r in rep
            if r["n_violations"] > tolerance * max(n, 1)
        }
        if bad:
            raise ValueError(
                f"expectations failed on {n} rows"
                + (f" (tolerance {tolerance:g})" if tolerance else "")
                + ": "
                + ", ".join(f"{k}: {v} violations"
                            for k, v in sorted(bad.items()))
            )
        return df
    ok = None
    for expr in constraints.values():
        cond = F.expr(expr)
        ok = cond if ok is None else ok & cond
    if mode == "drop":
        return df.filter(ok)
    if quarantine_path is None:
        raise ValueError("mode='quarantine' needs quarantine_path")
    tags = F.array_compact(
        F.array(
            *[
                F.when(_violation(expr), F.lit(name))
                for name, expr in constraints.items()
            ]
        )
    )
    invalid = df.withColumn("_violations", tags).filter(
        F.size("_violations") > 0
    )
    invalid.write.mode(quarantine_mode).parquet(quarantine_path)
    return df.filter(ok)


def stage_expect(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "expect", "constraints": {name: sql_bool, ...},
    "mode": "fail"|"drop"|"quarantine"|"report",
    "quarantine_path": ...?, "quarantine_mode": "append"|"overwrite"?,
    "unique": [[col, ...], ...]?}`` — the validation gate to put in
    front of a ``sink``/``merge`` stage."""
    return enforce_expectations(
        df,
        dict(spec.get("constraints") or {}),
        mode=spec.get("mode", "fail"),
        quarantine_path=spec.get("quarantine_path"),
        unique=[list(u) for u in spec["unique"]]
        if spec.get("unique")
        else None,
        tolerance=float(spec.get("tolerance", 0.0)),
        quarantine_mode=spec.get("quarantine_mode", "append"),
    )
