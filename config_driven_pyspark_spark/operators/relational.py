"""Relational pipeline stages — thin declarative lowerings onto DataFrame ops.

The reference implements none of these (SURVEY.md §2C: caller-supplied
DataFrames only); they are required capabilities of the new engine. Every
stage is expressed with built-in DataFrame/Column API so Catalyst gets full
visibility: filters reach the parquet scan as pushed predicates, projections
prune columns at the reader, joins are reorderable, and AQE can re-plan
shuffles at runtime. No stage ever collects to the driver.

Scale notes are attached per stage where the 100 TB plan shape matters.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_logger = logging.getLogger(__name__)


def parse_sort_key(spec: Any) -> Column:
    """Parse a sort key: ``"col"``, ``"col desc"``, ``"expr asc nulls last"``,
    or ``{"expr": ..., "desc": bool}``."""
    if isinstance(spec, dict):
        col = F.expr(spec["expr"])
        return col.desc() if spec.get("desc") else col.asc()
    text = str(spec).strip()
    lowered = text.lower()
    nulls: Optional[str] = None
    for suffix, kind in ((" nulls first", "first"), (" nulls last", "last")):
        if lowered.endswith(suffix):
            nulls = kind
            text, lowered = text[: -len(suffix)], lowered[: -len(suffix)]
    desc = False
    if lowered.endswith(" desc"):
        desc, text = True, text[:-5]
    elif lowered.endswith(" asc"):
        text = text[:-4]
    col = F.expr(text.strip())
    if desc:
        return col.desc_nulls_first() if nulls == "first" else (
            col.desc_nulls_last() if nulls == "last" else col.desc()
        )
    return col.asc_nulls_first() if nulls == "first" else (
        col.asc_nulls_last() if nulls == "last" else col.asc()
    )


def stage_filter(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "filter", "predicate": "<sql>"}`` → ``df.filter``.

    Declarative SQL predicate so Catalyst pushes it into the scan
    (``PushedFilters`` in ``.explain``) and prunes partitions.
    """
    return df.filter(F.expr(spec["predicate"]))


def stage_select(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "select", "columns": ["expr AS alias" | {expr, alias}]}``."""
    cols = []
    for c in spec["columns"]:
        if isinstance(c, dict):
            col = F.expr(c["expr"])
            cols.append(col.alias(c["alias"]) if "alias" in c else col)
        else:
            cols.append(F.expr(c))
    return df.select(*cols)


def stage_with_columns(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "with_columns", "columns": {alias: "<sql expr>"}}`` — one
    ``withColumns`` call (single Project, not a withColumn loop)."""
    return df.withColumns({a: F.expr(e) for a, e in spec["columns"].items()})


def stage_drop(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "drop", "columns": [...]}`` — plain column drops, or
    nested struct-field drops for dotted paths (``a.b.c`` case-insensitive,
    array/map levels implicit — see ``transform.drop_nested``)."""
    if any("." in c for c in spec["columns"]):
        from config_driven_pyspark_spark.operators.transform import drop_nested

        return drop_nested(df, spec["columns"])
    return df.drop(*spec["columns"])


def stage_rename(df: DataFrame, spec: dict) -> DataFrame:
    return df.withColumnsRenamed(spec["columns"])


def salted_join(
    df: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with manual key salting for skewed hot keys.

    Left rows get a uniform random salt in [0, salt); the right side is
    replicated once per salt value; the join runs on (keys..., salt). A hot
    left key's rows thus spread over ``salt`` shuffle partitions instead of
    one straggler. Results are identical to the unsalted join (pinned by
    test) — salting only changes data placement.

    Scale: use when one side has pathological key skew AND AQE's automatic
    skew-join splitting doesn't apply (e.g. broadcast-ineligible
    shuffled-hash joins, or skew concentrated in a single key). Cost: the
    right side is shuffled ``salt``× — keep the replicated side the smaller
    one.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted join supports inner|left, got {how!r}")
    salted_left = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return (
        salted_left.join(salted_right, on=list(on) + ["__salt"], how=how)
        .drop("__salt")
    )


def stage_join(
    df: DataFrame,
    right: DataFrame,
    spec: dict,
    left_stats: dict | None = None,
    right_stats: dict | None = None,
) -> DataFrame:
    """``{"stage": "join", "right": name, "on": expr|[cols], "how": ...,
    "broadcast": bool, "salt": int?, "auto": bool?,
    "broadcast_max_rows": N?, "skew_threshold": X?}``.

    Scale: dimension tables (region/nation/customer-sized relative to facts)
    should set ``broadcast: true`` — a broadcast-hash join removes the
    fact-side shuffle entirely. Large-large joins shuffle on the key; AQE
    converts to broadcast at runtime if a side turns out small, and splits
    skewed partitions (skew-join handling) when enabled. ``salt: N`` opts
    into manual key salting (see :func:`salted_join`) for skew AQE can't
    fix.

    ``auto: true`` (r13 — VERDICT r12 ask #8) consults the persisted
    planner stats of the two sides (written by ANALYZE with
    ``save: true`` — :func:`~.stats.save_table_stats`; the Pipeline
    resolves each side's table path when the frame is a direct source
    read) and picks broadcast / salt / plain via
    :func:`~.stats.plan_join_strategy`. Explicit ``broadcast``/``salt``
    always win; ABSENT stats leave the plan exactly as before."""
    on = spec.get("on")
    if (
        spec.get("auto")
        and not spec.get("salt")
        and not spec.get("broadcast")
    ):
        from config_driven_pyspark_spark.operators.stats import (
            plan_join_strategy,
        )

        decision = plan_join_strategy(
            left_stats,
            right_stats,
            keys=on if isinstance(on, list) else None,
            how=spec.get("how", "inner"),
            broadcast_max_rows=int(
                spec.get("broadcast_max_rows", 1_000_000)
            ),
            skew_threshold=float(spec.get("skew_threshold", 16.0)),
        )
        if decision:
            spec = {**spec, **decision}
    if spec.get("salt"):
        if spec.get("broadcast"):
            raise ValueError(
                "broadcast and salt are contradictory: a broadcast join has "
                "no shuffle to skew — drop one of the two"
            )
        if not isinstance(on, list):
            raise ValueError("salted join requires a column-list `on`")
        return salted_join(df, right, on, spec.get("how", "inner"),
                           int(spec["salt"]))
    if spec.get("broadcast"):
        right = F.broadcast(right)
    if isinstance(on, str):
        on = F.expr(on)
    return df.join(right, on=on, how=spec.get("how", "inner"))


def stage_aggregate(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "aggregate", "group_by": [...], "aggs": {alias: expr},
    "grouping": "none"|"rollup"|"cube"|"sets", "sets": [[cols], ...],
    "having": "<predicate over aliases>"?}``.

    ``grouping: sets`` aggregates at exactly the listed key combinations
    (``sets`` entries must be subsets of ``group_by``; ``[]`` is the grand
    total) — the generalization rollup/cube are shorthands for.

    ``having`` filters on the aggregated output (aliases are in scope) —
    Catalyst evaluates it post-aggregation, so at scale it prunes groups
    before any downstream join materializes them.

    Scale: hash aggregation with map-side partial aggregation is automatic
    for algebraic aggregates expressed via SQL exprs; the shuffle moves only
    partial states, not rows. High-cardinality group keys should raise
    ``spark.sql.shuffle.partitions`` (or rely on AQE coalescing).
    """
    keys = [F.expr(k) for k in spec.get("group_by", [])]
    aggs = [F.expr(e).alias(a) for a, e in spec["aggs"].items()]
    grouping = spec.get("grouping", "none")
    if grouping == "rollup":
        grouped = df.rollup(*keys)
    elif grouping == "cube":
        grouped = df.cube(*keys)
    elif grouping == "sets":
        sets = [[F.expr(c) for c in s] for s in spec["sets"]]
        grouped = df.groupingSets(sets, *keys)
    elif keys:
        grouped = df.groupBy(*keys)
    else:
        grouped = None
    out = df.agg(*aggs) if grouped is None else grouped.agg(*aggs)
    if "having" in spec:
        out = out.filter(F.expr(spec["having"]))
    return out


def stage_pivot(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "pivot", "group_by": [...], "pivot": col,
    "values": [...], "aggs": {alias: expr}}``.

    ``values`` is required: naming the pivot values up front keeps the
    output schema static AND skips Spark's extra distinct-values job over
    the full input (an unbounded scan at 100 TB). One agg → plain value
    column names; multiple aggs → ``value_alias`` columns (Spark
    convention).
    """
    keys = [F.expr(k) for k in spec.get("group_by", [])]
    aggs = [F.expr(e).alias(a) for a, e in spec["aggs"].items()]
    return (
        df.groupBy(*keys)
        .pivot(spec["pivot"], spec["values"])
        .agg(*aggs)
    )


def stage_unpivot(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "unpivot", "ids": [cols], "values": [cols],
    "var_name": "metric"?, "value_name": "value"?}`` — wide→long melt via
    ``DataFrame.unpivot``: one output row per (row, value column).

    Scale: plans as a Generate (same as explode) — map-only row expansion,
    no shuffle; value columns are cast to their common type by Spark, so
    mixing incompatible types errors at analysis, not mid-job.
    """
    return df.unpivot(
        [F.col(c) for c in spec["ids"]],
        [F.col(c) for c in spec["values"]],
        spec.get("var_name", "metric"),
        spec.get("value_name", "value"),
    )


def stage_explode(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "explode", "column": "<array expr>", "alias": name,
    "keep": [cols]?, "outer": bool}`` — one output row per array element
    (``outer: true`` keeps rows with empty/null arrays, element null).
    """
    gen = F.explode_outer if spec.get("outer") else F.explode
    exploded = gen(F.expr(spec["column"])).alias(spec.get("alias", "value"))
    keep = spec.get("keep")
    cols = ([F.col(c) for c in keep] if keep is not None else [F.col("*")])
    return df.select(*cols, exploded)


def stage_window(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "window", "partition_by": [...], "order_by": [...],
    "frame": "rows between ...", "columns": {alias: "<window fn expr>"}}``.

    Lowered to SQL ``OVER`` clauses inside one Project, so all window columns
    sharing the spec share a single shuffle+sort.
    """
    over_parts = []
    if spec.get("partition_by"):
        over_parts.append("PARTITION BY " + ", ".join(spec["partition_by"]))
    if spec.get("order_by"):
        over_parts.append("ORDER BY " + ", ".join(spec["order_by"]))
    if spec.get("frame"):
        over_parts.append(spec["frame"])
    over = " OVER (" + " ".join(over_parts) + ")"
    return df.withColumns(
        {alias: F.expr(expr + over) for alias, expr in spec["columns"].items()}
    )


def stage_gap_fill(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "gap_fill", "time_col": col, "step": "1 hour",
    "group_by": [keys]?, "fill": {col: literal}?}`` — densify a (possibly
    grouped) time series: one row per group per ``step`` between the
    global min and max of ``time_col``, with ``fill`` defaults (else null)
    where no input row exists. Feed it aggregated series, then window
    stages compute correct moving statistics over the dense grid.

    Input rows whose time is not exactly on the generated grid (lo +
    k·step) are PRESERVED as extra rows via the full-outer fill join —
    never silently dropped — so a mis-matched ``step`` surfaces as
    off-grid rows downstream instead of vanishing data. Truncate/bucket
    times upstream (e.g. ``date_trunc``) so the series is on-grid.

    Scale: the bounds aggregate is a tiny all-reduce whose 1-row result
    broadcasts into the grid generator; the grid itself is |groups| ×
    |steps| — exactly the output size, inherent to densification — built
    by a broadcast nested-loop of two small sides, never by expanding the
    input; the final fill is one equi-join on (keys, time).
    """
    tc = spec["time_col"]
    keys = list(spec.get("group_by", []))
    step = spec.get("step", "1 hour")
    bounds = df.agg(F.min(tc).alias("__lo"), F.max(tc).alias("__hi"))
    steps = bounds.select(
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"interval {step}"))
        ).alias(tc)
    )
    grid = df.select(*keys).distinct().crossJoin(steps) if keys else steps
    out = grid.join(df, on=keys + [tc], how="full")
    for col, val in (spec.get("fill") or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(val)))
    return out


def stage_fill_forward(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "fill_forward", "columns": [cols], "order_by": [...],
    "partition_by": [...]?}`` — last-observation-carried-forward: each null
    takes the most recent non-null value in order (per partition). The
    classic companion to ``gap_fill`` for sensor/price series.

    Scale: one window per spec (all columns share the single shuffle+sort);
    ``last(ignorenulls)`` over an unbounded-preceding rows frame is a
    running state of one value per column — no second pass, no self-join.
    Leading nulls (no prior observation) stay null. Without
    ``partition_by`` the window is global — a single sorted task, fine for
    aggregated series, wrong for raw 100 TB input.
    """
    if not spec.get("partition_by"):
        _logger.warning(
            "fill_forward with no `partition_by` sorts ALL rows in one "
            "window partition — fine for aggregated series, a single-task "
            "straggler at scale; supply partition keys for large data"
        )
    w = (
        Window.partitionBy(*spec.get("partition_by", []))
        .orderBy(*[parse_sort_key(k) for k in spec["order_by"]])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in spec["columns"]}
    )


def stage_interpolate(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "interpolate", "columns": [cols], "time_col": t,
    "partition_by": [...]?}`` — linear interpolation of nulls between the
    surrounding observations: each null gets
    ``prev + (next − prev) · (t − t_prev)/(t_next − t_prev)``; leading and
    trailing nulls (no observation on one side) stay null. The numeric
    companion to ``fill_forward`` for gap-filled sensor/price series.

    Scale: two windows over the same partitioning+sort — a running "last
    observed (value, time)" backward and a "next observed" forward — so
    the whole stage is one shuffle+sort with O(1) state per row; no
    self-join, no second pass.
    """
    tc = spec["time_col"]
    order = [parse_sort_key(k) for k in [tc]]
    part = spec.get("partition_by", [])
    if not part:
        _logger.warning(
            "interpolate with no `partition_by` sorts ALL rows in one "
            "window partition — fine for aggregated series, a single-task "
            "straggler at scale; supply partition keys for large data"
        )
    w_back = (
        Window.partitionBy(*part).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*part).orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_num = F.col(tc).cast("double")
    out = df
    for c in spec["columns"]:
        obs_t = F.when(F.col(c).isNotNull(), t_num)
        prev_v = F.last(c, ignorenulls=True).over(w_back)
        prev_t = F.last(obs_t, ignorenulls=True).over(w_back)
        next_v = F.first(c, ignorenulls=True).over(w_fwd)
        next_t = F.first(obs_t, ignorenulls=True).over(w_fwd)
        frac = (t_num - prev_t) / (next_t - prev_t)
        out = out.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                prev_v + (next_v - prev_v) * frac
            ),
        )
    return out


def stage_sort(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "sort", "by": [...], "limit": n?}``.

    Scale: a global sort is a range-partitioned shuffle (sampled bounds).
    With ``limit``, Spark plans ``TakeOrderedAndProject`` — per-partition
    top-N then a driver merge of N×partitions rows — so top-k never
    globally sorts 100 TB.
    """
    out = df.orderBy(*[parse_sort_key(k) for k in spec["by"]])
    if "limit" in spec:
        out = out.limit(int(spec["limit"]))
    return out


def stage_limit(df: DataFrame, spec: dict) -> DataFrame:
    return df.limit(int(spec["n"]))


def stage_distinct(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "distinct", "subset": [cols]?}`` → ``dropDuplicates``."""
    subset = spec.get("subset")
    return df.dropDuplicates(subset) if subset else df.distinct()


def stage_set_op(df: DataFrame, other: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "union"|"intersect"|"except", "other": name,
    "distinct": bool, "by_name": bool}``."""
    kind = spec["stage"]
    if kind == "union":
        out = df.unionByName(other) if spec.get("by_name") else df.union(other)
        return out.distinct() if spec.get("distinct") else out
    if kind == "intersect":
        return df.intersect(other) if spec.get("distinct", True) else df.intersectAll(other)
    if kind == "except":
        return df.exceptAll(other) if not spec.get("distinct") else df.subtract(other)
    raise ValueError(f"Unknown set op {kind}")


def stage_sample(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "sample", "fraction": 0.1, "seed": 42, "replacement":
    false}`` — per-partition Bernoulli (or Poisson) sampling; row counts are
    approximate (binomial around fraction·n) and depend on partitioning, so
    samples have no value-level oracle by design.
    """
    return df.sample(
        withReplacement=bool(spec.get("replacement", False)),
        fraction=float(spec["fraction"]),
        seed=int(spec.get("seed", 42)),
    )


def stage_persist(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "persist", "level": "MEMORY_AND_DISK"}`` — cache an
    intermediate consumed by multiple later stages (e.g. a frame used on
    both sides of a self-join) so it is computed once.

    Scale: prefer MEMORY_AND_DISK(_SER); pure MEMORY evicts under pressure
    and recomputes. Don't persist frames consumed once — the cache write
    costs more than it saves.
    """
    from pyspark import StorageLevel

    level_name = spec.get("level", "MEMORY_AND_DISK")
    level = getattr(StorageLevel, level_name, None)
    if level is None:
        raise ValueError(f"Unknown storage level {level_name!r}")
    return df.persist(level)


def stage_repartition(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "repartition", "n": int?, "by": [cols]?, "coalesce": bool}``.

    Explicit partition control for co-locating a downstream join/agg or
    sizing output files; ``coalesce`` narrows without a shuffle.
    """
    if spec.get("coalesce"):
        return df.coalesce(int(spec["n"]))
    cols = [F.expr(c) for c in spec.get("by", [])]
    if "n" in spec and cols:
        return df.repartition(int(spec["n"]), *cols)
    if cols:
        return df.repartition(*cols)
    return df.repartition(int(spec["n"]))


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via ``row_number`` window + filter.

    Scale: one shuffle on the partition keys; within-partition sort only.
    """
    over = (
        "PARTITION BY " + ", ".join(partition_by) + " ORDER BY " + ", ".join(order_by)
    )
    out = df.withColumn(rank_col, F.expr(f"row_number() OVER ({over})")).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def skew_report(df: DataFrame, keys: list[str], k: int = 20) -> DataFrame:
    """Heavy-hitter skew diagnostic — the report to run BEFORE picking a
    salt factor for a skewed join or aggregation: for the top-``k`` key
    groups by row count, emit (keys..., n, rank, share, skew_x) where
    ``share = n/total_rows`` and ``skew_x = n / (total/n_keys)`` — how
    many times hotter than the average key this key runs. A skew_x of
    40 on the top key says a plain hash partition on this key leaves
    one task 40× the median; salt by ~that factor (see the salted-join
    stage) or let AQE split it.

    Determinism: ties rank by the key columns; ratios are 9-decimal
    rounded exact integer quotients — bit-replicable by an external
    oracle.

    Scale: one map-side-combinable groupBy(keys) builds the count
    table; the top-k is ``orderBy(n desc).limit(k)`` — planned as
    TakeOrderedAndProject, never a full sort — and totals are one
    aggregate of the count table broadcast back to the k winners.  The
    count table's lineage is evaluated twice (top-k + totals); persist
    it upstream if the key cardinality is corpus-scale and the input
    scan is expensive."""
    if not keys:
        raise ValueError("skew_report needs at least one key column")
    if k <= 0:
        raise ValueError("k must be positive")
    counts = df.groupBy(*keys).agg(F.count("*").cast("bigint").alias("n"))
    stats = counts.agg(
        F.sum("n").cast("bigint").alias("__total"),
        F.count("*").cast("bigint").alias("__n_keys"),
    )
    top = counts.orderBy(F.desc("n"), *keys).limit(int(k))
    ranked = (
        top.crossJoin(F.broadcast(stats))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("n"), *[F.col(c) for c in keys])
            ),
        )
        .withColumn(
            "share",
            F.round(F.col("n").cast("double") / F.col("__total"), 9),
        )
        .withColumn(
            "skew_x",
            F.round(
                F.col("n").cast("double")
                / (F.col("__total").cast("double") / F.col("__n_keys")),
                9,
            ),
        )
    )
    return ranked.select(*keys, "n", "rank", "share", "skew_x")
