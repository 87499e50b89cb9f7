"""Temporal/interval join operators Spark lacks as built-ins.

Capability-gap operators (SURVEY.md §2C "joins" row): the reference has no
joins at all, and vanilla Spark expresses as-of and point-in-interval joins
only as inequality joins that plan as BroadcastNestedLoopJoin — O(n·m) and a
non-starter at 100 TB. Both operators here are re-expressed as single
equi-join/shuffle shapes over built-in DataFrame ops:

- ``asof_join``  — union both sides, one window pass per key carries the
  latest right-side payload forward onto each left row. One shuffle on the
  ``by`` keys + an in-partition sort; never materializes candidate pairs.
  (The merge-as-union-plus-window formulation is the standard distributed
  as-of technique, e.g. pandas ``merge_asof`` semantics on Spark.)
- ``range_join`` — bucket the point side by a fixed width, explode each
  interval into the buckets it covers, equi-join on (keys, bucket), then
  apply the exact bounds filter. Hash join O(|points| + |intervals|·spans)
  instead of a nested loop; each matching pair is produced exactly once
  because a point lives in exactly one bucket.
- ``streaming_asof_join`` — the streaming-capable as-of: a watermarked
  time-interval stream-stream join (state bounded by the mandatory
  ``tolerance``) followed by a time-window ``max_by`` reduction per left
  row. Runs identically on batch inputs, where it matches ``asof_join``
  with the same tolerance.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_logger = logging.getLogger(__name__)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_on: Optional[str] = None,
    direction: str = "backward",
    tolerance: Optional[str] = None,
    how: str = "left",
    right_prefix: str = "right_",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its ``on`` time, per ``by``
    key group. Inclusive on equality (ties: right row at the exact left
    time matches it).

    ``tolerance`` (an INTERVAL SQL string, e.g. ``"2 hours"``) drops
    matches farther than that from the left time. ``how``: ``left`` keeps
    unmatched left rows with nulls; ``inner`` drops them. Right payload
    columns are prefixed with ``right_prefix``; ``by`` keys keep one copy.

    Scale: one hash-shuffle of (left ∪ right) on ``by`` + per-key sort —
    the same cost as any keyed window; no pair blowup, no nested loop.
    Skewed keys are the caveat (same as any groupBy) — AQE skew handling
    applies to the shuffle.
    """
    if left.isStreaming or right.isStreaming:
        # honest contract rather than Spark's obscure analysis error: the
        # union+window formulation orders an unbounded-preceding window per
        # key, which Structured Streaming cannot execute (unbounded state,
        # non-time ordering). A streaming as-of needs a bounded lookback by
        # construction — express it as a watermarked time-interval
        # stream-stream join (tolerance becomes the interval bound), or use
        # the `stateful` stage (applyInPandasWithState) for exact last-value
        # semantics with explicit state eviction.
        raise NotImplementedError(
            "asof_join does not support streaming inputs: its union+window "
            "plan needs an unbounded ordered window. Use streaming_asof_join "
            "(bounded lookback via a watermarked time-interval join) or the "
            "'stateful' stage."
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_on = right_on or on
    by = list(by)
    if right_on in by:
        # the right payload struct excludes `by` keys, so the tolerance path
        # could not read the match time back — refuse up front with a clear
        # message instead of an unresolved-field analysis error later
        raise ValueError(
            f"asof_join right_on {right_on!r} cannot also be a `by` key; "
            "join on a separate time column"
        )
    if not by:
        _logger.warning(
            "asof_join with no `by` keys sorts ALL rows in one window "
            "partition — fine for small inputs, a single-task straggler at "
            "scale; supply partition keys for large data"
        )

    reserved = {"__t", "__r", "__side", "__m"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")
    payload_cols = [c for c in right.columns if c not in set(by)]
    out_clash = {f"{right_prefix}{c}" for c in payload_cols} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"asof_join output columns {sorted(out_clash)} collide with left "
            "columns; pick a different right_prefix"
        )
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__t"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__r"),
        F.lit(0).alias("__side"),
    )
    l = left.select(
        "*",
        F.col(on).alias("__t"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # backward: latest right at-or-before; right rows sort before left rows
    # at equal time so equality matches (inclusive). forward: mirror image.
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )

    if tolerance is not None:
        delta = (
            F.col("__t") - F.col(f"__m.{right_on}")
            if direction == "backward"
            else F.col(f"__m.{right_on}") - F.col("__t")
        )
        matched = matched.withColumn(
            "__m",
            F.when(delta <= F.expr(f"INTERVAL {tolerance}"), F.col("__m")),
        )

    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be left|inner, got {how!r}")

    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in payload_cols
    ]
    return matched.select(*out_cols)


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    tolerance: str,
    left_id: str,
    by: Sequence[str] = (),
    right_on: Optional[str] = None,
    left_watermark: str = "0 seconds",
    right_watermark: Optional[str] = None,
    window_step: str = "1 hour",
    how: str = "left",
    right_prefix: str = "right_",
    tie_break: Optional[str] = None,
) -> DataFrame:
    """Streaming-capable backward as-of join with a *mandatory* bounded
    lookback: each left row gets the latest right row in
    ``[left.on − tolerance, left.on]`` per ``by`` key.

    Unlike :func:`asof_join` (union + unbounded window — inexpressible in
    Structured Streaming), this lowers to the two stateful shapes streaming
    *does* support, chained: a watermarked time-interval stream-stream join
    (state bounded by ``tolerance``) followed by a time-window aggregation
    (``max_by`` picks the latest candidate per left row). ``left_id`` must
    uniquely identify left rows — it is the reduction key.

    The same code runs on batch inputs (watermarks are no-ops there), where
    it matches ``asof_join(direction="backward", tolerance=...)`` exactly —
    parity is pinned by tests. ``window_step`` is any bucket size; it only
    shapes the aggregation's group key (each left row falls in exactly one
    window, and ``left_id`` disambiguates within it), so correctness never
    depends on it. Pick it ≥ the typical watermark delay so streaming
    emits aren't needlessly fragmented.

    When several right rows share the winning timestamp, ``max_by`` picks
    one nondeterministically; pass ``tie_break`` (a right payload column,
    larger wins) to make the choice — and therefore the whole output —
    deterministic.

    ``left_id`` uniqueness is a *contract, not a validated precondition*:
    two left rows sharing (``left_id``, time-window bucket) are silently
    merged by the reduction — ``first`` picks one row's carry values and
    the other row disappears. Validating it would cost an extra stateful
    aggregation in streaming, so it is deliberately unchecked; ensure the
    id really is unique (or pre-dedup) before joining.

    Scale: join state holds only ``tolerance`` worth of right rows per key
    (watermark-evicted); the aggregation holds one open window per key.
    Both shuffle on the same ``by`` keys. No unbounded state anywhere.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    right_on = right_on or on
    by = list(by)
    if right_on in by:
        raise ValueError(
            f"streaming_asof_join right_on {right_on!r} cannot also be a "
            "`by` key; join on a separate time column"
        )
    if left_id not in left.columns:
        raise ValueError(f"left_id {left_id!r} is not a left column")

    by_aliases = [f"__rb{i}" for i in range(len(by))]
    reserved = {"__rt", "__r", "__m", "__w", *by_aliases}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"streaming_asof_join reserves column names {sorted(clash)}"
        )
    payload_cols = [c for c in right.columns if c not in set(by)]
    if tie_break is not None and tie_break not in payload_cols:
        raise ValueError(
            f"tie_break {tie_break!r} is not a right payload column "
            f"(available: {payload_cols})"
        )
    out_clash = {f"{right_prefix}{c}" for c in payload_cols} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"streaming_asof_join output columns {sorted(out_clash)} collide "
            "with left columns; pick a different right_prefix"
        )

    l = left.withWatermark(on, left_watermark)
    r = (
        right.withWatermark(right_on, right_watermark or left_watermark)
        .select(
            *[F.col(c).alias(a) for c, a in zip(by, by_aliases)],
            F.col(right_on).alias("__rt"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("__r"),
        )
    )

    # inclusive at the far edge (delta <= tolerance), matching asof_join
    cond = (F.col("__rt") <= F.col(on)) & (
        F.col("__rt") >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
    )
    for c, a in zip(by, by_aliases):
        cond = cond & (F.col(c) == F.col(a))
    joined = l.join(r, cond, "leftOuter" if how == "left" else "inner")

    group = [F.window(F.col(on), window_step).alias("__w"), F.col(left_id)]
    carry = [c for c in left.columns if c != left_id]
    # struct ordering is lexicographic by field, so (ts, tie_break) makes
    # equal-timestamp winners deterministic
    order_key = (
        F.struct(F.col("__rt"), F.col(f"__r.{tie_break}"))
        if tie_break is not None
        else F.col("__rt")
    )
    agg = [F.first(F.col(c)).alias(c) for c in carry] + [
        F.max_by(F.col("__r"), order_key).alias("__m")
    ]
    reduced = joined.groupBy(*group).agg(*agg)
    return reduced.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in payload_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lower: str,
    upper: str,
    by: Sequence[str] = (),
    bucket_width: float = 1.0,
    bounds: str = "[)",
) -> DataFrame:
    """Point-in-interval equi-ized join: left rows whose ``point`` falls in
    right's [``lower``, ``upper``) interval (``bounds`` picks ``"[)"``,
    ``"[]"``, ``"()"``, or ``"(]"``).

    ``bucket_width`` trades explode factor against join selectivity: each
    interval materializes (span/width + 1) bucket rows. Pick it near the
    median interval span so most intervals cover ≤ 2 buckets.

    Scale: plain hash equi-join on (``by``, bucket) — shuffles both sides
    once; never a BroadcastNestedLoopJoin. Exact bounds applied post-join.

    Streaming: because this lowers to a stateless explode + equi-join +
    filter, a streaming *point* side against a static interval side runs as
    a standard stream-static join with no extra state (parity pinned by
    ``tests/test_streaming.py``). Stream-stream use falls under Spark's
    watermark requirements for stateful joins — supply watermarks on both
    sides or Spark's analyzer will refuse it.
    """
    if bounds not in ("[)", "[]", "()", "(]"):
        raise ValueError(f"bounds must be one of [) [] () (], got {bounds!r}")
    by = list(by)
    w = float(bucket_width)

    reserved = {"__b", "__point", "__lo", "__hi"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"range_join reserves column names {sorted(clash)}")
    if point in right.columns or lower in left.columns or upper in left.columns:
        # shared names would make the post-join bounds filter ambiguous
        raise ValueError(
            "range_join requires point/lower/upper column names to be "
            "unique to their side; rename the clashing columns first"
        )

    lb = left.withColumn("__b", F.floor(F.col(point) / w))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lower) / w).cast("long"),
                F.floor(F.col(upper) / w).cast("long"),
            )
        ),
    )
    lo_ok = (
        F.col(point) >= F.col(lower) if bounds[0] == "[" else F.col(point) > F.col(lower)
    )
    hi_ok = (
        F.col(point) <= F.col(upper) if bounds[1] == "]" else F.col(point) < F.col(upper)
    )
    return lb.join(rb, on=by + ["__b"], how="inner").filter(lo_ok & hi_ok).drop("__b")


def stage_asof_join(left: DataFrame, right: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "asof_join", "right": name, "on": "ts", "by": [keys],
    "right_on": col?, "direction": "backward"|"forward", "tolerance":
    "2 hours"?, "how": "left"|"inner", "right_prefix": "right_"}``."""
    return asof_join(
        left,
        right,
        on=spec["on"],
        by=spec.get("by", ()),
        right_on=spec.get("right_on"),
        direction=spec.get("direction", "backward"),
        tolerance=spec.get("tolerance"),
        how=spec.get("how", "left"),
        right_prefix=spec.get("right_prefix", "right_"),
    )


def stage_streaming_asof_join(
    left: DataFrame, right: DataFrame, spec: dict
) -> DataFrame:
    """``{"stage": "streaming_asof_join", "right": name, "on": "ts",
    "tolerance": "2 hours", "left_id": col, "by": [keys]?, "right_on":
    col?, "left_watermark": "10 minutes"?, "right_watermark": ...?,
    "window_step": "1 hour"?, "how": "left"|"inner",
    "right_prefix": "right_", "tie_break": right col?}``.

    ``left_id`` must uniquely identify left rows: duplicates sharing a
    (left_id, window bucket) are silently merged by the reduction (see
    :func:`streaming_asof_join`). ``tie_break`` names a right payload
    column that deterministically breaks equal-timestamp ties (larger
    wins)."""
    return streaming_asof_join(
        left,
        right,
        on=spec["on"],
        tolerance=spec["tolerance"],
        left_id=spec["left_id"],
        by=spec.get("by", ()),
        right_on=spec.get("right_on"),
        left_watermark=spec.get("left_watermark", "0 seconds"),
        right_watermark=spec.get("right_watermark"),
        window_step=spec.get("window_step", "1 hour"),
        how=spec.get("how", "left"),
        right_prefix=spec.get("right_prefix", "right_"),
        tie_break=spec.get("tie_break"),
    )


def stage_range_join(left: DataFrame, right: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "range_join", "right": name, "point": col, "lower": col,
    "upper": col, "by": [keys]?, "bucket_width": num, "bounds": "[)"}``."""
    return range_join(
        left,
        right,
        point=spec["point"],
        lower=spec["lower"],
        upper=spec["upper"],
        by=spec.get("by", ()),
        bucket_width=spec.get("bucket_width", 1.0),
        bounds=spec.get("bounds", "[)"),
    )
