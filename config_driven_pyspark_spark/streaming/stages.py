"""Streaming pipeline stages over Structured Streaming.

The reference is batch-only (``apply(df)`` over a static DataFrame —
``/root/reference/src/config_driven_pyspark/functioniser.py:58``); streaming
is a capability gap the new engine fills (SURVEY.md §2C). Design rule:
**every stage here is batch/stream symmetric** — ``window()``,
``session_window()``, and aggregations behave identically on a static
DataFrame and on a stream, so one pipeline config can be smoke-tested in
batch and deployed streaming (parity pinned by
``tests/test_streaming.py``). Only watermarks, ``stream_dedup``'s
within-watermark variant, the ``stateful`` stage, and sinks are
streaming-specific, and each falls back to its exact batch twin when the
input is not streaming.

Scale notes: windowed aggregations keep state per (key, window) in the state
store — the watermark bounds state size, so always set one upstream of a
windowed agg on an unbounded stream. ``dropDuplicatesWithinWatermark`` keeps
only in-horizon keys. Shuffle partition count fixes state-store partition
count at first checkpoint — size ``spark.sql.shuffle.partitions`` for the
target throughput *before* the first run.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stage_watermark(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "watermark", "column": "ts", "delay": "10 minutes"}``.

    Declares event-time lateness tolerance; bounds windowed-agg /
    stream-dedup state. No-op semantics on batch inputs (Spark ignores
    watermarks in batch queries), so the stage is safe in shared configs.
    """
    return df.withWatermark(spec["column"], spec["delay"])


def _flatten_window(df: DataFrame, window_col: str = "window") -> DataFrame:
    """Replace the ``window`` struct with sortable ``window_start`` /
    ``window_end`` columns (stable, oracle-friendly schema)."""
    others = [c for c in df.columns if c != window_col]
    return df.select(
        F.col(f"{window_col}.start").alias("window_start"),
        F.col(f"{window_col}.end").alias("window_end"),
        *others,
    )


def _agg_exprs(aggs: dict[str, str]) -> list[Column]:
    return [F.expr(expr).alias(alias) for alias, expr in aggs.items()]


def stage_time_window(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "time_window", "column": "ts", "duration": "1 hour",
    "slide": "15 minutes"?, "group_by": [keys]?, "aggs": {alias: expr},
    "flatten": true?}``.

    Tumbling (no ``slide``) or sliding event-time windows; identical
    semantics batch and streaming. Scale: one shuffle on
    (window, *group_by); sliding windows multiply state/output by
    duration/slide — prefer tumbling + downstream rollup when possible.
    """
    col = spec.get("column", "ts")
    if spec.get("slide"):
        win = F.window(col, spec["duration"], spec["slide"])
    else:
        win = F.window(col, spec["duration"])
    keys = [F.col(k) for k in spec.get("group_by", [])]
    out = df.groupBy(win.alias("window"), *keys).agg(*_agg_exprs(spec["aggs"]))
    return _flatten_window(out) if spec.get("flatten", True) else out


def stage_session_window(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "session_window", "column": "ts", "gap": "30 minutes",
    "group_by": [keys], "aggs": {alias: expr}, "flatten": true?}``.

    Sessionization: windows extend while consecutive events per key arrive
    within ``gap``; window end = last event + gap. Batch/stream symmetric
    (``F.session_window`` merges partial sessions in both modes). Scale:
    state per open session; the watermark closes sessions and evicts state.
    """
    win = F.session_window(spec.get("column", "ts"), spec["gap"])
    keys = [F.col(k) for k in spec.get("group_by", [])]
    out = df.groupBy(win.alias("window"), *keys).agg(*_agg_exprs(spec["aggs"]))
    return _flatten_window(out) if spec.get("flatten", True) else out


def stage_stream_dedup(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "stream_dedup", "subset": [cols], "within_watermark":
    true?}``.

    Streaming exact dedup. With ``within_watermark`` (and a watermark set
    upstream) uses ``dropDuplicatesWithinWatermark`` so state is evicted at
    the horizon — the only sane shape for unbounded streams. On a batch
    input both variants are plain ``dropDuplicates`` (exact twin).
    """
    subset = spec.get("subset")
    if df.isStreaming and spec.get("within_watermark"):
        return (
            df.dropDuplicatesWithinWatermark(subset)
            if subset
            else df.dropDuplicatesWithinWatermark()
        )
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------


def _running_totals(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key running (count, sum) via ``applyInPandasWithState``.

    The Arrow-batched stateful path for semantics windowed aggs can't
    express (cross-batch cumulative totals emitted every trigger). State is
    two floats per key — O(distinct keys) total, hash-partitioned across
    the cluster like any keyed state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_fields = ", ".join(f"{k} string" for k in keys)
    out_schema = f"{key_fields}, n bigint, total double"

    def update(key: tuple, pdfs: Iterable, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [{**dict(zip(keys, key)), "n": n, "total": total}]
        )

    cast = df.withColumns({k: F.col(k).cast("string") for k in keys})
    return cast.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stage_stateful(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "stateful", "method": "running_totals", "keys": [...],
    "value": "value", "emit": "final"|"per_event", "order_by": [...]}``.

    On a batch input, ``emit="final"`` (default) falls back to the
    equivalent terminal aggregate (``groupBy(keys).agg(count, sum)``) —
    after the final trigger the streaming running totals converge to
    exactly that result, which is the batch/stream parity contract the
    tests pin. ``emit="per_event"`` is the batch-twin REFINEMENT of the
    stateful contract (VERDICT r6 ask #8): one row per input event with
    the running (n, total) up to and including it, over a deterministic
    ``order_by`` — the streaming side's per-trigger update emissions are
    trigger-boundary samples of exactly this sequence (decimal-exact
    accumulation so the totals are order-independent doubles). Batch
    only: the per-key window is a plain window function there, while
    ``applyInPandasWithState`` can only emit at trigger granularity.
    """
    method = spec.get("method", "running_totals")
    keys = spec["keys"]
    value_col = spec.get("value", "value")
    emit = spec.get("emit", "final")
    if method != "running_totals":
        raise ValueError(f"Unknown stateful method {method!r}")
    if emit not in ("final", "per_event"):
        raise ValueError(f"emit must be 'final' or 'per_event', got {emit!r}")
    if not df.isStreaming:
        cast = df.withColumns({k: F.col(k).cast("string") for k in keys})
        if emit == "per_event":
            from pyspark.sql import Window

            order_by = spec.get("order_by")
            if not order_by:
                raise ValueError(
                    "emit='per_event' requires order_by — running totals "
                    "are only well-defined over a deterministic event order"
                )
            w = (
                Window.partitionBy(*keys)
                .orderBy(*order_by)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return cast.select(
                *keys,
                *order_by,
                F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
                F.sum(F.col(value_col).cast("decimal(18,2)"))
                .over(w)
                .cast("double")
                .alias("total"),
            )
        return cast.groupBy(*keys).agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("double")).alias("total"),
        )
    if emit == "per_event":
        raise ValueError(
            "emit='per_event' is batch-only; a stream emits running totals "
            "per trigger (update mode) — drop emit or run on a batch input"
        )
    return _running_totals(df, keys, value_col)


# ---------------------------------------------------------------------------
# stream sink
# ---------------------------------------------------------------------------


def stage_stream_sink(
    df: DataFrame, spec: dict, batch_stages_fn=None
) -> DataFrame:
    """``{"stage": "stream_sink", "format": "memory"|"parquet"|"noop"|
    "console"|"foreach_batch"|"merge"|"scd2"|"incremental_agg",
    "query_name": str?, "path": str?,
    "checkpoint": str?, "output_mode": "append"|"update"|"complete",
    "trigger": "available_now"|{"processing_time": "10 seconds"},
    "await": true?, "sink": {<batch sink spec>}?, "stages": [...]?}``.

    ``foreach_batch`` routes every micro-batch through the ordinary batch
    ``sink`` stage spec given under ``sink`` (mode forced to append) — any
    batch format/partitioning/bucketing works for streaming output without
    a native streaming sink.  An optional ``stages`` list (compiled by the
    Pipeline into ``batch_stages_fn``) runs a BATCH sub-pipeline on each
    micro-batch first — batch-only operators become streaming-ingestible
    this way, e.g. ``dedup`` with a ``store_path`` probes and grows the
    persisted fingerprint store per micro-batch (the incremental-ingest
    pattern, config-drivable end to end).

    Starts the streaming query. ``available_now`` (default) drains all
    available input then stops — the batch-like trigger used for parity
    tests and backfills. For ``memory`` sinks, returns the result table as
    a DataFrame so downstream code can read what was emitted; otherwise
    returns the input (the query keeps running when ``await`` is false).

    ``await`` defaults to true only for ``available_now`` (which
    terminates); a ``processing_time`` query never terminates on its own,
    so awaiting it would hang the pipeline — those default to
    fire-and-return, and asking to await one is an error.
    """
    if not df.isStreaming:
        raise ValueError("stream_sink requires a streaming input DataFrame")
    if spec.get("stages") and batch_stages_fn is None:
        raise ValueError(
            "stream_sink `stages` need the Pipeline to compile them — "
            "run through Pipeline.from_config/from_yaml (direct "
            "stage_stream_sink calls must pass batch_stages_fn)"
        )
    fmt = spec.get("format", "memory")
    if fmt == "merge":
        # streaming CDC ingestion — the foreachBatch-MERGE idiom table
        # formats document, engine-native: every micro-batch upserts into
        # the parquet snapshot at `path` via the atomic-swap merge_upsert
        # (operators/table.py). Micro-batches apply sequentially, so a key
        # updated across batches resolves to the latest batch's row.
        # WITHIN a micro-batch, CDC streams routinely deliver several
        # events for one key — `order_col` names the event-order column
        # and the sink keeps only each key's latest event (highest
        # order_col, NULLs last) before merging; without it, merge_upsert
        # raises its duplicate-key error rather than picking arbitrarily.
        from config_driven_pyspark_spark.operators.table import merge_upsert

        if "path" not in spec or "keys" not in spec:
            raise ValueError(
                "stream_sink format merge requires `path` (the snapshot) "
                "and `keys` (the match columns); add `order_col` when a "
                "micro-batch can carry several events per key"
            )
        if spec.get("output_mode", "append") != "append":
            raise ValueError(
                "stream_sink format merge only supports output_mode append "
                "(the CDC batch stream)"
            )
        merge_keys = list(spec["keys"])
        order_col = spec.get("order_col")

        def _merge_handle(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_stages_fn is not None:
                batch_df = batch_stages_fn(batch_df)
            if order_col is not None:
                w = Window.partitionBy(*merge_keys).orderBy(
                    F.col(order_col).desc_nulls_last()
                )
                batch_df = (
                    batch_df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            merge_upsert(
                batch_df, spec["path"], merge_keys,
                spec.get("delete_col"),
                delete_mode=spec.get("delete_mode", "copy_on_write"),
                partition_by=spec.get("partition_by"),
            )
            # a long-running tombstone stream under merge_on_read
            # accumulates one deletion vector per micro-batch — the
            # same self-bounding knobs as the batch table_delete stage
            # (coalesce_after: fold pending vectors into one, no data
            # rewrite; materialize_after: absorb into file rewrites)
            if spec.get("coalesce_after") or spec.get(
                "materialize_after"
            ):
                from config_driven_pyspark_spark.operators.deletes import (
                    dv_housekeeping,
                )

                dv_housekeeping(
                    batch_df.sparkSession, spec["path"],
                    spec.get("partition_by"),
                    coalesce_after=spec.get("coalesce_after"),
                    materialize_after=spec.get("materialize_after"),
                )

        writer = df.writeStream.foreachBatch(_merge_handle).outputMode(
            "append"
        )
    elif fmt == "incremental_agg":
        # streaming materialized-view maintenance — every micro-batch's
        # monoid partials FOLD into the persisted aggregate snapshot
        # (operators/table.py::incremental_agg), so the MV tracks the
        # stream without ever rescanning history. The checkpoint makes
        # micro-batches disjoint slices of the stream, which is exactly
        # the operator's at-most-once fold contract.
        from config_driven_pyspark_spark.operators.table import (
            incremental_agg,
        )

        if not all(k in spec for k in ("path", "keys", "aggs")):
            raise ValueError(
                "stream_sink format incremental_agg requires `path` (the "
                "aggregate snapshot), `keys` and `aggs` (the monoid spec)"
            )
        if spec.get("output_mode", "append") != "append":
            raise ValueError(
                "stream_sink format incremental_agg only supports "
                "output_mode append — the fact stream itself, not a "
                "re-emitted aggregation (fold partials combine per batch)"
            )

        def _agg_handle(batch_df: DataFrame, batch_id: int) -> None:
            if batch_stages_fn is not None:
                batch_df = batch_stages_fn(batch_df)
            # epoch id rides into the snapshot's _last_batch_id marker:
            # a RETRIED micro-batch (failure after the fold committed
            # but before the checkpoint advanced) skips instead of
            # double-folding — the one retry-sensitive op in the family
            # (merge/scd2 re-application is idempotent per key)
            incremental_agg(
                batch_df, spec["path"], list(spec["keys"]),
                dict(spec["aggs"]), spec.get("partition_by"),
                batch_id=batch_id,
            )

        writer = df.writeStream.foreachBatch(_agg_handle).outputMode(
            "append"
        )
    elif fmt == "scd2":
        # streaming dimension versioning — each micro-batch of CDC
        # events applies as a type-2 SCD merge
        # (operators/table.py::scd2_merge): changed rows close the
        # current version and append a new one, identical re-deliveries
        # no-op via change detection, deletes close without successor.
        # That change detection also makes a RETRIED micro-batch
        # naturally idempotent (the re-applied rows are unchanged vs
        # the now-current versions), so no batch-id marker is needed —
        # unlike incremental_agg, whose folds are retry-sensitive.
        # `order_col` keeps each key's latest event within a
        # micro-batch (scd2_merge versions a key at most once per
        # batch, the same ambiguity contract as MERGE).
        from config_driven_pyspark_spark.operators.table import scd2_merge

        if "path" not in spec or "keys" not in spec:
            raise ValueError(
                "stream_sink format scd2 requires `path` (the versioned "
                "snapshot) and `keys`; add `order_col` when a micro-batch "
                "can carry several events per key"
            )
        if spec.get("output_mode", "append") != "append":
            raise ValueError(
                "stream_sink format scd2 only supports output_mode append "
                "(the CDC event stream)"
            )
        scd2_keys = list(spec["keys"])
        scd2_order = spec.get("order_col")

        def _scd2_handle(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_stages_fn is not None:
                batch_df = batch_stages_fn(batch_df)
            if scd2_order is not None:
                w = Window.partitionBy(*scd2_keys).orderBy(
                    F.col(scd2_order).desc_nulls_last()
                )
                batch_df = (
                    batch_df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    # dropped AFTER dedup: keeping it would make the
                    # event sequence a business column and every
                    # re-delivery a spurious "change" version
                    .drop("__rn", scd2_order)
                )
            scd2_merge(
                batch_df, spec["path"], scd2_keys,
                spec.get("ts_col", "effective_ts"),
                spec.get("delete_col"), spec.get("partition_by"),
            )

        writer = df.writeStream.foreachBatch(_scd2_handle).outputMode(
            "append"
        )
    elif fmt == "foreach_batch":
        from config_driven_pyspark_spark.sources.writers import stage_sink

        if "sink" not in spec:
            raise ValueError(
                "stream_sink format foreach_batch requires a `sink` sub-spec "
                '(e.g. {"stage": "sink", "format": "parquet", "path": ...})'
            )
        if spec.get("output_mode", "append") != "append":
            # update/complete re-emit rows every trigger; appending those to
            # a batch sink would silently accumulate duplicate/stale copies
            raise ValueError(
                "foreach_batch only supports output_mode append; "
                "update/complete would append duplicated rows per trigger"
            )
        sink_spec = {**spec["sink"], "mode": "append"}

        def _handle(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_stages_fn is not None:
                batch_df = batch_stages_fn(batch_df)
            stage_sink(batch_df, sink_spec)

        writer = df.writeStream.foreachBatch(_handle).outputMode(
            spec.get("output_mode", "append")
        )
    else:
        writer = df.writeStream.format(fmt).outputMode(
            spec.get("output_mode", "append")
        )
    if spec.get("query_name"):
        writer = writer.queryName(spec["query_name"])
    if spec.get("checkpoint"):
        writer = writer.option("checkpointLocation", spec["checkpoint"])
    if spec.get("path") and fmt not in ("merge", "incremental_agg"):
        # for format merge, `path` names the snapshot merge_upsert owns —
        # it is not a sink option
        writer = writer.option("path", spec["path"])
    for key, value in (spec.get("options") or {}).items():
        writer = writer.option(key, value)

    trigger = spec.get("trigger", "available_now")
    terminating = trigger == "available_now"
    if terminating:
        writer = writer.trigger(availableNow=True)
    elif isinstance(trigger, dict) and "processing_time" in trigger:
        writer = writer.trigger(processingTime=trigger["processing_time"])
    elif trigger is not None:
        raise ValueError(f"Unknown trigger spec {trigger!r}")

    should_await = spec.get("await", terminating)
    if should_await and not terminating:
        raise ValueError(
            "await: true with a non-terminating trigger would block forever; "
            "use trigger: available_now or await: false"
        )
    query = writer.start()
    if should_await:
        query.awaitTermination()
    if fmt == "memory" and spec.get("query_name"):
        return df.sparkSession.table(spec["query_name"])
    return df
