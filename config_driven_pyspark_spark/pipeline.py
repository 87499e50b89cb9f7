"""Pipeline — the declarative, config-driven entry point.

The reference's product is "config-driven PySpark" but it ships no config
loader (``/root/reference/README.md:49`` — parsing is left to the caller;
its YAML example at ``README.md:55-74`` is a flat ``path: function_name``
map fed to ``Functioniser.add`` in a loop). The new engine promotes config
to a full pipeline spec:

.. code-block:: yaml

    pipeline:
      - stage: source
        format: parquet
        path: "${sf_dir}/lineitem.parquet"
        name: lineitem
      - stage: filter
        predicate: "l_shipdate <= timestamp '1998-09-02'"
      - stage: transform            # the reference-equivalent nested engine;
        fields:                     # its config format IS the reference's
          l_returnflag: lower       # `path: function_name` map
      - stage: aggregate
        group_by: [l_returnflag]
        aggs:
          sum_qty: "sum(l_quantity)"

Stages run in order; each consumes the previous stage's output unless it
names an ``input``, and may ``name:`` its output for later reference (joins,
set ops, sql). ``${var}`` placeholders are substituted from ``variables``.

Everything lowers to native DataFrame calls — the whole pipeline is one lazy
Catalyst plan until an action runs, so cross-stage optimization (pushdown
through joins, column pruning through transforms) happens globally.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from config_driven_pyspark_spark.functions.registry import DfFunction, FunctionRegistry
from config_driven_pyspark_spark.operators import relational as R
from config_driven_pyspark_spark.operators.transform import NestedTransformer
from config_driven_pyspark_spark.sources.readers import stage_source
from config_driven_pyspark_spark.sources.writers import stage_sink

try:  # pyyaml is optional: dict configs work without it
    import yaml as _yaml
except ImportError:  # pragma: no cover
    _yaml = None


class PipelineContext:
    """Named DataFrames visible to later stages."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.frames: dict[str, DataFrame] = {}
        self.last: Optional[DataFrame] = None
        # table-path provenance for DIRECT source reads (any transform
        # clears it): the join stage's `auto` mode consults persisted
        # planner stats only for frames that ARE their table
        self.paths: dict[str, str] = {}
        self.last_path: Optional[str] = None

    def track_path(self, spec: dict) -> None:
        """Called after every stage: remember the source path of a
        plain batch source read, clear provenance otherwise."""
        if (
            spec.get("stage") == "source"
            and spec.get("path")
            and not spec.get("streaming")
        ):
            self.last_path = str(spec["path"])
        else:
            self.last_path = None
        if spec.get("name"):
            if self.last_path is not None:
                self.paths[spec["name"]] = self.last_path
            else:
                self.paths.pop(spec["name"], None)

    def get(self, name: str) -> DataFrame:
        if name not in self.frames:
            raise ValueError(f"Unknown stage output {name!r}; known: {sorted(self.frames)}")
        return self.frames[name]

    def resolve_input(self, spec: dict) -> DataFrame:
        if "input" in spec:
            return self.get(spec["input"])
        if self.last is None:
            raise ValueError(f"Stage {spec.get('stage')!r} has no input (first stage must be a source)")
        return self.last


def _fix_yaml_bool_keys(obj: Any) -> Any:
    """YAML 1.1 parses bare ``on``/``off`` keys as booleans; map them back to
    the strings the stage specs expect (``on:`` is the join-key field)."""
    if isinstance(obj, dict):
        return {
            (
                "on" if key is True else "off" if key is False else key
            ): _fix_yaml_bool_keys(value)
            for key, value in obj.items()
        }
    if isinstance(obj, list):
        return [_fix_yaml_bool_keys(v) for v in obj]
    return obj


def _substitute(obj: Any, variables: dict[str, Any]) -> Any:
    """Recursively substitute ``${var}`` in strings."""
    if isinstance(obj, str):
        for key, value in variables.items():
            obj = obj.replace("${" + key + "}", str(value))
        return obj
    if isinstance(obj, dict):
        return {k: _substitute(v, variables) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_substitute(v, variables) for v in obj]
    return obj


def _field_function(spec: Any, registry: FunctionRegistry) -> Union[str, Column, DfFunction]:
    """Parse a transform-stage field spec into something the nested engine
    accepts: ``"upper"`` | ``{"lit": v}`` | ``{"cast": "double"}`` |
    ``{"fn": name, "args": [...]}`` (extra args appended after the field
    Column)."""
    if isinstance(spec, str):
        return spec
    if isinstance(spec, dict):
        if "lit" in spec:
            return F.lit(spec["lit"])
        if "cast" in spec:
            to = spec["cast"]
            return lambda col: col.cast(to)
        if "fn" in spec:
            base = registry.resolve(spec["fn"])
            args = spec.get("args", [])
            return lambda col: base(col, *args)
    raise ValueError(f"Unparseable field function spec: {spec!r}")


class Pipeline:
    """Executable declarative pipeline."""

    def __init__(
        self,
        stages: list[dict],
        registry: Optional[FunctionRegistry] = None,
    ) -> None:
        self.stages = stages
        self.registry = registry or FunctionRegistry()
        self.udfs: dict[str, Any] = {}
        self.udafs: dict[str, Any] = {}
        self.grouped_udfs: dict[str, tuple[Any, str]] = {}
        self.flat_maps: dict[str, tuple[Any, str]] = {}
        # Observation handles registered by the `observe` stage, keyed by the
        # stage's `as` name; read .get after an action completes
        self.observations: dict[str, Any] = {}

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_config(cls, config: Union[dict, list], **kwargs: Any) -> "Pipeline":
        stages = config["pipeline"] if isinstance(config, dict) else config
        return cls(list(stages), **kwargs)

    @classmethod
    def from_yaml(cls, text: str, **kwargs: Any) -> "Pipeline":
        if _yaml is None:
            raise ImportError("pyyaml not available; use from_config with a dict")
        return cls.from_config(_fix_yaml_bool_keys(_yaml.safe_load(text)), **kwargs)

    def register_function(self, name: str, func: Union[Column, DfFunction]) -> None:
        self.registry.register(name, func)

    def register_udf(self, name: str, func: Any, returns: str) -> "Pipeline":
        """Register a true (serialized-Python) UDF for the ``udf`` stage,
        Arrow-batched via ``pandas_udf``: ``func`` takes/returns pandas
        Series. This is the slow path by design — prefer ``register_function``
        (Column builders, JVM-side) wherever the logic is expressible; use
        this only when it genuinely isn't. The return type is explicit
        because inferred annotations break under
        ``from __future__ import annotations`` (stringified hints)."""
        self.udfs[name] = F.pandas_udf(func, returnType=returns)
        return self

    def register_grouped_udf(self, name: str, func: Any, schema: str) -> "Pipeline":
        """Register a grouped-map UDF (UDAF-shaped) for the ``grouped_map``
        stage: ``func`` takes one pandas DataFrame per group and returns a
        pandas DataFrame matching ``schema``. Runs via ``applyInPandas`` —
        one shuffle on the group keys, Arrow-batched; per-group state is
        bounded by the largest group, so salt or pre-aggregate skewed keys
        before this stage at scale."""
        self.grouped_udfs[name] = (func, schema)
        return self

    def register_udaf(self, name: str, func: Any, returns: str) -> "Pipeline":
        """Register a true pandas UDAF (``GROUPED_AGG``): ``func`` takes one
        pandas Series per argument column and returns a single scalar per
        group. The name is registered on the SparkSession at ``run()`` so any
        ``aggregate`` stage (or raw ``sql`` stage) can call it inside a plain
        expression string — ``aggs: {m: "my_median(v)"}``. Arrow-batched with
        map-side partial application unavailable (whole group ships to one
        task), so pre-aggregate or salt skewed keys; prefer built-in
        aggregates whenever the statistic is expressible."""
        import inspect

        import pandas as pd

        params = list(inspect.signature(func).parameters)
        # pandas_udf infers GROUPED_AGG from a Series... -> scalar signature;
        # synthesize the annotations so callers can pass plain lambdas
        args = ", ".join(f"s{i}" for i in range(len(params)))
        ns: dict[str, Any] = {"__f": func}
        exec(f"def __w({args}): return __f({args})", ns)  # noqa: S102
        wrapper = ns["__w"]
        wrapper.__annotations__ = {f"s{i}": pd.Series for i in range(len(params))}
        wrapper.__annotations__["return"] = float
        self.udafs[name] = F.pandas_udf(wrapper, returnType=returns)
        return self

    def register_flat_map(self, name: str, func: Any, schema: str) -> "Pipeline":
        """Register a UDTF-shaped flat-map for the ``flat_map`` stage:
        ``func`` is an iterator-of-pandas-DataFrames transform (each input
        batch → zero or more output DataFrames matching ``schema``), run via
        ``mapInPandas`` — Arrow-batched, zero shuffle, 0..n output rows per
        input row. This completes the UDF family (scalar ``udf``, grouped
        ``grouped_map``, flat-map ``flat_map``); like the others it is the
        deliberate Python path — prefer ``explode``/built-in generators when
        the expansion is Column-expressible."""
        self.flat_maps[name] = (func, schema)
        return self

    # -- execution ---------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        variables: Optional[dict[str, Any]] = None,
    ) -> DataFrame:
        """Execute all stages; returns the final stage's DataFrame (lazy)."""
        ctx = PipelineContext(spark)
        variables = variables or {}
        # session-level by Spark's design (expression strings resolve against
        # the session's function catalog); re-registering overwrites, so the
        # last-run pipeline wins on a name collision
        for name, udaf in self.udafs.items():
            spark.udf.register(name, udaf)
        for raw in self.stages:
            spec = _substitute(dict(raw), variables)
            out = self._run_stage(ctx, spec)
            ctx.last = out
            ctx.track_path(spec)
            if spec.get("name"):
                ctx.frames[spec["name"]] = out
        if ctx.last is None:
            raise ValueError("Empty pipeline")
        return ctx.last

    _KINDS = frozenset(
        {
            "source", "sql", "transform", "filter", "select", "with_columns",
            "drop", "rename", "join", "aggregate", "pivot", "unpivot",
            "explode",
            "window", "gap_fill", "fill_forward", "interpolate", "sort",
            "limit",
            "distinct", "union", "intersect", "except", "repartition",
            "sample", "persist",
            "top_k", "skew_report", "dedup", "similarity", "text",
            "multimodal", "corpus",
            "observe",
            "udf", "grouped_map", "flat_map", "sink", "merge", "scd2",
            "scd2_asof", "incremental_agg", "compact",
            "table_delete", "table_update",
            "table_read", "dv_materialize", "dv_coalesce",
            "time_travel", "table_history", "table_restore",
            "vacuum_history", "expect", "table_changes", "alter",
            "enable_history", "analyze", "table_scan",
            "changes_stream",
            "watermark", "time_window", "session_window", "stream_dedup",
            "stateful", "stream_sink", "asof_join", "streaming_asof_join",
            "range_join",
        }
    )

    def _run_stage(self, ctx: PipelineContext, spec: dict) -> DataFrame:
        kind = spec.get("stage")
        if kind not in self._KINDS:
            raise ValueError(f"Unknown stage kind {kind!r}; expected one of {sorted(self._KINDS)}")
        if kind == "source":
            return stage_source(ctx.spark, spec)
        if kind == "sql":
            for alias, name in (spec.get("views") or {}).items():
                ctx.get(name).createOrReplaceTempView(alias)
            return ctx.spark.sql(spec["query"])
        if kind == "scd2_asof" and spec.get("path"):
            # source-like when reading a persisted snapshot — usable as
            # the first stage of a pipeline
            from config_driven_pyspark_spark.operators.table import (
                stage_scd2_asof,
            )

            return stage_scd2_asof(None, spec, spark=ctx.spark)
        if kind == "analyze" and spec.get("path"):
            # source-like when analyzing a persisted snapshot
            from config_driven_pyspark_spark.operators.stats import (
                stage_analyze,
            )

            return stage_analyze(None, spec, spark=ctx.spark)
        if kind == "table_read":
            # source-like: the table's live LOGICAL state — a plain
            # read with pending deletion vectors anti-joined away
            from config_driven_pyspark_spark.operators.deletes import (
                stage_table_read,
            )

            return stage_table_read(
                ctx.last if not spec.get("input") else ctx.get(spec["input"]),
                spec,
                spark=ctx.spark,
            )
        if kind == "dv_coalesce":
            # source-like: pure table maintenance, needs only the path
            from config_driven_pyspark_spark.operators.deletes import (
                stage_dv_coalesce,
            )

            return stage_dv_coalesce(
                ctx.last if not spec.get("input") else ctx.get(spec["input"]),
                spec,
                spark=ctx.spark,
            )
        if kind == "table_scan":
            from config_driven_pyspark_spark.operators.table import (
                stage_table_scan,
            )

            return stage_table_scan(
                ctx.last if not spec.get("input") else ctx.get(spec["input"]),
                spec,
                spark=ctx.spark,
            )
        if kind in ("time_travel", "table_history", "table_changes",
                    "enable_history"):
            # source-like: version reads, DESCRIBE HISTORY, CDF and the
            # retention switch need only the snapshot path
            from config_driven_pyspark_spark.operators import history as _H

            fn = {
                "time_travel": _H.stage_time_travel,
                "table_history": _H.stage_table_history,
                "table_changes": _H.stage_table_changes,
                "enable_history": _H.stage_enable_history,
            }[kind]
            return fn(
                ctx.last if not spec.get("input") else ctx.get(spec["input"]),
                spec,
                spark=ctx.spark,
            )
        if kind == "changes_stream":
            # source-like: the incremental CDF pump (version-
            # checkpointed micro-batches through an optional
            # sub-pipeline into a sink)
            from config_driven_pyspark_spark.operators import history as _H

            fn_sub = (
                self._compile_sub_stages(list(spec["stages"]))
                if spec.get("stages") else None
            )
            return _H.stage_changes_stream(
                ctx.last if not spec.get("input") else ctx.get(spec["input"]),
                spec,
                spark=ctx.spark,
                batch_stages_fn=fn_sub,
            )

        df = ctx.resolve_input(spec)

        if kind == "transform":
            engine = NestedTransformer()
            engine.registry = self.registry
            for path, fn_spec in spec["fields"].items():
                engine.add(path, _field_function(fn_spec, self.registry))
            return engine.apply(df)
        if kind == "filter":
            return R.stage_filter(df, spec)
        if kind == "select":
            return R.stage_select(df, spec)
        if kind == "with_columns":
            return R.stage_with_columns(df, spec)
        if kind == "drop":
            return R.stage_drop(df, spec)
        if kind == "rename":
            return R.stage_rename(df, spec)
        if kind == "join":
            left_stats = right_stats = None
            if spec.get("auto"):
                from config_driven_pyspark_spark.operators.stats import (
                    load_table_stats,
                )

                lpath = (
                    ctx.paths.get(spec["input"])
                    if spec.get("input") else ctx.last_path
                )
                rpath = ctx.paths.get(spec["right"])
                if lpath:
                    left_stats = load_table_stats(ctx.spark, lpath)
                if rpath:
                    right_stats = load_table_stats(ctx.spark, rpath)
            return R.stage_join(
                df, ctx.get(spec["right"]), spec,
                left_stats=left_stats, right_stats=right_stats,
            )
        if kind in ("asof_join", "streaming_asof_join", "range_join"):
            from config_driven_pyspark_spark.operators import joins as J

            stage_fn = {
                "asof_join": J.stage_asof_join,
                "streaming_asof_join": J.stage_streaming_asof_join,
                "range_join": J.stage_range_join,
            }[kind]
            return stage_fn(df, ctx.get(spec["right"]), spec)
        if kind == "aggregate":
            return R.stage_aggregate(df, spec)
        if kind == "pivot":
            return R.stage_pivot(df, spec)
        if kind == "unpivot":
            return R.stage_unpivot(df, spec)
        if kind == "explode":
            return R.stage_explode(df, spec)
        if kind == "window":
            return R.stage_window(df, spec)
        if kind == "gap_fill":
            return R.stage_gap_fill(df, spec)
        if kind == "fill_forward":
            return R.stage_fill_forward(df, spec)
        if kind == "interpolate":
            return R.stage_interpolate(df, spec)
        if kind == "sort":
            return R.stage_sort(df, spec)
        if kind == "limit":
            return R.stage_limit(df, spec)
        if kind == "distinct":
            return R.stage_distinct(df, spec)
        if kind in ("union", "intersect", "except"):
            return R.stage_set_op(df, ctx.get(spec["other"]), spec)
        if kind == "repartition":
            return R.stage_repartition(df, spec)
        if kind == "sample":
            return R.stage_sample(df, spec)
        if kind == "persist":
            return R.stage_persist(df, spec)
        if kind == "top_k":
            return R.top_k_per_group(
                df,
                spec["partition_by"],
                spec["order_by"],
                int(spec["k"]),
                keep_rank=spec.get("keep_rank", False),
            )
        if kind == "skew_report":
            return R.skew_report(df, spec["keys"], int(spec.get("k", 20)))
        if kind == "dedup":
            from config_driven_pyspark_spark.operators.dedup import stage_dedup

            return stage_dedup(df, spec)
        if kind == "similarity":
            from config_driven_pyspark_spark.operators.similarity import stage_similarity

            return stage_similarity(df, spec, ctx)
        if kind == "text":
            from config_driven_pyspark_spark.functions.text import stage_text

            return stage_text(df, spec)
        if kind == "multimodal":
            from config_driven_pyspark_spark.operators.multimodal import stage_multimodal

            return stage_multimodal(df, spec)
        if kind == "corpus":
            from config_driven_pyspark_spark.operators.corpus import stage_corpus

            return stage_corpus(df, spec, ctx)
        if kind == "udf":
            # {"stage": "udf", "fn": name, "args": [cols/exprs], "alias": out}
            if spec["fn"] not in self.udfs:
                raise ValueError(
                    f"Unknown UDF {spec['fn']!r}; register it with "
                    f"Pipeline.register_udf(name, func, returns)"
                )
            fn = self.udfs[spec["fn"]]
            args = [F.expr(a) for a in spec.get("args", [])]
            return df.withColumn(spec["alias"], fn(*args))
        if kind == "grouped_map":
            # {"stage": "grouped_map", "group_by": [...], "fn": name}
            if spec["fn"] not in self.grouped_udfs:
                raise ValueError(
                    f"Unknown grouped UDF {spec['fn']!r}; register it with "
                    f"Pipeline.register_grouped_udf(name, func, schema)"
                )
            gfn, gschema = self.grouped_udfs[spec["fn"]]
            return df.groupBy(*spec["group_by"]).applyInPandas(gfn, gschema)
        if kind == "observe":
            # {"stage": "observe", "as": "qa", "metrics": {"rows": "count(*)",
            #  "null_ids": "count_if(id IS NULL)"}} — piggybacks aggregate
            # metrics on the existing pass (zero extra scans/shuffles; at
            # 100 TB a separate count() would re-read the table). Batch:
            # read Pipeline.observations["qa"].get after an action.
            # Streaming: metrics surface per-batch in the streaming query's
            # progress events (observedMetrics) under the same name.
            metrics = [F.expr(e).alias(k) for k, e in spec["metrics"].items()]
            if df.isStreaming:
                return df.observe(spec["as"], *metrics)
            from pyspark.sql import Observation

            obs = Observation(spec["as"])
            self.observations[spec["as"]] = obs
            return df.observe(obs, *metrics)
        if kind == "flat_map":
            # {"stage": "flat_map", "fn": name}
            if spec["fn"] not in self.flat_maps:
                raise ValueError(
                    f"Unknown flat-map {spec['fn']!r}; register it with "
                    f"Pipeline.register_flat_map(name, func, schema)"
                )
            ffn, fschema = self.flat_maps[spec["fn"]]
            return df.mapInPandas(ffn, fschema)
        if kind in (
            "watermark", "time_window", "session_window", "stream_dedup",
            "stateful", "stream_sink",
        ):
            from config_driven_pyspark_spark.streaming import stages as S

            if kind == "stream_sink":
                return S.stage_stream_sink(
                    df, spec, batch_stages_fn=self._batch_stages_fn(spec)
                )
            return {
                "watermark": S.stage_watermark,
                "time_window": S.stage_time_window,
                "session_window": S.stage_session_window,
                "stream_dedup": S.stage_stream_dedup,
                "stateful": S.stage_stateful,
            }[kind](df, spec)
        if kind == "sink":
            return stage_sink(df, spec)
        if kind == "merge":
            from config_driven_pyspark_spark.operators.table import stage_merge

            return stage_merge(df, spec)
        if kind == "scd2":
            from config_driven_pyspark_spark.operators.table import stage_scd2

            return stage_scd2(df, spec)
        if kind == "scd2_asof":
            from config_driven_pyspark_spark.operators.table import (
                stage_scd2_asof,
            )

            return stage_scd2_asof(df, spec)
        if kind == "incremental_agg":
            from config_driven_pyspark_spark.operators.table import (
                stage_incremental_agg,
            )

            return stage_incremental_agg(df, spec)
        if kind == "compact":
            from config_driven_pyspark_spark.operators.table import (
                stage_compact,
            )

            return stage_compact(df, spec)
        if kind == "table_delete":
            from config_driven_pyspark_spark.operators.table import (
                stage_table_delete,
            )

            return stage_table_delete(df, spec)
        if kind == "table_update":
            from config_driven_pyspark_spark.operators.table import (
                stage_table_update,
            )

            return stage_table_update(df, spec)
        if kind == "dv_materialize":
            from config_driven_pyspark_spark.operators.deletes import (
                stage_dv_materialize,
            )

            return stage_dv_materialize(df, spec)
        if kind == "table_restore":
            from config_driven_pyspark_spark.operators.history import (
                stage_table_restore,
            )

            return stage_table_restore(df, spec)
        if kind == "expect":
            from config_driven_pyspark_spark.operators.expectations import (
                stage_expect,
            )

            return stage_expect(df, spec)
        if kind == "alter":
            from config_driven_pyspark_spark.operators.table import (
                stage_alter,
            )

            return stage_alter(df, spec)
        if kind == "analyze":
            from config_driven_pyspark_spark.operators.stats import (
                stage_analyze,
            )

            return stage_analyze(df, spec)
        if kind == "vacuum_history":
            from config_driven_pyspark_spark.operators.history import (
                vacuum_table_history,
            )

            vacuum_table_history(
                df.sparkSession,
                spec["path"],
                int(spec["keep_last"])
                if spec.get("keep_last") is not None
                else None,
                int(spec["older_than_seconds"])
                if spec.get("older_than_seconds") is not None
                else None,
            )
            return df
        raise ValueError(f"Unknown stage kind {kind!r}")

    def _batch_stages_fn(self, spec: dict):
        """Compile a ``stream_sink`` spec's optional ``stages`` list — a
        batch sub-pipeline run on every micro-batch inside
        ``foreachBatch`` — into ``batch_df -> DataFrame``.  The
        sub-stages share this pipeline's function/UDF registries and run
        with a fresh context seeded by the micro-batch (each batch is an
        independent small batch job — the streaming ingest pattern where
        e.g. incremental dedup probes and grows its store per batch).
        Returns ``None`` when the spec declares no stages."""
        sub_specs = spec.get("stages")
        if not sub_specs:
            return None
        if spec.get("format", "memory") != "foreach_batch":
            raise ValueError(
                "stream_sink `stages` (per-micro-batch sub-pipeline) "
                "requires format: foreach_batch"
            )
        return self._compile_sub_stages(sub_specs)

    def _compile_sub_stages(self, sub_specs: list):
        """``batch_df -> DataFrame`` over a sub-pipeline spec list,
        sharing this pipeline's function/UDF registries, each call a
        fresh context seeded by the batch — used by ``stream_sink``
        micro-batches and the ``changes_stream`` CDF pump."""

        def apply(batch_df: DataFrame) -> DataFrame:
            ctx = PipelineContext(batch_df.sparkSession)
            ctx.last = batch_df
            for raw in sub_specs:
                sub = dict(raw)
                out = self._run_stage(ctx, sub)
                ctx.last = out
                ctx.track_path(sub)
                if sub.get("name"):
                    ctx.frames[sub["name"]] = out
            return ctx.last

        return apply
