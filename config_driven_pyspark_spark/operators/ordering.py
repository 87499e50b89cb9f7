"""Curriculum ordering: exact global rank by score, without a global sort.

Capability gap vs the reference (SURVEY.md §2C): curriculum learning
and sorted-shard export need every document's exact position in score
order (easy→hard by quality/perplexity/length), but a naive
``row_number() OVER (ORDER BY score)`` is one unpartitioned window task
— the cluster-killer the engine's prefix-sum machinery exists to avoid.
``curriculum_order`` computes the exact 0-based global rank with the
two-level pattern: approximate score quantiles pre-bucket rows into
``n_buckets`` balanced ranges (boundaries are a driver-side
``approxQuantile`` collect, bounded by ``n_buckets`` doubles — the
kmeans-style bounded collect), per-bucket counts prefix-sum in a
``n_buckets``-row window, and each bucket ranks its own rows in
parallel. Bucket boundaries only affect LOAD BALANCE, never the
answer: the bucket function is monotone in score, so
``offset + within-bucket row_number`` equals the global rank exactly
even if the quantile sketch drifts.

Deterministic contract (what the DuckDB oracle replicates bit-for-bit):
total order is ``(score ASC NULLS FIRST, id ASC)`` (descending flips
the score comparison only); ``rank`` is the exact 0-based position;
``phase = floor(rank · n_phases / N)`` assigns the equal-width
curriculum stage in [0, n_phases).

Scale: one pass for boundaries (sketch aggregate), one groupBy(bucket)
count, one per-bucket window — widest window span is ~N/n_buckets, not
N. Raise ``n_buckets`` with corpus size to keep per-task rank state
bounded; skew is bounded by quantile balance, not key popularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def curriculum_order(
    df: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    ascending: bool = True,
    n_buckets: int = 256,
    n_phases: int = 1,
    rank_col: str = "curriculum_rank",
    phase_col: str = "phase",
) -> DataFrame:
    """Append the exact global ``rank_col`` (0-based position in
    ``(score, id)`` order) and ``phase_col`` (equal-width stage in
    [0, ``n_phases``)) — see the module docstring for the contract."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if n_phases <= 0:
        raise ValueError("n_phases must be positive")
    o = F.col(score_col).cast("double")
    if not ascending:
        o = -o
    work = df.withColumn("__o", o)
    if n_buckets > 1:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = work.approxQuantile("__o", probs, 0.001)
    else:
        bounds = []
    # monotone bucket id: number of boundaries strictly below the score
    # (nulls -> bucket 0, matching NULLS FIRST order); boundary drift
    # moves rows between buckets but never breaks bucket monotonicity
    b = F.lit(0)
    for v in bounds:
        b = b + F.when(F.col("__o") > F.lit(v), 1).otherwise(0)
    work = work.withColumn("__b", b)
    btot = work.groupBy("__b").agg(F.count("*").alias("__bt"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "__b", F.coalesce(F.sum("__bt").over(w_off), F.lit(0)).alias("__off")
    )
    w_local = Window.partitionBy("__b").orderBy(
        F.col("__o").asc_nulls_first(), F.col(id_col).asc()
    )
    # corpus size as a 1-row broadcast (never a constant-partition window)
    total = btot.agg(F.sum("__bt").alias("__n"))
    return (
        work.join(F.broadcast(offsets), "__b")
        .crossJoin(F.broadcast(total))
        .withColumn(
            rank_col,
            (F.col("__off") + F.row_number().over(w_local) - 1)
            .cast("bigint"),
        )
        .withColumn(
            phase_col,
            F.floor(F.col(rank_col) * n_phases / F.col("__n"))
            .cast("bigint"),
        )
        .drop("__o", "__b", "__off", "__n")
    )
