"""Similarity search — top-k nearest neighbors over an embedding column.

Capability gap vs the reference (SURVEY.md §2C). Two strategies:

- ``brute_force`` — exact cosine top-k: queries × corpus join with a
  window top-k. The corpus side is unit-normalized once; with a small query
  set the query side is broadcast, so the corpus never shuffles. This is
  the correctness baseline and the right plan when |queries| is small.
- ``srp_lsh``     — approximate: random-hyperplane signatures bucket both
  sides; only same-bucket (or neighboring-probe) pairs are scored. At 100 TB
  corpus scale this prunes the cross product to O(n · bucket occupancy);
  multi-probe (flipping each signature bit) trades recall for fan-out.
- ``ivf``         — inverted-file ANN: corpus vectors are assigned to their
  nearest centroid cell; each query probes its ``nprobe`` nearest cells and
  scores only those cells' vectors. Centroid assignment is the one place a
  Pandas UDF beats Column exprs (a b×d @ d×c numpy matmul per Arrow batch
  vs c unrolled dot expressions), so it uses ``pandas_udf``; scoring stays
  Column-native. ``nprobe = n_centroids`` degrades to exact brute force
  (pinned by test), the recall/cost dial in between.

Scoring math is ``zip_with``/``aggregate`` Column expressions in double
precision — whole-stage codegen applies.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from config_driven_pyspark_spark.functions import vectors as V
from config_driven_pyspark_spark.operators.dedup import _materialize, _spread


def _dim_or_none(df: DataFrame, vec_col: str) -> int | None:
    """First non-null vector's width, or None — one bounded ``take(1)``
    job at plan-build time against the SMALL side of a scoring join.
    Unlocks the unrolled whole-stage-codegen dot
    (functions/vectors.py::dot ``dim=``, r16); a failed/empty probe just
    keeps the interpreted HOF path, so this can never change results."""
    try:
        row = (
            df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
        )
        return len(row[0]) if row is not None and row[0] is not None else None
    except Exception:
        return None


def _topk_by(scored: DataFrame, k: int, score_col: str) -> DataFrame:
    """Shared per-query top-k tail: rank by (score desc, neighbor_id asc —
    the deterministic tie-break every oracle replicates) and keep k.
    Output column order: (query_id, neighbor_id, rank, <score_col>)."""
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col(score_col).desc(), F.col("neighbor_id")
            )
        ).cast("bigint"),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", "rank", score_col
    )


def _rerank_exact(
    approx_ranked: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    rerank: int,
    id_col: str,
    vec_col: str,
    broadcast_queries: bool,
) -> DataFrame:
    """Exact re-scoring of an approximate candidate pool (the standard
    ANN+rerank deployment): take the per-query top-``rerank`` rows of
    ``approx_ranked`` (which carries a ``rank`` column), join back to the
    TRUE corpus vectors — a |queries|·rerank-row join, the only place a
    full vector is touched again — and re-rank to top-k exact cosines."""
    pool = approx_ranked.filter(F.col("rank") <= rerank).select(
        "query_id", "neighbor_id"
    )
    truev = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        V.unit_normalize(F.col(vec_col)).alias("cv"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        V.unit_normalize(F.col(vec_col)).alias("qv"),
    )
    dim = _dim_or_none(queries, vec_col)
    exact = (
        pool.join(truev, "neighbor_id")
        .join(F.broadcast(qv) if broadcast_queries else qv, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(V.dot(F.col("qv"), F.col("cv"), dim), 6).alias(
                "cosine"
            ),
        )
    )
    return _topk_by(exact, k, "cosine")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query. Output: (query_id, neighbor_id, rank,
    cosine); self-matches excluded.

    Plan shape: corpus stays partitioned as-is; the (small) query set is
    broadcast, scoring is a map-side nested loop, and the shuffle into
    the final per-query ranking is bounded by the PARTIAL top-k: Spark
    inserts a two-level ``WindowGroupLimit`` around the exchange (the
    ``rank <= k`` filter over a row_number window), so each map
    partition ships at most ``k`` rows per query — the exchange carries
    ``O(k × |queries| × partitions)`` narrow rows, never the raw
    ``|queries| × |corpus|`` cross product.

    DECLARED SCALE BOUNDARY: the scoring itself is exact brute force —
    ``O(|corpus| × |queries|)`` dot products on the map side. That is
    the row's declared semantics (exact top-k, no index); it is the
    right tool for small query sets over any corpus size (cost is one
    corpus pass per ~thousands of queries), and the wrong tool for
    query sets that scale with the corpus — route those through the
    IVF/PQ/SRP index paths in this module and rerank (``_rerank_exact``)
    when exactness matters.
    """
    # CPU-heavy per-pair scoring must not inherit a small input file count
    # (one parquet file -> one task); a no-op at real scale
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), V.unit_normalize(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), V.unit_normalize(F.col(vec_col)).alias("qv")
    )
    # probe the (small) query side's vector width once: the per-pair dot
    # then runs unrolled inside whole-stage codegen (r16, guide §1.2
    # per-task work) instead of the interpreted HOF fold
    dim = _dim_or_none(queries, vec_col)
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(V.dot(F.col("qv"), F.col("cv"), dim), 6).alias(
                "cosine"
            ),
        )
    )
    return _topk_by(scored, k, "cosine")


def srp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    seed: int = 42,
    dim: Optional[int] = None,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate cosine top-k: score only same-SRP-bucket pairs.

    Recall is tunable via ``bits`` (fewer bits → bigger buckets → higher
    recall and cost) and ``multiprobe``: at ``1``, each query also probes
    every bucket at Hamming distance 1 from its own (one single-bit XOR
    per plane — a near-miss on one hyperplane no longer hides a close
    neighbor). Query fan-out becomes ``1 + bits`` buckets; the corpus
    side is untouched, so cost scales with |queries|, not |corpus| —
    measured recall@5 lift on a 16-cluster corpus: 0.315 → 0.705 at
    bits=4, 0.105 → 0.375 at bits=8 (PLANS.md r6 table). Radius ≥ 2 is combinatorial fan-out and
    deliberately unsupported. Queries with empty buckets return < k rows —
    callers wanting guaranteed k should fall back to brute force for
    those ids.
    """
    if multiprobe not in (0, 1):
        raise ValueError(
            f"multiprobe must be 0 or 1 (radius >= 2 fans out "
            f"combinatorially), got {multiprobe}"
        )
    if dim is None:
        row = corpus.select(vec_col).first()
        # empty corpus: any plane set works — the bucket join yields no rows
        dim = len(row[0]) if row is not None and row[0] is not None else 1
    from config_driven_pyspark_spark.operators.dedup import srp_planes

    planes = srp_planes(dim, bits, seed)

    def prep(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        # bind the normalized vector FIRST: the signature's per-plane
        # dots then reference a plain column (one normalize per row,
        # not one per plane — and the r16 unrolled dot's element_at
        # needs a cheap child)
        return df.select(
            F.col(id_col).alias(out_id),
            V.unit_normalize(F.col(vec_col)).alias(out_vec),
        ).select(
            out_id,
            out_vec,
            V.hyperplane_signature(F.col(out_vec), planes).alias("bucket"),
        )

    # spread the corpus: signature + scoring work shouldn't run on the
    # input's file-count parallelism (see _spread)
    c = prep(_spread(corpus), "neighbor_id", "cv")
    q = prep(queries, "query_id", "qv")
    if multiprobe:
        # each probed bucket is distinct and a corpus row has exactly one
        # bucket, so the explode cannot duplicate a (query, neighbor) pair
        q = q.withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << j))
                        for j in range(bits)
                    ],
                )
            ),
        )
    scored = (
        c.join(q, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            # dim is known here (probed/passed above) — unrolled dot
            F.round(V.dot(F.col("qv"), F.col("cv"), dim), 6).alias(
                "cosine"
            ),
        )
    )
    return _topk_by(scored, k, "cosine")


def _nearest_cells_udf(centroids, nprobe: int):
    """Arrow-batched assignment to the ``nprobe`` nearest (by dot product)
    unit centroids. ``centroids`` is a small driver-side numpy array
    broadcast with the serialized UDF — fine for the usual 2⁸–2¹⁶ cells.

    Takes the RAW vector column: against unit centroids, the dot-product
    ORDERING is invariant under positive scaling of the input, so cell
    choice needs no normalization (and a plain attribute input keeps the
    ArrowEvalPython projection trivial — nested-lambda normalize
    expressions are not evaluable as UDF inputs in Spark 4)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cent = centroids.T.copy()  # d×c, contiguous for the matmul

    def assign(vecs):
        mat = np.stack(vecs.to_numpy())  # b×d
        sims = mat @ cent  # b×c
        if nprobe == 1:
            # argmax (ties → lowest cell id, same as the stable sort) —
            # O(c) per row vs O(c log c); this is the corpus-sized path
            idx = np.argmax(sims, axis=1).reshape(-1, 1)
        else:
            # stable sort so equal similarities break ties by cell id —
            # deterministic across runs/partitions
            idx = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(idx.astype("int32")))

    # explicit real annotations (the module uses `from __future__ import
    # annotations`, which stringifies hints and breaks pandas_udf inference)
    assign.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(assign, "array<int>")


def train_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    method: str = "sample",
    kmeans_iters: int = 10,
    sample_rows: int = 20_000,
    seed: int = 42,
):
    """Centroid matrix (n_centroids × dim numpy, unit rows) for IVF.

    ``method="sample"``: the ``n_centroids`` lowest-id corpus vectors —
    deterministic, training-free, cell-balance-blind.
    ``method="kmeans"``: spherical k-means (Lloyd) on a deterministic
    hash-ordered sample of ≤ ``sample_rows`` vectors. The sample is a
    bounded driver action (the one acceptable collect: training set size is
    capped regardless of corpus size); assignment/update iterations run as
    numpy matmuls driver-side, so training cost is O(sample·cells·iters)
    and independent of the 100 TB corpus. Initialization is the first
    ``n_centroids`` sample rows; empty cells keep their previous centroid;
    all centroids stay unit-normalized so dot product = cosine.
    """
    import numpy as np

    if method == "sample":
        cent_rows = (
            corpus.select(F.col(id_col), V.unit_normalize(F.col(vec_col)).alias("v"))
            .orderBy(F.col(id_col))
            .limit(n_centroids)
            .collect()
        )
        return np.array([r["v"] for r in cent_rows], dtype="float64")
    if method != "kmeans":
        raise ValueError(f"centroids must be sample|kmeans, got {method!r}")

    # hash-ordered sample: deterministic across partitionings/runs, and
    # unbiased w.r.t. id locality (unlike lowest-id)
    rows = (
        corpus.select(
            V.unit_normalize(F.col(vec_col)).alias("v"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("__h"),
        )
        .orderBy("__h")
        .limit(sample_rows)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype="float64")
    if len(X) < n_centroids:
        raise ValueError(
            f"kmeans training needs >= n_centroids={n_centroids} sample rows, got {len(X)}"
        )
    cent = X[:n_centroids].copy()
    for _ in range(kmeans_iters):
        assign = (X @ cent.T).argmax(axis=1)  # spherical: max dot = min angle
        for ci in range(n_centroids):
            members = X[assign == ci]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cent[ci] = m / norm
    return cent


def kmeans_clusters(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Distributed spherical k-means over the FULL corpus (unlike
    :func:`train_centroids`'s bounded driver-side sample): every Lloyd
    iteration assigns all vectors Arrow-batched and updates centroids
    with one map-side-combinable groupBy — the clustering primitive for
    corpus curation (SemDeDup-style cluster-then-dedup, mixture
    analysis, per-cluster sampling). Returns ``(id_col, cluster)``.

    Determinism contract (what the chained-CTE oracle replays): init =
    the ``k`` lowest-id unit vectors (the IVF sample convention);
    assignment = argmax dot, ties to the lower cluster index; update =
    per-dimension mean of member unit vectors with each component
    rounded to 12 decimals and summed as DECIMAL(32,12) — exact and
    partition-order-independent, the BM25 decimal-sum trick — divided
    by the member count, then unit-normalized with a LEFT-TO-RIGHT
    sum of squares (replicating ``list_dot_product``); an empty cluster
    keeps its previous centroid.

    Scale: per iteration, one Arrow-batched assignment map plus one
    groupBy over (cluster, dimension) — k·dim result rows, partial
    aggregation collapses map-side, nothing corpus-sized ever reaches
    the driver (the k×dim centroid table is the only collect). Fixed
    small ``iters`` is the production IVF-training shape; cost is
    iters × (one corpus pass)."""
    import math

    import numpy as np

    if k <= 0:
        raise ValueError("k must be positive")
    if iters < 0:
        raise ValueError("iters must be >= 0")
    unit = _materialize(
        corpus.select(
            F.col(id_col).alias("id"),
            V.unit_normalize(F.col(vec_col)).alias("u"),
        )
    )
    cent = train_centroids(corpus, id_col, vec_col, k, "sample")
    dim = cent.shape[1]
    for _ in range(iters):
        assigned = unit.select(
            "id",
            "u",
            F.get(_nearest_cells_udf(cent, 1)(F.col("u")), 0).alias("cl"),
        )
        rows = (
            assigned.select("cl", F.posexplode("u").alias("d", "v"))
            .groupBy("cl", "d")
            .agg(
                F.sum(
                    F.round(F.col("v"), 12).cast("decimal(32,12)")
                ).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()  # k·dim rows — bounded regardless of corpus size
        )
        sums: dict = {}
        for r in rows:
            sums[(int(r["cl"]), int(r["d"]))] = (float(r["s"]), int(r["n"]))
        new = cent.copy()
        for ci in range(k):
            if (ci, 0) not in sums:
                continue  # empty cluster keeps its previous centroid
            m = [
                sums[(ci, d)][0] / sums[(ci, d)][1] for d in range(dim)
            ]
            ss = 0.0
            for x in m:  # left-to-right, matching list_dot_product
                ss += x * x
            nrm = math.sqrt(ss)
            if nrm > 0:
                new[ci] = [x / nrm for x in m]
        cent = np.asarray(new, dtype="float64")
    return unit.select(
        F.col("id").alias(id_col),
        F.get(_nearest_cells_udf(cent, 1)(F.col("u")), 0)
        .cast("int")
        .alias("cluster"),
    )


def save_centroids(spark: SparkSession, centroids, path: str) -> None:
    """Persist a trained IVF codebook (n×d unit rows) as a one-file parquet
    of ``(cell int, centroid array<double>)`` — readable by any Spark/
    DuckDB/Arrow consumer, tiny (2⁸–2¹⁶ rows), cheap to overwrite."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_centroids(spark: SparkSession, path: str):
    """Load a codebook written by :func:`save_centroids` (cell-ordered)."""
    import numpy as np

    rows = spark.read.parquet(path).orderBy("cell").collect()
    if not rows:
        raise ValueError(f"no centroids found at {path!r}")
    return np.array([r["centroid"] for r in rows], dtype="float64")


def load_pq_codebooks(spark: SparkSession, path: str, m: int, n_codes: int):
    """Load persisted PQ sub-codebooks (``subspace``/``code``-ordered
    parquet written by :func:`ivf_build_index`) as an m × n_codes × sub
    numpy array."""
    import numpy as np

    rows = spark.read.parquet(path).orderBy("subspace", "code").collect()
    if len(rows) != m * n_codes:
        raise ValueError(
            f"pq codebooks at {path!r} have {len(rows)} rows, expected "
            f"{m}×{n_codes}"
        )
    return np.array([r["centroid"] for r in rows], dtype="float64").reshape(
        m, n_codes, -1
    )


INDEX_FORMAT_VERSION = 1

# build params that change the index contents — recorded in the manifest
# and validated against the spec on every reuse of a persisted index.
# The pq_* keys are None/absent for a flat (full-vector) index; a flat
# spec against a PQ index (or vice versa) is a layout mismatch.
_INDEX_PARAMS = (
    "n_centroids", "centroids", "kmeans_iters", "sample_rows", "seed",
    "id_col", "vec_col", "pq_m", "pq_n_codes", "pq_codebooks",
    "quantization",
)


# driver-side cache for tiny per-index artifacts (codebooks, manifests):
# a build-once/query-many index pays one small Spark job per artifact per
# QUERY BATCH otherwise (measured ~0.8-1.1 s of fixed driver jobs per
# ivf_query_index call at sf0.1 — dwarfing the 0.55 s scoring job).
# Entries are validated by the directory's Hadoop FileStatus stamp
# (mtime+size of every file — one FS list call, no Spark job), so a
# rebuilt index is never served stale.
_META_CACHE: dict = {}


def _dir_stamp(spark: SparkSession, path: str) -> int:
    import zlib

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stamp = 1
    for st in fs.listStatus(hpath):
        # the file NAME goes into the stamp (ADVICE r6): mtime+size alone
        # collide when a rebuild writes same-size files within the FS's
        # mtime granularity (e.g. same n_centroids, different seed) —
        # Spark part-file names carry per-write UUIDs, so mixing them in
        # makes that collision practically impossible
        name_mix = zlib.crc32(st.getPath().getName().encode("utf-8"))
        stamp = (
            stamp * 1_000_003 + st.getModificationTime() + st.getLen() + name_mix
        ) % (1 << 62)
    return stamp


def _cached_meta(spark: SparkSession, path: str, loader):
    stamp = _dir_stamp(spark, path)
    hit = _META_CACHE.get(path)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    value = loader()
    _META_CACHE[path] = (stamp, value)
    return value


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists — any Spark-readable scheme (local,
    HDFS, s3a...); local paths short-circuit to one os.stat (r16)."""
    import os as _os

    from config_driven_pyspark_spark.operators.table import (
        _fs,
        _local_path,
    )

    jvm, fs = _fs(spark, path)
    lp = _local_path(fs, path)
    if lp is not None:
        return _os.path.exists(lp)
    return bool(fs.exists(jvm.org.apache.hadoop.fs.Path(path)))


def _corpus_fingerprint(corpus: DataFrame) -> Optional[str]:
    """Cheap identity for a file-backed corpus: sha256 of the sorted input
    file list (Spark part files carry write-scoped UUIDs, so a regenerated
    corpus changes the list even at identical sizes). Reads file locations
    from the ANALYZED logical plan, not ``DataFrame.inputFiles()`` — the
    latter runs after cache substitution, so a cached (or cache-matching)
    plan reports no files at all. None for genuinely non-file sources
    (in-memory frames); fingerprint checks are then skipped (best-effort
    guard: param checks still apply)."""
    import hashlib

    files: list = []
    try:
        leaves = corpus._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            try:  # LogicalRelation over HadoopFsRelation
                files.extend(leaf.relation().location().inputFiles())
            except Exception:  # non-file leaf (LocalRelation, v2, ...)
                continue
    except Exception:  # e.g. Spark Connect: no _jdf — fall back
        files = list(corpus.inputFiles())
    if not files:
        return None
    return hashlib.sha256(
        "\n".join(sorted(files)).encode("utf-8")
    ).hexdigest()[:16]


def write_index_manifest(spark: SparkSession, path: str, manifest: dict) -> None:
    """Persist ``<path>/manifest`` as one JSON line via a Spark text write
    (works on any Hadoop-compatible FS; no driver-local file assumptions)."""
    import json

    spark.createDataFrame(
        [(json.dumps(manifest, sort_keys=True),)], "value string"
    ).coalesce(1).write.mode("overwrite").text(f"{path}/manifest")


def read_index_manifest(spark: SparkSession, path: str) -> Optional[dict]:
    """The manifest written by :func:`ivf_build_index`, or None for a
    pre-manifest index (built by an older version of this module).
    Served from the stamp-validated driver cache — validation plus the
    query path otherwise each pay a small Spark job per query batch."""
    import json

    if not _fs_exists(spark, f"{path}/manifest"):
        return None

    def load():
        rows = spark.read.text(f"{path}/manifest").collect()
        return json.loads("".join(r["value"] for r in rows))

    manifest = _cached_meta(spark, f"{path}/manifest", load)
    # reject manifests from a NEWER layout than this reader understands
    # (ADVICE r6: format_version was written but never checked, so a
    # future layout bump would validate cleanly against old reader code).
    # Checked here — the one chokepoint both validation and the query
    # path read through — and on every call, not just cache misses.
    version = manifest.get("format_version", 1)
    if version > INDEX_FORMAT_VERSION:
        raise ValueError(
            f"IVF index at {path!r} has manifest format_version {version}, "
            f"newer than this reader's {INDEX_FORMAT_VERSION} — upgrade "
            "config_driven_pyspark_spark or rebuild the index with this "
            "version"
        )
    return manifest


def validate_index_manifest(
    spark: SparkSession, path: str, corpus: Optional[DataFrame] = None, **params
) -> None:
    """Guard against silently reusing a stale/mismatched persisted index:
    compare the spec's build params (and, for file-backed corpora, the
    corpus fingerprint) against ``<path>/manifest`` and raise ValueError
    on any difference. A manifest-less index (older build) only warns —
    it cannot be checked, but reuse should not hard-break on upgrade."""
    import warnings

    missing = set(_INDEX_PARAMS) - set(params)
    if missing:
        # a caller that forgets a build param would silently skip its
        # check — the central key list IS the validation contract
        raise ValueError(
            f"validate_index_manifest called without {sorted(missing)}; "
            "every _INDEX_PARAMS key must be supplied"
        )
    manifest = read_index_manifest(spark, path)
    if manifest is None:
        warnings.warn(
            f"IVF index at {path!r} has no manifest (built before manifest "
            "support); cannot verify its build params or source corpus match "
            "this spec — rebuild the index to silence this warning",
            stacklevel=2,
        )
        return
    # a key absent from the manifest counts as None (flat-layout indexes
    # predate / omit the pq_* keys), so spec-vs-layout disagreements in
    # either direction surface as mismatches
    mismatches = {
        key: (manifest.get(key), val)
        for key, val in params.items()
        if (key in manifest or val is not None) and manifest.get(key) != val
    }
    fp = _corpus_fingerprint(corpus) if corpus is not None else None
    stored_fp = manifest.get("corpus_fingerprint")
    if fp is not None and stored_fp is not None and fp != stored_fp:
        mismatches["corpus_fingerprint"] = (stored_fp, fp)
    if mismatches:
        detail = ", ".join(
            f"{key}: index has {old!r}, spec wants {new!r}"
            for key, (old, new) in sorted(mismatches.items())
        )
        raise ValueError(
            f"persisted IVF index at {path!r} does not match this spec "
            f"({detail}); delete the index directory to rebuild it, or "
            "point index_path at a fresh location"
        )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    broadcast_queries: bool = True,
    centroids: str = "sample",
    kmeans_iters: int = 10,
    sample_rows: int = 20_000,
    seed: int = 42,
    centroids_path: Optional[str] = None,
) -> DataFrame:
    """IVF-flat approximate cosine top-k.

    ``centroids`` picks the codebook: ``"sample"`` (deterministic lowest-id
    vectors, training-free) or ``"kmeans"`` (spherical k-means on a bounded
    driver-side sample — better cell balance and recall at equal nprobe;
    see ``train_centroids``). Corpus rows land in exactly one cell; queries
    fan out to ``nprobe`` cells, so cost is |corpus|/cells × nprobe per
    query instead of |corpus|.

    Scale: the corpus-side shuffle is on cell id (bounded cardinality =
    ``n_centroids``); per-cell skew is data-dependent — k-means centroids
    flatten it, more centroids flatten it further. Probing all cells
    reproduces brute force exactly. ``broadcast_queries=True`` fits the
    usual small-query-set case; set it False for query sets too big to
    broadcast (e.g. all-pairs over the corpus itself) — the join then
    shuffles both sides on the cell id.

    ``centroids_path``: persistent codebook. When set, an existing parquet
    at the path is loaded and training is SKIPPED entirely (the training
    method/seed args are then ignored by design — only the codebook SIZE
    is validated; for fully validated reuse build a manifested index via
    ``ivf_build_index``); when absent, centroids are trained once and
    saved there. At scale this is the
    difference between one k-means sample pass per *index build* and one
    per *query batch* — repeated lookups against a stable corpus reuse the
    codebook, and cell assignments stay consistent across runs (required
    if corpus cell ids are themselves persisted downstream).
    """
    spark = corpus.sparkSession
    trained = None
    if centroids_path is not None and _fs_exists(spark, centroids_path):
        # explicit existence probe (not a broad except AnalysisException):
        # a real read error on a present-but-corrupt codebook must surface,
        # not silently trigger an expensive retrain (ADVICE r5)
        trained = load_centroids(spark, centroids_path)
        # reuse is the documented contract (training method/seed are
        # intentionally NOT re-checked — use ivf_build_index's manifest
        # for validated reuse), but a codebook of the wrong SIZE would
        # silently change nprobe/n_centroids semantics: hard error.
        if len(trained) != n_centroids:
            raise ValueError(
                f"codebook at {centroids_path!r} has {len(trained)} "
                f"centroids but n_centroids={n_centroids} was requested — "
                "delete it to retrain, or pass the matching n_centroids"
            )
    if trained is None:
        trained = train_centroids(
            corpus, id_col, vec_col, n_centroids, centroids,
            kmeans_iters, sample_rows, seed,
        )
        if centroids_path is not None:
            save_centroids(spark, trained, centroids_path)
    centroids = trained

    # The Arrow UDF is deliberate here, not a compromise: a Column-math
    # argmax over literal centroid dots was measured 6× SLOWER end-to-end
    # (6.9 vs 1.1 s at sf0.1) because the join's pushed-down
    # isnotnull(cell) filter duplicates the whole literal expression —
    # including unit_normalize's per-element norm recompute (higher-order
    # functions are interpreted, no CSE) — while the UDF is opaque to
    # Catalyst, so the null filter tests its materialized output instead.
    # assignment reads the RAW vector (cell ordering is scale-invariant
    # against unit centroids); the unit vector is computed alongside for
    # scoring only. Known risk (documented, accepted): an exact oracle
    # that dots UNIT vectors instead can resolve a floating-point
    # NEAR-TIE between two centroids differently — mathematically the
    # same argmax, but the two computations round differently. On random
    # embeddings a meaningful tie is vanishingly unlikely; if a
    # hash-mismatch flake ever appears here, check tie distances first.
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        V.unit_normalize(F.col(vec_col)).alias("cv"),
        _nearest_cells_udf(centroids, 1)(F.col(vec_col)).getItem(0).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        V.unit_normalize(F.col(vec_col)).alias("qv"),
        F.explode(
            _nearest_cells_udf(centroids, nprobe)(F.col(vec_col))
        ).alias("cell"),
    )
    return _score_probed_cells(
        c, q, k, broadcast_queries, dim=int(centroids.shape[1])
    )


def _score_probed_cells(
    c: DataFrame, q: DataFrame, k: int, broadcast_queries: bool,
    score_col: str = "cosine", dim: int | None = None,
) -> DataFrame:
    """Shared IVF tail: cell equi-join → cosine → per-query top-k.
    ``c`` is (neighbor_id, cv vector, cell) — a unit vector (exact) or a
    PQ reconstruction (``score_col="approx_cosine"``); ``q`` is
    (query_id, qv unit vector, cell) with one row per probed cell.
    ``dim`` (the centroid/codebook width the caller already holds)
    unrolls the scoring dot into codegen (r16)."""
    scored = (
        c.join(F.broadcast(q) if broadcast_queries else q, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(V.dot(F.col("qv"), F.col("cv"), dim), 6).alias(
                score_col
            ),
        )
    )
    return _topk_by(scored, k, score_col)


def ivf_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    centroids: str = "sample",
    kmeans_iters: int = 10,
    sample_rows: int = 20_000,
    seed: int = 42,
    pq: Optional[dict] = None,
    quantization: Optional[str] = None,
) -> None:
    """Build a PERSISTED IVF index: ``<path>/centroids`` (the codebook,
    via :func:`save_centroids`) plus ``<path>/postings`` — every corpus
    vector unit-normalized and assigned to its nearest cell, written as
    parquet **partitioned by cell**.

    ``quantization="int8"`` is the THIRD postings layout (VERDICT r6 ask
    #6), between flat and PQ on the compression ladder: each unit vector
    is stored as int8 codes + one per-vector scale
    (:func:`quantize_embeddings` — explicit floor(x+0.5), so codes are
    bit-exact across engines and the driver oracle stays exact, unlike
    PQ's float-argmin codes) — 8× smaller than flat float64 with
    near-lossless recall (pinned ≈1.0 by test). Scoring dequantizes with
    pure Column math (map-only, codegen) and ranks by approx_cosine.

    This is the build-once / query-many layout for ANN at scale: the
    corpus is scanned and assigned exactly once per index build, and
    because ``cell`` is a physical partition directory, a query batch
    that probes ``nprobe`` of ``n_centroids`` cells reads only
    ``nprobe/n_centroids`` of the index from storage (static partition
    pruning — see :func:`ivf_query_index`), instead of rescanning and
    re-assigning 100 TB of embeddings per batch.

    ``pq={"m": 4, "n_codes": 16, "codebooks": "sample"}`` builds an
    IVF-**PQ** index: postings store ``m`` small codes per vector
    instead of the unit vector (measured **37× smaller on disk** at the
    defaults over sf0.1's 64-dim doubles — the dominant index-storage
    lever at 100 TB), with ``<path>/pq_codebooks`` persisted alongside.
    :func:`ivf_query_index` detects the layout from the manifest and
    ADC-scores reconstructions (see :func:`pq_topk`).

    ``centroids="path:<dir>"`` (and ``pq={"codebooks": "path:<dir>",
    "m": ..., "n_codes": ...}``) REUSES pre-trained artifacts instead of
    training — the primitive behind bit-identical rebuilds and the
    :func:`ivf_append_index` equivalence guarantee.
    """
    if quantization not in (None, "int8"):
        raise ValueError(
            f"quantization must be None or 'int8', got {quantization!r}"
        )
    if quantization and pq:
        raise ValueError(
            "quantization='int8' and pq=... are mutually exclusive postings "
            "layouts — pick one"
        )
    spark = corpus.sparkSession
    if centroids.startswith("path:"):
        cent = load_centroids(spark, centroids[len("path:"):])
        if len(cent) != n_centroids:
            raise ValueError(
                f"codebook at {centroids[5:]!r} has {len(cent)} centroids, "
                f"spec wants {n_centroids}"
            )
    else:
        cent = train_centroids(
            corpus, id_col, vec_col, n_centroids, centroids,
            kmeans_iters, sample_rows, seed,
        )
    save_centroids(spark, cent, f"{path}/centroids")
    pq_manifest = {}
    if pq:
        pq_m = int(pq.get("m", 4))
        pq_n_codes = int(pq.get("n_codes", 16))
        pq_method = pq.get("codebooks", "sample")
        if pq_method.startswith("path:"):
            cb = load_pq_codebooks(
                spark, pq_method[len("path:"):], pq_m, pq_n_codes
            )
        else:
            cb = pq_train_codebooks(
                corpus, id_col, vec_col, pq_m, pq_n_codes, pq_method,
                sample_rows, kmeans_iters, seed,
            )
        spark.createDataFrame(
            [
                (j, code, [float(x) for x in cb[j][code]])
                for j in range(pq_m) for code in range(pq_n_codes)
            ],
            "subspace int, code int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pq_codebooks")
        pq_manifest = {
            "pq_m": pq_m, "pq_n_codes": pq_n_codes, "pq_codebooks": pq_method,
        }
    postings = _encode_postings(
        corpus, id_col, vec_col, cent,
        pq_cb=cb if pq else None, quantization=quantization,
    )
    # co-locate each cell before the partitioned write: without this every
    # upstream task writes a file into every cell directory (tasks × cells
    # small files — measured at sf0.1 / 16 cells / 32 partitions: 501
    # files, 1.7-2.1 s vs 16 files, 0.9-1.1 s with the repartition), and
    # small-file count is what kills a 100 TB index read; files-per-cell
    # after = shuffle partitions holding that cell (AQE coalesces)
    postings.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/postings")
    # manifest last: its presence marks a COMPLETE build (params + corpus
    # identity), and every reuse validates against it instead of silently
    # querying an index built from different params or an older corpus.
    # n_rows comes from the just-written postings' parquet footers (no
    # second corpus scan).
    write_index_manifest(spark, path, {
        "format_version": INDEX_FORMAT_VERSION,
        "n_centroids": n_centroids,
        "centroids": centroids,
        "kmeans_iters": kmeans_iters,
        "sample_rows": sample_rows,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "corpus_fingerprint": _corpus_fingerprint(corpus),
        "n_rows": spark.read.parquet(f"{path}/postings").count(),
        "quantization": quantization,
        **pq_manifest,
    })


def _encode_postings(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cent,
    pq_cb=None,
    quantization: Optional[str] = None,
) -> DataFrame:
    """(neighbor_id, <layout payload>, cell) rows for a persisted-index
    write — ONE encode path shared by :func:`ivf_build_index` and
    :func:`ivf_append_index`, so appended vectors are encoded exactly as
    built ones. Payload by layout: flat → ``cv`` unit vector; pq →
    ``__codes``; int8 → ``__qcodes`` + ``__qscale`` (int8 SQ of the
    UNIT vector, :func:`quantize_embeddings`)."""
    if pq_cb is not None:
        payload = _pq_encode_udf(pq_cb)(F.col(vec_col)).alias("__codes")
    elif quantization == "int8":
        payload = V.unit_normalize(F.col(vec_col)).alias("__u")
    else:
        payload = V.unit_normalize(F.col(vec_col)).alias("cv")
    out = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        payload,
        _nearest_cells_udf(cent, 1)(F.col(vec_col)).getItem(0).alias("cell"),
    )
    if quantization == "int8":
        out = quantize_embeddings(out, "__u", "__qcodes", "__qscale").drop(
            "__u"
        ).select("neighbor_id", "__qcodes", "__qscale", "cell")
    return out


def ivf_append_index(
    corpus_new: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_duplicate: str = "allow",
) -> None:
    """Incrementally append NEW vectors to a persisted IVF / IVF-PQ index
    (VERDICT r6 ask #5) — growing corpora no longer force a full rebuild.

    Duplicate-id contract (``on_duplicate``): the default ``"allow"``
    trusts the caller to append each id once — re-appending a batch (or
    overlapping batches) duplicates its neighbor rows and inflates the
    manifest ``n_rows``, and compaction's row-count check then validates
    the duplicated total. ``"error"`` probes the existing postings ids
    (a semi-join on the pruned id column) and refuses overlapping
    appends by name; ``"skip"`` anti-joins already-present ids away and
    appends only the genuinely new rows — the idempotent-retry mode.
    Both probe modes read the postings id column once; ``"allow"`` keeps
    the append write-only (never reads existing postings).

    The new vectors are encoded with the SAME persisted artifacts the
    index was built with (centroids loaded, PQ sub-codebooks loaded,
    never retrained), assigned to cells, and written ``mode("append")``
    into the existing cell partitions with the same per-cell repartition
    (so appends add one file per cell touched, not tasks × cells small
    files). Because nothing is retrained, *append-then-query is
    bit-for-bit identical to a full rebuild over the combined corpus
    with the same artifacts* (pytest-pinned against
    ``ivf_build_index(centroids="path:...")``).

    The manifest is rewritten with the running ``n_rows``, an
    ``appends`` epoch counter, and a chained ``corpus_fingerprint``
    (sha256 of old-fp : new-fp) — so (a) the
    :func:`validate_index_manifest` guard correctly REFUSES a spec that
    still points at the pre-append corpus, and (b) the rewritten
    manifest + grown postings change their directory stamps, which
    invalidates every :func:`_cached_meta` entry for them — a repeat
    query batch can never be served the pre-append index state.

    Scale: one scan + one cell-keyed shuffle over only the NEW vectors;
    the existing postings are never read or rewritten. Compaction of
    many small appends is a rebuild (documented limitation).
    """
    import hashlib

    spark = corpus_new.sparkSession
    missing = [
        part for part in ("centroids", "postings")
        if not _fs_exists(spark, f"{path}/{part}")
    ]
    if missing:
        raise ValueError(
            f"no IVF index at {path!r}: missing {', '.join(missing)} — "
            "build one with ivf_build_index first"
        )
    manifest = read_index_manifest(spark, path)
    if manifest is None:
        raise ValueError(
            f"IVF index at {path!r} has no manifest; appending would "
            "guess its build params — rebuild it with this version first"
        )
    for key, val in (("id_col", id_col), ("vec_col", vec_col)):
        if manifest.get(key) != val:
            raise ValueError(
                f"append {key}={val!r} does not match the index's "
                f"{manifest.get(key)!r}"
            )
    if on_duplicate not in ("allow", "error", "skip"):
        raise ValueError(
            f"on_duplicate must be 'allow', 'error' or 'skip', "
            f"got {on_duplicate!r}"
        )
    if on_duplicate != "allow":
        existing = spark.read.parquet(f"{path}/postings").select(
            F.col("neighbor_id").alias(id_col)
        )
        if on_duplicate == "error":
            dup = corpus_new.select(id_col).join(
                existing, on=id_col, how="left_semi"
            )
            n_dup = dup.count()
            if n_dup:
                sample = [r[0] for r in dup.limit(5).collect()]
                raise ValueError(
                    f"ivf_append_index: {n_dup} id(s) in the append batch "
                    f"already exist in the index at {path!r} (e.g. "
                    f"{sample}) — re-appending would duplicate neighbor "
                    "rows; dedup the batch or use on_duplicate='skip'"
                )
        else:
            # localCheckpoint: this frame READS the postings path the
            # append below writes to — Spark's refreshByPath would
            # otherwise recompute it against the grown postings
            corpus_new = corpus_new.join(
                existing, on=id_col, how="left_anti"
            ).localCheckpoint()
    cent = load_centroids(spark, f"{path}/centroids")
    cb = None
    if manifest.get("pq_m"):
        cb = load_pq_codebooks(
            spark,
            f"{path}/pq_codebooks",
            int(manifest["pq_m"]),
            int(manifest["pq_n_codes"]),
        )
    postings = _encode_postings(
        corpus_new, id_col, vec_col, cent,
        pq_cb=cb, quantization=manifest.get("quantization"),
    )
    postings.repartition(F.col("cell")).write.mode("append").partitionBy(
        "cell"
    ).parquet(f"{path}/postings")
    old_fp = manifest.get("corpus_fingerprint")
    new_fp = _corpus_fingerprint(corpus_new)
    combined = (
        hashlib.sha256(f"{old_fp}:{new_fp}".encode()).hexdigest()[:16]
        if old_fp and new_fp
        else None
    )
    write_index_manifest(spark, path, {
        **manifest,
        "n_rows": int(manifest.get("n_rows") or 0) + corpus_new.count(),
        "appends": int(manifest.get("appends") or 0) + 1,
        "corpus_fingerprint": combined,
    })


def ncm_classify(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-class-mean classification over an embedding column — the
    classic embedding-space prototype classifier (and the fastest
    label-quality check a curation pipeline has: vectors whose NCM
    prediction disagrees with their label are mislabel/outlier
    candidates).  Class prototypes are the per-label means of the unit
    vectors — each component summed as DECIMAL(32,12) of 12-decimal
    roundings (exact, partition-order-independent — the k-means update
    contract) then unit-normalized — and every vector is assigned the
    prototype with the highest 6-decimal-rounded cosine, ties to the
    smaller label.  Output: (id, label, pred, cosine, correct).

    Scale: one groupBy over (label, dimension) — label·dim result rows,
    map-side partials — then a broadcast of the tiny prototype table
    and a |corpus|·|labels| map-side scoring with a per-vector
    row_number.  Nothing corpus-sized shuffles beyond the one
    aggregate."""
    dim = _dim_or_none(df, vec_col)
    unit = _spread(df).select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        V.unit_normalize(F.col(vec_col)).alias("u"),
    )
    comp = (
        unit.select("label", F.posexplode("u").alias("d", "v"))
        .groupBy("label", "d")
        .agg(
            (
                F.sum(
                    F.round(F.col("v"), 12).cast("decimal(32,12)")
                ).cast("double")
                / F.count("*")
            ).alias("m")
        )
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )
    protos = cent.select(
        F.col("label").alias("pred"),
        V.unit_normalize(F.col("c")).alias("cn"),
    )
    scored = unit.crossJoin(F.broadcast(protos)).select(
        "id",
        "label",
        "pred",
        F.round(V.dot(F.col("u"), F.col("cn"), dim), 6).alias("cosine"),
    )
    best = scored.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("id").orderBy(
                F.desc("cosine"), F.col("pred")
            )
        ),
    ).filter(F.col("__rn") == 1)
    return best.select(
        F.col("id").alias(id_col), "label", "pred", "cosine",
        (F.col("label") == F.col("pred")).alias("correct"),
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """ANN quality evaluation — per-query recall of an approximate result
    set against the exact one: ``recall = |approx ∩ exact| / |exact|``
    over each query's neighbor ids.  Output: (query, n_hits, n_exact,
    recall), one row per query present in ``exact``.  This is the
    measure-don't-guess harness every approximate tier here is tuned
    against (the pytest recall pins on IVF/PQ/SQ use the same
    definition); as an operator it lets a config pipeline score any ANN
    stage against a brute-force stage on live data.

    Scale: both inputs are |queries|·k rows — tiny next to the corpus —
    so the join and groupBy are negligible at any corpus size; recall is
    an exact integer ratio, bit-replicable by an external oracle.
    Duplicate (query, neighbor) pairs in either input are collapsed
    before the join — a duplicated approx pair must not multiply exact
    rows (that would inflate both n_hits and the n_exact denominator)."""
    a = approx.select(query_col, neighbor_col).distinct().withColumn(
        "__hit", F.lit(1)
    )
    e = exact.select(query_col, neighbor_col).distinct()
    return (
        e.join(a, [query_col, neighbor_col], "left")
        .groupBy(query_col)
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint").alias("n_hits"),
            F.count("*").cast("bigint").alias("n_exact"),
        )
        .withColumn(
            "recall",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_exact"), 9
            ),
        )
    )


def contrastive_triplets(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 20,
    pos_threshold: float = 0.9,
    neg_lo: float = 0.5,
    neg_hi: float = 0.8,
    n_neg: int = 3,
    pool: DataFrame | None = None,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(anchor, positive, semi-hard negative) training triplets for
    contrastive/embedding-model fine-tuning, mined from each anchor's
    k-NN pool: the positive is the highest-cosine neighbor at or above
    ``pos_threshold`` (ties → smaller id); negatives are the top
    ``n_neg`` neighbors inside the SEMI-HARD band
    [``neg_lo``, ``neg_hi``) — close enough to be informative, below the
    positive band so they are not unlabeled positives (the
    false-negative guard); anchors missing either side emit nothing.
    Output: one row per (anchor, negative) —
    ``(anchor_id, positive_id, pos_cosine, negative_id, neg_cosine,
    neg_rank)``.

    ``pool`` swaps in any precomputed ``(query_id, neighbor_id, rank,
    cosine)`` frame — e.g. ``ivf_query_index(rerank=...)`` output — so
    the mining rides the persisted ANN tier at corpus scale; the default
    is the exact ``brute_force_topk`` search (the oracle path), against
    ``queries`` anchors when given (broadcast — the usual bounded anchor
    batch) else corpus-vs-itself (every doc an anchor; |corpus|² dot
    products — use ``pool``/``queries`` past toy scale). Everything
    downstream of the pool is two filters, two |anchors|·k windows and
    one join — negligible next to the search itself."""
    if not (neg_lo < neg_hi <= pos_threshold):
        raise ValueError(
            "bands must satisfy neg_lo < neg_hi <= pos_threshold "
            f"(got {neg_lo}, {neg_hi}, {pos_threshold})"
        )
    if n_neg <= 0:
        raise ValueError("n_neg must be positive")
    if pool is None:
        pool = brute_force_topk(
            corpus, queries if queries is not None else corpus,
            k, id_col, vec_col,
            broadcast_queries=queries is not None,
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    pos = (
        pool.filter(F.col("cosine") >= pos_threshold)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neighbor_id").alias("positive_id"),
            F.col("cosine").alias("pos_cosine"),
        )
    )
    neg = (
        pool.filter(
            (F.col("cosine") >= neg_lo) & (F.col("cosine") < neg_hi)
        )
        .withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("neg_rank") <= n_neg)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neighbor_id").alias("negative_id"),
            F.col("cosine").alias("neg_cosine"),
            "neg_rank",
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id", "positive_id", "pos_cosine",
        "negative_id", "neg_cosine", "neg_rank",
    )


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    query_col: str = "query_id",
    cand_col: str = "neighbor_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998) —
    the standard diversity pass over an ANN candidate pool: per query,
    greedily select ``k`` of the pool, first by pure relevance, then by
    ``λ·rel − (1−λ)·max_sim_to_selected``, so near-duplicate hits stop
    crowding out distinct ones.  Input ``candidates`` is any per-query
    pool (``query_col``, ``cand_col`` — e.g. a widened
    :func:`brute_force_topk`/:func:`ivf_query_index` result); true
    vectors come from ``corpus``/``queries``.  Output: (query, cand,
    rank, mmr_score) with mmr_score = the value that won each step
    (step 1: the relevance itself).

    Determinism (oracle-replicable): relevance and candidate-candidate
    similarities are cosines of unit vectors rounded to 6 (the repo
    convention, computed with the same sequential-fold dot the SQL
    engines use); each step's MMR value rounds to 6 before the argmax
    and ties break to the smaller candidate id.

    Scale: the pool is |queries|·pool_size rows — tiny next to the
    corpus — so the joins are broadcast-sized and the greedy selection
    runs per query group in ONE Arrow-batched ``applyInPandas`` (the
    justified-UDF case: a data-dependent sequential argmax loop, O(k·
    pool) dots on an already-small pool, never corpus-touching)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    dim = _dim_or_none(queries, vec_col)
    cu = corpus.select(
        F.col(id_col).alias(cand_col),
        V.unit_normalize(F.col(vec_col)).alias("__cu"),
    )
    qu = queries.select(
        F.col(id_col).alias(query_col),
        V.unit_normalize(F.col(vec_col)).alias("__qu"),
    )
    pool = (
        candidates.select(query_col, cand_col)
        .join(cu, cand_col)
        .join(F.broadcast(qu), query_col)
        .select(
            query_col,
            cand_col,
            F.round(
                V.dot(F.col("__qu"), F.col("__cu"), dim), 6
            ).alias("__rel"),
            "__cu",
        )
    )
    lam_f = float(lam)
    k_i = int(k)
    q_name, c_name = query_col, cand_col

    def _dot(a, b) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    def pick(pdf):
        import pandas as pd

        qid = pdf[q_name].iloc[0]
        pool_rows = {
            int(r[c_name]): (float(r["__rel"]), list(r["__cu"]))
            for r in pdf.to_dict("records")
        }
        selected: list[tuple[int, float]] = []
        maxsim: dict[int, float] = {}
        while pool_rows and len(selected) < k_i:
            best_id, best_score = None, None
            for cid in sorted(pool_rows):
                rel, _ = pool_rows[cid]
                if not selected:
                    score = rel
                else:
                    score = round(
                        lam_f * rel - (1.0 - lam_f) * maxsim[cid], 6
                    )
                if best_score is None or score > best_score:
                    best_id, best_score = cid, score
            _, best_vec = pool_rows.pop(best_id)
            maxsim.pop(best_id, None)
            selected.append((best_id, best_score))
            for cid, (_, vec) in pool_rows.items():
                sim = round(_dot(vec, best_vec), 6)
                prev = maxsim.get(cid)
                if prev is None or sim > prev:
                    maxsim[cid] = sim
        return pd.DataFrame(
            [
                (qid, cid, i + 1, score)
                for i, (cid, score) in enumerate(selected)
            ],
            columns=[q_name, c_name, "rank", "mmr_score"],
        )

    schema = (
        f"{q_name} bigint, {c_name} bigint, rank int, mmr_score double"
    )
    return pool.groupBy(q_name).applyInPandas(pick, schema)


def rrf_fuse(
    rankings: list,
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid-
    retrieval combiner: given N per-query rankings of the same id space
    (e.g. BM25 lexical + embedding ANN), score every candidate
    ``Σ_i 1/(rrf_k + rank_i)`` (absent from a ranking contributes 0) and
    re-rank. Rank-based, so the component scores never need calibrating
    against each other — exactly why RRF is the default fusion in hybrid
    search engines.

    Determinism: the per-ranking contributions are summed EXPLICITLY in
    list order (a left-to-right Column ``+`` chain over the full-outer
    join of the rankings, not a ``sum()`` aggregate), so the float
    result is bit-reproducible and an external oracle adding the same
    coalesced terms in the same order matches exactly. Ties break to the
    smaller id (:func:`_topk_by`).

    Scale: N-1 equi-joins on (query, id) over frames that are already
    top-k-per-query (|queries|·k rows each) — the fusion input is tiny
    by construction regardless of corpus size; the expensive work
    happened inside the component retrievers, which scale on their own
    terms (BM25's bounded postings, ANN's pruned cells)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    scored = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            (
                F.lit(1.0)
                / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))
            ).alias(f"__s{i}"),
        )
        for i, r in enumerate(rankings)
    ]
    from functools import reduce

    joined = reduce(
        lambda a, b: a.join(b, ["query_id", "neighbor_id"], "full_outer"),
        scored,
    )
    contrib = [
        F.coalesce(F.col(f"__s{i}"), F.lit(0.0)) for i in range(len(scored))
    ]
    total = reduce(lambda a, b: a + b, contrib)
    return _topk_by(
        joined.select(
            "query_id", "neighbor_id", F.round(total, 9).alias("rrf_score")
        ),
        k,
        "rrf_score",
    )


def ivf_delete_index(
    spark: SparkSession,
    path: str,
    ids,
    id_col: str = "vec_id",
) -> int:
    """Delete vectors from a persisted IVF index by id — the fourth
    piece of the lifecycle (build / append / compact / delete), in the
    LSM shape that actually scales: deletes append 8-byte ids to
    ``<path>/tombstones`` (O(batch), no postings rewrite), every
    :func:`ivf_query_index` anti-joins the tombstones against the
    pruned postings scan (tombstones are tiny → broadcast, partition
    pruning untouched), and :func:`ivf_compact_index` physically drops
    tombstoned rows and clears the table.  Returns the number of
    tombstone rows appended (pre-existing duplicates are fine — the
    anti-join is idempotent).

    Contract: a tombstoned id is dead to queries even if a later
    :func:`ivf_append_index` re-adds it (the anti-join matches ids,
    not epochs) — compact FIRST to resurrect an id.  Single-writer,
    same as build/append/compact."""
    missing = [
        part for part in ("centroids", "postings")
        if not _fs_exists(spark, f"{path}/{part}")
    ]
    if missing:
        raise ValueError(
            f"no IVF index at {path!r}: missing {', '.join(missing)} — "
            "build one with ivf_build_index first"
        )
    if isinstance(ids, DataFrame):
        tomb = ids.select(
            F.col(id_col).cast("bigint").alias("neighbor_id")
        ).distinct()
    else:
        tomb = spark.createDataFrame(
            [(int(i),) for i in ids], "neighbor_id bigint"
        ).distinct()
    n = tomb.count()
    if n:
        tomb.coalesce(1).write.mode("append").parquet(f"{path}/tombstones")
    return n


def _apply_tombstones(
    spark: SparkSession, path: str, postings: DataFrame
) -> DataFrame:
    """Anti-join ``<path>/tombstones`` (if any) against a postings scan.
    Broadcast by size: the tombstone table is ids-only and tiny next to
    the postings, so the join never disturbs partition pruning."""
    if not _fs_exists(spark, f"{path}/tombstones"):
        return postings
    tomb = spark.read.parquet(f"{path}/tombstones")
    return postings.join(F.broadcast(tomb), "neighbor_id", "left_anti")


def ivf_compact_index(spark: SparkSession, path: str) -> None:
    """Compact a persisted index's postings after many small appends —
    the third piece of the build/append/compact lifecycle. Every
    :func:`ivf_append_index` adds roughly one file per touched cell;
    after N appends a cell directory holds N+1 files, and small-file
    count is what kills a 100 TB index read (every file is a parquet
    footer fetch + task). Compaction rewrites the postings with the
    same per-cell repartition the build uses — files-per-cell returns
    to the AQE-coalesced shuffle-partition count — without touching
    payloads: rows are copied as-is (any layout: flat/PQ/int8), so
    query results are bit-for-bit unchanged (pytest-pinned).

    The rewrite goes to a sibling ``postings_compacting`` directory,
    is row-count-verified against the manifest BEFORE the swap (a
    short write can never replace good postings), then swapped in via
    two FS renames; the manifest is rewritten last with a bumped
    ``compactions`` counter, so every driver-cache stamp invalidates.
    The swap window is two renames wide — run compaction from the
    writer that owns the index, like build/append."""
    missing = [
        part for part in ("centroids", "postings")
        if not _fs_exists(spark, f"{path}/{part}")
    ]
    if missing:
        raise ValueError(
            f"no IVF index at {path!r}: missing {', '.join(missing)} — "
            "build one with ivf_build_index first"
        )
    manifest = read_index_manifest(spark, path)
    if manifest is None:
        raise ValueError(
            f"IVF index at {path!r} has no manifest; compacting would "
            "trust unverifiable postings — rebuild it with this version"
        )
    tmp = f"{path}/postings_compacting"
    old = f"{path}/postings_precompact"
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    for stale in (tmp, old):  # debris from a crashed earlier compaction
        fs.delete(jvm.org.apache.hadoop.fs.Path(stale), True)
    postings = spark.read.parquet(f"{path}/postings")
    # physical removal point for ivf_delete_index tombstones: count the
    # tombstoned rows actually present FIRST (ids deleted twice or never
    # present must not shift the verification target), rewrite without
    # them, clear the table after the swap
    has_tombs = _fs_exists(spark, f"{path}/tombstones")
    n_dead = 0
    if has_tombs:
        tomb = spark.read.parquet(f"{path}/tombstones")
        n_dead = postings.join(
            F.broadcast(tomb), "neighbor_id", "left_semi"
        ).count()
        postings = postings.join(
            F.broadcast(tomb), "neighbor_id", "left_anti"
        )
    postings.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(tmp)
    n = spark.read.parquet(tmp).count()
    expected = int(manifest.get("n_rows") or 0) - n_dead
    if n != expected:
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise ValueError(
            f"compaction of {path!r} produced {n} rows but the manifest "
            f"records {expected} — aborted, original postings untouched"
        )
    p_post = jvm.org.apache.hadoop.fs.Path(f"{path}/postings")
    if not fs.rename(p_post, jvm.org.apache.hadoop.fs.Path(old)):
        raise IOError(f"could not move aside {path}/postings")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), p_post):
        # roll back so the index stays queryable
        fs.rename(jvm.org.apache.hadoop.fs.Path(old), p_post)
        raise IOError(f"could not swap compacted postings into {path!r}")
    fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)
    if has_tombs:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/tombstones"), True)
    write_index_manifest(spark, path, {
        **manifest,
        "n_rows": n,
        "compactions": int(manifest.get("compactions") or 0) + 1,
        "deletes_applied": int(manifest.get("deletes_applied") or 0)
        + n_dead,
    })


def ivf_query_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    broadcast_queries: bool = True,
    rerank: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Query a persisted IVF index built by :func:`ivf_build_index`.

    The codebook is loaded (no training), query vectors are assigned to
    their ``nprobe`` nearest cells, and the postings scan is filtered
    with a LITERAL ``cell IN (probed...)`` predicate computed from the
    query batch — ``cell`` is the parquet partition column, so the
    filter becomes a static PartitionFilter and only the probed cell
    directories are read at all (plan-pinned by test). The driver-side
    probe-cell computation is one bounded action over the query batch
    (the usual few-to-thousands lookup case; for corpus-sized query sets
    use :func:`ivf_topk` with ``broadcast_queries=False`` instead).
    Results are identical to :func:`ivf_topk` with the same codebook.

    An IVF-PQ index (built with ``pq=...``) is detected from the
    manifest: postings carry codes, the persisted sub-codebooks are
    loaded, and candidates are ADC-scored on reconstructions — results
    identical to :func:`ivfpq_topk` with the same codebooks, score
    column ``approx_cosine``.

    ``rerank`` (>= k) switches on the standard ANN+rerank deployment:
    the per-query approximate pool is widened to ``rerank`` candidates,
    then exact-rescored against ``corpus`` (the TRUE vectors — required,
    since pq/int8 postings only store lossy codes) and cut to top-k
    exact cosines (score column ``cosine``). A |queries|·rerank-row
    join — the only place full vectors are touched again — so the
    pruned-cells scan economics are unchanged at scale.
    """
    if rerank:
        if rerank < k:
            raise ValueError(
                f"rerank pool ({rerank}) must be >= k ({k})"
            )
        if corpus is None:
            raise ValueError(
                "rerank needs corpus=<the true-vector DataFrame>: pq/int8 "
                "postings store only lossy codes, so exact re-scoring must "
                "read the original vectors"
            )
    # name the exact missing piece rather than letting a downstream
    # AnalysisException (which could equally mean a bad queries frame)
    # masquerade as "index absent" (ADVICE r5)
    missing = [
        part for part in ("centroids", "postings")
        if not _fs_exists(spark, f"{path}/{part}")
    ]
    if missing:
        raise ValueError(
            f"no IVF index at {path!r}: missing {', '.join(missing)} — "
            "build one with ivf_build_index first"
        )
    # per-batch metadata loads come from the stamp-validated driver cache:
    # repeated query batches against a stable index skip every metadata
    # Spark job and go straight to the (pruned) scoring job
    cent = _cached_meta(
        spark, f"{path}/centroids",
        lambda: load_centroids(spark, f"{path}/centroids"),
    )
    q = _materialize(
        queries.select(
            F.col(id_col).alias("query_id"),
            V.unit_normalize(F.col(vec_col)).alias("qv"),
            F.explode(
                _nearest_cells_udf(cent, nprobe)(F.col(vec_col))
            ).alias("cell"),
        )
    )
    probed = [r["cell"] for r in q.select("cell").distinct().collect()]
    c = _apply_tombstones(
        spark, path,
        spark.read.parquet(f"{path}/postings").filter(
            F.col("cell").isin(probed)
        ),
    )
    manifest = read_index_manifest(spark, path) or {}
    # the postings schema is ground truth for the LAYOUT: a build that
    # died between the postings write and the manifest write (or a lost
    # manifest) must not fall through to the wrong scoring path — code
    # postings on the flat path would raise an unrelated
    # unresolved-column error; vector postings on the PQ path likewise
    actual = (
        "pq" if "__codes" in c.columns
        else "int8" if "__qcodes" in c.columns
        else "flat"
    )
    declared = (
        "pq" if manifest.get("pq_m")
        else "int8" if manifest.get("quantization") == "int8"
        else "flat"
    )
    if actual != declared:
        raise ValueError(
            f"IVF index at {path!r} is incomplete or mislabeled: postings "
            f"carry the {actual} layout but the manifest says {declared} — "
            "rebuild the index with ivf_build_index"
        )
    pool_k = rerank or k

    def _tail(approx: DataFrame) -> DataFrame:
        if not rerank:
            return approx
        return _rerank_exact(
            approx, corpus, queries, k, rerank, id_col, vec_col,
            broadcast_queries,
        )

    if declared == "int8":
        # dequantize in pure Column math (map-only, codegen): every code
        # is an exact small integer and the scale an exact double, so the
        # reconstruction — and therefore the rounded score — is bit-
        # replicable by the SQL oracle, unlike PQ's float-argmin codes
        c = c.select(
            "neighbor_id",
            "cell",
            F.transform(
                F.col("__qcodes"),
                lambda x: x.cast("double") * F.col("__qscale"),
            ).alias("cv"),
        )
        return _tail(_score_probed_cells(
            c, q, pool_k, broadcast_queries, score_col="approx_cosine",
            dim=int(cent.shape[1]),
        ))
    if manifest.get("pq_m"):
        import numpy as np

        if not _fs_exists(spark, f"{path}/pq_codebooks"):
            raise ValueError(
                f"no IVF index at {path!r}: missing pq_codebooks — "
                "build one with ivf_build_index first"
            )
        pq_m = int(manifest["pq_m"])
        pq_n_codes = int(manifest["pq_n_codes"])

        cb = _cached_meta(
            spark,
            f"{path}/pq_codebooks",
            lambda: load_pq_codebooks(
                spark, f"{path}/pq_codebooks", pq_m, pq_n_codes
            ),
        )
        c = c.select("neighbor_id", "cell", _pq_recon_col(cb).alias("cv"))
        return _tail(_score_probed_cells(
            c, q, pool_k, broadcast_queries, score_col="approx_cosine",
            dim=int(cent.shape[1]),
        ))
    return _tail(_score_probed_cells(
        c, q, pool_k, broadcast_queries, dim=int(cent.shape[1])
    ))


def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    n_codes: int = 16,
    method: str = "sample",
    sample_rows: int = 20_000,
    kmeans_iters: int = 10,
    seed: int = 42,
):
    """Product-quantization codebooks: an ``m × n_codes × (dim/m)`` numpy
    array — subspace ``j``'s codebook is column-slice ``j`` of the
    training vectors.

    ``method="sample"``: the ``n_codes`` lowest-id unit vectors, sliced —
    deterministic and training-free (the same convention as IVF's sample
    centroids, so an external oracle regenerates the codebooks exactly).
    ``method="kmeans"``: per-subspace Lloyd k-means on a bounded
    hash-ordered driver sample (the classic PQ training), seeded and
    deterministic but not practically oracle-replicable.
    """
    import numpy as np

    if method == "sample":
        rows = (
            corpus.select(F.col(id_col), V.unit_normalize(F.col(vec_col)).alias("v"))
            .orderBy(F.col(id_col))
            .limit(n_codes)
            .collect()
        )
        X = np.array([r["v"] for r in rows], dtype="float64")
    elif method == "kmeans":
        rows = (
            corpus.select(
                V.unit_normalize(F.col(vec_col)).alias("v"),
                F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("__h"),
            )
            .orderBy("__h")
            .limit(sample_rows)
            .collect()
        )
        X = np.array([r["v"] for r in rows], dtype="float64")
    else:
        raise ValueError(f"method must be sample|kmeans, got {method!r}")
    if len(X) < n_codes:
        raise ValueError(
            f"PQ needs >= n_codes={n_codes} training rows, got {len(X)}"
        )
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    if method == "sample":
        return X[:n_codes].reshape(n_codes, m, sub).transpose(1, 0, 2).copy()
    cbs = []
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        cent = S[:n_codes].copy()
        for _ in range(kmeans_iters):
            d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for ci in range(n_codes):
                members = S[assign == ci]
                if len(members):
                    cent[ci] = members.mean(axis=0)
        cbs.append(cent)
    return np.stack(cbs)


def _pq_encode_udf(codebooks):
    """Arrow-batched PQ encoder: raw vector → ``m`` uint8-ish codes.
    Per subspace ``j``, code = argmin over centroids of the unit vector's
    squared L2 distance — computed via the ordering-equivalent key
    ``|c|² − 2·u_j·c`` (ties → lower code, matching the oracle's
    ``ORDER BY key, code``). Normalization happens in-batch (numpy):
    nested-lambda Column inputs aren't evaluable as UDF inputs in
    Spark 4, same constraint as ``_nearest_cells_udf``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, n_codes, sub = codebooks.shape
    cnorm = (codebooks ** 2).sum(-1)  # m × n_codes

    def encode(vecs):
        X = np.stack(vecs.to_numpy())  # b × d
        sq = (X * X).sum(axis=1, keepdims=True)
        if not sq.all():
            # a zero vector has no direction to encode; dividing through
            # would yield NaN subspace keys whose argmin picks an
            # arbitrary code, silently diverging from the SQL oracle's
            # NaN ordering (ADVICE r6) — fail loudly instead, matching
            # the documented all-zero contract of quantize_embeddings
            # (which CAN represent it: scale 0, zero codes)
            raise ValueError(
                "pq encode: all-zero embedding vector cannot be "
                "PQ-encoded (cosine is undefined); filter zero-norm rows "
                "out or use quantize_embeddings for storage compression"
            )
        U = X / np.sqrt(sq)
        codes = np.empty((len(X), m), dtype="int32")
        for j in range(m):
            Uj = U[:, j * sub:(j + 1) * sub]
            key = cnorm[j][None, :] - 2.0 * (Uj @ codebooks[j].T)
            codes[:, j] = key.argmin(axis=1)  # ties → lowest code
        return pd.Series(list(codes))

    encode.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(encode, "array<int>")


def _pq_recon_col(codebooks) -> Column:
    """Reconstruction of a PQ-coded vector from the ``__codes`` column:
    per subspace, a literal codebook lookup (1-based ``element_at``),
    concatenated — pure Column math, whole-stage-codegen eligible."""
    m, n_codes, _sub = codebooks.shape
    return F.flatten(
        F.array(
            *[
                F.element_at(
                    F.array(
                        *[
                            F.array(*[F.lit(float(x)) for x in codebooks[j][code]])
                            for code in range(n_codes)
                        ]
                    ),
                    F.element_at(F.col("__codes"), j + 1) + 1,
                )
                for j in range(m)
            ]
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    n_codes: int = 16,
    method: str = "sample",
    broadcast_queries: bool = True,
    sample_rows: int = 20_000,
    kmeans_iters: int = 10,
    seed: int = 42,
    rerank: int = 0,
) -> DataFrame:
    """Product-quantization approximate cosine top-k (ADC by
    reconstruction): corpus vectors are compressed to ``m`` codes
    (``m·log2(n_codes)`` bits — 4 bytes/vector at the defaults vs 512 for
    raw float64×64), and each pair is scored as ``dot(q_unit,
    reconstruct(codes))`` = the classic asymmetric-distance sum
    ``Σ_j <q_j, c_{j,code_j}>``, computed with reconstruction as literal
    Column lookups so scoring stays whole-stage-codegen.

    Scale: PQ is the MEMORY-side ANN lever (IVF/SRP prune candidates;
    PQ shrinks what each candidate costs to score/store): the encoded
    corpus is ~128× smaller, fits higher in the storage hierarchy, and
    the scoring scan reads codes, not vectors. Encoding is one
    Arrow-batched pass; codebooks are ``m·n_codes·(d/m)`` doubles,
    literal-folded. Compose with IVF (probe cells, then PQ-score within
    them) when both pruning and compression are needed.

    ``rerank=R`` (R > k) is the standard PQ deployment: ADC selects the
    top-R candidate pool from codes alone, then only those R rows per
    query are re-scored against their TRUE vectors (one |queries|·R-row
    join back to the corpus) and re-ranked to top-k with exact cosines
    (output column ``cosine`` instead of ``approx_cosine``).
    Quantization collapse — distinct same-cell vectors reconstructing
    identically, which caps code-only recall@5 at ~k/cluster-size on
    tightly clustered data — disappears: measured recall@5 0.44 → 0.975
    (sample) / 0.995 (kmeans) at m=8, n_codes=64, rerank=50 on the
    PLANS.md r6 corpus, while the full-corpus scan still reads only
    codes. Known risk, same class as
    IVF assignment (documented there): float near-ties between two codes
    could round differently vs an external reimplementation; vanishingly
    unlikely on real embeddings."""
    if rerank and rerank < k:
        raise ValueError(f"rerank={rerank} must be >= k={k}")
    cb = pq_train_codebooks(
        corpus, id_col, vec_col, m, n_codes, method,
        sample_rows, kmeans_iters, seed,
    )
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _pq_encode_udf(cb)(F.col(vec_col)).alias("__codes"),
    )
    c = c.select("neighbor_id", _pq_recon_col(cb).alias("cv"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        V.unit_normalize(F.col(vec_col)).alias("qv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q) if broadcast_queries else q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.dot(
                    F.col("qv"), F.col("cv"),
                    int(cb.shape[0] * cb.shape[2]),
                ),
                6,
            ).alias("approx_cosine"),
        )
    )
    approx = _topk_by(scored, rerank or k, "approx_cosine")
    if not rerank:
        return approx
    return _rerank_exact(
        approx, corpus, queries, k, rerank, id_col, vec_col,
        broadcast_queries,
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    centroids: str = "sample",
    codebooks: str = "sample",
    broadcast_queries: bool = True,
    rerank: int = 0,
    sample_rows: int = 20_000,
    kmeans_iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF×PQ — the standard billion-scale ANN composition: IVF prunes
    WHICH vectors are scored (each query touches ``nprobe/n_centroids``
    of the corpus), PQ shrinks WHAT scoring a candidate costs (codes,
    ``m·log2(n_codes)`` bits, instead of the raw vector). One corpus
    pass computes both the cell id and the PQ codes; the probed-cell
    equi-join then carries only (id, cell, codes) — at 100 TB the
    scored payload is ~128× lighter than IVF-flat's unit vectors, and
    the candidate count is ~nprobe/n_centroids of PQ-alone's full scan.

    Scoring is ADC by literal-lookup reconstruction (see
    :func:`pq_topk`); ``rerank=R`` re-scores the per-query top-R pool
    against true vectors (one |queries|·R join back to the corpus) and
    is the standard way to recover recall lost to quantization collapse.
    Both codebook kinds default to the deterministic ``sample`` path so
    an external oracle can replicate end to end; ``kmeans`` trains each
    on a bounded driver-side sample.
    """
    if rerank and rerank < k:
        raise ValueError(f"rerank={rerank} must be >= k={k}")
    cent = train_centroids(
        corpus, id_col, vec_col, n_centroids, centroids,
        kmeans_iters, sample_rows, seed,
    )
    cb = pq_train_codebooks(
        corpus, id_col, vec_col, m, n_codes, codebooks,
        sample_rows, kmeans_iters, seed,
    )
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _nearest_cells_udf(cent, 1)(F.col(vec_col)).getItem(0).alias("cell"),
        _pq_encode_udf(cb)(F.col(vec_col)).alias("__codes"),
    )
    c = c.select("neighbor_id", "cell", _pq_recon_col(cb).alias("cv"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        V.unit_normalize(F.col(vec_col)).alias("qv"),
        F.explode(
            _nearest_cells_udf(cent, nprobe)(F.col(vec_col))
        ).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q) if broadcast_queries else q, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.dot(
                    F.col("qv"), F.col("cv"),
                    int(cb.shape[0] * cb.shape[2]),
                ),
                6,
            ).alias("approx_cosine"),
        )
    )
    approx = _topk_by(scored, rerank or k, "approx_cosine")
    if not rerank:
        return approx
    return _rerank_exact(
        approx, corpus, queries, k, rerank, id_col, vec_col,
        broadcast_queries,
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qcodes",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric int8 scalar quantization — the storage/bandwidth step
    between raw float embeddings (8 bytes/dim) and PQ (sub-byte/vector):
    per-vector ``scale = max|x| / 127`` and
    ``code_i = floor(x_i / scale + 0.5)`` ∈ [−127, 127], stored as
    ``array<smallint>`` + one double — 8× smaller than float64 with
    near-lossless cosine ranking (recall pinned by test).

    Pure Column math (``transform``/``aggregate``), map-only: no UDF, no
    shuffle, whole-stage codegen. Rounding is explicit floor(x+0.5) —
    identical semantics in every SQL engine, unlike round()'s
    half-even/half-away dialect differences — so an external oracle
    replicates codes bit-for-bit. The all-zero vector gets scale 0 and
    all-zero codes (not NULLs). :func:`dequantize_embeddings` inverts.
    """
    v = F.col(vec_col).cast("array<double>")
    max_abs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    # one aggregate whose FINISH lambda does the guard + per-element
    # division: higher-order functions evaluate interpreted with no
    # common-subexpression elimination, so embedding max_abs inside the
    # transform lambda would recompute the whole O(d) aggregate per
    # element (O(d²)/row — the unit_normalize docstring pitfall; was
    # ADVICE r6). Same float semantics: identical max order, division,
    # and explicit floor(x+0.5) rounding.
    codes = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x)),
        lambda m: F.when(
            m == 0, F.transform(v, lambda x: F.lit(0).cast("bigint"))
        ).otherwise(
            F.transform(v, lambda x: F.floor(x / (m / F.lit(127.0)) + F.lit(0.5)))
        ),
    ).cast("array<smallint>")
    return df.withColumn(scale_col, max_abs / F.lit(127.0)).withColumn(
        out_col, codes
    )


def dequantize_embeddings(
    df: DataFrame,
    codes_col: str = "qcodes",
    scale_col: str = "qscale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``x̂_i = code_i · scale``
    (map-only Column math). Max reconstruction error is scale/2 per
    component."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(codes_col),
            lambda c: c.cast("double") * F.col(scale_col),
        ),
    )


def matryoshka_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    out_col: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Matryoshka truncation (Kusupati et al. 2022, MRL): keep the FIRST
    ``out_dim`` components of the unit vector and (by default)
    re-normalize — the standard cheap-tier trick for embeddings trained
    with matryoshka losses, where prefixes are themselves usable
    representations. Map-only Column math (slice + one aggregate), no
    shuffle, exactly replicable in SQL; composes with every search tier
    here (brute force / LSH / IVF) at ``out_dim``-sized cost."""
    if out_dim <= 0:
        raise ValueError("out_dim must be positive")
    sliced = F.slice(
        V.unit_normalize(F.col(vec_col)), 1, out_dim
    )
    out = V.unit_normalize(sliced) if normalize else sliced
    return df.withColumn(out_col or vec_col, out)


def quantize_binary(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "bcode",
    word_bits: int = 32,
) -> DataFrame:
    """1-bit (sign) quantization: each unit-vector component becomes the
    bit ``(u_i >= 0)``, packed ``word_bits`` components per BIGINT word
    (MSB-first within a word via the ``acc*2 + bit`` fold) — a
    64-dim embedding shrinks to two longs (16 bytes vs 512, 32×), and
    Hamming distance between codes approximates angular distance (the
    sign-LSH bound). 32 bits per word, not 64: the fold stays far from
    BIGINT overflow, which ANSI mode would turn into a runtime error.
    Map-only Column math; the packing is exact integer arithmetic, so
    an external oracle reproduces every code bit-for-bit."""
    if word_bits <= 0 or word_bits > 62:
        raise ValueError("word_bits must be in 1..62")
    u = V.unit_normalize(F.col(vec_col))
    n_words = F.ceil(F.size(u) / F.lit(word_bits)).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda w: F.aggregate(
            F.slice(u, w * word_bits + 1, word_bits),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc * 2
            + F.when(v >= 0, F.lit(1)).otherwise(F.lit(0)),
        ),
    )
    return df.withColumn(out_col, words)


def bq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 50,
    word_bits: int = 32,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Binary-quantized search: Hamming distance over sign-packed codes
    selects a per-query pool of ``rerank`` candidates (ties to the
    smaller id), which is exact-rescored to top-k true cosines — the
    modern memory-tier ANN stack (e.g. binary embedding search), where
    the scan touches 32×-smaller codes and full vectors are read only
    for the pool. Hamming = Σ words ``bit_count(a XOR b)`` — integer
    math, bit-replicable by the oracle; the rerank tail is
    :func:`_rerank_exact`.

    Scale: the code scan is map-side against broadcast query codes
    (16 bytes/vector for 64 dims); the only full-vector touch is the
    |queries|·rerank join. For corpora where even the code scan is too
    hot, pre-prune with SRP buckets and Hamming-rank inside buckets."""
    if rerank < k:
        raise ValueError(f"rerank pool ({rerank}) must be >= k ({k})")
    c = quantize_binary(
        _spread(corpus).select(F.col(id_col).alias("neighbor_id"), vec_col),
        vec_col, "cc", word_bits,
    ).drop(vec_col)
    q = quantize_binary(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        vec_col, "qc", word_bits,
    ).drop(vec_col)
    if broadcast_queries:
        q = F.broadcast(q)
    hamming = F.aggregate(
        F.zip_with(
            F.col("cc"), F.col("qc"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", hamming.cast("int").alias("hamming")
        )
    )
    pool = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("hamming"), F.col("neighbor_id")
            )
        ),
    ).filter(F.col("rank") <= rerank)
    return _rerank_exact(
        pool, corpus, queries, k, rerank, id_col, vec_col, broadcast_queries
    )


def project_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    seed: int = 42,
    normalize: bool = True,
    dim: Optional[int] = None,
) -> DataFrame:
    """Johnson–Lindenstrauss random Gaussian projection: adds ``proj``
    (``array<double>``, length ``out_dim``) where ``proj[j]`` is the dot
    product with the j-th seeded Gaussian plane — the dimensionality-
    reduction step before ANN indexing / clustering when raw embeddings
    are wide. Planes come from the same deterministic generator as SRP-LSH
    (``srp_planes``), so an external oracle regenerates them as literals
    and replicates the projection bit-for-bit. ``normalize`` projects the
    unit vector (cosine-geometry pipelines); set False for raw dots.

    Scale: pure Column expressions — one map-only whole-stage-codegen
    Project, no shuffle, no UDF; planes are literal-folded into the plan.
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    if dim is None:
        # probe the first NON-NULL vector: a leading NULL row must not
        # silently yield wrong-length planes (ADVICE r4); the filtered
        # probe is one bounded driver job at plan-build time — pass
        # ``dim`` explicitly to skip it in latency-sensitive planning
        row = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
        if row is None:
            raise ValueError(
                f"project_embeddings: no non-null '{vec_col}' row to infer "
                "the input dimension from — pass dim= explicitly"
            )
        dim = len(row[0])
    from config_driven_pyspark_spark.operators.dedup import srp_planes

    planes = srp_planes(dim, out_dim, seed)
    # bind the projected vector to a REAL column first: the unrolled
    # per-plane dots then index a plain attribute (element_at would
    # otherwise re-evaluate a normalize EXPRESSION per component, r16)
    v = V.unit_normalize(F.col(vec_col)) if normalize else F.col(vec_col)
    proj = F.array(
        *[
            V.dot(F.col("__pj_v"), F.array(*[F.lit(x) for x in p]), dim)
            for p in planes
        ]
    )
    return (
        df.withColumn("__pj_v", v)
        .withColumn("proj", proj)
        .drop("__pj_v")
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Probe the first non-null vector's length — one bounded driver job
    at plan-build time (the project_embeddings pattern)."""
    row = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    if row is None:
        raise ValueError(
            f"no non-null '{vec_col}' row to infer the dimension from — "
            "pass dim= explicitly"
        )
    return len(row[0])


def _cov_parts(
    df: DataFrame, vec_col: str, dim: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared covariance sufficient statistics over non-null vectors:
    (sxx: i, j, sxx for i ≤ j), (sx: i, sx), (stats: 1-row n). All sums
    accumulate 9-decimal-rounded doubles as DECIMAL(18, 9) — exact and
    order-independent, so downstream covariances are bit-replicable.

    Scale: ONE corpus pass each — the upper-triangle product explode is
    dim·(dim+1)/2 structs per row collapsed map-side by the partial
    aggregate, so shuffle volume is partitions × dim² rows, never
    corpus-sized; means/count are ordinary combinable aggregates."""
    rows = _spread(df.filter(F.col(vec_col).isNotNull()))
    v = V.as_double(F.col(vec_col))
    tri = F.flatten(
        F.transform(
            v,
            lambda xi, i: F.transform(
                F.slice(v, i + 1, dim),
                lambda xj, lj: F.struct(
                    i.alias("i"),
                    (i + lj).alias("j"),
                    F.round(xi * xj, 9)
                    .cast("decimal(18,9)")
                    .alias("p"),
                ),
            ),
        )
    )
    sxx = (
        rows.select(F.explode(tri).alias("t"))
        .groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(F.sum("t.p").alias("sxx"))
    )
    sx = (
        rows.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum(F.round(F.col("x"), 9).cast("decimal(18,9)")).alias("sx"))
    )
    stats = rows.agg(F.count("*").cast("double").alias("n"))
    return sxx, sx, stats


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", dim: Optional[int] = None
) -> DataFrame:
    """Upper-triangle empirical covariance matrix of a vector column —
    (i, j, cov) for i ≤ j, cov = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n rounded to 9
    decimals. The dim²-bounded summary that drives PCA/whitening (and a
    drift check between corpus snapshots: embedding distributions that
    move show up here long before downstream recall does).

    Bit-replicable: sufficient statistics are exact DECIMAL sums of
    9-rounded products (see ``_cov_parts``); the final combine is one
    fixed double expression, so an external SQL engine reproduces every
    value. Scale: one corpus pass, map-side-combined to dim² rows."""
    if dim is None:
        dim = _infer_dim(df, vec_col)
    sxx, sx, stats = _cov_parts(df, vec_col, dim)
    si = sx.select(F.col("i"), F.col("sx").alias("__sxi"))
    sj = sx.select(F.col("i").alias("j"), F.col("sx").alias("__sxj"))
    return (
        sxx.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.round(
                (
                    F.col("sxx").cast("double")
                    - F.col("__sxi").cast("double")
                    * F.col("__sxj").cast("double")
                    / F.col("n")
                )
                / F.col("n"),
                9,
            ).alias("cov"),
        )
    )


def pca_train(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 8,
    whiten: bool = False,
    dim: Optional[int] = None,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Distributed PCA fit: covariance sufficient statistics aggregate
    corpus-side (one pass, dim²-bounded — ``_cov_parts``), then the
    dim×dim eigendecomposition runs driver-side in numpy (the k·dim
    collect pattern of ``kmeans_clusters``; a 1024-dim embedding's
    covariance is 4 MB — never corpus-sized). Returns (mean,
    components, eigenvalues): components are the top ``out_dim``
    eigenvectors by descending eigenvalue, sign-fixed so each vector's
    largest-|·| entry is positive (deterministic orientation);
    ``whiten`` scales each component by 1/√λ (λ floored at 1e-12) so
    projected dimensions have unit variance — the usual prep before
    cosine ANN / SemDeDup on anisotropic embedding spaces."""
    import numpy as np

    if dim is None:
        dim = _infer_dim(df, vec_col)
    if not 1 <= out_dim <= dim:
        raise ValueError(f"out_dim must be in [1, {dim}], got {out_dim}")
    sxx, sx, stats = _cov_parts(df, vec_col, dim)
    n = float(stats.first()["n"])
    if n < 2:
        raise ValueError("pca_train needs >= 2 non-null vectors")
    mean = np.zeros(dim)
    for r in sx.collect():
        mean[r["i"]] = float(r["sx"]) / n
    cov = np.zeros((dim, dim))
    for r in sxx.collect():
        cov[r["i"], r["j"]] = float(r["sxx"])
    # assemble covariance from sufficient stats, mirror the triangle
    cov = (cov - np.outer(mean, mean) * n) / n
    cov = np.triu(cov) + np.triu(cov, 1).T
    vals, vecs = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(vals)[::-1][:out_dim]  # top out_dim, descending
    comps, eigs = [], []
    for c in order:
        vec = vecs[:, c].copy()
        pivot = int(np.argmax(np.abs(vec)))   # first max on ties
        if vec[pivot] < 0:
            vec = -vec
        lam = float(max(vals[c], 0.0))
        if whiten:
            vec = vec / np.sqrt(max(lam, 1e-12))
        comps.append([float(x) for x in vec])
        eigs.append(lam)
    return [float(x) for x in mean], comps, eigs


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 8,
    whiten: bool = False,
    dim: Optional[int] = None,
    model: Optional[tuple] = None,
) -> DataFrame:
    """PCA projection: adds ``proj`` (``array<double>``, length
    ``out_dim``) = Vᵀ(x − μ) with components from :func:`pca_train`
    (pass ``model`` to reuse a fit — train once, project many). The
    mean offset folds into a per-component scalar driver-side, so the
    projection is ONE map-only whole-stage-codegen Project — dot
    products against literal component arrays, no shuffle, no UDF
    (the ``project_embeddings`` shape, with learned planes)."""
    mean, comps, _ = model if model is not None else pca_train(
        df, vec_col, out_dim, whiten, dim
    )
    if len(comps) != out_dim:
        raise ValueError(
            f"model has {len(comps)} components, out_dim={out_dim}"
        )
    offs = [sum(m * c for m, c in zip(mean, comp)) for comp in comps]
    v = F.col(vec_col)
    proj = F.array(
        *[
            V.dot(v, F.array(*[F.lit(x) for x in comp]), len(comp))
            - F.lit(off)
            for comp, off in zip(comps, offs)
        ]
    )
    return df.withColumn("proj", proj)


def stage_similarity(df: DataFrame, spec: dict, ctx=None) -> DataFrame:
    """``{"stage": "similarity", "method": "brute_force"|"srp_lsh"|"ivf"|
    "pq"|"ivfpq"|"project"|"covariance"|"pca"|"quantize"|"dequantize"|
    "contrastive" (triplet mining — pos_threshold/neg_lo/neg_hi/n_neg,
    optional pool: <named (query_id, neighbor_id, rank, cosine) stage>),
    "k": 10,
    "queries": <stage name, default: self>, "id_col":
    ..., "vec_col": ..., "bits": 8, "n_centroids": 16, "nprobe": 4,
    "out_dim": 8 (project), "m"/"n_codes"/"codebooks"/"rerank" (pq, ivfpq —
    "codebooks" picks the PQ training method; for ivfpq "centroids" picks
    the IVF one), "broadcast_queries": bool, "centroids_path":
    <parquet path — ivf loads an existing codebook / saves after training>,
    "index_path": <dir — ivf queries a persisted cell-partitioned index,
    building it first if absent (see ivf_build_index/ivf_query_index);
    with "rerank": N the approximate pool widens to N and is
    exact-rescored against the stage input's true vectors>}``.

    ``broadcast_queries`` (brute_force/ivf) assumes the query set fits in
    a broadcast — the usual few-to-thousands lookup case. Set it false for
    query sets too large to broadcast (e.g. corpus-vs-itself search); the
    join then shuffles both sides on its key. For ivf it defaults to true
    only when an explicit ``queries`` frame is named — self-search implies
    |queries| = |corpus| and defaults to the shuffle path."""
    queries = ctx.get(spec["queries"]) if (ctx and spec.get("queries")) else df
    method = spec.get("method", "brute_force")
    k = int(spec.get("k", 10))
    id_col = spec.get("id_col", "vec_id")
    vec_col = spec.get("vec_col", "embedding")
    if method == "mmr":
        cand_name = spec.get("candidates")
        if not cand_name or ctx is None:
            raise ValueError(
                "method='mmr' needs candidates: <named stage> — a "
                "per-query candidate pool (query_id, neighbor_id)"
            )
        return mmr_rerank(
            ctx.get(cand_name), df, queries, k,
            float(spec.get("lam", 0.7)),
            spec.get("query_col", "query_id"),
            spec.get("cand_col", "neighbor_id"),
            id_col, vec_col,
        )
    if method == "rrf":
        names = spec.get("rankings")
        if not names or ctx is None:
            raise ValueError(
                "method='rrf' needs rankings: [<named stages>] — each a "
                "per-query ranking frame (query_id, <id>, rank)"
            )
        return rrf_fuse(
            [ctx.get(n) for n in names],
            k,
            int(spec.get("rrf_k", 60)),
            spec.get("query_col", "query_id"),
            spec.get("fuse_id_col", "neighbor_id"),
            spec.get("rank_col", "rank"),
        )
    if method == "ncm":
        return ncm_classify(
            df, id_col, vec_col, spec.get("label_col", "label")
        )
    if method == "contrastive":
        return contrastive_triplets(
            df, id_col, vec_col, k,
            float(spec.get("pos_threshold", 0.9)),
            float(spec.get("neg_lo", 0.5)),
            float(spec.get("neg_hi", 0.8)),
            int(spec.get("n_neg", 3)),
            ctx.get(spec["pool"]) if (ctx and spec.get("pool")) else None,
            queries if spec.get("queries") else None,
        )
    if method == "recall":
        if ctx is None or not spec.get("approx") or not spec.get("exact"):
            raise ValueError(
                "method='recall' needs approx: <named stage> and "
                "exact: <named stage> — two per-query ranking frames"
            )
        return recall_at_k(
            ctx.get(spec["approx"]), ctx.get(spec["exact"]),
            spec.get("query_col", "query_id"),
            spec.get("fuse_id_col", "neighbor_id"),
        )
    if method == "covariance":
        return embedding_covariance(df, vec_col, spec.get("dim"))
    if method == "pca":
        return pca_project(
            df, vec_col, int(spec.get("out_dim", 8)),
            bool(spec.get("whiten", False)), spec.get("dim"),
        )
    if method == "brute_force":
        return brute_force_topk(
            df, queries, k, id_col, vec_col, spec.get("broadcast_queries", True)
        )
    if method == "srp_lsh":
        return srp_lsh_topk(
            df, queries, k, id_col, vec_col,
            int(spec.get("bits", 8)), int(spec.get("seed", 42)),
            spec.get("dim"), int(spec.get("multiprobe", 0)),
        )
    if method == "ivf":
        index_path = spec.get("index_path")
        if index_path:
            # persisted-index path: build once if absent, validate the
            # manifest if present (reusing an index built with different
            # params or from a different corpus must fail loudly, never
            # silently return stale neighbors), then query with static
            # partition pruning on the probed cells
            spark = df.sparkSession
            pq_spec = spec.get("pq")
            build_params = {
                "n_centroids": int(spec.get("n_centroids", 16)),
                "centroids": spec.get("centroids", "sample"),
                "kmeans_iters": int(spec.get("kmeans_iters", 10)),
                "sample_rows": int(spec.get("sample_rows", 20_000)),
                "seed": int(spec.get("seed", 42)),
                "id_col": id_col,
                "vec_col": vec_col,
                "pq_m": int(pq_spec.get("m", 4)) if pq_spec else None,
                "pq_n_codes": (
                    int(pq_spec.get("n_codes", 16)) if pq_spec else None
                ),
                "pq_codebooks": (
                    pq_spec.get("codebooks", "sample") if pq_spec else None
                ),
                "quantization": spec.get("quantization"),
            }
            if not _fs_exists(spark, f"{index_path}/postings"):
                ivf_build_index(
                    df, index_path, id_col, vec_col,
                    build_params["n_centroids"], build_params["centroids"],
                    build_params["kmeans_iters"], build_params["sample_rows"],
                    build_params["seed"], pq_spec,
                    spec.get("quantization"),
                )
            else:
                validate_index_manifest(
                    spark, index_path, corpus=df, **build_params
                )
            return ivf_query_index(
                spark, index_path, queries, k, id_col, vec_col,
                int(spec.get("nprobe", 4)),
                spec.get("broadcast_queries", bool(spec.get("queries"))),
                int(spec.get("rerank", 0)),
                # df is the corpus the index was built from/validated
                # against — the true vectors exact rerank re-scores with
                df if spec.get("rerank") else None,
            )
        return ivf_topk(
            df, queries, k, id_col, vec_col,
            int(spec.get("n_centroids", 16)), int(spec.get("nprobe", 4)),
            # self-search (no explicit queries) means |queries| = |corpus|:
            # too big to broadcast by default
            spec.get("broadcast_queries", bool(spec.get("queries"))),
            spec.get("centroids", "sample"),
            int(spec.get("kmeans_iters", 10)),
            int(spec.get("sample_rows", 20_000)),
            int(spec.get("seed", 42)),
            spec.get("centroids_path"),
        )
    if method == "ivfpq":
        return ivfpq_topk(
            df, queries, k, id_col, vec_col,
            int(spec.get("n_centroids", 16)), int(spec.get("nprobe", 4)),
            int(spec.get("m", 4)), int(spec.get("n_codes", 16)),
            spec.get("centroids", "sample"),
            spec.get("codebooks", "sample"),
            spec.get("broadcast_queries", bool(spec.get("queries"))),
            int(spec.get("rerank", 0)),
            int(spec.get("sample_rows", 20_000)),
            int(spec.get("kmeans_iters", 10)),
            int(spec.get("seed", 42)),
        )
    if method == "pq":
        return pq_topk(
            df, queries, k, id_col, vec_col,
            int(spec.get("m", 4)), int(spec.get("n_codes", 16)),
            # "codebooks" is the canonical key (matching ivfpq, where
            # "centroids" means the IVF codebook); "centroids" accepted
            # as a fallback so the two methods stay config-compatible
            spec.get("codebooks", spec.get("centroids", "sample")),
            spec.get("broadcast_queries", bool(spec.get("queries"))),
            int(spec.get("sample_rows", 20_000)),
            int(spec.get("kmeans_iters", 10)),
            int(spec.get("seed", 42)),
            int(spec.get("rerank", 0)),
        )
    if method == "kmeans":
        # "n_clusters" (not "k" — that's reserved for top-k above)
        return kmeans_clusters(
            df, id_col, vec_col, int(spec.get("n_clusters", 8)),
            int(spec.get("iters", 2)),
        )
    if method == "matryoshka":
        return matryoshka_embeddings(
            df, vec_col, int(spec.get("out_dim", 16)),
            spec.get("out_col"), bool(spec.get("normalize", True)),
        )
    if method == "binary":
        return bq_topk(
            df, queries, k, id_col, vec_col,
            int(spec.get("rerank", 50)), int(spec.get("word_bits", 32)),
            spec.get("broadcast_queries", bool(spec.get("queries"))),
        )
    if method == "project":
        return project_embeddings(
            df, id_col, vec_col, int(spec.get("out_dim", 8)),
            int(spec.get("seed", 42)), bool(spec.get("normalize", True)),
            spec.get("dim"),
        )
    if method == "quantize":
        return quantize_embeddings(
            df, vec_col, spec.get("out_col", "qcodes"),
            spec.get("scale_col", "qscale"),
        )
    if method == "dequantize":
        return dequantize_embeddings(
            df, spec.get("codes_col", "qcodes"),
            spec.get("scale_col", "qscale"), spec.get("out_col", vec_col),
        )
    raise ValueError(f"Unknown similarity method {method!r}")
