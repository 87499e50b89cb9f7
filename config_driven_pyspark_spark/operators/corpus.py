"""Training-corpus operators — repetition/quality signals, deterministic
sampling, benchmark decontamination, and token-window chunking.

Capability gap vs the reference (SURVEY.md §2C): the reference
(`/root/reference/src/config_driven_pyspark/functioniser.py`) transforms
fields in place and has no corpus-preparation surface; these are the
operations a large-scale LLM training-data pipeline runs between raw text
and tokenized shards. All of them are pure built-in Column expressions +
relational ops — no Python UDFs — so they stay inside whole-stage codegen
at 100 TB.

- ``repetition_stats``  — Gopher-style repetition signals per document:
  type-token ratio, duplicate n-gram fraction, top-word frequency share.
- ``hash_sample``       — deterministic (re-runnable) sampling by md5 of a
  key column, with optional per-stratum rates. Unlike ``df.sample`` this is
  stable across runs/partitionings — the property training pipelines need
  for reproducible mixtures.
- ``contamination_flags`` / ``decontaminate`` — flag or drop corpus
  documents sharing word n-grams with a benchmark set (eval-set leakage).
- ``chunk_documents``   — split each document into fixed-size token
  windows (optional stride overlap) for context-length packing.
- ``mixture_sample``    — deterministic source/language mixing: derive
  per-stratum sampling rates from target mixture weights (max retention)
  and apply them with the md5-prefix filter.
- ``token_budget_sample`` — deterministic "~N tokens, reproducibly":
  md5-ordered fill until a (global or per-stratum) token budget.
- ``line_dedup``        — C4/RefinedWeb-style exact span dedup: keep the
  globally first occurrence of every line / token window, reassemble docs.
- ``span_dedup``        — arbitrary-length repeated-span detection/removal
  via overlapping stride-1 window fingerprints merged into maximal spans
  (the bucketed approximation of suffix-array ExactSubstr dedup).
- ``pack_sequences``    — GPT-style concat-and-cut packing of document
  tokens into fixed ``seq_len`` training sequences.
- ``split_assign``      — deterministic train/val/test split + shard id +
  intra-shard shuffle key, all md5-derived: the reproducible export layout
  step before writing training shards.
- ``cap_per_stratum``   — at most N documents per domain/source, picked in
  md5 pseudo-random order via the same skew-safe two-level prefix sum.
- ``bm25_topk``         — BM25 keyword retrieval over the corpus (search,
  keyword quality filters, lexical decontamination sweeps), with decimal-
  summed contributions so scores are aggregation-order independent.

Scale notes per operator are on the functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from config_driven_pyspark_spark.functions import text as TX
from config_driven_pyspark_spark.operators.dedup import _materialize, _spread


def _resolve_percentile_method(op: str, method: str | None) -> str:
    """The exact→approx percentile escape hatch, flagged at PLAN time
    (VERDICT r8 ask #7).  ``method=None`` (the caller never chose)
    resolves to ``"exact"`` for backward-compatible bit-exact results
    but emits a warning: the exact interpolating ``percentile`` buffers
    every value of a stratum in one aggregation buffer — fine to ~10⁷
    rows per stratum, a genuine single-buffer sort on a corpus-scale
    stratum.  Passing ``method="exact"`` explicitly pins today's
    behavior silently; ``method="approx"`` switches to the fixed-memory
    ``percentile_approx`` sketch (the 100 TB path)."""
    if method is None:
        import warnings

        warnings.warn(
            f"{op}: exact percentiles buffer each stratum in memory — "
            "a genuine bottleneck on corpus-scale strata. Pass "
            "method='exact' to pin bit-exact behavior (silences this) "
            "or method='approx' for the fixed-memory sketch.",
            stacklevel=3,
        )
        return "exact"
    if method not in ("exact", "approx"):
        raise ValueError(
            f"{op}: method must be 'exact' or 'approx', got {method!r}"
        )
    return method


def word_ngrams_all(toks, n: int):
    """Non-distinct word n-grams of a token array (space-joined). Short
    inputs (< n tokens) yield one partial gram — mirrored exactly by the
    DuckDB oracles."""
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str = "text", ngram_n: int = 3
) -> DataFrame:
    """Per-document repetition signals: ``n_tokens``, ``ttr`` (distinct /
    total tokens), ``dup_ngram_frac`` (1 − distinct/total n-grams) and
    ``top_word_frac`` (most frequent token's share).

    Scale: the array ratios are map-only (no shuffle). The top-word share
    explodes tokens and aggregates (id, token) — one shuffle with map-side
    partial counts; token arrays never cross the wire, only 8-byte counts.
    """
    # materialized: the token array feeds both the ratio projection and the
    # top-word explode — without it each branch re-scans and re-tokenizes
    base = _materialize(
        _spread(df).select(
            F.col(id_col).alias("id"), TX.tokens(F.lower(F.col(text_col))).alias("w")
        )
    )
    arr = base.select(
        "id",
        F.size("w").cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct("w")).cast("double")
            / F.greatest(F.size("w"), F.lit(1)),
            6,
        ).alias("ttr"),
        F.round(
            1
            - F.size(F.array_distinct(word_ngrams_all(F.col("w"), ngram_n))).cast(
                "double"
            )
            / F.greatest(F.size(word_ngrams_all(F.col("w"), ngram_n)), F.lit(1)),
            6,
        ).alias("dup_ngram_frac"),
    )
    freq = (
        base.select("id", F.explode("w").alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("c"))
    )
    top = freq.groupBy("id").agg(
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_word_frac")
    )
    return (
        arr.join(top, "id", "left")
        .na.fill({"top_word_frac": 0.0})
        .withColumnRenamed("id", id_col)
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float | None = None,
    rates: dict[str, float] | None = None,
    stratify_by: str | None = None,
) -> DataFrame:
    """Deterministic sample: keep rows whose md5(key) falls below the rate
    threshold. ``rates`` maps stratum value → rate (``"*"`` = default) over
    ``stratify_by``. Granularity is 1/256 (first md5 byte).

    Scale: a map-only filter — no shuffle, no RNG state, identical output
    for any partitioning/cluster size, which ``df.sample`` does not give.
    The predicate is a plain string compare on the md5 hex prefix so the
    DuckDB oracle is the byte-identical expression.
    """
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)

    def thr(r: float) -> str:
        n = max(0, min(256, int(r * 256)))
        # 256 ("100") would compare lexicographically below "ff"; any
        # letter past 'f' is greater than every 2-char hex bucket
        return "g" if n == 256 else format(n, "02x")

    if rates is not None:
        if stratify_by is None:
            raise ValueError("rates requires stratify_by")
        default = thr(rates.get("*", 0.0))
        cond = F.lit(default)
        for value, r in rates.items():
            if value == "*":
                continue
            cond = F.when(F.col(stratify_by) == value, F.lit(thr(r))).otherwise(cond)
        keep = bucket < cond
    else:
        if rate is None:
            raise ValueError("hash_sample needs rate or rates")
        keep = bucket < F.lit(thr(rate))
    return df.withColumn("sample_bucket", bucket).filter(keep)


def mixture_sample(
    df: DataFrame,
    stratify_by: str,
    weights: dict[str, float],
    key_col: str,
) -> DataFrame:
    """Deterministic data mixing: subsample strata so the output
    approximates the target ``weights`` (stratum → proportion) with maximum
    retention — the per-source mixing step of training-corpus assembly
    (Pile/Dolma-style source weighting). Strata absent from ``weights`` are
    dropped.

    Rates are derived, not given: with observed counts ``c_g`` and targets
    ``w_g``, the largest feasible output is ``T = min_g c_g/w_g``; stratum
    ``g`` keeps ``T·w_g`` rows via the same md5-prefix filter as
    ``hash_sample`` (granularity 1/256), so results are identical for any
    partitioning or cluster size.

    Scale: one tiny groupBy on the stratum column (map-side partial
    counts), the scalar ``T`` and per-stratum thresholds stay DataFrame-side
    (broadcast back) — no driver collect; the corpus itself sees one
    broadcast-hash join + a map-only filter.
    """
    if not weights:
        raise ValueError("mixture_sample needs non-empty weights")
    w_expr = None
    for value, w in weights.items():
        clause = F.when(F.col(stratify_by) == value, F.lit(float(w)))
        w_expr = clause if w_expr is None else w_expr.when(
            F.col(stratify_by) == value, F.lit(float(w))
        )
    counts = (
        df.select(stratify_by)
        .withColumn("w", w_expr)
        .filter(F.col("w").isNotNull())
        .groupBy(stratify_by, "w")
        .agg(F.count("*").cast("double").alias("c"))
    )
    return _apply_stratum_weights(df, stratify_by, key_col, counts)


def _apply_stratum_weights(
    df: DataFrame, stratify_by: str, key_col: str, counts: DataFrame
) -> DataFrame:
    """Shared max-retention tail for weighted mixing: given per-stratum
    ``(stratify_by, w, c)``, keep ``T·w_g`` rows of stratum ``g`` where
    ``T = min_g c_g/w_g``, via the md5-prefix filter (granularity 1/256,
    partitioning-invariant). Threshold arithmetic mirrors the DuckDB
    oracle op-for-op so the md5 cut is bit-identical:
    rate = (t*w)/c, n = floor(rate*256)."""
    tmax = counts.agg(F.min(F.col("c") / F.col("w")).alias("t"))
    n = F.floor(F.col("t") * F.col("w") / F.col("c") * 256)
    rates = (
        counts.crossJoin(F.broadcast(tmax))
        .select(
            stratify_by,
            F.when(n >= 256, F.lit("g"))
            .otherwise(F.format_string("%02x", n.cast("int")))
            .alias("__thr"),
        )
    )
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    return (
        df.join(F.broadcast(rates), stratify_by)
        .filter(bucket < F.col("__thr"))
        .drop("__thr")
    )


def temperature_mixture(
    df: DataFrame,
    stratify_by: str,
    key_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled source mixing (the mT5/UL2 recipe): target
    weights are DERIVED from the observed stratum counts as
    ``w_g ∝ c_g^alpha`` — ``alpha=1`` keeps natural proportions,
    ``alpha→0`` flattens toward uniform — then applied with the same
    max-retention md5 machinery as :func:`mixture_sample` (sampling only
    removes rows, so the smallest stratum is kept in full and larger
    strata are downsampled toward the tempered proportions:
    ``rate_g = (min_h c_h^{1-alpha}) · c_g^{alpha-1}``).

    ``alpha=0.5`` (the default) computes the tempering as ``sqrt`` —
    IEEE-correctly-rounded on every engine, so the md5 cut is
    bit-identical to an external oracle. Other alphas use ``pow``,
    where a 1-ulp engine difference could flip a 1/256 boundary
    (documented; the pytest covers alpha=1 equivalence too).

    Scale: identical to mixture_sample — one tiny stratum groupBy, no
    driver collect, broadcast rates, map-only filter."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    w = (
        F.sqrt(F.col("c"))
        if alpha == 0.5
        else F.pow(F.col("c"), F.lit(float(alpha)))
    )
    counts = (
        df.groupBy(stratify_by)
        .agg(F.count("*").cast("double").alias("c"))
        .withColumn("w", w)
    )
    return _apply_stratum_weights(df, stratify_by, key_col, counts)


def _md5_stream_offsets(
    base: DataFrame, id_col: str, n_col: str, keys: list[str]
) -> DataFrame:
    """Add ``__s`` — the sum of ``n_col`` over all rows strictly before this
    one in md5(id) pseudo-random order (per-``keys`` stratum) — without a
    corpus-wide window.

    A naive global running sum is one unpartitioned window task. Here the
    order key's first md5 byte pre-buckets rows into 256 uniform groups:
    per-bucket totals (tiny agg) get prefix-summed in a 256-row window,
    then each bucket computes its local running sum in parallel and adds
    its offset — same semantics as the global window (the bucket is a
    prefix of the order key), but the widest window span is |bucket|, not
    |corpus|. Also leaves ``__ok``/``__b``/``__off`` for the caller to drop.

    Stratum keys are joined through a null-coalesced string surrogate: a
    NULL stratum is a legitimate group (groupBy already treats it as one),
    and a plain equi-join would silently drop every such row.
    """
    sk = [f"__k{i}" for i in range(len(keys))]
    base = base.withColumns(
        {
            s: F.coalesce(F.col(k).cast("string"), F.lit("\x00"))
            for s, k in zip(sk, keys)
        }
    ).withColumn(
        "__ok", F.md5(F.col(id_col).cast("string"))
    ).withColumn("__b", F.substring("__ok", 1, 2))
    btot = base.groupBy(*sk, "__b").agg(F.sum(n_col).alias("__bt"))
    w_off = (
        Window.partitionBy(*sk).orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = btot.select(
        *sk, "__b", F.coalesce(F.sum("__bt").over(w_off), F.lit(0)).alias("__off")
    )
    w_local = (
        Window.partitionBy(*(sk + ["__b"])).orderBy("__ok", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(offsets), sk + ["__b"])
        .withColumn(
            "__s", F.col("__off") + F.coalesce(F.sum(n_col).over(w_local), F.lit(0))
        )
        .drop(*sk)
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    budget: int = 1_000_000,
    by: str | None = None,
) -> DataFrame:
    """Deterministic token-budget fill: keep documents in md5(id) pseudo-
    random order until the cumulative token count reaches ``budget``
    (per-``by``-stratum when given, else global) — "give me ~N tokens,
    reproducibly". The straddling document is kept, so overshoot is bounded
    by one document. Output adds ``n_tokens``.

    Scale: see ``_md5_stream_offsets`` — no corpus-wide single-task window.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    keys = [by] if by else []
    base = df.withColumn("n_tokens", TX.token_count(F.col(text_col)))
    return (
        _md5_stream_offsets(base, id_col, "n_tokens", keys)
        .filter(F.col("__s") < budget)
        .drop("__ok", "__b", "__off", "__s")
    )


def cap_per_stratum(
    df: DataFrame,
    id_col: str,
    by: str,
    cap: int,
) -> DataFrame:
    """Domain/source caps: keep at most ``cap`` rows per ``by`` stratum,
    chosen deterministically in md5(id) pseudo-random order — the standard
    guard against one domain dominating a pretraining mixture. Re-runnable:
    the survivor set is a pure function of the ids.

    Scale: reuses the two-level md5-bucket prefix sum
    (``_md5_stream_offsets`` with a unit weight), so a hot stratum (one
    domain = 30% of the corpus — exactly when you need caps) is processed
    by 256 parallel bucket windows instead of one straggler task; a plain
    ``row_number() over (partition by domain)`` would put the whole hot
    domain in a single window task.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    base = df.withColumn("__one", F.lit(1))
    return (
        _md5_stream_offsets(base, id_col, "__one", [by])
        .filter(F.col("__s") < cap)
        .drop("__ok", "__b", "__off", "__s", "__one")
    )


def shard_by_size(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    shard_bytes: int = 1_000_000,
    by: str | None = None,
) -> DataFrame:
    """Byte-budget shard layout: documents stream in md5(id) pseudo-random
    order and a document lands in shard ``floor(cum_bytes_before /
    shard_bytes)`` — so every shard holds ~``shard_bytes`` of UTF-8 text
    (within one document), the export layout training-data writers
    actually want ("~1 GB files"), where :func:`split_assign`'s
    ``n_shards`` fixes the COUNT instead. Adds ``n_bytes`` (UTF-8
    octets) and ``shard``; per-``by`` stratum restarts shard ids.
    Deterministic: a pure function of the ids and texts — identical
    across runs and partitionings.

    Scale: see ``_md5_stream_offsets`` — two-level md5-bucket prefix
    sums, no corpus-wide single-task window; map-only besides the tiny
    bucket-offset agg."""
    if shard_bytes <= 0:
        raise ValueError("shard_bytes must be positive")
    keys = [by] if by else []
    base = df.withColumn(
        "n_bytes",
        F.coalesce(F.octet_length(F.col(text_col)), F.lit(0)).cast("bigint"),
    )
    return (
        _md5_stream_offsets(base, id_col, "n_bytes", keys)
        .withColumn(
            "shard", F.floor(F.col("__s") / shard_bytes).cast("bigint")
        )
        .drop("__ok", "__b", "__off", "__s")
    )


def quality_classify(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    text_col: str = "text",
    bias: float = 0.0,
    threshold: float = 0.0,
    mode: str | None = None,
) -> DataFrame:
    """fastText-style linear quality-classifier inference — the
    CCNet/LLaMA corpus-filter shape: ``score = bias + (Σ weight(token))
    / n_tokens`` over the document's lowercased whitespace tokens
    (absent vocabulary tokens weigh 0; a token occurring twice counts
    twice), ``keep = score >= threshold``. Inference only — train the
    weights offline (fastText, logistic regression) and ship them as
    config. Adds ``n_tokens``, ``score``, ``keep``.

    Determinism: each matched weight is rounded to 9 decimals and
    summed as DECIMAL(18,9) — exact, order-independent (the BM25
    trick) — then one double division by ``n_tokens``; an empty
    document scores exactly ``bias``. Bit-replicable by the oracle.

    Scale: two evaluation modes, same values bit-for-bit.  ``"join"``
    (the batch default): the vocabulary (10⁴-10⁶ tokens) is broadcast;
    the corpus side is explode → broadcast-hash join → one groupBy(id)
    with map-side partial sums — the :func:`contamination_flags` shape,
    no corpus self-join.  ``"map_literal"``: the vocabulary compiles
    into a literal MAP column and each row scores with
    ``aggregate(transform(tokens, element_at))`` — 0 exchanges, so it
    runs unchanged on STREAMING inputs (the auto-pick there); the plan
    carries the whole vocabulary, so keep it for vocabularies that fit
    a plan comfortably (≲10⁴ entries — past that, use the join mode
    batch-side or score in foreachBatch)."""
    if not weights:
        raise ValueError("quality_classify needs a non-empty weights dict")
    if mode is None:
        mode = "map_literal" if df.isStreaming else "join"
    if mode not in ("join", "map_literal"):
        raise ValueError(
            f"quality_classify mode must be 'join' or 'map_literal', "
            f"got {mode!r}"
        )
    if mode == "join" and df.isStreaming:
        raise ValueError(
            "quality_classify mode='join' aggregates per document — "
            "unsupported on streams; use mode='map_literal'"
        )
    base = df.withColumn(
        "n_tokens", TX.token_count(F.lower(F.col(text_col)))
    )
    if mode == "map_literal":
        # one literal map + a per-row higher-order fold: the same
        # round-to-9-decimals DECIMAL(18,9) terms as the join path,
        # accumulated at the join path's own F.sum type DECIMAL(28,9)
        # (each add yields (29,9), cast back — exact at 9 decimals), so
        # both modes produce bit-identical scores
        wmap = F.map_from_arrays(
            F.array(*[F.lit(t) for t in weights]),
            F.array(*[
                F.round(F.lit(float(x)), 9).cast("decimal(18,9)")
                for x in weights.values()
            ]),
        )
        sw = F.aggregate(
            TX.tokens(F.lower(F.col(text_col))),
            F.lit(0).cast("decimal(28,9)"),
            lambda acc, t: (
                acc
                + F.coalesce(
                    F.element_at(wmap, t), F.lit(0).cast("decimal(18,9)")
                )
            ).cast("decimal(28,9)"),
        )
        scored = base.withColumn("__sw", sw)
    else:
        spark = df.sparkSession
        w = F.broadcast(
            spark.createDataFrame(
                [(t, float(x)) for t, x in weights.items()],
                "__tok string, __w double",
            )
        )
        toks = _spread(df).select(
            F.col(id_col).alias("id"),
            F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("__tok"),
        )
        sums = (
            toks.join(w, "__tok")
            .groupBy("id")
            .agg(
                F.sum(F.round(F.col("__w"), 9).cast("decimal(18,9)")).alias(
                    "__sw"
                )
            )
        )
        scored = base.join(
            sums.withColumnRenamed("id", id_col), id_col, "left"
        )
    score = F.when(F.col("n_tokens") > 0,
        F.lit(float(bias))
        + F.coalesce(F.col("__sw").cast("double"), F.lit(0.0))
        / F.col("n_tokens"),
    ).otherwise(F.lit(float(bias)))
    return (
        scored
        .withColumn("score", F.round(score, 9))
        .withColumn("keep", F.col("score") >= F.lit(float(threshold)))
        .drop("__sw")
    )


#: PII patterns written to the RE2 ∩ java.util.regex common subset —
#: no lookarounds, no backreferences, ASCII \d/\b in both engines — so
#: Spark's regexp_count/regexp_replace and an external RE2 oracle
#: (DuckDB regexp_extract_all/regexp_replace 'g') match and redact the
#: exact same spans.  Deliberately recall-leaning (e.g. the ipv4
#: pattern accepts 999.999.999.999): corpus scrubbing prefers false
#: redactions over leaked PII, the BigCode/Dolma convention.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d{1,2}[ \-]\d{3}[ \-]\d{3,4}[ \-]\d{4}",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
    out_col: str | None = None,
    tag_format: str = "<{TYPE}>",
) -> DataFrame:
    """PII detection + redaction — the pre-release scrub every public
    training corpus runs (emails, IPv4 addresses, phone numbers).  Adds
    one ``n_<type>`` count per requested type (counted on the ORIGINAL
    text, so later redactions never mask earlier counts), ``has_pii``,
    and rewrites ``out_col`` (default: in place) with each match
    replaced by ``tag_format`` (``<EMAIL>``, ``<IPV4>``, ...).
    Replacement applies in the declared ``types`` order; patterns are
    chosen non-overlapping, and counts are order-independent by
    construction.

    Scale: pure map-side Column regexes (JVM codegen, no UDF), 0
    exchanges — partition-count-invariant and embarrassingly parallel
    at any corpus size."""
    types = list(types or PII_PATTERNS)
    unknown = sorted(set(types) - set(PII_PATTERNS))
    if unknown:
        raise ValueError(
            f"pii_scrub: unknown PII types {unknown}; "
            f"available: {sorted(PII_PATTERNS)}"
        )
    out = df
    flags = []
    for t in types:
        out = out.withColumn(
            f"n_{t}",
            F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[t])),
        )
        flags.append(F.col(f"n_{t}") > 0)
    has = flags[0]
    for f in flags[1:]:
        has = has | f
    redacted = F.col(text_col)
    for t in types:
        tag = tag_format.format(TYPE=t.upper())
        # Java's regexp_replace treats $ and \ in the REPLACEMENT as
        # group references/escapes (RE2 oracles treat them literally) —
        # quote them so any custom tag lands byte-for-byte as written
        tag = tag.replace("\\", "\\\\").replace("$", "\\$")
        redacted = F.regexp_replace(redacted, PII_PATTERNS[t], tag)
    return out.withColumn("has_pii", has).withColumn(
        out_col or text_col, redacted
    )


#: HTML boilerplate patterns, RE2 ∩ java.util.regex common subset
#: (non-greedy + (?is) flags work identically in both engines) so a
#: DuckDB oracle strips byte-identical text.  Order matters and is
#: fixed: comments → script/style blocks (their TEXT content must go,
#: not just the tags) → remaining tags → entities → collapse.
_HTML_STRIP_RES: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<[^>]*>", " "),
]
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
]


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
) -> DataFrame:
    """Dependency-free HTML → text extraction — the first stage of any
    web-crawl curation pipeline (the trafilatura/resiliparse niche,
    reduced to the deterministic regex core): strips comments, whole
    ``<script>``/``<style>`` blocks (content included), every remaining
    tag, decodes the six standard entities (``&amp; &lt; &gt; &quot;
    &#39;/&apos; &nbsp;`` — ``&amp;`` last so ``&amp;lt;`` decodes to
    the literal ``&lt;``), and collapses whitespace.  NULL input yields
    an empty string — the one well-defined empty bucket, the
    :func:`url_features` convention.  This is a text-recovery pass, not
    a sanitizer — do not reuse it as an XSS defense.

    Scale: a fixed chain of map-side Column regexes (JVM codegen, no
    UDF), 0 exchanges — streaming-safe and partition-count-invariant.
    Patterns sit in the RE2 ∩ Java common subset, so an external
    oracle replays the extraction byte-for-byte."""
    text = F.coalesce(F.col(html_col), F.lit(""))
    for pat, repl in _HTML_STRIP_RES:
        text = F.regexp_replace(text, pat, repl)
    for ent, ch in _HTML_ENTITIES:
        text = F.replace(text, F.lit(ent), F.lit(ch))
    text = F.trim(F.regexp_replace(text, r"\s+", " "))
    return df.withColumn(out_col, text)


#: Gopher rule thresholds (Rae et al. 2021, arXiv:2112.11446 §A1.1.2 —
#: the published repetition-free quality heuristics). Every value is a
#: config knob on :func:`gopher_filter`.
GOPHER_DEFAULTS: dict[str, float] = {
    "min_tokens": 50,
    "max_tokens": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_ratio": 0.9,
    "max_ellipsis_ratio": 0.3,
    "min_alpha_frac": 0.8,
    "min_stopwords": 2,
}

#: Gopher's "has 2 of ..." stopword list (the paper's exact eight).
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def word_blocklist_filter(
    df: DataFrame,
    words: list[str],
    text_col: str = "text",
    mode: str = "any",
    max_hits: int = 0,
) -> DataFrame:
    """The C4 bad-words rule (Raffel et al. 2020 §2.2 — "removed any
    page that contained any word on the 'List of Dirty, Naughty …'
    blocklist") as one map-only stage: lowercased whitespace tokens are
    membership-tested against the broadcast-literal ``words`` set and
    the stage adds ``n_blocked`` (total offending-token count),
    ``blocked_words`` (the sorted distinct offenders actually present —
    the audit column) and ``keep``. ``mode="any"`` keeps only documents
    with ``n_blocked <= max_hits`` (C4 semantics at the default 0);
    ``mode="flag"`` keeps every row and just annotates.

    Multi-word entries are matched as exact consecutive token SEQUENCES
    (the published list has phrases): entries group by token length and
    each length-n group membership-tests the document's word n-grams,
    so a phrase can never match across a token it doesn't contain.

    Determinism: membership is exact token equality after ``lower()``
    (no substring matching — 'class' never trips on 'ass'; compose with
    ``normalize`` upstream for punctuation-glued hits). Scale: each
    length group compiles to one INSET membership test (a hash set, not
    per-entry expression nodes), so the plan is scan + Project with 0
    exchanges, no UDF, streaming-safe."""
    if mode not in ("any", "flag"):
        raise ValueError(f"mode must be 'any' or 'flag', got {mode!r}")
    if not words:
        raise ValueError("words must be a non-empty list")
    groups: dict[int, list[str]] = {}
    for w in words:
        parts = [t for t in w.lower().split(" ") if t]
        if not parts:
            raise ValueError("words must not contain blank entries")
        groups.setdefault(len(parts), []).append(" ".join(parts))
    # materialize the token array as its own column: interpreted lambdas
    # re-evaluate a referenced expression per element, so element_at over
    # the raw split would re-tokenize the document at every gram position
    # (measured 15x slower on the bench row)
    df = df.withColumn(
        "__bl_toks",
        F.coalesce(
            TX.tokens(F.lower(F.col(text_col))),
            F.array().cast("array<string>"),
        ),
    )
    toks = F.col("__bl_toks")
    # single-arg lambdas built by factories: transform/filter dispatch on
    # lambda ARITY (a second parameter — even a default — receives the
    # element index), so closures must not add parameters
    def _gram_at(n: int):
        # try_element_at composition: F.slice rejects Column starts and
        # plain element_at THROWS under ANSI when a doc is shorter than
        # the phrase (hypothesis-caught); out-of-range positions yield
        # nulls concat_ws drops, and a short join (< n-1 spaces) can
        # never equal an n-token phrase, so the size < n edge is inert
        return lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, i + k + 1) for k in range(n)]
        )

    def _in_set(pl: list[str]):
        return lambda g: g.isin(*pl)

    hit_arrays = []
    for n in sorted(groups):
        pl = sorted(set(groups[n]))
        if n == 1:
            grams = toks
        else:
            grams = F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))
                ),
                _gram_at(n),
            )
        hit_arrays.append(F.filter(grams, _in_set(pl)))
    hits = F.concat(*hit_arrays) if len(hit_arrays) > 1 else hit_arrays[0]
    out = df.withColumn(
        "n_blocked", F.size(hits).cast("bigint")
    ).withColumn(
        "blocked_words",
        F.array_sort(F.array_distinct(hits)),
    ).withColumn("keep", F.col("n_blocked") <= max_hits).drop("__bl_toks")
    if mode == "any":
        return out.filter(F.col("keep"))
    return out


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """The Gopher rule-based quality filter (Rae et al. 2021, §A1.1.2)
    as one map-only stage — the standard pre-LM heuristic screen:
    token-count band, mean-word-length band, symbol-to-word ratio
    (``#`` and ``...`` hits per token), bullet-started and
    ellipsis-ended line fractions, alphabetic-word fraction, and the
    2-of-8 stopword requirement.  Adds every metric (``n_tokens``,
    ``mean_word_len``, ``symbol_ratio``, ``bullet_ratio``,
    ``ellipsis_ratio``, ``alpha_frac``, ``n_stop``) plus the combined
    ``keep`` — metrics stay inspectable so a pipeline can report WHY
    documents died (the usual curation audit).  Thresholds are config
    (``thresholds`` merges over :data:`GOPHER_DEFAULTS`).  Empty/NULL
    documents fail the token band and keep well-defined zero metrics.

    Determinism: tokens are the whitespace split used repo-wide;
    ratios are integer quotients evaluated in one fixed double
    expression, rounded to 9 decimals — bit-replicable by an external
    oracle.

    Scale: pure Column math (array folds, no UDF, no explode) —
    nothing shuffles at any corpus size; streaming-safe and
    embarrassingly parallel.  Like :func:`repetition_filter`, the
    per-row folds are interpreted expressions, so an under-partitioned
    batch input is first ``_spread`` to the session parallelism (no-op
    at real scale and on streams/local frames)."""
    th = {**GOPHER_DEFAULTS, **(thresholds or {})}
    unknown = sorted(set(th) - set(GOPHER_DEFAULTS))
    if unknown:
        raise ValueError(
            f"gopher_filter: unknown thresholds {unknown}; "
            f"available: {sorted(GOPHER_DEFAULTS)}"
        )
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = TX.tokens(text)
    n = F.size(toks).cast("bigint")
    nd = n.cast("double")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.length(t).cast("bigint"),
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    low = F.lower(text)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(
        F.filter(TX.tokens(low), lambda t: F.array_contains(stop_arr, t))
    )
    n_symbol = (
        F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ) + F.regexp_count(text, F.lit(r"\.\.\.")) + F.regexp_count(
        text, F.lit("…")
    )
    lines = F.filter(
        F.split(text, "\n"),
        lambda ln: F.length(F.trim(ln)) > 0,
    )
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).rlike(r"^[-*•]"),
        )
    )
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"),
        )
    )

    def ratio(num, den):
        return F.when(
            den > 0, F.round(num.cast("double") / den.cast("double"), 9)
        ).otherwise(F.lit(0.0))

    out = (
        _spread(df).withColumn("n_tokens", n)
        .withColumn("mean_word_len", ratio(sum_len, n))
        .withColumn("symbol_ratio", ratio(n_symbol, n))
        .withColumn("bullet_ratio", ratio(n_bullet, n_lines))
        .withColumn("ellipsis_ratio", ratio(n_ellipsis, n_lines))
        .withColumn("alpha_frac", ratio(n_alpha, n))
        .withColumn("n_stop", n_stop.cast("bigint"))
    )
    keep = (
        (F.col("n_tokens") >= F.lit(int(th["min_tokens"])))
        & (F.col("n_tokens") <= F.lit(int(th["max_tokens"])))
        & (F.col("mean_word_len") >= F.lit(float(th["min_mean_word_len"])))
        & (F.col("mean_word_len") <= F.lit(float(th["max_mean_word_len"])))
        & (F.col("symbol_ratio") <= F.lit(float(th["max_symbol_ratio"])))
        & (F.col("bullet_ratio") <= F.lit(float(th["max_bullet_ratio"])))
        & (F.col("ellipsis_ratio") <= F.lit(float(th["max_ellipsis_ratio"])))
        & (F.col("alpha_frac") >= F.lit(float(th["min_alpha_frac"])))
        & (F.col("n_stop") >= F.lit(int(th["min_stopwords"])))
    )
    return out.withColumn("keep", keep)


def source_overlap(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Cross-stratum duplicate-content matrix — the provenance
    diagnostic run before mixing sources: for every unordered stratum
    pair (a < b bytewise), how many DISTINCT contents appear in both
    (``n_shared``), each side's distinct-content total (``n_a``,
    ``n_b``), and the content-level Jaccard (9 decimals).  "How much of
    wiki is already inside crawl" is one row of this table; a high
    overlap says dedup BEFORE mixing or the mixture weights lie.
    Contents are the standard fingerprint (whitespace-normalized md5;
    ``normalize=False`` for byte-exact).  Pairs with zero overlap are
    omitted (strata² rows of zeros help nobody at 10³ sources).

    Scale: one groupBy to (fingerprint, stratum) distinct pairs, a
    fingerprint self-join that fans out only Σ strata(fp)² per
    fingerprint (bounded by the stratum count, not the corpus), and a
    stratum-pair count — never a corpus self-join."""
    key = (
        TX.fingerprint(F.col(text_col))
        if normalize
        else F.md5(F.col(text_col).cast("binary"))
    )
    fs = _materialize(
        _spread(df).select(
            key.alias("__fp"), F.col(by).cast("string").alias("__s")
        ).distinct()
    )
    totals = fs.groupBy("__s").agg(
        F.count_distinct("__fp").alias("__n")
    )
    pairs = (
        fs.alias("a")
        .join(fs.alias("b"), "__fp")
        .filter(F.col("a.__s") < F.col("b.__s"))
        .groupBy(
            F.col("a.__s").alias("stratum_a"),
            F.col("b.__s").alias("stratum_b"),
        )
        .agg(F.count_distinct("__fp").alias("n_shared"))
    )
    ta = totals.select(
        F.col("__s").alias("stratum_a"), F.col("__n").alias("n_a")
    )
    tb = totals.select(
        F.col("__s").alias("stratum_b"), F.col("__n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), "stratum_a")
        .join(F.broadcast(tb), "stratum_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                9,
            ),
        )
        .select(
            "stratum_a", "stratum_b", "n_shared", "n_a", "n_b", "jaccard"
        )
    )


#: query parameters stripped by :func:`url_normalize` — the usual
#: tracking/session noise that splits one logical page into many URLs.
URL_TRACKING_PARAMS_RE = (
    r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref|ref_src|mc_cid|mc_eid)$"
)


def url_normalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_norm",
    sort_params: bool = False,
    strip_params_re: str = URL_TRACKING_PARAMS_RE,
) -> DataFrame:
    """Canonical URL form for URL-level dedup and per-page caps — the
    standard crawl canonicalization: lowercase scheme and authority,
    strip the default port (``:80`` for http, ``:443`` for https),
    drop the fragment, remove tracking query parameters (name matches
    ``strip_params_re``, case-insensitively — utm_*/fbclid/gclid/... by
    default), drop the ``?`` when no parameters survive, and normalize
    an empty path to ``/``.  ``sort_params=True`` additionally sorts
    surviving parameters bytewise (order-insensitive canonical form —
    opt-in because it changes which URLs unify).  Unparseable URLs
    (no ``scheme://``) pass through unchanged into ``out_col``; NULLs
    become empty strings.  Two pages differing only in tracking noise
    then fingerprint identically — compose with ``dedup`` on
    ``url_norm`` or ``cap`` for the usual pipeline.

    Scale: one Project of regexp extracts + an array filter/rejoin for
    the query string — map-only, 0 exchanges, streaming-safe; patterns
    in the RE2 ∩ Java common subset, oracle-replicable."""
    raw = F.coalesce(F.col(url_col), F.lit(""))
    url_re = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
    scheme = F.lower(F.regexp_extract(raw, url_re, 1))
    auth = F.lower(F.regexp_extract(raw, url_re, 2))
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.regexp_replace(auth, r":80$", ""),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.regexp_replace(auth, r":443$", ""),
    ).otherwise(auth)
    path = F.regexp_extract(raw, url_re, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(raw, url_re, 4)  # includes the leading '?'
    params = F.filter(
        F.split(F.regexp_replace(qs, r"^\?", ""), "&"),
        lambda p: (F.length(p) > 0)
        & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).rlike(
            strip_params_re
        ),
    )
    if sort_params:
        params = F.array_sort(params)
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    normalized = F.when(
        scheme == "", raw  # unparseable: pass through
    ).otherwise(
        F.concat(scheme, F.lit("://"), auth, path, query)
    )
    return df.withColumn(out_col, normalized)


#: Gopher repetition thresholds (Rae et al. 2021 §A1.1.1 Table A1 —
#: keep a document iff every metric is ≤ its bound).
GOPHER_REPETITION_DEFAULTS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _grams_or_empty(toks: Column, n: int) -> Column:
    """All word n-grams of a token array, or an empty array when the
    document is shorter than ``n`` tokens (``word_ngrams_all`` would
    otherwise emit one short gram)."""
    return F.when(
        F.size(toks) >= n, word_ngrams_all(toks, n)
    ).otherwise(F.array().cast("array<string>"))


def _top_gram_chars(grams: Column) -> Column:
    """max over distinct grams of count·len(gram) — the character mass
    of the most repeated n-gram, as ONE sorted fold over the array
    (equal grams are adjacent after array_sort, so a (prev, run, best)
    struct accumulator tracks the best run·len without any shuffle or
    per-gram rescans)."""
    return F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint")).alias("run"),
            F.greatest(
                acc["best"],
                (
                    F.when(g == acc["prev"], acc["run"] + 1)
                    .otherwise(F.lit(1).cast("bigint"))
                ) * F.length(g),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _dup_gram_chars(grams: Column) -> Column:
    """Σ over distinct grams with count ≥ 2 of count·len(gram) — the
    character mass of ALL occurrences of duplicated n-grams, same
    sorted-fold shape as :func:`_top_gram_chars` (the second occurrence
    retroactively adds the first occurrence's length)."""
    return F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("dup"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint")).alias("run"),
            (
                acc["dup"]
                + F.when(
                    g == acc["prev"],
                    F.length(g).cast("bigint")
                    + F.when(
                        acc["run"] == 1, F.length(g).cast("bigint")
                    ).otherwise(F.lit(0).cast("bigint")),
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("dup"),
        ),
        lambda acc: acc["dup"],
    )


def _java_trim(s: str) -> str:
    """``java.lang.String.trim`` exactly: strip leading/trailing chars
    <= U+0020 (Python ``str.strip`` also strips U+00A0 etc. — a real
    difference on web text)."""
    i, j = 0, len(s)
    while i < j and s[i] <= " ":
        i += 1
    while j > i and s[j - 1] <= " ":
        j -= 1
    return s[i:j]


def _jround9(x: float) -> float:
    """Spark ``round(double, 9)`` exactly: shortest-decimal representation
    (Double.toString ≡ Python repr) quantized HALF_UP — NOT Python's
    banker's ``round`` (differs on e.g. 1/1024 = 0.0009765625, whose
    10th digit is an exact 5)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1E-9"),
                                           rounding=ROUND_HALF_UP))


def _repetition_filter_pandas(
    df: DataFrame, text_col: str, th: dict[str, float]
) -> DataFrame:
    """Arrow-batched twin of the Column-expression repetition screen —
    bit-identical metrics (pinned by tests), ~40× less per-row CPU than
    the interpreted higher-order folds."""
    from collections import Counter

    from pyspark.sql.types import (
        BooleanType, DoubleType, StructField, StructType,
    )

    names = list(GOPHER_REPETITION_DEFAULTS)
    bounds = [(n, float(th[n])) for n in names]
    schema = StructType(
        list(df.schema.fields)
        + [StructField(n, DoubleType()) for n in names]
        + [StructField("keep", BooleanType())]
    )

    def ratio(num: int, den: int) -> float:
        return _jround9(num / den) if den > 0 else 0.0

    def metrics(text: str) -> dict[str, float]:
        n_chars = len(text)
        vals: dict[str, float] = {}
        for sep, prefix in (("\n\n", "para"), ("\n", "line")):
            segs = [s for s in (_java_trim(p) for p in text.split(sep)) if s]
            uniq = set(segs)
            n, nd = len(segs), len(uniq)
            chars = sum(len(s) for s in segs)
            chars_d = sum(len(s) for s in uniq)
            vals[f"dup_{prefix}_frac"] = ratio(n - nd, n)
            vals[f"dup_{prefix}_char_frac"] = ratio(chars - chars_d, chars)
        toks = [t for t in text.split(" ") if t]
        counters = {
            n: Counter(
                " ".join(toks[i : i + n])
                for i in range(len(toks) - n + 1)
            )
            if len(toks) >= n
            else Counter()
            for n in range(2, 11)
        }
        for n in (2, 3, 4):
            top = max(
                (c * len(g) for g, c in counters[n].items()), default=0
            )
            vals[f"top_{n}gram_char_frac"] = ratio(top, n_chars)
        for n in (5, 6, 7, 8, 9, 10):
            dup = sum(
                c * len(g) for g, c in counters[n].items() if c >= 2
            )
            vals[f"dup_{n}gram_char_frac"] = ratio(dup, n_chars)
        return vals

    def compute(batches):
        for pdf in batches:
            mets = [
                metrics(t if isinstance(t, str) else "")
                for t in pdf[text_col]
            ]
            out = pdf.copy()
            for name in names:
                out[name] = [m[name] for m in mets]
            out["keep"] = [
                all(m[k] <= b for k, b in bounds) for m in mets
            ]
            yield out

    return _spread(df).mapInPandas(compute, schema=schema)


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
    impl: str = "pandas",
) -> DataFrame:
    """The Gopher repetition rules (Rae et al. 2021 §A1.1.1) — the
    companion screen to :func:`gopher_filter`'s quality rules, catching
    boilerplate-looped and keyboard-mash documents: duplicate line /
    paragraph fractions (count and character mass), the character share
    of the single most repeated {2,3,4}-gram, and the character mass of
    all duplicated {5..10}-grams.  Adds all 13 metrics plus ``keep``
    (every metric ≤ its bound; :data:`GOPHER_REPETITION_DEFAULTS`,
    overridable per key via ``thresholds``).

    Metric definitions (pinned, oracle-replicable): lines split on
    ``\\n`` (paragraphs on ``\\n\\n``), trimmed, empties dropped;
    ``dup_line_frac = (n_lines − n_distinct)/n_lines`` and
    ``dup_line_char_frac`` the same on summed lengths;
    ``top_Ngram_char_frac = max_g count(g)·len(g) / len(text)`` over
    raw-token word n-grams; ``dup_Ngram_char_frac = Σ_{count(g)≥2}
    count(g)·len(g) / len(text)``.  Empty/NULL documents score all
    zeros and keep.  Ratios round to 9 decimals.  Note the top-gram
    metric counts the most frequent gram EVEN AT COUNT 1 (the paper's
    definition), so very short documents legitimately fail it — run
    the length rules (:func:`gopher_filter`) alongside, as Gopher does.

    Scale: every metric is WITHIN-document — array_distinct ratios and
    one sorted fold per n (struct accumulator over the array_sort'ed
    gram array, O(G log G) per doc) — so the stage shuffles nothing at
    any corpus size, is streaming-safe, and never explodes tokens into
    rows.  The per-row folds are CPU-heavy interpreted expressions, so
    an under-partitioned batch input (one small parquet file → one scan
    partition → one core) is first ``_spread`` to the session
    parallelism — a no-op at real scale where inputs span many splits,
    and a pass-through for streams and local test frames (measured: the
    sf0.1 single-file bench row ran 26 s on one task, ~1 s spread over
    32).  Two implementations with pinned-identical output (including
    the HALF_UP 9-decimal rounding and Java trim semantics):
    ``impl="pandas"`` (default) computes the metrics in one Arrow
    batch pass — Counter/sets beat interpreted fold expressions ~40×
    per row; ``impl="column"`` is the pure-Column form (zero Python,
    the DuckDB-oracle reference semantics) — both map-only and
    streaming-safe."""
    th = {**GOPHER_REPETITION_DEFAULTS, **(thresholds or {})}
    unknown = sorted(set(th) - set(GOPHER_REPETITION_DEFAULTS))
    if unknown:
        raise ValueError(
            f"repetition_filter: unknown thresholds {unknown}; "
            f"available: {sorted(GOPHER_REPETITION_DEFAULTS)}"
        )
    if impl == "pandas":
        return _repetition_filter_pandas(df, text_col, th)
    if impl != "column":
        raise ValueError(f"impl must be 'pandas' or 'column', got {impl!r}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = TX.tokens(text)
    n_chars = F.length(text).cast("bigint")

    def seg_metrics(sep: str, prefix: str):
        segs = F.filter(
            F.transform(F.split(text, sep), lambda s: F.trim(s)),
            lambda s: F.length(s) > 0,
        )
        n = F.size(segs).cast("bigint")
        nd = F.size(F.array_distinct(segs)).cast("bigint")
        chars = F.aggregate(
            segs, F.lit(0).cast("bigint"),
            lambda acc, s: acc + F.length(s).cast("bigint"),
        )
        chars_d = F.aggregate(
            F.array_distinct(segs), F.lit(0).cast("bigint"),
            lambda acc, s: acc + F.length(s).cast("bigint"),
        )
        frac = F.when(
            n > 0, F.round((n - nd).cast("double") / n.cast("double"), 9)
        ).otherwise(F.lit(0.0))
        cfrac = F.when(
            chars > 0,
            F.round((chars - chars_d).cast("double") / chars.cast("double"), 9),
        ).otherwise(F.lit(0.0))
        return {f"dup_{prefix}_frac": frac, f"dup_{prefix}_char_frac": cfrac}

    cols = {}
    cols.update(seg_metrics(r"\n\n", "para"))
    cols.update(seg_metrics(r"\n", "line"))

    def char_frac(mass: Column) -> Column:
        return F.when(
            n_chars > 0,
            F.round(mass.cast("double") / n_chars.cast("double"), 9),
        ).otherwise(F.lit(0.0))

    for n in (2, 3, 4):
        cols[f"top_{n}gram_char_frac"] = char_frac(
            _top_gram_chars(_grams_or_empty(toks, n))
        )
    for n in (5, 6, 7, 8, 9, 10):
        cols[f"dup_{n}gram_char_frac"] = char_frac(
            _dup_gram_chars(_grams_or_empty(toks, n))
        )
    out = _spread(df)
    for name in GOPHER_REPETITION_DEFAULTS:
        out = out.withColumn(name, cols[name])
    keep = None
    for name in GOPHER_REPETITION_DEFAULTS:
        cond = F.col(name) <= F.lit(float(th[name]))
        keep = cond if keep is None else (keep & cond)
    return out.withColumn("keep", keep)


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    target_text_col: str | None = None,
    n_buckets: int = 1024,
    lam: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 —
    "Data Selection for Language Models via Importance Resampling"):
    score each raw-corpus document by how target-like its hashed n-gram
    profile is.  Features are lowercased whitespace unigrams + bigrams
    hashed into ``n_buckets`` md5 buckets (the paper's hashed n-gram
    estimator); each bucket gets an add-``lam``-smoothed log probability
    ratio ``ln(p_target(b) / p_raw(b))`` and a document's weight is the
    sum of its grams' ratios (multiplicity counts).  Adds ``n_grams``
    and ``dsir_score``; resample downstream by score (top-fraction, or
    Gumbel top-k for the paper's stochastic variant).

    Determinism: bucket = md5 slice (no RNG); per-bucket log ratios are
    computed once on the bounded bucket table, rounded to 9 decimals,
    and per-document sums are DECIMAL(18,9) — exact, order-independent
    — so an external oracle replays every score bit-for-bit.

    Scale: two corpus passes (bucket counts; scoring), both map-side-
    combinable explode→groupBy shapes.  The ratio table is ≤``n_buckets``
    rows and broadcast; the target side (a quality/domain sample) is
    typically tiny.  Nothing corpus-sized is ever collected or
    self-joined."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if lam <= 0:
        raise ValueError("lam (smoothing) must be positive")

    def grams_of(frame: DataFrame, col: str, key) -> DataFrame:
        t = TX.tokens(F.lower(F.col(col)))
        n1 = F.greatest(F.size(t) - 1, F.lit(0))
        bigrams = F.zip_with(
            F.slice(t, 1, n1), F.slice(t, 2, n1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        return frame.select(
            key.alias("id"),
            F.explode(F.concat(t, bigrams)).alias("__g"),
        ).withColumn(
            "bucket",
            F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10)
            .cast("bigint") % n_buckets,
        )

    raw_g = grams_of(_spread(df), text_col, F.col(id_col))
    tgt_g = grams_of(
        target, target_text_col or text_col, F.monotonically_increasing_id()
    )
    raw_b = raw_g.groupBy("bucket").agg(
        F.count("*").cast("double").alias("__cr")
    )
    tgt_b = tgt_g.groupBy("bucket").agg(
        F.count("*").cast("double").alias("__ct")
    )
    # the raw total folds as a whole-frame window over the ≤n_buckets
    # joined count table (left join preserves every raw bucket), NOT a
    # second aggregate over the gram table — one corpus pass, not two.
    # The target total does need its own agg (target-only buckets would
    # be dropped by the join), but the target side is tiny by assumption.
    # Integer-valued doubles sum exactly, so totals match count() to the
    # bit.  (plan-audited r8: corpus passes 3 → 2, exchanges 13 → 12)
    tot_t = tgt_b.agg(F.sum("__ct").alias("__tt"))
    lam_b = float(lam) * n_buckets
    ratio = (
        raw_b.join(tgt_b, "bucket", "left")
        .withColumn("__tr", F.sum("__cr").over(Window.partitionBy()))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "bucket",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("__ct"), F.lit(0.0)) + F.lit(float(lam)))
                        * (F.col("__tr") + F.lit(lam_b))
                    )
                    / (
                        (F.col("__cr") + F.lit(float(lam)))
                        * (F.col("__tt") + F.lit(lam_b))
                    )
                ),
                9,
            ).cast("decimal(18,9)").alias("__lr"),
        )
    )
    scores = (
        raw_g.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("__lr").cast("double").alias("dsir_score"),
        )
    )
    return (
        df.join(
            scores.withColumnRenamed("id", id_col), id_col, "left"
        )
        .withColumn("n_grams", F.coalesce(F.col("n_grams"), F.lit(0)))
        .withColumn(
            "dsir_score", F.coalesce(F.col("dsir_score"), F.lit(0.0))
        )
    )


#: scheme://host extractor and host-suffix slices, all in the RE2 ∩
#: java.util.regex common subset (see PII_PATTERNS) so an external
#: oracle extracts identical spans.
_URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+).*$"


def url_features(
    df: DataFrame,
    url_col: str = "url",
    blocklist: list[str] | None = None,
    public_suffixes: list[str] | None = None,
) -> DataFrame:
    """URL → curation features, the CommonCrawl-style web-corpus shape:
    adds ``host`` (lowercased authority), ``domain``, ``tld``, and —
    when a ``blocklist`` of domains is given — ``blocked``.  By default
    ``domain`` is the LAST TWO host labels (NOT the registrable domain:
    ``bbc.co.uk`` → ``co.uk``, so blocklists/caps on multi-part public
    suffixes scope to the whole suffix).  Pass ``public_suffixes`` — a
    list of multi-label public suffixes such as ``["co.uk",
    "com.au"]``, e.g. sliced from the Mozilla Public Suffix List — to
    get true registrable domains: a host ending in a listed suffix
    takes one extra label (``bbc.co.uk`` → ``bbc.co.uk``); longest
    suffix wins.  Unparseable URLs yield empty strings (and ``blocked
    = false``), never nulls, so downstream groupBys keep one
    well-defined bucket.  Compose with ``cap`` (per-domain caps),
    ``hash_sample`` (per-domain rates), or a filter on ``blocked`` for
    the usual pipeline.

    Scale: pure map-side regexp_extract + isin against a literal
    blocklist (for blocklists past ~10⁴ entries, broadcast-join a
    blocklist frame on ``domain`` instead); the suffix list compiles
    into one CASE chain evaluated per row — keep it to the suffixes
    your corpus actually has (or broadcast-join a full PSL frame on
    the host suffix) — 0 exchanges."""
    import re as _re

    host = F.lower(
        F.regexp_extract(
            F.coalesce(F.col(url_col), F.lit("")), _URL_HOST_RE, 1
        )
    )
    domain = F.regexp_extract(F.col("host"), r"([^.]+\.[^.]+)$", 1)
    if public_suffixes:
        # each wrap becomes the OUTERMOST (first-evaluated) branch, so
        # iterating shortest-first leaves the longest suffix on top —
        # "plc.co.im" beats "co.im"; one extra label ahead of the
        # matched suffix = the registrable domain
        for sfx in sorted(
            {s.lower().strip(".") for s in public_suffixes},
            key=lambda s: s.count("."),
        ):
            pat = r"([^.]+\." + _re.escape(sfx) + r")$"
            domain = F.when(
                F.col("host").endswith("." + sfx),
                F.regexp_extract(F.col("host"), pat, 1),
            ).otherwise(domain)
    out = (
        df.withColumn("host", host)
        .withColumn("domain", domain)
        .withColumn("tld", F.regexp_extract(F.col("host"), r"\.([^.]+)$", 1))
    )
    if blocklist is not None:
        out = out.withColumn(
            "blocked", F.col("domain").isin([d.lower() for d in blocklist])
        )
    return out


def mad_outliers(
    df: DataFrame,
    score_col: str,
    by: str | None = None,
    c: float = 3.0,
    method: str | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Robust outlier flags by median absolute deviation — the
    heavy-tail-safe alternative to z-scores for corpus metrics (token
    counts, quality scores) whose distributions mean/std misread:
    ``outlier = |x − median| > c·MAD`` with ``MAD = median(|x −
    median|)`` per ``by`` stratum (global without).  Adds ``med``,
    ``mad``, ``is_outlier``; a zero-MAD stratum (over half the values
    identical) flags only values different from the median.

    Determinism: with ``method="exact"`` both medians use the exact
    interpolating ``percentile`` (hash-equal to DuckDB
    ``quantile_cont`` — the corpus_profile contract); the comparison is
    one fixed double expression.  ``method="approx"`` swaps in the
    fixed-memory ``percentile_approx`` sketch (±1/``accuracy``
    rank error) — the corpus-scale-stratum path.  Leaving ``method``
    unset keeps exact and WARNS at plan time (the documented
    escape-hatch contract, :func:`_resolve_percentile_method`)."""
    if c <= 0:
        raise ValueError("c must be positive")
    method = _resolve_percentile_method("mad_outliers", method)
    keys = [by] if by else []
    base = _spread(df).withColumn("__x", F.col(score_col).cast("double"))

    def med_of(col):
        if method == "approx":
            return F.percentile_approx(col, F.lit(0.5), F.lit(accuracy))
        return F.percentile(col, F.lit(0.5))

    def attach(frame: DataFrame, agg: DataFrame) -> DataFrame:
        return (
            frame.join(F.broadcast(agg), keys)
            if keys
            else frame.crossJoin(F.broadcast(agg))
        )

    med = base.groupBy(*keys).agg(med_of("__x").alias("med"))
    with_med = attach(base, med)
    mad = with_med.groupBy(*keys).agg(
        med_of(F.abs(F.col("__x") - F.col("med"))).alias("mad")
    )
    out = attach(with_med, mad)
    return (
        out.withColumn(
            "is_outlier",
            F.abs(F.col("__x") - F.col("med")) > F.lit(float(c)) * F.col("mad"),
        )
        .drop("__x")
    )


def score_normalize(
    df: DataFrame,
    score_col: str,
    by: str | None = None,
    out_col: str = "z_score",
) -> DataFrame:
    """Per-stratum z-normalization of a score column — the calibration
    step before mixing quality scores across sources whose classifiers
    run hot or cold: ``z = (x − mean)/std`` with mean and SAMPLE std
    per ``by`` stratum (global without).  Strata with fewer than 2 rows
    or zero variance get ``z = 0.0`` (no information, not infinity).

    Determinism: scores are rounded to 9 decimals and cast to
    DECIMAL(14,9) — narrow enough that the x·x product type (29,18)
    stays inside the 38-digit cap WITHOUT Spark's silent scale
    reduction — and both moments accumulate as exact, order-
    independent DECIMAL sums; then
    ``std = sqrt((n·Σx² − (Σx)²) / (n·(n−1)))`` evaluates in one
    fixed double expression, so an external oracle replays every z
    bit-for-bit.  (Never use the builtin ``stddev`` for cross-engine
    checks: its streaming accumulation is partition-order-dependent.)

    Scale: one map-side-combinable groupBy for the moments (stratum-
    cardinality result, broadcast back) + a map-side projection."""
    keys = [by] if by else []
    x = F.round(F.col(score_col), 9).cast("decimal(14,9)")
    base = _spread(df).withColumn("__x", x)
    moments = base.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("__n"),
        F.sum("__x").cast("decimal(28,9)").alias("__sx"),
        F.sum(
            (F.col("__x") * F.col("__x")).cast("decimal(38,18)")
        ).alias("__sxx"),
    )
    joined = (
        base.join(F.broadcast(moments), keys)
        if keys
        else base.crossJoin(F.broadcast(moments))
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    var_num = n * sxx - sx * sx
    z = F.when(
        (F.col("__n") >= 2) & (var_num > 0),
        F.round(
            (F.col("__x").cast("double") - sx / n)
            / F.sqrt(var_num / (n * (n - F.lit(1.0)))),
            9,
        ),
    ).otherwise(F.lit(0.0))
    return joined.withColumn(out_col, z).drop(
        "__x", "__n", "__sx", "__sxx"
    )


def length_filter(
    df: DataFrame,
    text_col: str = "text",
    by: str | None = None,
    lo: float = 0.01,
    hi: float = 0.99,
    method: str | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Percentile outlier trim: keep documents whose token count lies
    inside the corpus's [``lo``, ``hi``] quantile band (inclusive),
    per-``by`` stratum when given — the data-driven version of
    Gopher's absolute length rules: degenerate ultra-short docs and
    runaway concatenations both go, with thresholds that adapt to each
    stratum's own distribution.  Adds ``n_tokens``.

    Determinism: with ``method="exact"`` bounds use the exact
    interpolating ``percentile`` (hash-equal to DuckDB
    ``quantile_cont`` — the corpus_profile contract), compared
    inclusively against integer counts.  ``method="approx"`` swaps in
    the fixed-memory ``percentile_approx`` sketch — on corpus-scale
    strata the right trade (the band edges move by at most
    1/``accuracy`` of a stratum's rank range).  Leaving ``method``
    unset keeps exact and WARNS at plan time (the documented
    escape-hatch contract, :func:`_resolve_percentile_method`).

    Scale: one aggregate computes the bounds; the bounds table is
    stratum-cardinality and broadcast back, so the filter itself is
    map-side."""
    if not (0.0 <= lo <= hi <= 1.0):
        raise ValueError(f"need 0 <= lo <= hi <= 1, got [{lo}, {hi}]")
    method = _resolve_percentile_method("length_filter", method)
    keys = [by] if by else []
    base = _spread(df).withColumn(
        "__n", TX.token_count(F.col(text_col)).cast("double")
    )
    if method == "approx":
        bounds = base.groupBy(*keys).agg(
            F.percentile_approx("__n", F.lit(float(lo)), F.lit(accuracy))
            .alias("__lo"),
            F.percentile_approx("__n", F.lit(float(hi)), F.lit(accuracy))
            .alias("__hi"),
        )
    else:
        bounds = base.groupBy(*keys).agg(
            F.percentile("__n", F.lit(float(lo))).alias("__lo"),
            F.percentile("__n", F.lit(float(hi))).alias("__hi"),
        )
    joined = (
        base.join(F.broadcast(bounds), keys)
        if keys
        else base.crossJoin(F.broadcast(bounds))
    )
    return (
        joined.filter(
            (F.col("__n") >= F.col("__lo")) & (F.col("__n") <= F.col("__hi"))
        )
        .withColumn("n_tokens", F.col("__n").cast("bigint"))
        .drop("__n", "__lo", "__hi")
    )


def novelty_score(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    ngram_n: int = 8,
    unit: str = "word",
    max_df: int = 1,
) -> DataFrame:
    """Per-document n-gram novelty — the duplication-pressure /
    memorization-risk signal: the fraction of a document's DISTINCT
    n-grams that appear in at most ``max_df`` documents corpus-wide
    (``max_df=1`` ⇒ the gram exists nowhere else).  Low novelty marks
    template/boilerplate-heavy documents that exact and near dedup both
    miss (each copy differs, but every PIECE is common); high novelty
    marks unique long-tail content worth upweighting.  Adds
    ``n_distinct_grams``, ``n_novel`` and ``novelty`` (9-decimal
    rounded fraction; gram-less documents score 0.0).

    Scale: two corpus-keyed shuffles, both map-side combinable — the
    (id, gram) explode is distinct per document, so the gram
    document-frequency table is ``groupBy(gram).count()``; the per-doc
    roll-up re-keys on id.  Skewed grams (stop-phrase shingles)
    collapse in the partial aggregate; nothing is collected."""
    if unit not in ("word", "char"):
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    if max_df < 1:
        raise ValueError("max_df must be >= 1")

    def grams(col: Column) -> Column:
        if unit == "word":
            return TX.word_ngrams(col, ngram_n)
        return TX.shingles(col, ngram_n)

    # word_ngrams/shingles emit one degenerate '' gram for docs shorter
    # than the window (sequence(0, 0) -> a single empty slice); a truly
    # gram-less doc must score 0.0, not share the '' gram corpus-wide
    doc_grams = _spread(df).select(
        F.col(id_col).alias("__id"),
        F.explode(grams(F.col(text_col))).alias("__g"),
    ).where(F.col("__g") != "")
    # (id, gram) pairs are distinct per doc, so count(*) per gram IS the
    # document frequency
    gram_df = doc_grams.groupBy("__g").agg(F.count("*").alias("__df"))
    per_doc = (
        doc_grams.join(gram_df, "__g")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_distinct_grams"),
            F.sum(
                F.when(F.col("__df") <= max_df, 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        df.join(
            per_doc.withColumnRenamed("__id", id_col), id_col, "left"
        )
        .withColumn(
            "n_distinct_grams",
            F.coalesce("n_distinct_grams", F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "n_novel", F.coalesce("n_novel", F.lit(0)).cast("bigint")
        )
        .withColumn(
            "novelty",
            F.when(
                F.col("n_distinct_grams") > 0,
                F.round(
                    F.col("n_novel").cast("double")
                    / F.col("n_distinct_grams").cast("double"),
                    9,
                ),
            ).otherwise(F.lit(0.0)),
        )
    )


def quantile_bucket(
    df: DataFrame,
    score_col: str,
    by: str | None = None,
    edges: tuple[float, ...] = (1 / 3, 2 / 3),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    out_col: str = "bucket",
    method: str | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-stratum quantile-band labeling — the CCNet recipe (Wenzek et
    al. 2020): bucket every document by where its ``score_col`` (there,
    LM perplexity) falls in its ``by``-stratum's own distribution —
    ``head``/``middle``/``tail`` terciles by default, arbitrary
    ascending ``edges`` + ``len(edges)+1`` ``labels`` in general.  A row
    lands in the first bucket whose quantile threshold is >= its score
    (inclusive, ties to the better bucket); scores above the last edge
    take the final label.

    Determinism: with ``method="exact"`` thresholds use the exact
    interpolating ``percentile`` (hash-equal to DuckDB
    ``quantile_cont``); both engines then compare identical doubles, so
    bucket labels replay bit-for-bit.  ``method="approx"`` swaps in the
    fixed-memory sketch; leaving ``method`` unset keeps exact and WARNS
    at plan time (the documented escape-hatch contract,
    :func:`_resolve_percentile_method`).

    Scale: one aggregate computes the thresholds; the threshold table
    is stratum-cardinality and broadcast back; labeling is map-side."""
    if len(labels) != len(edges) + 1:
        raise ValueError(
            f"need len(labels) == len(edges)+1, got {len(labels)} labels "
            f"for {len(edges)} edges"
        )
    fl = [float(e) for e in edges]
    if any(not (0.0 < e < 1.0) for e in fl) or fl != sorted(fl):
        raise ValueError(f"edges must be ascending in (0, 1), got {edges}")
    method = _resolve_percentile_method("quantile_bucket", method)
    keys = [by] if by else []
    base = _spread(df)
    sc = F.col(score_col).cast("double")
    if method == "approx":
        aggs = [
            F.percentile_approx(sc, F.lit(e), F.lit(accuracy)).alias(f"__q{i}")
            for i, e in enumerate(fl)
        ]
    else:
        aggs = [
            F.percentile(sc, F.lit(e)).alias(f"__q{i}")
            for i, e in enumerate(fl)
        ]
    bounds = base.groupBy(*keys).agg(*aggs)
    joined = (
        base.join(F.broadcast(bounds), keys)
        if keys
        else base.crossJoin(F.broadcast(bounds))
    )
    # build innermost-last so the LOWEST edge is the outermost WHEN —
    # first match wins, ties inclusive toward the better bucket
    label = F.lit(labels[-1])
    for i in reversed(range(len(fl))):
        label = F.when(sc <= F.col(f"__q{i}"), F.lit(labels[i])).otherwise(
            label
        )
    return joined.withColumn(out_col, label).drop(
        *[f"__q{i}" for i in range(len(fl))]
    )


def corpus_diff(
    new: DataFrame,
    baseline: DataFrame,
    by: str,
    text_col: str = "text",
) -> DataFrame:
    """Snapshot drift report between two corpus versions — the check
    every pipeline re-run wants before shipping: per-``by`` stratum,
    document and token counts of baseline vs new with absolute deltas
    and percent change (NULL pct where the baseline stratum is empty —
    a new stratum, not an infinite growth).  Full outer on the stratum
    key, so vanished and newborn strata both surface.

    Scale: one map-side-combinable groupBy per side over bounded
    stratum keys; the join is stratum-cardinality rows.  Exact integer
    deltas; pct is an integer quotient rounded to 9 decimals —
    bit-replicable by an external oracle."""

    def side(df: DataFrame, pfx: str) -> DataFrame:
        return df.groupBy(F.col(by).alias(by)).agg(
            F.count("*").cast("bigint").alias(f"{pfx}_docs"),
            F.sum(TX.token_count(F.col(text_col)))
            .cast("bigint").alias(f"{pfx}_tokens"),
        )

    j = side(baseline, "old").join(side(new, "new"), by, "full_outer")
    od = F.coalesce(F.col("old_docs"), F.lit(0))
    nd = F.coalesce(F.col("new_docs"), F.lit(0))
    ot = F.coalesce(F.col("old_tokens"), F.lit(0))
    nt = F.coalesce(F.col("new_tokens"), F.lit(0))
    return j.select(
        by,
        od.alias("old_docs"), nd.alias("new_docs"),
        (nd - od).alias("delta_docs"),
        ot.alias("old_tokens"), nt.alias("new_tokens"),
        (nt - ot).alias("delta_tokens"),
        F.when(
            od > 0,
            F.round((nd - od).cast("double") / od * 100.0, 9),
        ).alias("pct_docs"),
    )


def upsample(
    df: DataFrame,
    stratify_by: str,
    factors: dict[str, float],
    on: str,
) -> DataFrame:
    """Per-stratum repetition / upsampling — the "repeat wiki 4×, books
    1.5×, drop 3/4 of crawl" mixing knob every pretraining recipe uses
    (data-constrained scaling, Muennighoff et al. 2023): each document
    gets ``floor(f)`` copies plus one more when its 16-bit md5 slice
    falls below ``frac(f)·65536`` — expected multiplicity is the
    stratum's factor (granularity 1/65536) and the realized copy count
    is a pure function of the id.  Strata absent from ``factors``
    default to 1.0; factor 0 drops the stratum.  Output: input rows
    exploded with ``copy_idx`` (0..copies−1), so downstream packing /
    sharding sees each repetition as its own row.

    Scale: map-only CASE + sequence + explode — no shuffle, no RNG
    state; output size is Σ factor·|stratum| by construction."""
    if not factors:
        raise ValueError("upsample needs a non-empty factors dict")
    if any(f < 0 for f in factors.values()):
        raise ValueError("upsample factors must be >= 0")
    b16 = F.conv(
        F.substring(F.md5(F.col(on).cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    full_c = None
    thr_c = None
    for val, f in factors.items():
        full = int(f)
        thr = int((f - full) * 65536 + 0.5)
        cond = F.col(stratify_by) == val
        full_c = (
            F.when(cond, F.lit(full))
            if full_c is None
            else full_c.when(cond, F.lit(full))
        )
        thr_c = (
            F.when(cond, F.lit(thr))
            if thr_c is None
            else thr_c.when(cond, F.lit(thr))
        )
    full_c = full_c.otherwise(F.lit(1))
    thr_c = thr_c.otherwise(F.lit(0))
    copies = full_c + F.when(b16 < thr_c, F.lit(1)).otherwise(F.lit(0))
    # sequence(0, n-1) would run DESCENDING for n=0 — guard with an
    # empty array, which explode() then drops entirely
    idx = F.when(
        copies >= 1, F.sequence(F.lit(0), copies - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("copy_idx", F.explode(idx))


def importance_resample(
    df: DataFrame,
    id_col: str,
    n: int,
    score_col: str = "dsir_score",
    temperature: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Gumbel top-k importance resampling — DSIR's selection step (Xie
    et al. 2023 §2; Vieira 2014): draw ``n`` documents WITHOUT
    replacement with probability ∝ exp(score/temperature) by ranking
    ``key = score/temperature + Gumbel(md5(salt‖id))`` and keeping the
    top ``n``.  The Gumbel noise is derived from md5 — u = (hash32 +
    0.5)/2³² ∈ (0,1), G = −ln(−ln u) — so the "random" draw is a pure
    function of (salt, id): re-runnable, partitioning-invariant, and
    re-rollable per training run via ``salt``.  Keys are rounded to 9
    decimals with id tie-break, making the selected SET bit-replicable
    by an external oracle.  Adds ``resample_key``.

    Scale: map-only key computation + ``orderBy(key).limit(n)``, which
    Spark executes as TakeOrderedAndProject — per-partition top-n then
    a driver merge of n·n_partitions candidates, never a global sort."""
    if n <= 0:
        raise ValueError("n must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    key = F.round(
        F.col(score_col) / F.lit(float(temperature)) + -F.log(-F.log(u)), 9
    )
    return (
        df.withColumn("resample_key", key)
        .orderBy(F.desc("resample_key"), F.col(id_col))
        .limit(n)
    )


def contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    ngram_n: int = 8,
    bench_text_col: str | None = None,
    unit: str = "word",
) -> DataFrame:
    """(id, n_shared) for corpus documents sharing ≥1 distinct n-gram
    with the benchmark set — the standard eval-decontamination check.
    ``unit="word"`` (default) matches word ``ngram_n``-grams;
    ``unit="char"`` matches whitespace-normalized character
    ``ngram_n``-grams — the GPT-4/Llama-style substring-overlap variant
    (e.g. n=24..50 chars), robust to tokenization and small
    word-boundary edits the word form misses.

    Scale: benchmark sets (eval suites) are tiny next to a 100 TB corpus, so
    the distinct benchmark n-grams are broadcast; the corpus side is a
    map-side explode + broadcast-hash semi-join + one groupBy(id) with
    partial counts. No corpus self-join ever happens.
    """
    if unit not in ("word", "char"):
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")

    def grams(col: Column) -> Column:
        if unit == "word":
            return TX.word_ngrams(col, ngram_n)
        return TX.shingles(col, ngram_n)

    bench_grams = benchmark.select(
        F.explode(
            grams(F.col(bench_text_col or text_col))
        ).alias("g")
    ).distinct()
    doc_grams = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(grams(F.col(text_col))).alias("g"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
        .withColumnRenamed("id", id_col)
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    ngram_n: int = 8,
    bench_text_col: str | None = None,
    unit: str = "word",
) -> DataFrame:
    """Drop contaminated documents (those flagged by ``contamination_flags``)."""
    flags = contamination_flags(
        df, benchmark, id_col, text_col, ngram_n, bench_text_col, unit
    ).select(id_col)
    return df.join(flags, on=id_col, how="left_anti")


def bloom_contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    ngram_n: int = 8,
    bench_text_col: str | None = None,
    unit: str = "word",
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter decontamination (the Dolma/NeMo-Curator shape):
    benchmark n-grams are folded into an ``m_bits``-bit Bloom bitmap
    (``k_hashes`` md5-derived positions per gram) and every corpus gram
    is probed with pure integer Column math — no join ever touches the
    corpus side.  Output matches ``contamination_flags``:
    (id, n_flagged) for documents with ≥1 gram whose ``k_hashes`` bits
    are all set.  Flags are a superset of the exact check (Bloom false
    positives, rate ≈ (1 - e^(-k·n/m))^k); with the defaults and a
    10k-gram benchmark that is ~1e-8 — and fully deterministic, so an
    external oracle replays every flag (including any false positive)
    bit-for-bit by recomputing the same md5 positions.

    Scale: ``contamination_flags`` broadcasts the distinct benchmark
    n-gram STRINGS and equi-joins the exploded corpus — fine for eval
    suites, but a multi-GB broadcast for large holdout sets.  Here the
    broadcast is the bitmap itself — ``m_bits/8`` bytes (128 KiB at the
    default 2^20) regardless of benchmark size — attached via a 1-row
    broadcast cross join, and the corpus side is map-only probing plus
    one partial-aggregated groupBy(id).  Bit positions come from the
    first 8 md5 hex chars of ``"{i}:{gram}"`` (the repo-standard
    conv/CAST slice), so one md5 per (gram, hash) replays identically
    in any engine.
    """
    if unit not in ("word", "char"):
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    if m_bits < 64 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k_hashes <= 0:
        raise ValueError("k_hashes must be positive")

    def grams(col: Column) -> Column:
        if unit == "word":
            return TX.word_ngrams(col, ngram_n)
        return TX.shingles(col, ngram_n)

    def bit_pos(g: Column, i: int) -> Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), g)), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % m_bits
        )

    spark = df.sparkSession
    positions = sorted(
        r["pos"]
        for r in benchmark.select(
            F.explode(grams(F.col(bench_text_col or text_col))).alias("g")
        )
        .distinct()
        .select(
            F.explode(
                F.array(
                    *[bit_pos(F.col("g"), i) for i in range(k_hashes)]
                )
            ).alias("pos")
        )
        .distinct()
        # bounded by min(k_hashes * |distinct benchmark grams|, m_bits)
        # — the same benchmark-is-tiny assumption contamination_flags
        # makes for its string broadcast, at 8 bytes per position.
        .collect()
    )
    words = [0] * (m_bits // 64)
    for p in positions:
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement fold into signed BIGINT for the Spark literal
    words = [w - (1 << 64) if w >= 1 << 63 else w for w in words]
    bloom = spark.createDataFrame([(words,)], "bloom array<bigint>")

    # per-bit masks as one literal array (bit 63 = the sign bit, hence
    # the negative literal) — shift amounts must be Python ints in
    # F.shiftright, so test word & mask[p%64] != 0 instead (the
    # simhash64 idiom)
    masks = F.array(
        *[
            F.lit((1 << j) if j < 63 else -(1 << 63)).cast("bigint")
            for j in range(64)
        ]
    )

    def probe(g: Column, bm: Column) -> Column:
        hit = F.lit(True)
        for i in range(k_hashes):
            p = bit_pos(g, i)
            word = F.element_at(bm, F.shiftright(p, 6).cast("int") + 1)
            mask = F.element_at(masks, (p % 64).cast("int") + 1)
            hit = hit & (word.bitwiseAND(mask) != 0)
        return hit

    doc_grams = _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(grams(F.col(text_col))).alias("g"),
    )
    return (
        doc_grams.crossJoin(F.broadcast(bloom))
        .filter(probe(F.col("g"), F.col("bloom")))
        .groupBy("id")
        .agg(F.count("*").alias("n_flagged"))
        .withColumnRenamed("id", id_col)
    )


def bloom_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    ngram_n: int = 8,
    bench_text_col: str | None = None,
    unit: str = "word",
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Drop documents flagged by ``bloom_contamination_flags`` (an
    anti-join on the flagged ids; removals are a deterministic superset
    of the exact ``decontaminate`` by the Bloom false-positive rate)."""
    flags = bloom_contamination_flags(
        df, benchmark, id_col, text_col, ngram_n, bench_text_col, unit,
        m_bits, k_hashes,
    ).select(id_col)
    return df.join(flags, on=id_col, how="left_anti")


def semantic_contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
) -> DataFrame:
    """EMBEDDING-space benchmark leakage (the semantic complement of the
    word-n-gram :func:`contamination_flags`): flag corpus rows whose
    cosine against ANY benchmark vector reaches ``threshold`` — catches
    paraphrased/translated eval contamination that exact n-grams miss.
    One row per contaminated corpus id:
    ``(id, max_cosine, matched_bench_id)`` — the highest-cosine
    benchmark match (ties to the smaller benchmark id), cosine rounded
    to 6 so an external oracle reproduces the argmax exactly.

    Scale: the benchmark side (an eval set — thousands of rows) is
    unit-normalized and BROADCAST; the corpus side never shuffles — the
    comparison is a map-side broadcast nested loop of |corpus|·|bench|
    dot products inside codegen, embarrassingly parallel, with the
    aggregation collapsing map-side to one row per contaminated id.
    For benchmark sets too big to broadcast, pre-prune with SRP buckets
    (:func:`~.similarity.srp_lsh_topk`) and verify survivors here."""
    from config_driven_pyspark_spark.functions import vectors as V

    def guarded_unit(col, side: str):
        # explicit zero-norm guard (ADVICE r7): a zero vector would
        # otherwise abort with an opaque DIVIDE_BY_ZERO under ANSI mode —
        # or, with ANSI off, silently produce NaN cosines that Spark
        # orders ABOVE the threshold, flagging everything. Name the
        # operator and the fix instead (_pq_encode_udf's convention).
        msg = (
            f"semantic_contamination_flags: zero-norm {side} vector — "
            "drop or fix zero embeddings before decontamination"
        )
        return F.when(
            F.assert_true(V.dot(col, col) != 0, F.lit(msg)).isNull(),
            V.unit_normalize(col),
        )

    bid = bench_id_col or id_col
    bvec = bench_vec_col or vec_col
    from config_driven_pyspark_spark.operators.similarity import (
        _dim_or_none,
    )

    # benchmark-side width probe → unrolled codegen scoring dot (r16)
    vdim = _dim_or_none(benchmark, bvec)
    b = F.broadcast(
        benchmark.select(
            F.col(bid).alias("__bench_id"),
            guarded_unit(F.col(bvec), "benchmark").alias("__bv"),
        )
    )
    scored = (
        _spread(df)
        .select(
            F.col(id_col),
            guarded_unit(F.col(vec_col), "corpus").alias("__cv"),
        )
        .join(b, F.lit(True))
        .select(
            id_col,
            "__bench_id",
            F.round(
                V.dot(F.col("__cv"), F.col("__bv"), vdim), 6
            ).alias("__cos"),
        )
        .filter(F.col("__cos") >= threshold)
    )
    return (
        scored.withColumn(
            "__mx", F.max("__cos").over(Window.partitionBy(id_col))
        )
        .filter(F.col("__cos") == F.col("__mx"))
        .groupBy(id_col)
        .agg(
            F.max("__cos").alias("max_cosine"),
            F.min("__bench_id").alias("matched_bench_id"),
        )
    )


def semantic_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
) -> DataFrame:
    """Drop corpus rows flagged by :func:`semantic_contamination_flags`."""
    flags = semantic_contamination_flags(
        df, benchmark, id_col, vec_col, threshold, bench_id_col,
        bench_vec_col,
    ).select(id_col)
    return df.join(flags, on=id_col, how="left_anti")


def chunk_sentences(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 128,
) -> DataFrame:
    """Sentence-preserving chunking — the RAG-ingest variant of
    :func:`chunk_documents`: sentences are NEVER split mid-way; each
    document's sentences (runs matching ``[^.!?]+[.!?]*``, space-trimmed,
    empties dropped) group into chunks by
    ``chunk_id = floor(tokens_before_sentence / chunk_tokens)`` — the
    same no-reset cumulative rule ``pack_sequences`` uses, so a chunk
    holds the consecutive sentences whose preceding token mass lies in
    one ``chunk_tokens`` band (chunks end AT sentence boundaries and may
    overshoot by at most one sentence). Output: ``(id, chunk_id,
    chunk_text, n_tokens, n_sentences)``; chunk text is the
    space-rejoined trimmed sentences. Gram-less documents emit nothing.

    Determinism: the extraction regex sits in the RE2 ∩ Java common
    subset; token counts are the repo-wide whitespace split; the
    cumulative sum is a per-document ordered window (state bounded by
    sentences-per-doc, the span_dedup bound), never corpus-wide.

    Scale: one per-document window + one groupBy(id, chunk) whose
    ordered re-join happens array-side after ``array_sort`` — two
    shuffles both keyed by the doc id, fan-out = sentences/doc."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"[^.!?]+[.!?]*"), 0
            ),
            # single-arg lambda on purpose: F.trim itself is two-arg
            # (col, trim) and transform would feed the index into it
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    ex = (
        _spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(F.coalesce(sents, F.array().cast("array<string>")))
            .alias("pos", "sent"),
        )
        .withColumn("nt", F.size(TX.tokens(F.col("sent"))).cast("bigint"))
    )
    w = (
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = ex.withColumn(
        "chunk_id",
        F.floor(
            F.coalesce(F.sum("nt").over(w), F.lit(0)) / F.lit(chunk_tokens)
        ).cast("bigint"),
    )
    return (
        ch.groupBy("id", "chunk_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "sent", "nt"))
            ).alias("parts"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_id",
            F.array_join(
                F.transform(F.col("parts"), lambda p: p["sent"]), " "
            ).alias("chunk_text"),
            F.aggregate(
                F.col("parts"), F.lit(0).cast("bigint"),
                lambda acc, p: acc + p["nt"],
            ).alias("n_tokens"),
            F.size("parts").cast("bigint").alias("n_sentences"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_size: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """Split documents into fixed token windows: (id, chunk_idx, n_tokens,
    chunk_text). ``stride`` < ``chunk_size`` gives overlapping windows
    (defaults to non-overlapping).

    Scale: map-only — tokenize, ``sequence`` over window starts, explode,
    ``slice``. Output rows ≈ input tokens / stride; no shuffle until the
    caller repartitions for shard writing.
    """
    stride = stride or chunk_size
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    n_chunks = F.ceil(F.size("w") / F.lit(float(stride)))
    windows = (
        _spread(df)
        .select(F.col(id_col).alias("id"), TX.tokens(F.col(text_col)).alias("w"))
        .filter(F.size("w") > 0)
        .select(
            "id",
            "w",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            "id",
            "chunk_idx",
            F.slice(
                "w", F.col("chunk_idx") * stride + 1, chunk_size
            ).alias("cw"),
        )
    )
    return windows.select(
        F.col("id").alias(id_col),
        "chunk_idx",
        F.size("cw").cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", "cw").alias("chunk_text"),
    )


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    delimiter: str = "\n",
    window: int | None = None,
) -> DataFrame:
    """C4/RefinedWeb-style exact span dedup across the whole corpus: split
    every document into segments — literal-``delimiter`` lines by default,
    fixed non-overlapping ``window``-token windows when given — keep only
    the globally first occurrence of each distinct segment (first = lowest
    (id, segment index)), and reassemble the survivors in original order.
    The delimiter is treated as a literal string on both the split and the
    rejoin (regex-quoted for ``F.split``), so reassembled text round-trips
    exactly.

    Output: one row per input document — (id, text, n_segments,
    n_removed); a document whose every segment was seen earlier keeps an
    empty text rather than disappearing, so the caller decides the
    drop threshold.

    Scale: the first-occurrence choice is ``groupBy(segment).min(struct(id,
    idx))`` — map-side partial aggregation collapses skewed segments (blank
    lines, boilerplate headers) to one row per map partition before the
    shuffle, and the join back on the segment is an equi-join AQE can
    skew-split. Reassembly is one groupBy(id) whose state is bounded by
    document size. Nothing driver-side, no windows over the corpus.
    """
    joiner = " " if window else delimiter
    if window is not None and window <= 0:
        raise ValueError("window must be positive")
    if window:
        w = F.coalesce(
            TX.tokens(F.col(text_col)), F.array().cast("array<string>")
        )
        arr = F.when(
            F.size(w) > 0,
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.ceil(F.size(w) / F.lit(float(window))) - 1,
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(w, i.cast("int") * window + 1, window)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    else:
        # \Q...\E: Java-regex literal quoting — split and rejoin must agree
        # on the delimiter being a literal or rebuilt text can't round-trip
        arr = F.coalesce(
            F.split(F.col(text_col), "\\Q" + delimiter + "\\E"),
            F.array().cast("array<string>"),
        )
    base = _spread(df).select(F.col(id_col).alias("id"), arr.alias("segs"))
    segs = base.select("id", F.posexplode("segs").alias("idx", "seg"))
    firsts = segs.groupBy("seg").agg(
        F.min(F.struct(F.col("id"), F.col("idx"))).alias("f")
    )
    kept = segs.join(firsts, "seg").filter(
        (F.col("id") == F.col("f.id")) & (F.col("idx") == F.col("f.idx"))
    )
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            joiner,
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("__text"),
        F.count("*").alias("__n_kept"),
    )
    return (
        base.select("id", F.size("segs").cast("bigint").alias("n_segments"))
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("__text", F.lit("")).alias(text_col),
            "n_segments",
            (F.col("n_segments") - F.coalesce("__n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


def boilerplate_strip(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    delimiter: str = "\n",
    max_df: int | None = None,
    max_frac: float = 0.05,
) -> DataFrame:
    """RefinedWeb-style boilerplate removal: split every document into
    literal-``delimiter`` lines and remove EVERY occurrence of any line
    whose document frequency (number of distinct documents containing
    it) exceeds the threshold — navigation chrome, cookie banners,
    licence footers.  The threshold is ``max_df`` documents when given,
    else ``ceil(max_frac * n_docs)``.  Distinct from ``line_dedup``,
    which keeps the globally FIRST occurrence of each line; boilerplate
    lines are junk in every copy, so none survive.

    Output mirrors ``line_dedup``: one row per input document —
    (id, text, n_segments, n_removed); text round-trips exactly through
    the literal delimiter for the surviving lines.

    Scale: the doc-frequency table is ``groupBy(line).count_distinct(id)``
    — map-side partial aggregation collapses repeated lines per
    partition before the shuffle.  The boilerplate set is by definition
    tiny (only lines crossing a high-df bar survive the filter), so the
    removal anti-join broadcasts in practice and AQE picks that up from
    runtime stats; the corpus side is one explode + anti-join + one
    groupBy(id) bounded by document size.  The corpus row count feeds
    the fractional threshold through a 1-row broadcast cross join —
    nothing corpus-sized is collected or windowed.

    Batch-only BY NATURE: the doc-frequency threshold is a property of
    the whole corpus, so a stream would never know a line's final df
    (each micro-batch would strip against a different, growing
    threshold). On a stream this raises — strip inside foreachBatch
    against a batch-computed boilerplate set instead.
    """
    if df.isStreaming:
        raise ValueError(
            "boilerplate_strip is batch-only: the doc-frequency "
            "threshold is corpus-global. Compute the boilerplate line "
            "set on a batch snapshot and strip in foreachBatch."
        )
    if max_df is not None and max_df <= 0:
        raise ValueError("max_df must be positive")
    if max_df is None and not (0.0 < max_frac <= 1.0):
        raise ValueError("max_frac must be in (0, 1]")
    arr = F.coalesce(
        F.split(F.col(text_col), "\\Q" + delimiter + "\\E"),
        F.array().cast("array<string>"),
    )
    base = _spread(df).select(F.col(id_col).alias("id"), arr.alias("segs"))
    segs = base.select("id", F.posexplode("segs").alias("idx", "seg"))
    docfreq = segs.groupBy("seg").agg(
        F.count_distinct("id").alias("__df")
    )
    if max_df is not None:
        bad = docfreq.filter(F.col("__df") > max_df).select("seg")
    else:
        n_docs = base.agg(F.count("*").alias("__n"))
        bad = (
            docfreq.crossJoin(F.broadcast(n_docs))
            .filter(
                F.col("__df")
                > F.ceil(F.col("__n") * F.lit(float(max_frac)))
            )
            .select("seg")
        )
    kept = segs.join(bad, "seg", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            delimiter,
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("__text"),
        F.count("*").alias("__n_kept"),
    )
    return (
        base.select("id", F.size("segs").cast("bigint").alias("n_segments"))
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("__text", F.lit("")).alias(text_col),
            "n_segments",
            (F.col("n_segments") - F.coalesce("__n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


def corpus_profile(
    df: DataFrame,
    by: str | None = None,
    metrics: list[str] | None = None,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    method: str = "approx",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-stratum distribution report for corpus QA (VERDICT r6 ask #7):
    one row per (stratum, metric) with count, mean, min/max, and the
    requested percentiles — the shape a pipeline author reads BEFORE
    choosing mixture weights, caps, or budgets.

    ``metrics`` are existing NUMERIC columns (add token counts etc.
    upstream with a ``with_columns``/``text`` stage). ``method="approx"``
    (default — the 100 TB path) uses ``percentile_approx``: a fixed-size
    t-digest-style sketch per group, mergeable map-side, so memory per
    group is O(accuracy) regardless of corpus size. ``method="exact"``
    uses the exact interpolating ``percentile`` — it buffers each
    group's values, right for bounded strata and for the driver row's
    exact-companion oracle (the ``q_sketch_exact_companions`` pattern:
    the approx path is pytest-gated against exact within quantile-rank
    error, the exact path is hash-checked by DuckDB ``quantile_cont``,
    which interpolates identically).

    ONE groupBy whatever the metric count: every metric's aggregates are
    computed in the same pass as a struct, then exploded to long form —
    map-side partial aggregation, no per-metric rescans.
    """
    if method not in ("approx", "exact"):
        raise ValueError(f"method must be 'approx' or 'exact', got {method!r}")
    if not metrics:
        raise ValueError("metrics: name at least one numeric column")
    pct_names = [
        "p" + f"{p * 100:g}".replace(".", "_") for p in percentiles
    ]
    pct_arr = F.array(*[F.lit(float(p)) for p in percentiles])
    structs = []
    for m in metrics:
        c = F.col(m).cast("double")
        pcts = (
            F.percentile_approx(c, pct_arr, accuracy)
            if method == "approx"
            else F.percentile(c, pct_arr)
        )
        structs.append(
            F.struct(
                F.lit(m).alias("metric"),
                F.count(c).cast("bigint").alias("n_docs"),
                F.round(F.avg(c), 6).alias("mean"),
                F.min(c).alias("min"),
                F.max(c).alias("max"),
                F.transform(pcts, lambda x: F.round(x, 6)).alias("__p"),
            ).alias(f"__{m}")
        )
    keys = [by] if by else []
    wide = _spread(df).groupBy(*keys).agg(*structs)
    long = wide.select(
        *keys,
        F.explode(F.array(*[F.col(f"__{m}") for m in metrics])).alias("s"),
    )
    return long.select(
        *keys,
        "s.metric",
        "s.n_docs",
        "s.mean",
        "s.min",
        "s.max",
        *[
            F.col("s.__p").getItem(i).alias(name)
            for i, name in enumerate(pct_names)
        ],
    )


def span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window: int = 16,
    mode: str = "spans",
) -> DataFrame:
    """Arbitrary-length repeated-span detection/removal — the bucketed
    approximation of suffix-array ExactSubstr dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"):
    fingerprint every OVERLAPPING ``window``-token window (stride 1 —
    stride > 1 only matches copies whose offsets agree mod the stride),
    keep the globally first occurrence of each distinct window (first =
    lowest ``(id, pos)``), and merge each document's remaining duplicate
    windows into MAXIMAL spans. A repeated region of L >= window tokens
    at token offset p yields duplicate windows at p..p+L-window, which
    merge back to exactly ``[p, p+L)`` — arbitrary-length spans from
    fixed-size fingerprints, and regions separated by any non-duplicated
    gap stay separate spans. This is what :func:`line_dedup`'s fixed
    non-overlapping windows cannot see: a repeated block straddling a
    window boundary (VERDICT r6 ask #3).

    ``mode="spans"`` returns one row per maximal span —
    ``(id, span_start, span_end, span_len, n_windows)``, token offsets,
    end exclusive. ``mode="strip"`` removes every span-covered token and
    reassembles — ``(id, text, n_tokens, n_removed)``; like
    ``line_dedup(window=...)`` the rebuilt text is space-joined tokens.

    Scale: windows travel as 8-byte xxhash64 longs (the token text never
    shuffles); first-occurrence choice is the same skew-safe
    ``groupBy(key).min(struct(id, pos))`` as line_dedup — map-side
    partial aggregation collapses a boilerplate window repeated millions
    of times to one row per map partition before the shuffle, and the
    join back is an equi-join AQE can skew-split. Stride 1 costs
    ~``window``x the hashing work of non-overlapping windows (keys are
    built array-side via ``transform``, never duplicating the token
    array per window row) — the price of offset-independent detection;
    the suffix-array alternative is a global sort the cluster pays far
    more for. Span merging is a lag/sum window PARTITIONED BY document
    (state bounded by windows-per-doc, same bound as line_dedup's
    reassembly); equal-length windows make ends monotone in start, so
    the single-lag island test is exact interval merging.
    """
    if window <= 0:
        raise ValueError("window must be positive")
    if mode not in ("spans", "strip"):
        raise ValueError(f"mode must be 'spans' or 'strip', got {mode!r}")
    w = F.coalesce(TX.tokens(F.col(text_col)), F.array().cast("array<string>"))
    base = _materialize(
        _spread(df).select(F.col(id_col).alias("id"), w.alias("w"))
    )
    # per-position window fingerprints, built array-side: one 8-byte long
    # per position instead of an exploded row carrying the whole token
    # array (explode-then-slice copies O(n) tokens per window row).
    # xxhash64 over the sliced ARRAY directly (r16): hashing the slice
    # structurally (length + elements) skips materializing a ~window×
    # avg-token-length concat string per position — O(window·|text|)
    # string building dropped from the hot loop; equal window contents
    # still hash equal (and token-boundary info is now part of the
    # hash, where concat_ws(" ") relied on tokens never containing
    # spaces). The hash value itself is engine-internal: first-
    # occurrence selection compares CONTENT-equal windows, which is
    # what the oracle replays.
    keys = F.when(
        F.size("w") >= window,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - window),
            lambda i: F.xxhash64(
                F.slice(F.col("w"), i.cast("int") + 1, window)
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    segs = base.select("id", F.posexplode(keys).alias("pos", "key"))
    firsts = segs.groupBy("key").agg(
        F.min(F.struct(F.col("id"), F.col("pos"))).alias("f")
    )
    dups = (
        segs.join(firsts, "key")
        .filter((F.col("id") != F.col("f.id")) | (F.col("pos") != F.col("f.pos")))
        .select("id", "pos")
    )
    byid = Window.partitionBy("id").orderBy("pos")
    prev = F.lag("pos").over(byid)
    isl = dups.withColumn(
        "island",
        F.sum(
            F.when(prev.isNull() | (F.col("pos") > prev + window), 1).otherwise(0)
        ).over(byid),
    )
    spans = isl.groupBy("id", "island").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + window).cast("bigint").alias("span_end"),
        F.count("*").cast("bigint").alias("n_windows"),
    )
    if mode == "spans":
        return spans.select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
            "n_windows",
        )
    per_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    # Linear coverage mask (ADVICE r7: the previous flat covered-array +
    # array_contains membership test was O(covered × tokens) per doc —
    # quadratic for long heavily-duplicated documents). Islands merge
    # into strictly DISJOINT spans (a new island starts only past
    # prev + window), so after array_sort one fold concatenates
    # [gap falses][span trues] per span and pads the tail to n —
    # O(spans + tokens). zip_with's element-wise lambda also keeps clear
    # of Spark 4's interpreted-projection limit on nested lambdas that
    # reference an outer index (INTERNAL_ERROR "Cannot evaluate
    # expression", hit in r7 when bpe_encode consumed strip output).
    spans_sorted = F.array_sort(
        F.coalesce(
            F.col("spans"),
            F.array().cast(
                "array<struct<span_start:bigint,span_end:bigint>>"
            ),
        )
    )
    mask = F.aggregate(
        spans_sorted,
        F.struct(
            F.lit(0).cast("bigint").alias("end"),
            F.array().cast("array<boolean>").alias("m"),
        ),
        lambda acc, s: F.struct(
            s["span_end"].alias("end"),
            F.concat(
                acc["m"],
                F.array_repeat(
                    F.lit(False), (s["span_start"] - acc["end"]).cast("int")
                ),
                F.array_repeat(
                    F.lit(True),
                    (s["span_end"] - s["span_start"]).cast("int"),
                ),
            ).alias("m"),
        ),
        lambda acc: F.concat(
            acc["m"],
            F.array_repeat(
                F.lit(False), (F.size(F.col("w")) - acc["end"]).cast("int")
            ),
        ),
    )
    kept = F.filter(
        F.zip_with(F.col("w"), mask, lambda t, m: F.when(~m, t)),
        lambda x: x.isNotNull(),
    )
    return (
        base.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.concat_ws(" ", kept).alias(text_col),
            F.size("w").cast("bigint").alias("n_tokens"),
            (F.size("w") - F.size(kept)).cast("bigint").alias("n_removed"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seq_len: int = 512,
    by: str | None = None,
    tokens_col: str | None = None,
    boundaries: bool = False,
) -> DataFrame:
    """GPT-style sequence packing: concatenate every document's tokens in
    deterministic md5(id) pseudo-random order and cut the stream every
    ``seq_len`` tokens; a document straddling a cut is split across the
    adjacent sequences (the standard concat-and-split batching for causal
    LM training). One row per sequence — (seq_id, n_docs, n_tokens,
    seq_text); every sequence has exactly ``seq_len`` tokens except the
    final partial one. ``by`` packs each stratum independently (seq ids
    restart per stratum). ``tokens_col`` names a precomputed
    ``array<string>`` token column (e.g. ``apply_bpe``'s output) to pack
    by TOKENIZER tokens instead of whitespace tokens; ``text_col`` is
    ignored then.  ``boundaries=True`` adds a ``boundaries`` column —
    space-joined ``doc_id:offset:len`` triples in sequence order — the
    metadata a trainer needs to mask cross-document attention inside a
    packed sequence (same groupBy, one extra aggregate expression).

    Scale: the global token offset is ``_md5_stream_offsets`` — md5-prefix
    buckets give 256 parallel local windows plus one 256-row offset window,
    never a corpus-wide single-task sort. The boundary explode emits
    ceil(n/seq_len)+1 pieces per document at most, and the final
    groupBy(seq_id) moves each token through the shuffle exactly once with
    perfectly uniform keys.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    keys = [by] if by else []
    w = (
        F.col(tokens_col) if tokens_col else TX.tokens(F.col(text_col))
    )
    # _materialize: _md5_stream_offsets references this frame on BOTH
    # sides of its offsets join, so without it the token derivation runs
    # twice — cheap for a whitespace split, but when tokens_col carries
    # an Arrow-batched BPE encode the whole UDF re-executed (measured
    # ~2x the encode cost in the e2e pipeline). Cache-once is strictly
    # cheaper than recompute here (see _materialize's rationale).
    base = _materialize(
        _spread(df)
        .select(
            *keys,
            F.col(id_col).alias("id"),
            w.alias("w"),
        )
        .withColumn("n", F.size("w").cast("bigint"))
        .filter(F.col("n") > 0)
    )
    pos = _md5_stream_offsets(base, "id", "n", keys)
    pieces = (
        pos.select(
            *keys,
            "id",
            "w",
            "n",
            "__s",
            F.explode(
                F.sequence(
                    F.floor(F.col("__s") / seq_len),
                    F.floor((F.col("__s") + F.col("n") - 1) / seq_len),
                )
            ).alias("seq_id"),
        )
        .withColumn("__ps", F.greatest("__s", F.col("seq_id") * seq_len))
        .withColumn(
            "__pe", F.least(F.col("__s") + F.col("n"), (F.col("seq_id") + 1) * seq_len)
        )
        .select(
            *keys,
            F.col("id"),
            F.col("seq_id").cast("bigint").alias("seq_id"),
            (F.col("__ps") - F.col("seq_id") * seq_len).alias("__off_in_seq"),
            F.slice(
                "w",
                (F.col("__ps") - F.col("__s") + 1).cast("int"),
                (F.col("__pe") - F.col("__ps")).cast("int"),
            ).alias("pw"),
        )
    )
    aggs = [
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size("pw")).cast("bigint").alias("n_tokens"),
        F.concat_ws(
            " ",
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__off_in_seq", "pw"))),
                    lambda s: s["pw"],
                )
            ),
        ).alias("seq_text"),
    ]
    if boundaries:
        aggs.append(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "__off_in_seq",
                                F.col("id").alias("__id"),
                                F.size("pw").alias("__m"),
                            )
                        )
                    ),
                    lambda t: F.concat_ws(
                        ":",
                        t["__id"].cast("string"),
                        t["__off_in_seq"].cast("string"),
                        t["__m"].cast("string"),
                    ),
                ),
            ).alias("boundaries")
        )
    return pieces.groupBy(*keys, "seq_id").agg(*aggs)


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    n_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test split + shard layout: adds ``split``
    (named bucket by cumulative ``splits`` fractions, insertion order),
    ``shard`` (0..n_shards−1), and ``shuffle_key`` (intra-shard
    pseudo-random sort key) — every one a disjoint slice of
    ``md5(salt ‖ key)``, so assignment is a pure function of the key:
    identical across runs, partitionings, and cluster sizes, and any row
    is traceable to its shard from the key alone. ``salt`` re-rolls all
    assignments (e.g. per training run) without touching the data.

    Split granularity is 1/65536 (16 bits); fractions must sum to 1.
    A NULL ``key_col`` raises at execution time (no deterministic home).
    Writing ``partitionBy(split).bucketBy/repartition(shard)`` then sorting
    by ``shuffle_key`` yields the standard reproducibly-shuffled shard
    export without any corpus-wide sort (each shard sorts independently).

    Scale: map-only — no shuffle, no RNG state; stays in whole-stage
    codegen (md5 + conv + case are all JVM built-ins).
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError(f"splits must sum to 1, got {sum(splits.values())}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # NULL keys would hash to NULL and silently land in the last-named
    # split with NULL shard (ADVICE r4) — fail loudly instead: assignment
    # is a pure function of the key, so a null key has no deterministic
    # home. raise_error stays JVM-side (still whole-stage codegen).
    key_s = F.col(key_col).cast("string")
    key_checked = F.when(key_s.isNotNull(), key_s).otherwise(
        F.raise_error(F.lit(
            f"split_assign: NULL {key_col} — split/shard assignment is a "
            "pure function of the key; filter or fill null keys first"
        ))
    )
    h = F.md5(F.concat(F.lit(salt), key_checked))
    b16 = F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint")
    cum = 0.0
    expr = None
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        thr = int(round(cum * 65536))
        cond = b16 < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split_col = (
        expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])
    )
    return df.withColumns({
        "split": split_col,
        "shard": (F.conv(F.substring(h, 5, 4), 16, 10).cast("bigint")
                  % F.lit(n_shards)),
        "shuffle_key": F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint"),
    })


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval: top-``k`` documents per query with the
    Robertson/Sparck-Jones BM25 score (the ``+1`` idf variant, always
    positive) — the workhorse for corpus search, keyword-based quality
    filtering, and lexical decontamination sweeps.

    Output: (query_id, doc_id, rank, score); ties break to the smaller
    doc_id. Per-term contributions are rounded to 9 decimals and summed as
    DECIMAL(18, 9): decimal addition is exact and order-independent, so
    the score never depends on aggregation order — an external oracle
    reproduces it bit-for-bit (float += across rows would not).

    Scale: docs tokenize map-side and explode to (doc, term, tf); only
    terms appearing in some query survive (semi-join against the broadcast
    query vocabulary), so the per-term frame is |query vocab|-bounded per
    doc, never the full posting list. That posting frame is persisted —
    both its consumers (df(term) and the per-term contributions) would
    otherwise recompute the full tokenize+explode+semi-join corpus scan
    (plan-audited: two `Scan parquet documents` branches before, one
    after). Corpus stats (N, avgdl) are a 1-row broadcast from a second,
    column-pruned scan (text only) — irreducible, since avgdl needs the
    length of EVERY doc, not just vocab-hitting ones. One shuffle on
    (query, doc) for the final sum, one window top-k.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )
    base = _spread(docs).select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).withColumn("dl", F.size("__toks"))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col(query_text_col)), " "),
                        lambda t: t != "",
                    )
                )
            ).alias("term"),
        )
    )
    vocab = qterms.select("term").distinct()

    tf = _materialize(
        base.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .join(F.broadcast(vocab), "term", "left_semi")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))

    contrib = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__c",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                ),
                9,
            ).cast("decimal(18,9)"),
        )
    )
    scored = (
        contrib.groupBy("query_id", "doc_id")
        .agg(F.sum("__c").cast("double").alias("score"))
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("score").desc(), F.col("doc_id")
            )
        ).cast("bigint"),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id", "doc_id", "rank", "score"
    )


def bigram_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 10_000,
    k_smoothing: float = 0.5,
    smoothing: str = "add_k",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document bigram language-model negative log-likelihood — the
    classic KenLM-style quality signal for training-data filtering
    (gibberish / boilerplate / wrong-language text scores high NLL
    against a model trained on the corpus itself).

    Model: a bigram LM trained on this corpus, with the vocabulary
    capped to the ``vocab_size`` most frequent tokens (ties: count desc,
    token asc — deterministic) and everything else mapped to ``<unk>``.
    ``smoothing="add_k"`` (default): ``P(w2|w1) = (C(w1,w2) + k) /
    (C(w1) + k·V)`` with ``V`` = |vocab| + 1 for ``<unk>``.
    ``smoothing="kneser_ney"``: interpolated KN with fixed ``discount``
    D (Kneser & Ney 1995; the KenLM standard) —
    ``P(w2|w1) = max(C(w1,w2) − D, 0)/C(w1) + D·N₁₊(w1,·)/C(w1) ·
    N₁₊(·,w2)/N_types`` where the continuation weight counts DISTINCT
    followers/preceders, so frequent-but-predictable tokens ('francisco'
    after 'san') stop inflating unrelated contexts — the well-known
    failure of pure frequency smoothing. All three N₁₊ statistics are
    one extra aggregate each over the SAME bigram-type table;
    self-scoring keeps every term positive. Output: (doc_id, n_bigrams,
    nll_sum) where ``nll_sum = Σ −ln P`` over the document's bigrams.
    Per-bigram NLL terms are rounded to 9 decimals and summed as
    DECIMAL(18,9) — exact, order-independent addition (the BM25 trick) —
    so an external oracle replicates the double output bit-for-bit.
    Docs with < 2 tokens get (0, 0.0). Perplexity = exp(nll_sum /
    n_bigrams) is left to the caller: emitting the exact sum avoids a
    division whose rounding an oracle could disagree on.

    Scale: tokens stay array-side until one explode; bigram frame built
    by a map-only slice/transform (no self-join on positions); the
    vocabulary is a ``vocab_size``-bounded TakeOrdered broadcast either
    side of the ``<unk>`` mapping; model counts are two map-side-
    combinable aggregations of the (persisted) bigram frame; scoring
    re-joins bigrams to the model on (w1) then (w1, w2) — the model
    table is vocab²-bounded, the only unbounded shuffles key on word
    pairs. Self-scoring guarantees every scored bigram exists in the
    model, so the joins are inner.
    """
    k = float(k_smoothing)
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    base = _materialize(
        _spread(docs).select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    )
    vocab = _materialize(
        base.select(F.explode("__toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("word").asc())
        .limit(vocab_size)
        .select("word")
    )
    # V stays DataFrame-side (1-row broadcast: |vocab| + 1 for <unk>) —
    # a driver-side vocab.count() was measured at 0.4 s of pure plan-phase
    # latency per call and is not needed as a literal
    v_total = vocab.agg((F.count("*") + 1).alias("__v"))

    # bigrams via array slice + transform: map-only, no positional join
    bi = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
                " (w, i) -> struct(w AS w1, __toks[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    bi = _materialize(
        bi.join(
            F.broadcast(vocab.select(F.col("word").alias("w1"),
                                     F.lit(True).alias("__in1"))),
            "w1", "left",
        )
        .join(
            F.broadcast(vocab.select(F.col("word").alias("w2"),
                                     F.lit(True).alias("__in2"))),
            "w2", "left",
        )
        .select(
            "doc_id",
            F.when(F.col("__in1").isNotNull(), F.col("w1"))
            .otherwise(F.lit("<unk>")).alias("w1"),
            F.when(F.col("__in2").isNotNull(), F.col("w2"))
            .otherwise(F.lit("<unk>")).alias("w2"),
        )
    )
    if smoothing not in ("add_k", "kneser_ney"):
        raise ValueError(
            f"smoothing must be 'add_k' or 'kneser_ney', got {smoothing!r}"
        )
    c12 = bi.groupBy("w1", "w2").agg(F.count("*").alias("__c12"))
    c1 = bi.groupBy("w1").agg(F.count("*").alias("__c1"))
    if smoothing == "kneser_ney":
        d = float(discount)
        c12 = _materialize(c12)
        n1f = c12.groupBy("w1").agg(F.count("*").alias("__n1f"))
        n1b = c12.groupBy("w2").agg(F.count("*").alias("__n1b"))
        n_types = c12.agg(F.count("*").alias("__nt"))
        model = (
            c12.join(c1, "w1").join(n1f, "w1").join(n1b, "w2")
            .crossJoin(F.broadcast(n_types))
        )
        nll_term = F.round(
            -F.log(
                F.greatest(F.col("__c12") - F.lit(d), F.lit(0.0))
                / F.col("__c1")
                + F.lit(d) * F.col("__n1f") / F.col("__c1")
                * (F.col("__n1b") / F.col("__nt"))
            ),
            9,
        ).cast("decimal(18,9)")
    else:
        model = c12.join(c1, "w1").crossJoin(F.broadcast(v_total))
        nll_term = F.round(
            -F.log(
                (F.col("__c12") + F.lit(k))
                / (F.col("__c1") + F.lit(k) * F.col("__v"))
            ),
            9,
        ).cast("decimal(18,9)")
    per_doc = (
        bi.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(nll_term).cast("double").alias("nll_sum"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("nll_sum", F.lit(0.0)).alias("nll_sum"),
        )
    )


def _unk_bigrams(
    docs: DataFrame, id_col: str, text_col: str, vocab: DataFrame
) -> DataFrame:
    """(doc_id, w1, w2): the document bigram frame with out-of-vocab
    tokens mapped to ``<unk>`` — the shared construction between the
    self-trained and stored-model perplexity paths (array slice +
    transform, map-only; vocab broadcast on both endpoints)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    base = _spread(docs).select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    )
    bi = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
                " (w, i) -> struct(w AS w1, __toks[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    return (
        bi.join(
            F.broadcast(vocab.select(F.col("word").alias("w1"),
                                     F.lit(True).alias("__in1"))),
            "w1", "left",
        )
        .join(
            F.broadcast(vocab.select(F.col("word").alias("w2"),
                                     F.lit(True).alias("__in2"))),
            "w2", "left",
        )
        .select(
            "doc_id",
            F.when(F.col("__in1").isNotNull(), F.col("w1"))
            .otherwise(F.lit("<unk>")).alias("w1"),
            F.when(F.col("__in2").isNotNull(), F.col("w2"))
            .otherwise(F.lit("<unk>")).alias("w2"),
        )
    )


def bigram_lm_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 10_000,
    model_path: str | None = None,
) -> DataFrame:
    """Train the add-k bigram LM ONCE and persist it — the
    train-once/score-many counterpart of the self-training
    :func:`bigram_perplexity`: a reference model built on a curated
    corpus scores every future batch without retraining (the KenLM
    deployment shape).  Persists three parquet tables under
    ``model_path``: ``vocab`` (word), ``unigrams`` (w1, c1),
    ``bigrams`` (w1, w2, c12) — counts over the <unk>-mapped training
    bigrams, the exact quantities the smoothed probability needs.
    Returns a 1-row summary (n_vocab, n_unigrams, n_bigram_types,
    n_bigram_tokens).

    Scale: the same bounded shapes as self-training — capped-vocab
    TakeOrdered, two map-side-combinable counts; the persisted model
    is vocab²-bounded, independent of corpus size."""
    if not model_path:
        raise ValueError("bigram_lm_train needs a model_path")
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    base = _materialize(_spread(docs).select(toks.alias("__toks")))
    vocab = _materialize(
        base.select(F.explode("__toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("word").asc())
        .limit(vocab_size)
        .select("word")
    )
    # rejoin the token arrays so the shared bigram builder (which owns
    # the tokenize-and-<unk> recipe) sees the identical token stream —
    # tokens are non-empty by construction, so split(join(t)) ≡ t
    big = _materialize(
        _unk_bigrams(
            base.select(
                F.monotonically_increasing_id().alias("__id"),
                F.array_join("__toks", " ").alias("__text"),
            ),
            "__id", "__text", vocab,
        )
    )
    c12 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab.write.mode("overwrite").parquet(f"{model_path}/vocab")
    c1.write.mode("overwrite").parquet(f"{model_path}/unigrams")
    c12.write.mode("overwrite").parquet(f"{model_path}/bigrams")
    spark = docs.sparkSession
    v = spark.read.parquet(f"{model_path}/vocab")
    u = spark.read.parquet(f"{model_path}/unigrams")
    b2 = spark.read.parquet(f"{model_path}/bigrams")
    return (
        v.agg(F.count("*").cast("bigint").alias("n_vocab"))
        .crossJoin(u.agg(F.count("*").cast("bigint").alias("n_unigrams")))
        .crossJoin(
            b2.agg(
                F.count("*").cast("bigint").alias("n_bigram_types"),
                F.sum("c12").cast("bigint").alias("n_bigram_tokens"),
            )
        )
    )


def bigram_perplexity_stored(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_path: str | None = None,
    k_smoothing: float = 0.5,
) -> DataFrame:
    """Score documents against a PERSISTED bigram LM (see
    :func:`bigram_lm_train`) — unlike the self-training scorer, unseen
    bigrams are expected: a bigram absent from the model backs off to
    ``P = (0 + k) / (C(w1) + k·V)`` and an unseen context to
    ``P = 1/V`` — exactly add-k smoothing's unseen-event mass, which is
    what makes the NLL a cross-corpus novelty/quality signal.  Output
    (doc_id, n_bigrams, nll_sum); per-bigram terms are 9-decimal
    DECIMAL sums (bit-replicable by the oracle); < 2-token docs get
    (0, 0.0).

    Scale: the model streams from parquet (vocab²-bounded tables); the
    corpus side is the same map-only bigram build + two joins keyed on
    word pairs.  History (the training corpus) is never rescanned."""
    if not model_path:
        raise ValueError("bigram_perplexity_stored needs a model_path")
    k = float(k_smoothing)
    spark = docs.sparkSession
    vocab = spark.read.parquet(f"{model_path}/vocab")
    uni = spark.read.parquet(f"{model_path}/unigrams")
    bi2 = spark.read.parquet(f"{model_path}/bigrams")
    v_total = vocab.agg((F.count("*") + 1).alias("__v"))
    big = _unk_bigrams(docs, id_col, text_col, vocab)
    nll_term = F.round(
        -F.log(
            (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("__v"))
        ),
        9,
    ).cast("decimal(18,9)")
    per_doc = (
        big.join(bi2, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(v_total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(nll_term).cast("double").alias("nll_sum"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint")
            .alias("n_bigrams"),
            F.coalesce("nll_sum", F.lit(0.0)).alias("nll_sum"),
        )
    )


def top_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
    min_count: int = 5,
) -> DataFrame:
    """Top-``k`` collocations (corpus-wide bigrams) by pointwise mutual
    information — the standard phrase-mining signal (PMI surfaces
    "new york"-style units whose co-occurrence beats chance; raw bigram
    counts surface "of the"). ``PMI = ln(P(w1,w2) / (P(w1)·P(w2)))``
    with bigram probability over total bigram count and unigram
    probabilities over total token count; ``min_count`` suppresses the
    unstable low-frequency tail (a hapax pair has spuriously maximal
    PMI). Output: (w1, w2, n12, pmi), PMI rounded to 9 decimals, ties
    broken (w1, w2) ascending — fully deterministic, and every input to
    the single ``ln`` is an exact integer ratio, so an external oracle
    reproduces the doubles bit-for-bit.

    Scale: bigrams are a map-only array slice (no positional join); all
    counts are map-side-combinable aggs shuffling on words; the two
    1-row totals broadcast; the final top-k is a ``TakeOrdered`` —
    nothing keys on documents, so doc-count growth only widens the agg
    inputs."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    base = _materialize(
        _spread(docs).select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    )
    uni = _materialize(
        base.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bi = (
        base.select(
            F.explode(
                F.expr(
                    "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)),"
                    " (w, i) -> struct(w AS w1, __toks[i + 1] AS w2))"
                )
            ).alias("b")
        )
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count("*").alias("n12"))
        .filter(F.col("n12") >= min_count)
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_big = base.select(
        F.greatest(F.size("__toks") - 1, F.lit(0)).alias("nb")
    ).agg(F.sum("nb").alias("n_big"))
    scored = (
        bi.join(F.broadcast(uni.select(F.col("w").alias("w1"),
                                       F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"),
                                     F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select(
            "w1", "w2", "n12",
            # the ratio is computed in DOUBLE from the first factor on
            # (n_uni² overflows int64 on a 100 TB corpus); the oracle uses
            # the identical cast + left-associated multiply order, so the
            # ln input is the same double bit pattern
            F.round(
                F.log(
                    (F.col("n12").cast("double") * F.col("n_uni") * F.col("n_uni"))
                    / (F.col("n_big").cast("double") * F.col("c1") * F.col("c2"))
                ),
                9,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)


def stage_corpus(df: DataFrame, spec: dict, ctx) -> DataFrame:
    """``{"stage": "corpus", "op": <name>, ...}`` — config-driven entry
    points for every corpus operator in this module: ``repetition``,
    ``hash_sample``, ``decontaminate``/``contamination_flags`` (word or
    ``unit: char`` grams), ``bloom_decontaminate``/
    ``bloom_contamination_flags`` (fixed-size Bloom bitmap broadcast),
    ``semantic_decontaminate``/
    ``semantic_contamination_flags``, ``chunk``, ``mixture``
    (target weights, or ``alpha`` for temperature), ``token_budget``,
    ``line_dedup``, ``boilerplate_strip``, ``span_dedup``, ``pack``
    (``tokens_col`` for BPE
    counts, ``boundaries`` for attention-mask metadata), ``profile``,
    ``split_assign``, ``cap``, ``shard_by_size``, ``quality_classify``,
    ``pii_scrub``, ``dsir`` + ``importance_resample``, ``upsample``,
    ``url_features``, ``url_normalize``, ``source_overlap``, ``html_extract``,
    ``gopher_filter``, ``repetition_filter``, ``diff``,
    ``length_filter``, ``score_normalize``, ``quantile_bucket``,
    ``novelty``,
    ``bpe_train``/``bpe_encode``, ``unigram_train``/``unigram_encode``,
    ``wordpiece_train``/``wordpiece_encode``, ``hash_embed``,
    ``manifest``/``manifest_diff``, ``curriculum``, ``word_blocklist``,
    ``chunk_sentences``,
    ``collocations``, ``perplexity``,
    ``bm25``.  Named-frame inputs (``benchmark``/``target``/``baseline``/
    ``queries``/``merges``) resolve through ``ctx`` from earlier
    ``name:``-tagged stages."""
    op = spec.get("op")
    id_col = spec.get("id_col", "id")
    text_col = spec.get("column", "text")
    if op == "repetition":
        return repetition_stats(df, id_col, text_col, int(spec.get("n", 3)))
    if op == "hash_sample":
        return hash_sample(
            df,
            spec.get("on", id_col),
            spec.get("rate"),
            spec.get("rates"),
            spec.get("stratify_by"),
        )
    if op in ("decontaminate", "contamination_flags"):
        bench = ctx.get(spec["benchmark"])
        fn = decontaminate if op == "decontaminate" else contamination_flags
        return fn(
            df, bench, id_col, text_col, int(spec.get("n", 8)),
            spec.get("benchmark_column"), spec.get("unit", "word"),
        )
    if op in ("bloom_decontaminate", "bloom_contamination_flags"):
        bench = ctx.get(spec["benchmark"])
        fn = (
            bloom_decontaminate
            if op == "bloom_decontaminate"
            else bloom_contamination_flags
        )
        return fn(
            df, bench, id_col, text_col, int(spec.get("n", 8)),
            spec.get("benchmark_column"), spec.get("unit", "word"),
            int(spec.get("m_bits", 1 << 20)),
            int(spec.get("k_hashes", 4)),
        )
    if op in ("semantic_decontaminate", "semantic_contamination_flags"):
        bench = ctx.get(spec["benchmark"])
        fn = (
            semantic_decontaminate
            if op == "semantic_decontaminate"
            else semantic_contamination_flags
        )
        return fn(
            df, bench, id_col, spec.get("vec_col", "embedding"),
            float(spec.get("threshold", 0.95)),
            spec.get("benchmark_id_col"), spec.get("benchmark_vec_col"),
        )
    if op == "chunk":
        return chunk_documents(
            df, id_col, text_col, int(spec.get("chunk_size", 64)),
            spec.get("stride"),
        )
    if op == "chunk_sentences":
        return chunk_sentences(
            df, id_col, text_col, int(spec.get("chunk_tokens", 128)),
        )
    if op == "mixture":
        if spec.get("alpha") is not None and spec.get("weights") is None:
            return temperature_mixture(
                df, spec["stratify_by"], spec.get("on", id_col),
                float(spec["alpha"]),
            )
        return mixture_sample(
            df, spec["stratify_by"], spec["weights"], spec.get("on", id_col)
        )
    if op == "token_budget":
        return token_budget_sample(
            df, id_col, text_col, int(spec["budget"]), spec.get("by")
        )
    if op == "line_dedup":
        win = spec.get("window")
        return line_dedup(
            df, id_col, text_col, spec.get("delimiter", "\n"),
            int(win) if win is not None else None,
        )
    if op == "boilerplate_strip":
        mdf = spec.get("max_df")
        return boilerplate_strip(
            df, id_col, text_col, spec.get("delimiter", "\n"),
            int(mdf) if mdf is not None else None,
            float(spec.get("max_frac", 0.05)),
        )
    if op == "profile":
        return corpus_profile(
            df, spec.get("by"), spec.get("metrics"),
            tuple(spec.get("percentiles", (0.25, 0.5, 0.75, 0.9, 0.99))),
            spec.get("method", "approx"), int(spec.get("accuracy", 10_000)),
        )
    if op == "span_dedup":
        return span_dedup(
            df, id_col, text_col, int(spec.get("window", 16)),
            spec.get("mode", "spans"),
        )
    if op == "pack":
        return pack_sequences(
            df, id_col, text_col, int(spec.get("seq_len", 512)),
            spec.get("by"), spec.get("tokens_col"),
            bool(spec.get("boundaries", False)),
        )
    if op == "bpe_train":
        from config_driven_pyspark_spark.operators.bpe import bpe_train

        return bpe_train(
            df, text_col, int(spec.get("n_merges", 50)),
            int(spec.get("max_words", 10_000)),
            spec.get("merge_loop", "driver"),
        )
    if op == "bpe_encode":
        from config_driven_pyspark_spark.operators.bpe import apply_bpe

        return apply_bpe(
            df, ctx.get(spec["merges"]), text_col,
            spec.get("out_col", "bpe_tokens"),
        )
    if op == "unigram_train":
        from config_driven_pyspark_spark.operators.unigram import (
            unigram_train,
        )

        return unigram_train(
            df, text_col, int(spec.get("vocab_size", 200)),
            int(spec.get("max_piece_len", 4)),
            int(spec.get("max_words", 10_000)),
        )
    if op == "unigram_encode":
        from config_driven_pyspark_spark.operators.unigram import (
            unigram_encode,
        )

        return unigram_encode(
            df, ctx.get(spec["vocab"]), text_col,
            spec.get("out_col", "unigram_tokens"),
            int(spec.get("max_piece_len", 4)),
            int(spec.get("max_word_len", 16)),
        )
    if op == "curriculum":
        from config_driven_pyspark_spark.operators.ordering import (
            curriculum_order,
        )

        return curriculum_order(
            df, id_col, spec.get("score_col", "score"),
            bool(spec.get("ascending", True)),
            int(spec.get("n_buckets", 256)),
            int(spec.get("n_phases", 1)),
        )
    if op == "manifest":
        from config_driven_pyspark_spark.operators.integrity import (
            export_manifest,
        )

        return export_manifest(
            df, spec.get("by", "shard"), id_col, text_col
        )
    if op == "manifest_diff":
        from config_driven_pyspark_spark.operators.integrity import (
            manifest_diff,
        )

        return manifest_diff(
            df, ctx.get(spec["manifest"]), spec.get("by", "shard"),
            id_col, text_col,
        )
    if op == "hash_embed":
        from config_driven_pyspark_spark.operators.featurize import (
            hash_embed,
        )

        return hash_embed(
            df, id_col, text_col, int(spec.get("dim", 64)),
            spec.get("out_col", "embedding"),
            bool(spec.get("bigrams", True)),
        )
    if op == "wordpiece_train":
        from config_driven_pyspark_spark.operators.wordpiece import (
            wordpiece_train,
        )

        return wordpiece_train(
            df, text_col, int(spec.get("vocab_size", 200)),
            int(spec.get("max_piece_len", 4)),
            int(spec.get("max_words", 10_000)),
        )
    if op == "wordpiece_encode":
        from config_driven_pyspark_spark.operators.wordpiece import (
            wordpiece_encode,
        )

        return wordpiece_encode(
            df, ctx.get(spec["vocab"]), text_col,
            spec.get("out_col", "wordpiece_tokens"),
            int(spec.get("max_piece_len", 4)),
            int(spec.get("max_word_len", 16)),
        )
    if op == "token_stats":
        from config_driven_pyspark_spark.operators.bpe import token_stats

        return token_stats(
            df, spec["count_col"], spec.get("by"), text_col,
            spec.get("tokens_col"), spec.get("unk_token", "[UNK]"),
        )
    if op == "bpe_stats":
        from config_driven_pyspark_spark.operators.bpe import (
            tokenizer_stats,
        )

        return tokenizer_stats(
            df, ctx.get(spec["merges"]), spec.get("by"), text_col
        )
    if op == "split_assign":
        return split_assign(
            df, spec.get("on", id_col), spec.get("splits"),
            int(spec.get("n_shards", 64)), spec.get("salt", ""),
        )
    if op == "cap":
        return cap_per_stratum(df, id_col, spec["by"], int(spec["cap"]))
    if op == "shard_by_size":
        return shard_by_size(
            df, id_col, text_col, int(spec.get("shard_bytes", 1_000_000)),
            spec.get("by"),
        )
    if op == "quality_classify":
        return quality_classify(
            df, id_col, spec["weights"], text_col,
            float(spec.get("bias", 0.0)), float(spec.get("threshold", 0.0)),
            spec.get("mode"),
        )
    if op == "pii_scrub":
        return pii_scrub(
            df, text_col, spec.get("types"), spec.get("out_col"),
            spec.get("tag_format", "<{TYPE}>"),
        )
    if op == "dsir":
        return dsir_weights(
            df, ctx.get(spec["target"]), id_col, text_col,
            spec.get("target_column"),
            int(spec.get("n_buckets", 1024)),
            float(spec.get("lam", 0.5)),
        )
    if op == "url_features":
        return url_features(
            df, spec.get("url_col", "url"), spec.get("blocklist"),
            spec.get("public_suffixes"),
        )
    if op == "html_extract":
        return html_extract(
            df, spec.get("html_col", "html"), spec.get("out_col", "text")
        )
    if op == "word_blocklist":
        return word_blocklist_filter(
            df, spec["words"], text_col,
            spec.get("mode", "any"), int(spec.get("max_hits", 0)),
        )
    if op == "gopher_filter":
        return gopher_filter(
            df, text_col, spec.get("thresholds"),
            tuple(spec.get("stopwords", GOPHER_STOPWORDS)),
        )
    if op == "repetition_filter":
        return repetition_filter(
            df, text_col, spec.get("thresholds"),
            spec.get("impl", "pandas"),
        )
    if op == "source_overlap":
        return source_overlap(
            df, spec.get("by", "source"), text_col,
            spec.get("normalize", True),
        )
    if op == "url_normalize":
        return url_normalize(
            df, spec.get("url_col", "url"),
            spec.get("out_col", "url_norm"),
            bool(spec.get("sort_params", False)),
            spec.get("strip_params_re", URL_TRACKING_PARAMS_RE),
        )
    if op == "mad_outliers":
        return mad_outliers(
            df, spec["score_col"], spec.get("by"),
            float(spec.get("c", 3.0)),
            spec.get("method"), int(spec.get("accuracy", 10_000)),
        )
    if op == "novelty":
        return novelty_score(
            df, id_col, text_col, int(spec.get("n", 8)),
            spec.get("unit", "word"), int(spec.get("max_df", 1)),
        )
    if op == "quantile_bucket":
        return quantile_bucket(
            df, spec["score_col"], spec.get("by"),
            tuple(spec.get("edges", (1 / 3, 2 / 3))),
            tuple(spec.get("labels", ("head", "middle", "tail"))),
            spec.get("out_col", "bucket"),
            spec.get("method"), int(spec.get("accuracy", 10_000)),
        )
    if op == "score_normalize":
        return score_normalize(
            df, spec["score_col"], spec.get("by"),
            spec.get("out_col", "z_score"),
        )
    if op == "length_filter":
        return length_filter(
            df, text_col, spec.get("by"),
            float(spec.get("lo", 0.01)), float(spec.get("hi", 0.99)),
            spec.get("method"), int(spec.get("accuracy", 10_000)),
        )
    if op == "diff":
        return corpus_diff(
            df, ctx.get(spec["baseline"]), spec["by"], text_col
        )
    if op == "upsample":
        return upsample(
            df, spec["stratify_by"], spec["factors"], spec.get("on", id_col)
        )
    if op == "importance_resample":
        return importance_resample(
            df, id_col, int(spec["n"]),
            spec.get("score_col", "dsir_score"),
            float(spec.get("temperature", 1.0)),
            spec.get("salt", ""),
        )
    if op == "collocations":
        return top_collocations(
            df, id_col, text_col,
            int(spec.get("k", 100)), int(spec.get("min_count", 5)),
        )
    if op == "perplexity":
        if spec.get("model_path"):
            return bigram_perplexity_stored(
                df, id_col, text_col, spec["model_path"],
                float(spec.get("k_smoothing", 0.5)),
            )
        return bigram_perplexity(
            df, id_col, text_col,
            int(spec.get("vocab_size", 10_000)),
            float(spec.get("k_smoothing", 0.5)),
            spec.get("smoothing", "add_k"),
            float(spec.get("discount", 0.75)),
        )
    if op == "perplexity_train":
        return bigram_lm_train(
            df, text_col, int(spec.get("vocab_size", 10_000)),
            spec["model_path"],
        )
    if op == "bm25":
        return bm25_topk(
            df, ctx.get(spec["queries"]), int(spec.get("k", 10)),
            id_col, text_col,
            spec.get("query_id_col", "query_id"),
            spec.get("query_text_col", "query_text"),
            float(spec.get("k1", 1.2)), float(spec.get("b", 0.75)),
        )
    raise ValueError(f"Unknown corpus op {op!r}")
