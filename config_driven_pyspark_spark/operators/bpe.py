"""Byte-pair-encoding tokenizer training and application.

Capability gap vs the reference (SURVEY.md §2C / VERDICT r6 ask #4): the
reference (`/root/reference/src/config_driven_pyspark/functioniser.py`)
has no tokenizer surface at all, and this repo's corpus operators
(``token_budget_sample``, ``pack_sequences``, ``chunk_documents``)
previously counted whitespace tokens only. Real training pipelines
budget and pack by TOKENIZER tokens — so train the tokenizer on the
corpus itself, Spark-first:

- ``bpe_train``  — classic BPE (Sennrich et al. 2016): start from
  per-character symbols, repeatedly count adjacent symbol pairs across
  the corpus and merge the most frequent pair (ties -> lexicographically
  smallest), recording the merge table.
- ``apply_bpe``  — map-only encode: re-play the merge table over each
  document's words (Arrow-batched pandas UDF with a per-batch word
  memo — encoding is inherently sequential per word, the same reason
  real tokenizers are native code).

Determinism contract (what the DuckDB oracle replicates bit-for-bit):
words are whitespace tokens; the trainable word table is the top
``max_words`` by (freq DESC, word ASC); base symbols are the word's
characters (no end-of-word marker — documented simplification); each
round's winning pair is argmax by (count DESC, lhs ASC, rhs ASC); merge
application is a greedy LEFT-TO-RIGHT fold (accumulate symbols, merging
whenever the accumulator's last symbol is ``lhs`` and the next is
``rhs`` — so "a a a" under merge (a,a) becomes [aa, a], exactly
DuckDB's ``list_reduce`` over singleton lists).

Scale (the 100 TB shape): the ONE full-corpus pass is the word-frequency
groupBy (map-side combine collapses repeated words before the shuffle).
Everything iterative runs on the capped distinct-word table — vocab-
bounded (``max_words`` rows), the same corpus-to-word-counts reduction
every production BPE trainer performs. Two interchangeable merge loops
(bit-identical tables by construction, pinned by
``tests/test_bpe.py::test_driver_and_spark_merge_loops_identical``):

- ``merge_loop="driver"`` (default): collect the capped word table ONCE
  (bounded: ``max_words`` rows) and run the merge rounds driver-side
  with incremental pair-count maintenance (the classic Sennrich
  ``learn_bpe`` shape — only words containing the winning pair are
  touched per round). A production 32k-merge vocab is ~64k scheduler
  round-trips on the Spark loop (hours of pure latency at 50 ms/job);
  driver-side it is in-memory Python on a vocab-bounded table.
- ``merge_loop="spark"`` (opt-in, oracle replay): the original
  per-round groupBy + single-row collect. Round cost is already
  corpus-independent; what it pays is one Spark job per round. The
  word table is re-materialized per round (localCheckpoint, unpersist
  previous) to keep the plan depth constant instead of stacking
  ``n_merges`` nested higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from config_driven_pyspark_spark.functions import text as TX
from config_driven_pyspark_spark.operators.dedup import _spread

MERGES_SCHEMA = (
    "rank bigint, lhs string, rhs string, merged string, pair_count bigint"
)


def _merge_fold(syms: Column, lhs: str, rhs: str) -> Column:
    """Greedy left-to-right application of one merge to a symbol array:
    fold symbols into an accumulator, replacing the accumulator's tail
    with ``lhs+rhs`` whenever (tail == lhs, next == rhs). ``F.get`` (not
    ``element_at``) for the empty-accumulator probe — ANSI element_at
    raises on out-of-bounds."""
    merged = lhs + rhs
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == lhs) & (s == rhs),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _driver_merge_loop(
    rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """In-memory merge rounds over the collected (word, freq) table with
    incremental pair-count maintenance: only words containing the winning
    pair are re-folded each round (the Sennrich ``learn_bpe`` shape), so
    round cost is proportional to affected words, not the vocab.

    Bit-identical to the Spark loop by construction: pair counts are
    exact int sums; the winner is ``min`` by ``(-count, lhs, rhs)`` —
    Python's code-point string order equals Spark's UTF-8 byte order
    (UTF-8 preserves code-point order); the fold is the same greedy
    left-to-right accumulator as :func:`_merge_fold`. Symbol split is
    ``list(word)`` vs Spark's ``split(word, '')`` — identical for BMP
    text (non-BMP chars would split into surrogate halves JVM-side; use
    ``merge_loop="spark"`` if that edge matters)."""
    from collections import defaultdict

    words: list[list[str]] = [list(w) for w, _ in rows]
    freqs: list[int] = [f for _, f in rows]
    stats: dict[tuple[str, str], int] = defaultdict(int)
    indices: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        f = freqs[i]
        for pair in zip(syms, syms[1:]):
            stats[pair] += f
            indices[pair].add(i)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        if not stats:
            break
        (lhs, rhs), c = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, lhs + rhs, int(c)))
        merged = lhs + rhs
        # indices is maintained lazily (stale ids are harmless: their
        # subtract-then-re-add below cancels), so iterate a sorted copy
        for i in sorted(indices.pop((lhs, rhs), ())):
            syms, f = words[i], freqs[i]
            for pair in zip(syms, syms[1:]):
                stats[pair] -= f
                if stats[pair] <= 0:
                    del stats[pair]
            out: list[str] = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = merged
                else:
                    out.append(s)
            words[i] = out
            for pair in zip(out, out[1:]):
                stats[pair] += f
                indices[pair].add(i)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_words: int = 10_000,
    merge_loop: str = "driver",
) -> DataFrame:
    """Train a BPE merge table on the corpus; returns a small DataFrame
    ``(rank, lhs, rhs, merged, pair_count)`` in merge order. Stops early
    when no adjacent pair remains (every word fully merged).

    ``merge_loop`` picks where the (corpus-independent) merge rounds run:
    ``"driver"`` collects the capped word table once and iterates
    in-memory; ``"spark"`` replays each round as a groupBy job (the
    oracle-replay path). Identical output — see module docstring."""
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    if max_words <= 0:
        raise ValueError("max_words must be positive")
    if merge_loop not in ("driver", "spark"):
        raise ValueError(
            f"merge_loop must be 'driver' or 'spark', got {merge_loop!r}"
        )
    spark = df.sparkSession
    toks = F.coalesce(
        TX.tokens(F.col(text_col)), F.array().cast("array<string>")
    )
    freq = (
        _spread(df)
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if merge_loop == "driver":
        rows = [
            (r["word"], int(r["freq"]))
            for r in freq.orderBy(F.desc("freq"), "word")
            .limit(max_words)
            .collect()
        ]
        return spark.createDataFrame(
            _driver_merge_loop(rows, n_merges), MERGES_SCHEMA
        )
    # localCheckpoint (not bare persist): each round's fold references the
    # symbol column several times, so stacking rounds multiplies the
    # LOGICAL plan ~5x per merge — by round ~15 the analyzer OOMs just
    # stringifying it. Checkpointing cuts the lineage to a LogicalRDD so
    # plan size stays constant per round. Local (not HDFS) is right here:
    # the table is vocab-bounded and deterministically retrainable; on a
    # long-lived production cluster use spark.checkpoint() for executor-
    # loss resilience.
    words = (
        freq.orderBy(F.desc("freq"), "word")
        .limit(max_words)
        .select("word", "freq", F.split("word", "").alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple] = []
    try:
        for rank in range(1, n_merges + 1):
            pairs = (
                words.filter(F.size("syms") >= 2)
                .select(
                    "freq",
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(0), F.size("syms") - 2),
                            lambda i: F.struct(
                                F.get(F.col("syms"), i.cast("int")).alias("lhs"),
                                F.get(F.col("syms"), i.cast("int") + 1).alias(
                                    "rhs"
                                ),
                            ),
                        )
                    ).alias("p"),
                )
                .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
                .agg(F.sum("freq").alias("c"))
            )
            top = (
                pairs.orderBy(F.desc("c"), "lhs", "rhs").limit(1).collect()
            )
            if not top:
                break
            lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], int(top[0]["c"])
            merges.append((rank, lhs, rhs, lhs + rhs, c))
            nxt = words.withColumn(
                "syms", _merge_fold(F.col("syms"), lhs, rhs)
            ).localCheckpoint()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def _encode_words_vectorized(texts, encode_word):
    """Shared vectorized batch body for every word-level tokenizer encode
    (BPE / unigram / WordPiece).  The per-word replay is cheap — natural
    corpora repeat words heavily, so a batch holds few DISTINCT words —
    but a per-word Python loop over the word *instances* dominated the
    e2e pipeline (~18M instances / 31 distinct at sf0.1, ~20 s).
    Explode to a word Series (C), categorical-encode so each distinct
    word replays ``encode_word`` exactly once per batch, gather the
    space-joined encodings through the category codes (C), and re-join
    per document (C iteration).  Tokens cannot contain spaces (they are
    concatenations of word characters), so the join/split roundtrip is
    lossless."""
    import pandas as pd

    s = texts.fillna("")
    words = s.str.split(" ").explode()
    words = words[words != ""]
    if len(words):
        cat = words.astype("category")
        enc_strs = pd.Index(
            [" ".join(encode_word(w)) for w in cat.cat.categories]
        )
        joined = (
            pd.Series(
                enc_strs[cat.cat.codes], index=words.index, dtype=object
            )
            .groupby(level=0)
            .agg(" ".join)
        )
    else:
        joined = pd.Series([], dtype=object)
    joined = joined.reindex(s.index, fill_value="")
    return joined.map(lambda t: t.split(" ") if t else [])


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Map-only BPE encode: split each document into whitespace words and
    re-play the merge table per word (training-order, same greedy
    left-to-right fold as :func:`bpe_train`), emitting one flat
    ``array<string>`` of BPE tokens per document plus
    ``n_bpe_tokens``. ``merges`` is the DataFrame from :func:`bpe_train`
    (collected here — it's ``n_merges`` rows, driver-bounded by
    construction) or a pre-collected ``[(lhs, rhs), ...]`` list.

    Arrow-batched pandas UDF with a per-batch memo keyed by distinct
    word — natural-language batches repeat words heavily, so each
    distinct word pays the O(n_merges · len) replay once per batch. No
    shuffle; composes with ``pack_sequences(tokens_col=...)`` /
    ``token_budget_sample`` so downstream packing and budgeting run on
    TOKENIZER counts, not whitespace counts.
    """
    if isinstance(merges, DataFrame):
        merges = [
            (r["lhs"], r["rhs"])
            for r in merges.orderBy("rank").collect()
        ]
    table = [(lhs, rhs) for lhs, rhs in merges]

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        for lhs, rhs in table:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(s)
            syms = out
        return syms

    def encode(texts):
        return _encode_words_vectorized(texts, encode_word)

    encode.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = pandas_udf(encode, "array<string>")
    return df.withColumn(out_col, udf(F.col(text_col))).withColumn(
        f"n_{out_col}", F.size(out_col).cast("bigint")
    )


def tokenizer_stats(
    df: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    by: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum tokenizer fertility report — the "how does this
    tokenizer treat each language/source" diagnostic that drives vocab
    and mixture decisions: document count, total BPE tokens, total
    UTF-8 bytes, and ``tokens_per_byte`` (9-decimal rounded; a language
    the tokenizer fragments badly shows a high ratio and effectively
    gets fewer bytes per compute budget).

    Scale: one map-only Arrow-batched encode pass (:func:`apply_bpe`)
    plus a single stratum-keyed aggregate with map-side partials —
    nothing corpus-sized moves."""
    enc = apply_bpe(df, merges, text_col)
    keys = [by] if by else []
    agg = enc.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.sum(
            F.octet_length(F.coalesce(F.col(text_col), F.lit("")))
        ).cast("bigint").alias("n_bytes"),
    )
    return agg.withColumn(
        "tokens_per_byte",
        F.when(
            F.col("n_bytes") > 0,
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_bytes").cast("double"),
                9,
            ),
        ).otherwise(F.lit(0.0)),
    )


def token_stats(
    df: DataFrame,
    count_col: str,
    by: str | None = None,
    text_col: str = "text",
    tokens_col: str | None = None,
    unk_token: str = "[UNK]",
) -> DataFrame:
    """:func:`tokenizer_stats`' roll-up decoupled from the BPE encode —
    the same per-stratum fertility report (docs, tokens, UTF-8 bytes,
    9-decimal ``tokens_per_byte``) over ANY precomputed token-count
    column, so ``unigram_encode``/``wordpiece_encode`` outputs (or an
    external tokenizer's counts) feed the identical diagnostic and the
    three tokenizer families compare on one table.

    With ``tokens_col`` set, also reports vocabulary COVERAGE:
    ``n_unk`` (total ``unk_token`` pieces in that array column) and
    ``unk_rate = round(n_unk / n_tokens, 9)`` — the per-stratum signal
    that a language falls outside the trained vocabulary (WordPiece
    collapses uncovered words to a single ``[UNK]``, so a high rate
    here means silent content loss, not just fragmentation).

    Scale: one stratum-keyed aggregate with map-side partials; the UNK
    count is an array-side filter inside the same aggregate."""
    keys = [by] if by else []
    aggs = [
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(count_col).cast("bigint").alias("n_tokens"),
        F.sum(
            F.octet_length(F.coalesce(F.col(text_col), F.lit("")))
        ).cast("bigint").alias("n_bytes"),
    ]
    if tokens_col is not None:
        aggs.append(
            F.sum(
                F.size(
                    F.filter(F.col(tokens_col), lambda t: t == unk_token)
                )
            ).cast("bigint").alias("n_unk")
        )
    agg = df.groupBy(*keys).agg(*aggs)
    if tokens_col is not None:
        agg = agg.withColumn(
            "unk_rate",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.col("n_unk").cast("double")
                    / F.col("n_tokens").cast("double"),
                    9,
                ),
            ).otherwise(F.lit(0.0)),
        )
    return agg.withColumn(
        "tokens_per_byte",
        F.when(
            F.col("n_bytes") > 0,
            F.round(
                F.col("n_tokens").cast("double")
                / F.col("n_bytes").cast("double"),
                9,
            ),
        ).otherwise(F.lit(0.0)),
    )
