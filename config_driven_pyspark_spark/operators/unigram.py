"""Unigram-LM tokenizer (SentencePiece-style Viterbi segmentation).

Capability gap vs the reference (SURVEY.md §2C): the second major
subword-tokenizer family next to BPE (``operators/bpe.py``). Where BPE
composes symbols bottom-up through a learned merge order, the unigram
model scores every possible segmentation of a word under per-piece
log-probabilities and picks the best one by dynamic programming — the
Kudo (2018) inference shape, which real pipelines use both to tokenize
and to compare tokenizer quality (see ``bpe.tokenizer_stats``).

Deterministic contract (what the DuckDB oracle replicates bit-for-bit):

- The trainable word table is the whitespace-token top ``max_words`` by
  (freq DESC, word ASC) — identical to ``bpe_train``.
- The vocabulary is frequency-derived, not EM-refined (the optional EM
  rounds of full SentencePiece are a training refinement; the
  segmentation machinery — the hard part at corpus scale — is
  identical): every substring of length 1..``max_piece_len`` of every
  table word at every start position, weighted by word frequency. ALL
  single characters are retained (they are the segmentation fallback);
  multi-character pieces keep the top ``vocab_size`` by
  (count DESC, piece ASC).
- ``score(piece) = round(ln(count / total), 9)`` with ``total`` the sum
  of retained-piece counts; an out-of-vocab single character scores the
  fixed ``UNK_SCORE`` (−100.0).
- Viterbi: ``best[0] = 0``; ``best[i] = max over j`` of
  ``round(best[j] + score(word[j:i]), 9)`` for ``i−j ≤ max_piece_len``,
  ties broken toward the SMALLEST ``j`` (longest final piece) — the
  per-step 9-decimal quantization puts both engines on the same value
  grid, so the argmax (and therefore the segmentation) is replayable as
  unrolled SQL steps, the MMR-oracle pattern. Words longer than
  ``max_word_len`` fall back to their character sequence.

Scale (the 100 TB shape): the ONE full-corpus pass is the word-frequency
groupBy (map-side combined); vocabulary extraction runs on the capped
word table with a bounded substring explode (≤ ``max_words`` ×
``max_word_len`` × ``max_piece_len`` rows through a combinable
aggregate); encode is a map-only Arrow-batched pandas UDF with a
per-batch distinct-word memo (the ``apply_bpe`` shape) — no shuffle, no
driver state beyond the vocab_size-bounded score table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from config_driven_pyspark_spark.operators.bpe import (
    _encode_words_vectorized,
)

from config_driven_pyspark_spark.functions import text as TX
from config_driven_pyspark_spark.operators.dedup import _spread

UNK_SCORE = -100.0

VOCAB_SCHEMA = "piece string, count bigint, score double"


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    max_piece_len: int = 4,
    max_words: int = 10_000,
) -> DataFrame:
    """Frequency-derived unigram vocabulary ``(piece, count, score)``
    over the capped word table — pure Column expressions end-to-end
    (substring explode + two combinable aggregates + one top-k), so an
    external SQL engine reproduces every score exactly."""
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    if max_words <= 0:
        raise ValueError("max_words must be positive")
    toks = F.coalesce(
        TX.tokens(F.col(text_col)), F.array().cast("array<string>")
    )
    words = (
        _spread(df)
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(max_words)
    )
    w = F.col("word")
    n = F.length(w)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), n - s + 1)
                ),
                lambda l: w.substr(s, l),
            ),
        )
    )
    counts = (
        words.select(F.col("freq"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("count"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multis = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.desc("count"), "piece")
        .limit(vocab_size)
    )
    vocab = chars.unionByName(multis)
    total = vocab.agg(F.sum("count").alias("total"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "piece",
        F.col("count").cast("bigint").alias("count"),
        F.round(
            F.log(F.col("count").cast("double") / F.col("total").cast("double")),
            9,
        ).alias("score"),
    )


def _viterbi(
    word: str,
    scores: dict[str, float],
    max_piece_len: int,
    max_word_len: int,
    q9,
) -> list[str]:
    """One word's best segmentation under the module's deterministic DP
    contract (see module docstring); ``q9`` is the shared HALF_UP
    9-decimal quantizer so every compared value sits on the oracle's
    grid."""
    nloc = len(word)
    if nloc > max_word_len:
        return list(word)
    best: list[float] = [0.0] * (nloc + 1)
    back: list[int] = [0] * (nloc + 1)
    for i in range(1, nloc + 1):
        cand_best = None
        cand_j = 0
        for j in range(max(0, i - max_piece_len), i):
            s = scores.get(word[j:i])
            if s is None:
                if i - j != 1:
                    continue
                s = UNK_SCORE
            c = q9(best[j] + s)
            if cand_best is None or c > cand_best:  # ties keep smallest j
                cand_best, cand_j = c, j
        best[i], back[i] = cand_best, cand_j
    out: list[str] = []
    i = nloc
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_encode(
    df: DataFrame,
    vocab: list[tuple[str, float]] | DataFrame,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """Map-only unigram encode: Viterbi-segment each whitespace word
    under the vocabulary's log-probabilities, emitting one flat
    ``array<string>`` of pieces per document plus ``n_<out_col>``.
    ``vocab`` is the DataFrame from :func:`unigram_train` (collected
    here — vocab_size-bounded by construction) or a pre-collected
    ``[(piece, score), ...]`` list.

    Arrow-batched pandas UDF with a per-batch distinct-word memo (the
    ``apply_bpe`` shape); composes with ``pack_sequences(tokens_col=...)``
    and ``tokenizer_stats``-style roll-ups downstream."""
    if isinstance(vocab, DataFrame):
        vocab = [(r["piece"], float(r["score"])) for r in vocab.collect()]
    scores = {p: float(s) for p, s in vocab}

    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    grid = Decimal("1e-9")

    def q9(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(grid, rounding=ROUND_HALF_UP)
        )

    def encode(texts):
        # shared vectorized batch body — see bpe._encode_words_vectorized
        return _encode_words_vectorized(
            texts, lambda word: _viterbi( word, scores, max_piece_len, max_word_len, q9 )
        )

    encode.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = pandas_udf(encode, "array<string>")
    return df.withColumn(out_col, udf(F.col(text_col))).withColumn(
        f"n_{out_col}", F.size(out_col).cast("bigint")
    )
