"""WordPiece tokenizer (BERT-style greedy longest-match-first).

Capability gap vs the reference (SURVEY.md §2C): the third major
subword-tokenizer family next to BPE (``operators/bpe.py``, learned
merge order) and unigram-LM (``operators/unigram.py``, Viterbi under
piece log-probs). WordPiece segments each word LEFT-TO-RIGHT, always
taking the LONGEST vocabulary piece that matches at the cursor; pieces
that do not start a word carry the ``##`` continuation marker, and a
word that cannot be segmented at any cursor position (or that exceeds
``max_word_len`` characters) becomes a single ``[UNK]`` token — the
exact WordPieceTokenizer contract of the public BERT reference
implementation.

Deterministic contract (what the DuckDB oracle replicates bit-for-bit):

- The trainable word table is the whitespace-token top ``max_words`` by
  (freq DESC, word ASC) — identical to ``bpe_train``/``unigram_train``.
- The vocabulary is frequency-derived: every substring of length
  1..``max_piece_len`` of every table word at every start position,
  weighted by word frequency and tagged with its role —
  ``cont = false`` for word-initial (start position 1), ``cont = true``
  otherwise. Roles are SEPARATE vocab entries (``(piece, cont)`` is the
  key — no ``##`` string-prefix ambiguity for corpora that contain
  ``#``). All single-character pieces are retained in both roles (the
  coverage floor); multi-character pieces keep the top ``vocab_size``
  by (count DESC, piece ASC, cont ASC).
- Encode: cursor at 0; at each step try lengths
  ``min(max_piece_len, remaining)..1`` and take the first ``(substring,
  cursor > 0)`` vocabulary hit — longest match wins, then advance. Any
  position with no hit → the WHOLE word is ``[UNK]``. Emitted pieces
  are display-formed: ``##`` + piece when ``cont``.

Scale (the 100 TB shape): the ONE full-corpus pass is the
word-frequency groupBy (map-side combined); vocabulary extraction runs
on the capped word table with a bounded substring explode
(≤ ``max_words`` × ``max_word_len`` × ``max_piece_len`` rows through a
combinable aggregate); encode is a map-only Arrow-batched pandas UDF
with a per-batch distinct-word memo (the ``apply_bpe`` shape) — no
shuffle, no driver state beyond the vocab_size-bounded piece table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from config_driven_pyspark_spark.operators.bpe import (
    _encode_words_vectorized,
)

from config_driven_pyspark_spark.functions import text as TX
from config_driven_pyspark_spark.operators.dedup import _spread

UNK_TOKEN = "[UNK]"

VOCAB_SCHEMA = "piece string, cont boolean, count bigint"


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    max_piece_len: int = 4,
    max_words: int = 10_000,
) -> DataFrame:
    """Frequency-derived WordPiece vocabulary ``(piece, cont, count)``
    over the capped word table — pure Column expressions end-to-end
    (role-tagged substring explode + two combinable aggregates + one
    top-k), so an external SQL engine reproduces every count exactly."""
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
                lambda l: F.struct(
                    w.substr(s, l).alias("piece"),
                    (s > F.lit(1)).alias("cont"),
                ),
            ),
        )
    )
    counts = (
        words.select(F.col("freq"), F.explode(subs).alias("p"))
        .groupBy(F.col("p.piece").alias("piece"), F.col("p.cont").alias("cont"))
        .agg(F.sum("freq").alias("count"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multis = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.desc("count"), "piece", "cont")
        .limit(vocab_size)
    )
    return chars.unionByName(multis).select(
        "piece", "cont", F.col("count").cast("bigint").alias("count")
    )


def _greedy(
    word: str,
    vocab: set[tuple[str, bool]],
    max_piece_len: int,
    max_word_len: int,
) -> list[str]:
    """One word's greedy longest-match-first segmentation under the
    module's deterministic contract (see module docstring)."""
    n = len(word)
    if n > max_word_len:
        return [UNK_TOKEN]
    out: list[str] = []
    pos = 0
    while pos < n:
        hit = 0
        for l in range(min(max_piece_len, n - pos), 0, -1):
            if (word[pos : pos + l], pos > 0) in vocab:
                hit = l
                break
        if not hit:
            return [UNK_TOKEN]
        out.append(("##" if pos else "") + word[pos : pos + hit])
        pos += hit
    return out


def wordpiece_encode(
    df: DataFrame,
    vocab: list[tuple[str, bool]] | DataFrame,
    text_col: str = "text",
    out_col: str = "wordpiece_tokens",
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """Map-only WordPiece encode: greedy-segment each whitespace word
    against the role-tagged vocabulary, emitting one flat
    ``array<string>`` of display-formed pieces per document plus
    ``n_<out_col>``. ``vocab`` is the DataFrame from
    :func:`wordpiece_train` (collected here — vocab_size-bounded by
    construction) or a pre-collected ``[(piece, cont), ...]`` list.

    Arrow-batched pandas UDF with a per-batch distinct-word memo (the
    ``apply_bpe`` shape); composes with ``pack_sequences(tokens_col=...)``
    and ``tokenizer_stats``-style roll-ups downstream."""
    if isinstance(vocab, DataFrame):
        vocab = [(r["piece"], bool(r["cont"])) for r in vocab.collect()]
    pieces = {(p, bool(c)) for p, c in vocab}

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def encode(texts):
        # shared vectorized batch body — see bpe._encode_words_vectorized
        return _encode_words_vectorized(
            texts, lambda word: _greedy( word, pieces, max_piece_len, max_word_len )
        )

    encode.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = pandas_udf(encode, "array<string>")
    return df.withColumn(out_col, udf(F.col(text_col))).withColumn(
        f"n_{out_col}", F.size(out_col).cast("bigint")
    )
