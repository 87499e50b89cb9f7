"""Text-analysis Column functions + the ``text`` pipeline stage.

Capability gap the reference doesn't cover (SURVEY.md §2C): language-ID,
quality scoring, token counting, shingling, and document fingerprinting for
large-scale training-data pipelines. Everything is built-in Column
expressions (split/regexp/aggregate) — JVM-side, no UDFs — and each function
is written so an ANSI-SQL oracle (DuckDB) can reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword panels for the n-gram/stopword-hit language
# heuristic; order is the deterministic tie-break (first wins)
LANG_STOPWORDS: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of", "to", "a"]),
    ("fr", ["le", "la", "et", "les", "des"]),
    ("de", ["der", "die", "und", "das", "ist"]),
    ("es", ["el", "la", "y", "los", "que"]),
]


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty tokens removed)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def char_count(text: Column) -> Column:
    return F.length(text).cast("bigint")


def avg_token_length(text: Column) -> Column:
    toks = tokens(text)
    return F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    stripped = F.regexp_replace(text, r"[!-/:-@\[-`{-~]", "")
    return (F.length(text) - F.length(stripped)) / F.length(text)


def stopword_hits(text: Column, words: list[str]) -> Column:
    wordset = [w for w in words]
    return F.size(F.filter(tokens(F.lower(text)), lambda t: t.isin(*wordset)))


def stopword_ratio(text: Column, words: list[str]) -> Column:
    return stopword_hits(text, words) / token_count(text)


def quality_score(text: Column) -> Column:
    """Deterministic heuristic quality score in [0, 1]: rewards reasonable
    length, penalizes extreme punctuation density and very short tokens.
    (Heuristic family: Gopher/C4-style quality rules, public domain knowledge.)
    """
    n_tok = token_count(text)
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    word_len_term = F.when(avg_token_length(text).between(2.0, 12.0), 1.0).otherwise(0.5)
    return F.round(0.5 * length_term + 0.3 * punct_term + 0.2 * word_len_term, 6)


def lang_margin(text: Column) -> Column:
    """Language-ID confidence: (best stopword-panel hit count − runner-up
    hit count) / token count, rounded to 6 decimals — near 0 for
    mixed-language or stopword-free text (route to manual review / drop
    under a Gopher-style rule), larger when one panel dominates. Uses
    the same panels as :func:`lang_id`, so the pair gives a (label,
    confidence) feature per document; empty documents score 0.0."""
    scores = F.array_sort(
        F.array(*[stopword_hits(text, w) for _, w in LANG_STOPWORDS])
    )
    n = len(LANG_STOPWORDS)
    toks = token_count(text)
    return F.when(
        toks > 0,
        F.round(
            (F.element_at(scores, n) - F.element_at(scores, n - 1))
            / toks,
            6,
        ),
    ).otherwise(F.lit(0.0))


def sentence_count(text: Column) -> Column:
    """Sentence count = runs of terminal punctuation ``[.!?]+`` (floored
    at 1 for any non-empty token stream — an unpunctuated fragment is
    one sentence). Regex sits in the RE2 ∩ Java common subset."""
    return F.when(token_count(text) == 0, F.lit(0)).otherwise(
        F.greatest(F.lit(1), F.regexp_count(text, F.lit(r"[.!?]+")))
    ).cast("bigint")


def syllable_count(text: Column) -> Column:
    """Heuristic syllable total: per word, the number of vowel-group
    runs ``[aeiouy]+`` in the lowercased word, floored at 1 (the
    standard dependency-free approximation under Flesch scoring)."""
    return F.aggregate(
        F.transform(
            tokens(text),
            lambda w: F.greatest(
                F.lit(1), F.regexp_count(F.lower(w), F.lit(r"[aeiouy]+"))
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("bigint")


def flesch_reading_ease(text: Column) -> Column:
    """Flesch reading ease (Flesch 1948, public formula):
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``,
    rounded to 6 decimals; empty documents score null. Integer inputs +
    one fixed double expression → bit-replicable across engines."""
    w = token_count(text)
    return F.when(
        w > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (w / sentence_count(text))
            - F.lit(84.6) * (syllable_count(text) / w),
            6,
        ),
    )


def fk_grade(text: Column) -> Column:
    """Flesch–Kincaid grade level (Kincaid et al. 1975):
    ``0.39·(words/sentences) + 11.8·(syllables/words) − 15.59``,
    rounded to 6 decimals; empty documents score null."""
    w = token_count(text)
    return F.when(
        w > 0,
        F.round(
            F.lit(0.39) * (w / sentence_count(text))
            + F.lit(11.8) * (syllable_count(text) / w)
            - F.lit(15.59),
            6,
        ),
    )


def lang_id(text: Column) -> Column:
    """Stopword-panel language guess; ties break by panel order, zero hits
    everywhere → 'und' (undetermined)."""
    scores = {lang: stopword_hits(text, words) for lang, words in LANG_STOPWORDS}
    best = F.greatest(*scores.values()) if len(scores) > 1 else list(scores.values())[0]
    result = F.lit("und")
    # build the CASE from last panel to first so earlier panels win ties
    for lang, _ in reversed(LANG_STOPWORDS):
        result = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(result)
    return result


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lowercased text. Stable across engines (md5 is md5 everywhere), used as
    the exact-dedup key."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")).cast("binary")
    )


_BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """BPE-style pre-tokenizer count: letter runs, single digits, and
    punctuation marks each count as one pre-token (the GPT-2-family
    pre-tokenization shape — real BPE merges only split these further, so
    this is a stable lower bound usable for length filtering/budgeting)."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_PRETOKEN_RE), 0)).cast("bigint")


def rolling_hash(text: Column, modulus: int = 2_147_483_647, base: int = 31) -> Column:
    """Polynomial rolling hash (Rabin–Karp) over the character codes:
    ``h = (h*base + code) mod M`` folded left-to-right with ``aggregate``.
    Order-sensitive (anagrams differ) and engine-portable — the oracle
    reproduces it exactly with a list_reduce. ``M = 2^31-1`` keeps
    ``h*base + code`` within bigint under ANSI mode."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % modulus,
    )


# PII-shaped patterns for training-data scrubbing; deliberately simple,
# deterministic, and reproducible in any regex engine
_REDACT_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
    (r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
]


def redact(text: Column) -> Column:
    """Replace email/phone/IP-shaped substrings with typed placeholders —
    the standard scrub pass before training-data use. Single Project, one
    regexp_replace per pattern."""
    out = text
    for pattern, replacement in _REDACT_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


# Latin-1/Latin-Extended accent fold map (same length by construction —
# pytest-pinned); applied with translate(), which is code-point-wise in
# both Spark (StringTranslate) and DuckDB (utf8proc), so the fold is
# byte-replicable cross-engine.
_ACCENT_SRC = "ÁÀÂÄÃÅáàâäãåÉÈÊËéèêëÍÌÎÏíìîïÓÒÔÖÕóòôöõÚÙÛÜúùûüÇçÑñÝýÿ"
_ACCENT_DST = "AAAAAAaaaaaaEEEEeeeeIIIIiiiiOOOOOoooooUUUUuuuuCcNnYyy"


def normalize(
    text: Column,
    lowercase: bool = True,
    strip_accents: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """Standard web-text normalization before dedup/fingerprinting:
    ASCII control characters (``\\x00-\\x1F``, ``\\x7F``) become spaces,
    accents fold to their base letters, text lowercases, and space runs
    collapse to one space with ends trimmed — in that fixed order, so
    the collapse pass sees the spaces the control strip introduced.
    Pure Column expression chain (regexp_replace + translate + lower),
    single Project, byte-replicable by an external oracle."""
    out = F.regexp_replace(text, r"[\x00-\x1F\x7F]", " ")
    if strip_accents:
        out = F.translate(out, _ACCENT_SRC, _ACCENT_DST)
    if lowercase:
        out = F.lower(out)
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r" +", " "))
    return out


def shingles(text: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text — the unit set
    for n-gram Jaccard / MinHash dedup. Pure expression: ``sequence`` over
    start offsets + ``transform`` + ``array_distinct``."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    starts = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(starts, lambda i: F.substring(norm, i, k))
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) — alternative shingle unit."""
    toks = tokens(F.lower(text))
    count = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(count - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            starts,
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


_TEXT_OPS = {
    "token_count": token_count,
    "char_count": char_count,
    "avg_token_length": avg_token_length,
    "punct_ratio": punct_ratio,
    "quality_score": quality_score,
    "lang_id": lang_id,
    "fingerprint": fingerprint,
    "bpe_token_count": bpe_token_count,
    "rolling_hash": rolling_hash,
    "redact": redact,
    "normalized": normalize,
    "lang_margin": lang_margin,
    "sentence_count": sentence_count,
    "syllable_count": syllable_count,
    "flesch_reading_ease": flesch_reading_ease,
    "fk_grade": fk_grade,
}


def stage_text(df: DataFrame, spec: dict) -> DataFrame:
    """``{"stage": "text", "column": "text", "ops": ["token_count", ...]}`` —
    appends one derived column per requested op (single Project)."""
    col = F.col(spec.get("column", "text"))
    ops = spec.get("ops") or list(_TEXT_OPS)
    unknown = [op for op in ops if op not in _TEXT_OPS]
    if unknown:
        raise ValueError(f"Unknown text ops {unknown}; available: {sorted(_TEXT_OPS)}")
    return df.withColumns({op: _TEXT_OPS[op](col) for op in ops})
