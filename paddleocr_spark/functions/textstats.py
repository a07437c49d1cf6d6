"""Text-analysis operators: token counting, quality scoring, language-ID,
document fingerprinting.

These are the corpus-curation analogs of the reference's per-line text
postprocessing (word segmentation `get_word_info`
rec_postprocess.py:70-134, confidence scoring rec_postprocess.py:186,
dict lookup rec_postprocess.py:24-49) lifted to corpus scale. All are
pure column expressions — JVM-side, zero Python, zero shuffles — so at
100 TB they pipeline into the scan with no extra stage.

Cross-engine determinism rules (the DuckDB oracle must agree bitwise):
- explicit whitespace class, never bare ``\\s`` (engines differ);
- char classes / alternations only in regexes (Java regex vs RE2 agree);
- integer arithmetic or exact IEEE double division only; round() at the
  output boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer regex: letter runs | digit runs | single non-alnum
# (the `get_word_info` char-class segmentation analog).
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Tiny deterministic stopword profiles (language-ID by profile hit-rate).
STOP_EN = ["the", "a", "of", "and", "in", "to", "is"]
STOP_DE = ["der", "die", "und", "das", "ein"]
STOP_FR = ["le", "la", "et", "les", "des"]
STOP_ES = ["el", "los", "y", "una", "las"]

CJK_STRIP_RE = "[^一-龥]"  # strip-everything-else => CJK char count

PUNCT_RE = "[^A-Za-z0-9 ]"


def words(text: Column) -> Column:
    """Whitespace-token array (single-space-separated corpus text)."""
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    return F.size(words(text)).cast("int")


def token_count_re(text: Column) -> Column:
    """BPE-ish regex token count (letters/digits/punct split)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0))).cast("int")


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    """Count of tokens that are in the stopword list."""
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words(text), lambda w: F.array_contains(arr, w))).cast("int")


def cjk_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, CJK_STRIP_RE, "")).cast("int")


def punct_count(text: Column) -> Column:
    return (
        F.length(text) - F.length(F.regexp_replace(text, PUNCT_RE, ""))
    ).cast("int")


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.5 * min(len/500, 1) + 0.3 * stopword_ratio-capped + 0.2 * alnum ratio.

    Mirrors the role of ``drop_score`` (predict_system.py:149-154) as a
    keep/drop confidence for corpus filtering.
    """
    n = F.length(text).cast("double")
    nw = token_count_ws(text).cast("double")
    stop_ratio = stopword_hits(text, STOP_EN).cast("double") / nw
    alnum = F.length(F.regexp_replace(text, "[^A-Za-z0-9]", "")).cast("double")
    score = (
        F.lit(0.5) * F.least(n / F.lit(500.0), F.lit(1.0))
        + F.lit(0.3) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        + F.lit(0.2) * (alnum / n)
    )
    # empty text: alnum/n is NULL (and the whole sum with it), so an
    # empty doc vanished from BOTH sides of any score partition
    # (score >= t and score < t are each NULL). Pin it to 0.0 — the
    # lowest possible quality, which is what empty means.
    return F.when(n == 0, F.lit(0.0)).otherwise(score)


def langid_pred(text: Column) -> Column:
    """Stopword-profile language-ID (n-gram-heuristic family).

    score(lang) = hits of that profile; prediction = argmax with the
    fixed tie order zh > en > de > fr > es > unk (deterministic).
    CJK chars dominate: any CJK => zh.
    """
    nw = words(text)
    n = F.size(nw).cast("double")

    def ratio(stops: list[str]) -> Column:
        return stopword_hits(text, stops).cast("double") / n

    en, de, fr, es = ratio(STOP_EN), ratio(STOP_DE), ratio(STOP_FR), ratio(STOP_ES)
    best = F.greatest(en, de, fr, es)
    return (
        F.when(cjk_count(text) > 0, F.lit("zh"))
        .when(best == F.lit(0.0), F.lit("unk"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def shingle_expr(words_col: Column, text: Column, k: int = 3) -> Column:
    """Word k-shingles from an already-bound words array column.

    ``words_col`` MUST be a plain column reference (not an inline
    ``split(...)`` expression): each shingle reads it k times, and an
    inline expression would re-split the text per access — O(words²)
    per row instead of O(words). Callers bind it with ``withColumn``
    (CollapseProject keeps multi-referenced non-cheap projections).
    """
    return F.when(F.size(words_col) < k, F.array(text)).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(words_col) - k),
            lambda i: F.concat_ws(" ", *[F.get(words_col, i + j) for j in range(k)]),
        )
    )


def with_shingles(df, text_col: str = "text", k: int = 3, out: str = "__sh"):
    """Append a shingle array column, computing the word split once."""
    return (
        df.withColumn("__w", F.split(F.col(text_col), " "))
        .withColumn(out, shingle_expr(F.col("__w"), F.col(text_col), k))
        .drop("__w")
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Inline shingle expression — convenience for small inputs ONLY
    (quadratic in word count; hot paths use with_shingles)."""
    return shingle_expr(words(text), text, k)


def fingerprint_from_shingles(sh: Column) -> Column:
    """Rolling-hash document fingerprint: min md5 over word k-shingles
    (winnowing-style content fingerprint; stable under partitioning)."""
    return F.array_min(F.transform(sh, lambda s: F.md5(s)))


def fingerprint(text: Column, k: int = 4) -> Column:
    return fingerprint_from_shingles(shingles(text, k))


def sql_words(col: str) -> str:
    return f"str_split({col}, ' ')"


def sql_shingles(col: str, k: int = 3) -> str:
    """DuckDB mirror of `shingles` (1-indexed lists)."""
    w = sql_words(col)
    joined = " || ' ' || ".join(f"{w}[i+{j + 1}]" for j in range(k))
    return (
        f"case when len({w}) < {k} then [{col}] "
        f"else list_transform(range(len({w})-{k - 1}), i -> {joined}) end"
    )
