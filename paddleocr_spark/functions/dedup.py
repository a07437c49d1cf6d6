"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The corpus-scale generalization of the reference's suppression/dedup
family (SURVEY.md §2.7: `visited`-set merge dedup utility.py:768-783,
`duplicate_idx` containment dedup picodet_postprocess.py:272-296) —
re-expressed as the standard web-corpus near-dup stack.

Scale design (the part that matters at 10^12 rows):
- exact dedup = hash-groupBy: one shuffle on a 32-char key, partial
  aggregation map-side; never shuffles document bodies, only (hash, id).
- MinHash signatures are per-row column expressions (no shuffle); the
  LSH band join shuffles only (band_id, band_hash, doc_id) triples and
  joins within band buckets — the classic shingle→minhash→band→bucket
  join, O(candidate pairs) not O(n²).
- SimHash is a per-row 16-bit signature via explode + groupBy(doc_id):
  one shuffle of (doc_id, word) pairs; near-dup lookup is then a cheap
  band/bit-prefix join (not materialized here).
- n-gram Jaccard is the exact verifier run only on candidate pairs.

All expressions are engine-portable (md5 hex, integer arithmetic) so a
DuckDB oracle reproduces them bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paddleocr_spark.functions.textstats import shingles, sql_shingles

N_MINHASH = 8          # signature length
LSH_BANDS = 4          # bands of N_MINHASH / LSH_BANDS rows each
SIMHASH_BITS = 16      # one md5 hex digit's parity per bit


def content_hash(text: Column) -> Column:
    """Exact-dedup key."""
    return F.md5(text)


def minhash_from_shingles(sh: Column, seed: int) -> Column:
    """One MinHash value: min over word-k-shingles of md5('{seed}|'+s).

    md5 hex strings compare lexicographically the same in every engine,
    so `min` needs no int conversion.
    """
    return F.array_min(
        F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    )


def minhash_sig(text: Column, seed: int, k: int = 3) -> Column:
    return minhash_from_shingles(shingles(text, k), seed)


def with_minhash(df: DataFrame, text_col: str = "text", n: int = N_MINHASH) -> DataFrame:
    """Append sig0..sig{n-1}. The shingle array is bound to a column
    once (O(words) per row) and every signature reads it."""
    from paddleocr_spark.functions.textstats import with_shingles

    df = with_shingles(df, text_col, 3, "__sh")
    df = df.select(
        "*",
        *[
            minhash_from_shingles(F.col("__sh"), i).alias(f"sig{i}")
            for i in range(n)
        ],
    )
    return df.drop("__sh")


def band_hashes(n: int = N_MINHASH, bands: int = LSH_BANDS) -> list[Column]:
    """Band keys: md5 of the concatenated signature rows in each band."""
    rows_per = n // bands
    out = []
    for b in range(bands):
        cols = [F.col(f"sig{b * rows_per + r}") for r in range(rows_per)]
        out.append(F.md5(F.concat_ws("|", *cols)))
    return out


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """shingle → minhash → band → bucket-join: distinct candidate pairs
    (a < b) whose signatures collide in at least one band."""
    sigs = with_minhash(df.select(id_col, text_col), text_col)
    bands = band_hashes()
    banded = sigs.select(
        id_col,
        F.posexplode(F.array(*bands)).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band_id") == F.col(f"b.band_id"))
            & (F.col(f"a.band_hash") == F.col(f"b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash16(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash over distinct words.

    Bit j of a word = parity of hex digit j of md5(word); the document
    bit is the sign of sum(±1) over its distinct words. One shuffle of
    (id, word) pairs; partial aggregation does the heavy lifting.
    """
    w = df.select(
        id_col, F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("word")
    ).filter(F.col("word") != "")
    contribs = [
        (
            F.conv(F.substring(F.md5("word"), j + 1, 1), 16, 10).cast("int") % 2 * 2 - 1
        ).alias(f"c{j}")
        for j in range(SIMHASH_BITS)
    ]
    w = w.select(id_col, *contribs)
    aggs = [F.sum(f"c{j}").alias(f"s{j}") for j in range(SIMHASH_BITS)]
    g = w.groupBy(id_col).agg(*aggs)
    bits = [
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(SIMHASH_BITS)
    ]
    acc = bits[0]
    for bexp in bits[1:]:
        acc = acc + bexp
    return g.select(id_col, acc.cast("bigint").alias("simhash"))


def jaccard_from_shingles(sa: Column, sb: Column) -> Column:
    """Exact Jaccard over two distinct-shingle array columns."""
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return inter / union


def jaccard_ngram(text_a: Column, text_b: Column, k: int = 3) -> Column:
    """Exact word-k-gram Jaccard similarity (the LSH verifier).
    Inline-expression form; hot paths bind shingle columns first."""
    return jaccard_from_shingles(
        F.array_distinct(shingles(text_a, k)), F.array_distinct(shingles(text_b, k))
    )


# ---------------------------------------------------------------- SQL mirrors

def sql_minhash_sig(col: str, seed: int, k: int = 3) -> str:
    return (
        f"list_min(list_transform({sql_shingles(col, k)}, s -> md5('{seed}|' || s)))"
    )


def sql_simhash16(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    contribs = ", ".join(
        f"sum(('0x' || substr(md5(word), {j + 1}, 1))::int % 2 * 2 - 1) s{j}"
        for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(case when s{j} > 0 then {1 << j} else 0 end)" for j in range(SIMHASH_BITS)
    )
    return f"""
        with wx as (
          select {id_col}, unnest(list_distinct(str_split({text_col}, ' '))) word
          from {table}
        ), s as (
          select {id_col}, {contribs} from wx where word <> '' group by {id_col}
        )
        select {id_col}, cast({bits} as bigint) simhash from s
    """
