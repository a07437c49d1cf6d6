"""Semantics + plan gates for the corpus-curation query set
(decontaminate / tfidf_top_terms / source_cap / stratified_sample).

Value-exactness vs DuckDB is covered by test_driver_contract; these
tests pin the properties the oracle can't see: plan shape (what makes
each op scale) and the determinism/invariance contracts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import paddleocr_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------- plans

def test_decontaminate_broadcasts_benchmark_side(spark):
    """The eval-set gram table must be the broadcast side: corpus grams
    stream through a map-side hash join, never a corpus-wide shuffle
    join on gram strings."""
    plan = _plan(Q.QUERIES["decontaminate"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_tfidf_no_cartesian_scan(spark):
    """Only the deliberate 1-row-N broadcast cross join may be a
    nested loop; the tf↔df join must be an equi-join."""
    plan = _plan(Q.QUERIES["tfidf_top_terms"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_stratified_sample_is_join_free_codegen(spark):
    """Mixture resampling is pure column arithmetic + one aggregate:
    no join of any kind, no Python evaluation."""
    plan = _plan(Q.QUERIES["stratified_sample"](spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


# --------------------------------------------------------------- semantics

def test_decontaminate_plants_and_finds_overlap(spark):
    """A corpus doc sharing exactly one 5-gram with a benchmark doc is
    flagged with n_shared=1; a disjoint doc is absent."""
    rows = [
        (97, "alpha beta gamma delta epsilon zeta"),          # benchmark (97 % 97 == 0)
        (1, "xx alpha beta gamma delta epsilon yy"),           # shares the 5-gram
        (2, "one two three four five six seven"),              # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    grams = df.filter(F.size(F.split("text", " ")) >= 5).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(F.split("text", " ")) - 5),
                lambda i: F.concat_ws(" ", F.slice(F.split("text", " "), i + 1, 5)),
            )
        ).alias("g"),
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .collect()
    )
    got = {r["doc_id"]: r["n_shared"] for r in hits}
    assert got == {1: 1}


def test_source_cap_caps_and_orders(spark):
    """Never more than 5 docs per source; within a source ranks follow
    (n_chars desc, doc_id asc) exactly."""
    out = Q.QUERIES["source_cap"](spark, SF_DIR).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        assert len(rows) <= 5, src
        rows.sort(key=lambda r: r["rank"])
        keys = [(-r["n_chars"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys), src


def test_stratified_sample_is_resharding_invariant(spark):
    """The kept set is a pure function of (doc_id, lang): identical
    totals whatever the partition layout."""
    base = Q.QUERIES["stratified_sample"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # same computation over an adversarial re-sharding
    import paddleocr_spark.queries_curation as C

    reshard = docs.repartition(17, "lang")
    ref = {tuple(r) for r in base.collect()}

    def over(df):
        from pyspark.sql import functions as FF

        bucket = (
            FF.conv(
                FF.substring(
                    FF.md5(FF.concat(FF.lit("mix:"), FF.col("doc_id").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("bigint")
            % 100
        )
        rate = FF.when(FF.lit(False), FF.lit(0))
        for lang, r in C._MIX_RATES.items():
            rate = rate.when(FF.col("lang") == lang, FF.lit(r))
        keep = (bucket < rate.otherwise(FF.lit(0))).cast("int")
        return (
            df.select("lang", "n_chars", keep.alias("keep"))
            .groupBy("lang")
            .agg(
                FF.count("*").alias("n_total"),
                FF.sum("keep").alias("n_kept"),
                FF.sum(FF.col("keep") * FF.col("n_chars")).alias("chars_kept"),
            )
        )

    assert {tuple(r) for r in over(reshard).collect()} == ref
    # and the mixture actually subsamples: zh keeps all, es keeps fewer
    rates = {r["lang"]: (r["n_kept"], r["n_total"]) for r in base.collect()}
    assert rates["zh"][0] == rates["zh"][1]
    assert rates["es"][0] < rates["es"][1]


def test_tfidf_rank_contract(spark):
    """Exactly ≤3 rows per doc, ranks 1..k dense from 1, scores
    non-increasing with rank."""
    out = Q.QUERIES["tfidf_top_terms"](spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1)), doc
        assert len(rows) <= 3
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True), doc
