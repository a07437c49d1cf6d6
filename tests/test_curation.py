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


def test_dup_ngram_spans_plants_full_and_zero_coverage(spark):
    """Three identical 10-token docs: every 5-gram occurs 3× corpus-wide
    (meets the ≥3 gate), so the interval union must cover every token
    (dup_frac=1.0). A doc sharing nothing is absent from the output."""
    from paddleocr_spark.queries_curation import dup_ngram_spans_over

    dup = "a b c d e f g h i j"
    rows = [(1, dup), (2, dup), (3, dup), (4, "q r s t u v w x y z")]
    out = dup_ngram_spans_over(
        spark.createDataFrame(rows, "doc_id bigint, text string")
    ).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"]) for r in out}
    assert got == {1: (10, 10, 1.0), 2: (10, 10, 1.0), 3: (10, 10, 1.0)}


def test_dup_ngram_spans_merges_overlapping_intervals(spark):
    """Two hits at pos 0 and pos 2 (window 5) cover tokens [0,7) = 7,
    not 10: the running-max merge must not double-count the overlap.
    Planted: 3 docs share the first 7 tokens (two overlapping frequent
    5-grams each: pos 0–2), differing tails keep the rest unique."""
    from paddleocr_spark.queries_curation import dup_ngram_spans_over

    head = "a b c d e f g"
    rows = [(i, f"{head} t{i} u{i} v{i}") for i in (1, 2, 3)]
    out = dup_ngram_spans_over(
        spark.createDataFrame(rows, "doc_id bigint, text string")
    ).collect()
    assert {(r["n_tokens"], r["dup_tokens"]) for r in out} == {(10, 7)}


def test_dup_ngram_spans_broadcast_mode_matches_window_mode(spark):
    """The Zipf-head-safe broadcast variant is value-identical to the
    window-count form on the real table, and its plan has NO window
    over the gram hash (the skew-killer) — the frequent set arrives
    via a broadcast join instead."""
    from paddleocr_spark.queries_curation import dup_ngram_spans_over

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = dup_ngram_spans_over(docs, frequent_grams_via="window")
    b = dup_ngram_spans_over(docs, frequent_grams_via="broadcast")
    assert w.exceptAll(b).count() == 0 and b.exceptAll(w).count() == 0
    plan = _plan(b)
    assert "BroadcastHashJoin" in plan, plan
    # the only Window left is the per-doc interval merge (partition by
    # doc_id); no window partitions on the gram hash h
    import re

    for m in re.finditer(r"windowspecdefinition\(([^,]+),", plan):
        assert "doc_id" in m.group(1), plan


def test_dup_ngram_spans_hybrid_mode_matches_and_splits(spark):
    """The 100 TB shape: head (count >= H) broadcasts, torso
    (3 <= count < H) shuffle-joins with skew bounded by H. Value-
    identical to the window mode at every split point, including the
    degenerate ones (everything head / everything torso), and the
    plan carries both a broadcast join and a window-free gram path."""
    from paddleocr_spark.queries_curation import dup_ngram_spans_over

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = dup_ngram_spans_over(docs, frequent_grams_via="window")
    for h_min in (3, 4, 100_000):  # all-head, split, all-torso
        hy = dup_ngram_spans_over(
            docs, frequent_grams_via="hybrid", head_min_count=h_min
        )
        assert w.exceptAll(hy).count() == 0 and hy.exceptAll(w).count() == 0, h_min
    plan = _plan(
        dup_ngram_spans_over(docs, frequent_grams_via="hybrid", head_min_count=4)
    )
    assert "BroadcastHashJoin" in plan, plan
    import re

    for m in re.finditer(r"windowspecdefinition\(([^,]+),", plan):
        assert "doc_id" in m.group(1), plan


def test_block_dedup_keeps_each_block_exactly_once(spark):
    """Corpus-wide, sum(n_kept) equals the number of DISTINCT blocks;
    a doc that is a copy of an earlier one keeps zero blocks."""
    from paddleocr_spark.queries_curation import block_dedup_over

    text40 = " ".join(f"w{i}" for i in range(40))  # 2 full 20-token blocks
    rows = [(1, text40), (2, text40), (3, " ".join(f"x{i}" for i in range(25)))]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: (r["n_blocks"], r["n_kept"]) for r in block_dedup_over(df).collect()}
    assert out == {1: (2, 2), 2: (2, 0), 3: (2, 2)}

    # invariant on the real table: every distinct block kept exactly once
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    agg = block_dedup_over(docs).agg(F.sum("n_kept").alias("kept")).collect()[0]
    n_distinct = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, cast(ceil(size(split(text, ' ')) / 20.0) as int) - 1),"
                    " i -> array_join(slice(split(text, ' '), i * 20 + 1, 20), ' '))"
                )
            ).alias("b")
        )
        .select("b")
        .distinct()
        .count()
    )
    assert agg["kept"] == n_distinct


def test_seq_packing_streams_are_contiguous(spark):
    """Within every stream, doc placements tile the token axis with no
    gaps or overlaps: next start == prev start + prev n_tokens, first
    starts at 0, and chunk ids are consistent with the offsets."""
    out = Q.QUERIES["seq_packing"](spark, SF_DIR).collect()
    by_stream: dict[int, list] = {}
    for r in out:
        by_stream.setdefault(r["stream"], []).append(r)
    assert len(by_stream) == 8
    for stream, rows in by_stream.items():
        rows.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in rows:
            assert r["start_tok"] == expect, (stream, r)
            assert r["first_chunk"] == r["start_tok"] // 2048
            last_chunk = (r["start_tok"] + r["n_tokens"] - 1) // 2048
            assert r["n_chunks"] == last_chunk - r["first_chunk"] + 1
            expect += r["n_tokens"]


def test_new_curation_ops_are_join_free(spark):
    """dup_ngram_spans (window-count form), block_dedup, and
    seq_packing must contain no join operator and no Python stage."""
    for name in ("dup_ngram_spans", "block_dedup", "seq_packing"):
        plan = _plan(Q.QUERIES[name](spark, SF_DIR))
        assert "Join" not in plan, (name, plan)
        assert "Python" not in plan, (name, plan)


def test_url_filter_broadcasts_blocklist_and_stays_native(spark):
    """The host blocklist must be the broadcast build side (real
    blocklists are always broadcastable) and every gating rule must be
    a native expression — no shuffle join on hosts, no Python stage."""
    plan = _plan(Q.QUERIES["url_filter"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan, plan


def test_quality_linear_broadcasts_model_weights(spark):
    """Model inference = broadcast weight-table join + codegen
    arithmetic: the token stream must never shuffle on the feature
    bucket, and the forward pass has no Python stage."""
    plan = _plan(Q.QUERIES["quality_linear"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Python" not in plan, plan


def test_url_filter_gate_semantics(spark):
    """Blocked hosts always lose with reason=blocked_host; kept==1 iff
    reason=='ok'; every doc appears exactly once."""
    rows = Q.QUERIES["url_filter"](spark, SF_DIR).collect()
    n_docs = Q.QUERIES["url_filter"](spark, SF_DIR).select("doc_id").distinct().count()
    assert len(rows) == n_docs
    for r in rows:
        if r["host"] in ("src1.example.com", "src4.example.com"):
            assert r["reason"] == "blocked_host", r
        assert (r["kept"] == 1) == (r["reason"] == "ok"), r


def test_quality_linear_kept_matches_sign(spark):
    """kept is exactly the sign gate on the exact integer weight sum,
    and quality crosses 0.5 together with it."""
    for r in Q.QUERIES["quality_linear"](spark, SF_DIR).collect():
        assert (r["kept"] == 1) == (r["sum_w100"] >= 0), r
        if r["sum_w100"] > 0:
            assert r["quality"] > 0.5, r
        elif r["sum_w100"] < 0:
            assert r["quality"] < 0.5, r


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


def test_line_dedup_rewrite_drops_boilerplate_everywhere(spark):
    """RefinedWeb exact line dedup: a segment repeated >= min_count
    times corpus-wide is dropped from EVERY doc (no first-occurrence
    winner), and the rebuilt text preserves original segment order."""
    import hashlib

    from paddleocr_spark.queries_curation import line_dedup_rewrite_over

    boiler = " ".join(f"b{i}" for i in range(8))
    uniq = {d: " ".join(f"u{d}_{i}" for i in range(8)) for d in (1, 2, 3)}
    # boilerplate sits FIRST in doc 1, LAST in docs 2/3: order must survive
    rows = [
        (1, boiler + " " + uniq[1]),
        (2, uniq[2] + " " + boiler),
        (3, uniq[3] + " " + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in line_dedup_rewrite_over(df).collect()}
    for d in (1, 2, 3):
        assert (got[d]["n_lines"], got[d]["n_kept"]) == (2, 1)
        assert got[d]["new_md5"] == hashlib.md5(uniq[d].encode()).hexdigest()

    # below the threshold nothing is dropped and the rebuild is identity
    got4 = {r["doc_id"]: r for r in line_dedup_rewrite_over(df, min_count=4).collect()}
    assert all(got4[d]["n_kept"] == 2 for d in (1, 2, 3))
    assert got4[1]["new_md5"] == hashlib.md5(rows[0][1].encode()).hexdigest()


def test_line_dedup_rewrite_plan_shape(spark):
    """Two hash-keyed exchanges only (xxhash64(segment) for the
    frequency count, doc_id for the rebuild): no single-partition
    window, no Python, no join."""
    from paddleocr_spark.queries_curation import line_dedup_rewrite_over

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(line_dedup_rewrite_over(docs))
    assert "SinglePartition" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") >= 2


def test_gopher_rules_gate_semantics(spark):
    """Each Gopher rule flips the gate independently: a doc inside
    every bound passes; too-short, stopword-free, and short-word-heavy
    docs each fail on exactly the intended signal."""
    from paddleocr_spark.queries_curation import gopher_rules_over

    good = "the a " + " ".join(f"word{i:02d}" for i in range(28))  # 30 words
    short = "the a word one two"                                   # 5 words
    nostop = " ".join(f"word{i:02d}" for i in range(30))           # no the/a
    shorty = "the a " + " ".join("ab" for _ in range(28))          # 28/30 short
    rows = [(1, good), (2, short), (3, nostop), (4, shorty)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in gopher_rules_over(df).collect()}

    assert got[1]["pass_gopher"] == 1
    assert got[1]["n_words"] == 30 and got[1]["stop_hits"] == 2
    assert got[2]["pass_gopher"] == 0 and got[2]["n_words"] == 5
    assert got[3]["pass_gopher"] == 0 and got[3]["stop_hits"] == 0
    assert got[4]["pass_gopher"] == 0 and got[4]["frac_short"] > 0.3
    # mean word length is the O(1) arithmetic identity, not a re-scan:
    # 30 words, 3 + 1 + 28*6 chars (round(...,6) in the query)
    assert abs(got[1]["mean_word_len"] - round((3 + 1 + 28 * 6) / 30, 6)) < 1e-9


def test_gopher_rules_plan_is_shuffle_free(spark):
    """The whole gate is one codegen projection: zero exchanges, zero
    joins, zero Python — the property that makes it the first pass."""
    from paddleocr_spark.queries_curation import gopher_rules_over

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(gopher_rules_over(docs))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_c4_line_clean_semantics(spark):
    """Kept lines = (derived terminal punctuation) AND >= 5 words; the
    rebuild preserves original order; docs below min_lines fail the
    doc gate. Expectations computed independently from the same md5
    derivation the query uses."""
    import hashlib

    from paddleocr_spark.queries_curation import c4_line_clean_over

    def punct(doc_id: int, idx: int) -> bool:
        h = hashlib.md5(f"c4:{doc_id}:{idx}".encode()).hexdigest()
        return int(h[:4], 16) % 10 < 7

    # doc 1: five 8-word lines + a 3-word tail (tail fails the >=5 rule)
    lines1 = [" ".join(f"w{j}_{i}" for i in range(8)) for j in range(5)]
    tail = "t0 t1 t2"
    text1 = " ".join(lines1) + " " + tail
    # doc 2: one 8-word line -- can never reach min_lines=3
    text2 = " ".join(f"x{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, text1), (2, text2)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in c4_line_clean_over(df).collect()}

    exp_kept = [lines1[j] for j in range(5) if punct(1, j)]
    assert got[1]["n_lines"] == 6
    assert got[1]["n_kept"] == len(exp_kept)
    assert got[1]["new_md5"] == hashlib.md5(" ".join(exp_kept).encode()).hexdigest()
    assert got[1]["doc_pass"] == int(len(exp_kept) >= 3)
    assert got[2]["n_kept"] <= 1 and got[2]["doc_pass"] == 0


def test_c4_line_clean_plan_shape(spark):
    """Every C4 rule is local: exactly the one rebuild exchange on
    doc_id, no join, no corpus-wide window, no Python."""
    from paddleocr_spark.queries_curation import c4_line_clean_over

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(c4_line_clean_over(docs))
    assert "SinglePartition" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_decontaminate_bloom_exact_parity(spark):
    """The bloom-prefiltered path is value-identical to the exact path:
    phase 2's exact verify kills every bloom false positive, so both
    queries share one oracle."""
    exact = {
        (r["doc_id"], r["n_shared"])
        for r in Q.QUERIES["decontaminate"](spark, SF_DIR).collect()
    }
    bloom = {
        (r["doc_id"], r["n_shared"])
        for r in Q.QUERIES["decontaminate_bloom"](spark, SF_DIR).collect()
    }
    assert exact == bloom and len(exact) > 0


def test_decontaminate_bloom_plan_all_probes_broadcast(spark):
    """Each of the k bloom probes is a broadcast left-semi hash join and
    the exact verify is a broadcast join: corpus grams pass the whole
    prefilter map-side — no shuffle of the corpus gram stream."""
    from paddleocr_spark.queries_curation import BLOOM_K

    plan = _plan(Q.QUERIES["decontaminate_bloom"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= BLOOM_K + 1, plan
    assert plan.count("LeftSemi") >= BLOOM_K, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_gopher_line_rules_semantics_md5_independent(spark):
    """Bullet/ellipsis counts recomputed independently from the same
    md5 derivation; the >90%-bullet and >30%-ellipsis docs fail, a
    quiet doc passes, and thresholds are exact integer cross-products."""
    import hashlib

    from paddleocr_spark.queries_curation import gopher_line_rules_over

    def n_flag(doc_id, n_lines, tag, m):
        hit = 0
        for i in range(n_lines):
            h = hashlib.md5(f"{tag}:{doc_id}:{i}".encode()).hexdigest()
            if int(h[:4], 16) % 10 < doc_id % m:
                hit += 1
        return hit

    text = " ".join(f"w{i}" for i in range(32))  # 4 lines of 8 words
    # doc 21: 21%11=10 -> every line a bullet (fails rule 1)
    # doc 11: 11%11=0 and 11%7=4 -> no bullets, ~40% ellipses
    # doc 22: 22%11=0, 22%7=1 -> quiet doc
    df = spark.createDataFrame(
        [(21, text), (11, text), (22, text)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_line_rules_over(df).collect()}
    for doc in (21, 11, 22):
        assert got[doc]["n_lines"] == 4
        assert got[doc]["n_bullet"] == n_flag(doc, 4, "glb", 11)
        assert got[doc]["n_ellipsis"] == n_flag(doc, 4, "gle", 7)
        want_pass = int(
            not (10 * got[doc]["n_bullet"] > 9 * 4)
            and not (10 * got[doc]["n_ellipsis"] > 3 * 4)
        )
        assert got[doc]["pass_lines"] == want_pass
    assert got[21]["n_bullet"] == 4 and got[21]["pass_lines"] == 0
    assert got[22]["pass_lines"] == 1


def test_gopher_line_rules_plan_no_explode_no_shuffle(spark):
    """Lines are never exploded: the whole line gate is one codegen
    projection — zero exchanges, joins, generators, or Python."""
    from paddleocr_spark.queries_curation import gopher_line_rules_over

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(gopher_line_rules_over(docs))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_bm25_matches_pure_python_twin(spark):
    """Spark BM25 equals an independent pure-Python implementation
    bit-for-bit (before rounding: compare at the rounded-6 output) on
    a tiny corpus, including dl normalization and the Lucene idf."""
    import math

    from paddleocr_spark.queries_curation import BM25_QUERIES, bm25_topk_over

    texts = {
        1: "table scan table join",
        2: "join merge join join",
        3: "window sort stream window",
        4: "scan scan scan scan scan",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    got = {(r["qid"], r["doc_id"]): r for r in bm25_topk_over(df).collect()}

    tok = {i: t.split(" ") for i, t in texts.items()}
    n, avgdl = len(tok), sum(len(w) for w in tok.values()) / float(len(tok))
    dfreq = {}
    for ws in tok.values():
        for t in set(ws):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for qid, term in BM25_QUERIES:
        for i, ws in tok.items():
            tf = ws.count(term)
            if not tf:
                continue
            idf = math.log((n - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
            s = idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl)))
            want[(qid, i)] = want.get((qid, i), 0.0) + s
    assert set(got) == set(want)
    for key, r in got.items():
        assert r["score"] == round(want[key], 6), (key, r["score"], want[key])
    # ranking order == python-twin score order (doc 1 matches both
    # qid-0 terms, so it outranks the scan-only doc 4)
    for qid in {q for q, _ in BM25_QUERIES}:
        by_rank = sorted(
            (k for k in got if k[0] == qid), key=lambda k: got[k]["rank"]
        )
        by_want = sorted(
            (k for k in want if k[0] == qid), key=lambda k: (-want[k], k[1])
        )
        assert by_rank == by_want


def test_bm25_plan_broadcasts_queries_no_python(spark):
    """The O(queries) term list broadcasts onto the tf stream; no
    Python anywhere; the stats total rides a 1-row broadcast (no
    driver count)."""
    plan = _plan(Q.QUERIES["bm25_topk"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats cross join


def test_shard_assign_two_level_prefix_equals_serial_and_bounds_bins(spark):
    """The two-level distributed prefix sum equals the serial global
    cumsum (partitioning-invariant), and shards respect the bin
    boundary: each shard's tokens fit target + one straddling doc."""
    from paddleocr_spark.queries_curation import shard_assign_over

    rows = [(i * 3 + (i % 7), 1 + (i * 13) % 40) for i in range(500)]
    df = spark.createDataFrame(
        [(d, "w " * (t - 1) + "w") for d, t in rows],
        "doc_id bigint, text string",
    )
    target = 256
    for parts in (1, 7):
        got = {
            r["doc_id"]: r.asDict()
            for r in shard_assign_over(df.repartition(parts), target).collect()
        }
        cum = 0
        for d, t in sorted(rows):
            assert got[d]["tok_start"] == cum, (d, got[d], cum)
            assert got[d]["shard"] == cum // target
            cum += t
    # bin property: a shard never holds more than target + max_doc
    per_shard = {}
    for d, t in rows:
        per_shard[got[d]["shard"]] = per_shard.get(got[d]["shard"], 0) + t
    assert max(per_shard.values()) <= target + max(t for _, t in rows)


def test_shard_assign_plan_no_global_window_no_python(spark):
    """No corpus-wide single-partition window: every window is keyed
    (bucket / super-bucket); the doc stream shuffles on the bucket
    key, never unpartitioned."""
    from paddleocr_spark.queries_curation import shard_assign_over

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(shard_assign_over(docs))
    assert "EvalPython" not in plan
    # the doc-level window is partitioned by bucket — the corpus never
    # funnels through SinglePartition for its window
    import re as _re
    for m in _re.finditer(r"Window .*", plan):
        line = m.group(0)
        if "doc_id" in line and "bucket" not in line:
            raise AssertionError(f"unkeyed corpus window: {line}")


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus whose term frequencies follow f(r) = C / r exactly has
    OLS slope -1 on the log-log head; the query recovers it (within
    integer-rounding jitter of the planted counts)."""
    from paddleocr_spark.queries_curation import zipf_fit_over

    rows, did = [], 0
    for r in range(1, 41):
        term, n = f"t{r:02d}", max(1, 400 // r)
        for _ in range(n):
            rows.append((did, term)); did += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = zipf_fit_over(df, k=40).collect()[0]
    assert out["n_terms"] == 40
    assert -1.05 < out["zipf_slope"] < -0.93, out["zipf_slope"]


def test_dedup_agreement_verifies_candidates_by_family(spark):
    """The verifier separates the families on this corpus: pairs both
    families agree on are all true near-dups, MinHash-only candidates
    are mostly verified, and the SimHash radius's extra candidates are
    noise (max exact Jaccard far below the bar) — exactly the tuning
    signal the audit exists to surface."""
    import paddleocr_spark.queries as Q

    out = {r["found_by"]: r.asDict()
           for r in Q.QUERIES["dedup_agreement"](spark, SF_DIR).collect()}
    assert out["both"]["n_verified"] == out["both"]["n_pairs"] > 0
    assert out["minhash_only"]["n_verified"] > 0
    assert out["simhash_only"]["max_jaccard"] < 0.5
    # the audit's reason to exist: the families genuinely disagree on
    # part of the candidate space
    assert set(out) == {"both", "minhash_only", "simhash_only"}
    # per-label cap: labels under it stay exact, overflow is sampled
    from paddleocr_spark.queries_curation import DEDUP_AGREEMENT_MAX_VERIFY

    assert all(
        r["n_sampled"] == min(r["n_pairs"], DEDUP_AGREEMENT_MAX_VERIFY)
        for r in out.values()
    )


def test_dedup_agreement_verify_cap_bounds_sample(spark):
    """With max_verify smaller than a label's candidate volume, n_pairs
    stays the exact per-label census while the verify sample is bounded
    by the PER-LABEL cap — overflow counted, never verified (r4 verdict
    item 4); labels under the cap stay fully verified."""
    from paddleocr_spark.queries_curation import dedup_agreement_over

    full = {r["found_by"]: r.asDict()
            for r in dedup_agreement_over(spark, SF_DIR).collect()}
    cap = 5
    capped = {r["found_by"]: r.asDict()
              for r in dedup_agreement_over(
                  spark, SF_DIR, max_verify=cap).collect()}
    assert set(capped) == set(full)
    for k in full:
        assert capped[k]["n_pairs"] == full[k]["n_pairs"]
        assert capped[k]["n_sampled"] == min(cap, full[k]["n_pairs"])
        assert capped[k]["n_verified"] <= capped[k]["n_sampled"]
    # at least one label genuinely overflows the cap on this corpus
    assert any(r["n_pairs"] > cap for r in full.values())


def test_embed_outliers_flags_planted_outlier(spark):
    """A vector far from its label's tight cluster exceeds the 1.5x
    mean-distance bar and is counted; a clean label reports zero."""
    import numpy as np

    from paddleocr_spark.queries_curation import embed_outliers_over

    rng = np.random.RandomState(7)
    rows = []
    for i in range(20):  # tight cluster around 1.0
        rows.append((i, 0, (1.0 + 0.01 * rng.randn(64)).tolist()))
    rows.append((99, 0, (np.full(64, 5.0)).tolist()))  # planted outlier
    for i in range(20):  # clean label
        rows.append((200 + i, 1, (2.0 + 0.01 * rng.randn(64)).tolist()))
    df = spark.createDataFrame(rows, "vec_id bigint, label int, embedding array<float>")
    got = {r["label"]: r.asDict() for r in embed_outliers_over(df).collect()}
    assert got[0]["n"] == 21 and got[0]["n_outliers"] == 1
    assert got[1]["n_outliers"] == 0
    assert got[0]["max_dist"] > 10 * got[1]["max_dist"]
