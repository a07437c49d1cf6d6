"""The extraction plan: detect -> filter -> CTC-collapse -> assemble.

Two independent Spark realizations of the exact same semantics (both
byte-identical to the pure-Python oracle, core/oracle.py — the pytest
gate asserts all three agree):

- ``extract`` (array mode, the production path): after the stage-1 UDF,
  EVERYTHING is per-row higher-order functions on the blocks array —
  zero shuffles, embarrassingly parallel, the right shape for a
  1000-executor cluster over 10^12 rows. The whole post-UDF plan is one
  whole-stage-codegen projection.

- ``extract_relational`` (cross-check path): explode -> native filters
  -> window (lag/run-id, the reference's adjacency dedup as a window,
  SURVEY.md §2.5 rows-frame note) -> groupBy. Costs shuffles; exists to
  cross-validate the array path and to demonstrate the relational
  formulation of each operator.

Reference semantics sites are cited in core/oracle.py's docstring; the
expression-level parity rules (IEEE double arithmetic on integer inputs,
identical operation order for means) are what make byte-identity hold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from paddleocr_spark.config import DEFAULT, LATIN_RUN_CLASS, PipelineConfig
from paddleocr_spark.operators.detect_stage import with_blocks

_RUN_PATTERN = LATIN_RUN_CLASS + "+|[^a-zA-Z0-9 :*./%+-]"


def score_expr(text_len: Column, link_len: Column, k: int) -> Column:
    """(text_len - link_text_len) / (text_len + k): box_score_fast analog.

    Same operation order as core.oracle.block_score -> bit-identical."""
    return (text_len - link_len).cast("double") / (text_len + float(k))


def rtl_reverse_expr(text: Column) -> Column:
    """pred_reverse (rec_postprocess.py:51-65) as native Spark: split into
    latin-ish runs / single chars, reverse the run list, join."""
    runs = F.regexp_extract_all(text, F.lit(_RUN_PATTERN), F.lit(0))
    return F.array_join(F.reverse(runs), "")


def _flip_cond(lang: Column, cfg: PipelineConfig) -> Column:
    """cls analog: label='180' iff p180 is the argmax; flip iff also
    p180 > cls_thresh (predict_cls.py:119-125)."""
    p180 = F.when(lang == "ar", F.lit(0.95)).otherwise(F.lit(0.05))
    return (p180 > F.lit(0.5)) & (p180 > F.lit(cfg.cls_thresh))


def _merge_runs(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Array mode: dets array -> merged span array (CTC collapse)."""
    dets = F.col("dets")

    starts = F.when(
        F.size(dets) > 0,
        F.filter(
            F.sequence(F.lit(0), F.size(dets) - 1),
            lambda i: (i == F.lit(0))
            | (F.get(dets, i)["text"] != F.get(dets, i - 1)["text"]),
        ),
    ).otherwise(F.array().cast("array<int>"))
    df = df.withColumn("starts", starts)

    starts_c = F.col("starts")

    def span_of(s: Column, j: Column) -> Column:
        nxt = F.when(j + 1 < F.size(starts_c), F.get(starts_c, j + 1)).otherwise(
            F.size(F.col("dets"))
        )
        run_len = nxt - s
        run = F.slice(F.col("dets"), s + 1, run_len)
        first = F.get(F.col("dets"), s)
        return F.struct(
            first["block_id"].alias("block_id"),
            first["start"].alias("start"),
            F.aggregate(run, first["end"], lambda m, x: F.greatest(m, x["end"])).alias(
                "end"
            ),
            (
                F.aggregate(run, F.lit(0.0), lambda a, x: a + x["score"])
                / run_len
            ).alias("score"),
            first["text"].alias("text"),
            first["parent_id"].alias("parent_id"),
        )

    df = df.withColumn("mspans", F.transform(starts_c, span_of))
    # blank drop (ignored_tokens analog) + drop_score filter
    return df.withColumn(
        "mspans",
        F.filter(
            F.col("mspans"),
            lambda x: (x["text"] != "") & (x["score"] >= F.lit(cfg.drop_score)),
        ),
    )


def _assemble(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Shared tail: RTL flip + parent-aware join + output columns.

    Expects columns: url, lang, n_blocks_detected, mspans
    (array<struct<block_id,start,end,score,text,parent_id>> in reading
    order)."""
    flip = _flip_cond(F.col("lang"), cfg)
    flipped = F.when(
        flip,
        F.transform(
            F.col("mspans"),
            lambda x: F.struct(
                x["block_id"].alias("block_id"),
                x["start"].alias("start"),
                x["end"].alias("end"),
                x["score"].alias("score"),
                rtl_reverse_expr(x["text"]).alias("text"),
                x["parent_id"].alias("parent_id"),
            ),
        ),
    ).otherwise(F.col("mspans"))
    df = df.withColumn("fspans", flipped)

    fs = F.col("fspans")
    pieces = F.transform(
        fs,
        lambda x, i: F.when(i == F.lit(0), x["text"])
        .when(
            x["parent_id"] == F.get(fs, i - 1)["parent_id"],
            F.concat(F.lit(" "), x["text"]),
        )
        .otherwise(F.concat(F.lit("\n"), x["text"])),
    )
    return df.select(
        "url",
        F.array_join(pieces, "").alias("extracted_text"),
        F.transform(
            fs,
            lambda x: F.struct(
                x["block_id"].alias("block_id"),
                x["start"].alias("start"),
                x["end"].alias("end"),
                x["score"].alias("score"),
            ),
        ).alias("spans"),
        F.col("n_blocks_detected"),
        F.size(fs).alias("n_blocks_kept"),
    )


def scored_blocks(df: DataFrame, cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """url/lang/html -> url, lang, blocks, scored (array with score).

    score_mode='fast' scores over the block's full subtree counters
    (box_score_fast, db_postprocess.py:189-204); 'slow' over the
    element's OWN text with nested block elements excluded
    (box_score_slow strict membership, db_postprocess.py:206-225). The
    min-size filter always uses the raw text_len, like the reference's
    side<=3 drop which is score-mode-independent."""
    slow = cfg.score_mode == "slow"
    df = with_blocks(df.select("url", "lang", "html"), cfg)
    scored = F.transform(
        F.col("blocks"),
        lambda x: F.struct(
            x["block_id"].alias("block_id"),
            x["start"].alias("start"),
            x["end"].alias("end"),
            x["text"].alias("text"),
            x["parent_id"].alias("parent_id"),
            x["text_len"].alias("text_len"),
            score_expr(
                x["own_text_len"] if slow else x["text_len"],
                x["own_link_len"] if slow else x["link_text_len"],
                cfg.score_k,
            ).alias("score"),
        ),
    )
    return df.withColumn("scored", scored)


def _dets_col(cfg: PipelineConfig) -> Column:
    """Detection filters: segmentation predicate (> det_thresh), box
    threshold (>= det_box_thresh), min size (> min_text_len), then the
    max_candidates cap in document order (db_postprocess.py:126)."""
    kept = F.filter(
        F.col("scored"),
        lambda x: (x["score"] > F.lit(cfg.det_thresh))
        & (x["score"] >= F.lit(cfg.det_box_thresh))
        & (x["text_len"] > F.lit(cfg.min_text_len)),
    )
    return F.slice(kept, 1, cfg.max_candidates)


def extract(df: DataFrame, cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """Production path: zero-shuffle, per-row higher-order functions."""
    d = scored_blocks(df, cfg)
    d = d.withColumn("n_blocks_detected", F.size("blocks"))
    d = d.withColumn("dets", _dets_col(cfg))
    d = _merge_runs(d, cfg)
    return _assemble(d, cfg)


FUSED_SCHEMA = (
    "url string, extracted_text string, "
    "spans array<struct<block_id:int,start:int,end:int,score:double>>, "
    "n_blocks_detected int, n_blocks_kept int"
)


def extract_fused(df: DataFrame, cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """Throughput path: the whole per-page pipeline fused into ONE
    Arrow-batched mapInPandas stage (core.oracle.extract_page — the same
    pure function the pytest golden gate certifies byte-identical to the
    array plan), emitting final columns directly.

    This is the reference's own execution shape — the entire
    detect→cls→rec pipeline runs per-image inside one process
    (tools/infer/predict_system.py:76-158) — re-expressed as a single
    vectorized UDF stage. vs `extract` (array mode) it trades the
    composable blocks column for throughput: the Arrow boundary carries
    final text + spans instead of every candidate block struct
    (~3-5x less transfer), and the post-UDF interpreted higher-order
    expressions (which measure ~1ms CPU/doc — 4x the tokenizer itself)
    disappear. Measured: 23.7k vs 16.3k docs/sec on 32 cores at sf0.1,
    and far flatter degradation under host contention (the work sits in
    the Python worker pool, not 32 JVM threads of HOF eval).

    Use `extract` when downstream stages consume the blocks/scored
    arrays relationally in the same job; use this when the job's output
    IS the extraction (the 100 TB corpus pass). Both are byte-identical
    per url (test_extract_e2e gate)."""
    from paddleocr_spark.core.oracle import extract_page

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                extract_page(u, bytes(h), l, cfg)
                for u, h, l in zip(pdf["url"], pdf["html"], pdf["lang"])
            ]
            yield pd.DataFrame(
                {
                    "url": [r.url for r in rows],
                    "extracted_text": [r.extracted_text for r in rows],
                    "spans": [
                        [
                            (s["block_id"], s["start"], s["end"], s["score"])
                            for s in r.spans
                        ]
                        for r in rows
                    ],
                    "n_blocks_detected": [r.n_blocks_detected for r in rows],
                    "n_blocks_kept": [r.n_blocks_kept for r in rows],
                }
            )

    cols = df.select("url", "html", "lang")
    if cfg.sort_by_len:
        cols = cols.sortWithinPartitions(F.length("html"))
    return cols.mapInPandas(run, FUSED_SCHEMA)


def extract_relational(df: DataFrame, cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """Cross-check path: explode -> filter -> window -> groupBy.

    PRECONDITION: url is unique in ``df``. The windows and the final
    rollup key on url, so duplicate input urls would interleave both
    rows' blocks into one span stream and fan the merged result onto
    every base row — unlike the array/fused paths, which process rows
    independently. The production pipeline guarantees uniqueness (the
    warehouse upsert / latest_crawl rule); apply ``latest_crawl``
    first when feeding raw multi-capture crawls."""
    d = scored_blocks(df, cfg)
    base = d.select("url", "lang", F.size("blocks").alias("n_blocks_detected"))

    e = d.select("url", F.explode("scored").alias("b")).select("url", "b.*")
    e = e.filter(
        (F.col("score") > F.lit(cfg.det_thresh))
        & (F.col("score") >= F.lit(cfg.det_box_thresh))
        & (F.col("text_len") > F.lit(cfg.min_text_len))
    )
    w = Window.partitionBy("url").orderBy("block_id")
    e = e.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= cfg.max_candidates
    )
    prev_text = F.lag("text").over(w)
    e = e.withColumn(
        "new_run",
        (prev_text.isNull() | (prev_text != F.col("text"))).cast("int"),
    )
    e = e.withColumn(
        "span_id",
        F.sum("new_run").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )

    g = e.groupBy("url", "span_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct("block_id", "start", "end", "score", "text", "parent_id")
            )
        ).alias("run")
    )
    run = F.col("run")
    first = F.get(run, 0)
    g = g.select(
        "url",
        F.struct(
            first["block_id"].alias("block_id"),
            first["start"].alias("start"),
            F.aggregate(run, first["end"], lambda m, x: F.greatest(m, x["end"])).alias(
                "end"
            ),
            (
                F.aggregate(run, F.lit(0.0), lambda a, x: a + x["score"]) / F.size(run)
            ).alias("score"),
            first["text"].alias("text"),
            first["parent_id"].alias("parent_id"),
        ).alias("span"),
    )
    g = g.filter(
        (F.col("span")["text"] != "") & (F.col("span")["score"] >= F.lit(cfg.drop_score))
    )
    per_url = g.groupBy("url").agg(
        F.sort_array(F.collect_list("span")).alias("mspans")
    )

    joined = base.join(per_url, "url", "left").withColumn(
        "mspans",
        F.coalesce(
            F.col("mspans"),
            F.array().cast(
                "array<struct<block_id:int,start:int,end:int,score:double,"
                "text:string,parent_id:int>>"
            ),
        ),
    )
    return _assemble(joined, cfg)
