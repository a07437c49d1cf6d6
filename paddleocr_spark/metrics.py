"""Evaluation metrics as distributed aggregations.

Re-expresses the reference's metric classes (SURVEY.md §2.4) as Spark
aggregations over joined (prediction, golden) tables — the streaming
accumulator pattern (`self.correct_num += ...`, ppocr/metrics/
rec_metric.py:54-56) becomes Spark's partial+final aggregation for free:

- RecMetric (rec_metric.py:38-60): corpus exact-match accuracy and
  1 - normalized Levenshtein (normalized by max(len(pred), len(gold));
  both-empty counts as distance 0).
- DetMetric (det_metric.py:24-71): span-level precision/recall/F1 via an
  overlap join — here over [start,end) char intervals instead of IoU'd
  polygons.

At scale these join on url (co-partitioned equi-join) and reduce to a
handful of doubles — no driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rec_metric(pred: DataFrame, gold: DataFrame, key: str = "url",
               pred_col: str = "extracted_text", gold_col: str = "golden_text") -> DataFrame:
    """Exact-match accuracy + mean (1 - normalized edit distance).

    Scored over EVERY golden sample (the reference accumulates across
    the whole eval set): a document the pipeline dropped, or one whose
    prediction is NULL, scores as an empty prediction — an inner join
    would silently exclude exactly the failures from the averages
    (lose 999 of 1000 docs and still report exact_acc 1.0)."""
    j = gold.select(key, gold_col).join(pred.select(key, pred_col), key, "left")
    pc = F.coalesce(F.col(pred_col), F.lit(""))
    lev = F.levenshtein(pc, F.col(gold_col)).cast("double")
    mx = F.greatest(F.length(pc), F.length(gold_col)).cast("double")
    norm = F.when(mx == 0, F.lit(0.0)).otherwise(lev / mx)
    return j.agg(
        F.avg((pc == F.col(gold_col)).cast("double")).alias("exact_acc"),
        F.avg(F.lit(1.0) - norm).alias("norm_edit_sim"),
        F.count("*").alias("n_docs"),
    )


def det_metric(pred_spans: DataFrame, gold_spans: DataFrame, key: str = "url",
               min_overlap: float = 0.5, bucket_width: int = 1000) -> DataFrame:
    """Span-level P/R/F1: a predicted [start,end) matches a golden span
    when intersection / union >= min_overlap (IoU-matched hmean analog,
    det_metric.py:24-71). Expects (key, start, end) on both sides.

    Fully lazy, single logical plan, ONE action when the caller
    collects (round 1 ran three separate count() jobs). The overlap
    join is banded: each span explodes to the `bucket_width`-char
    buckets it touches and the join key is (key, bucket) — overlapping
    spans always share a touched bucket, and the per-group pair space
    is bounded by spans-per-bucket instead of spans-per-doc (the
    quadratic-in-dense-docs fix).

    Matching is ONE-TO-ONE like the reference evaluator (each golden
    matched by at most one prediction and vice versa — a pair-counting
    match would let one gold matched by two preds push recall past
    1.0): spans are identified by (key, start, end) — both sides are
    deduped — each gold takes its first candidate pred in (start, end)
    order, then each pred keeps its first gold, a deterministic
    one-to-one assignment (it can differ from the reference's
    index-order greedy only when three-way overlap chains compete,
    where neither is a maximum matching either).
    """
    from pyspark.sql import Window
    def banded(df, s, e):
        return df.withColumn(
            "__bk",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket_width),
                    F.floor((F.col(e) - 1) / bucket_width),
                )
            ),
        )

    p = pred_spans.select(
        key, F.col("start").alias("ps"), F.col("end").alias("pe")
    ).distinct()
    g = gold_spans.select(
        key, F.col("start").alias("gs"), F.col("end").alias("ge")
    ).distinct()
    inter = F.greatest(
        F.lit(0), F.least("pe", "ge") - F.greatest("ps", "gs")
    ).cast("double")
    union = (F.greatest("pe", "ge") - F.least("ps", "gs")).cast("double")
    cand = (
        banded(p, "ps", "pe")
        .join(banded(g, "gs", "ge"), [key, "__bk"])
        .filter((inter / union) >= min_overlap)
        .select(key, "ps", "pe", "gs", "ge")
        .distinct()
    )
    w_gold = Window.partitionBy(key, "gs", "ge").orderBy("ps", "pe")
    w_pred = Window.partitionBy(key, "ps", "pe").orderBy("gs", "ge")
    matched = (
        cand.withColumn("__r1", F.row_number().over(w_gold))
        .filter(F.col("__r1") == 1)
        .withColumn("__r2", F.row_number().over(w_pred))
        .filter(F.col("__r2") == 1)
        .select(key, "ps", "pe")
    )
    # one union of tagged 1-rows -> one aggregation job for all three
    # counters (the partial+final shape of the reference's accumulators)
    tagged = (
        p.select(F.lit(1).alias("p"), F.lit(0).alias("g"), F.lit(0).alias("m"))
        .unionAll(g.select(F.lit(0), F.lit(1), F.lit(0)))
        .unionAll(matched.select(F.lit(0), F.lit(0), F.lit(1)))
    )
    # coalesce: sum() over the empty union (both inputs empty) is NULL,
    # and callers summing counts across partitions need real zeros
    agg = tagged.agg(
        F.coalesce(F.sum("p"), F.lit(0)).alias("n_pred"),
        F.coalesce(F.sum("g"), F.lit(0)).alias("n_gold"),
        F.coalesce(F.sum("m"), F.lit(0)).alias("n_match"),
    )
    prec = F.when(F.col("n_pred") > 0, F.col("n_match") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_gold") > 0, F.col("n_match") / F.col("n_gold")).otherwise(0.0)
    return (
        agg.withColumn("precision", prec.cast("double"))
        .withColumn("recall", rec.cast("double"))
        .withColumn(
            "f1",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0).cast("double"),
        )
        .select(
            "precision", "recall", "f1",
            F.col("n_pred").cast("long").alias("n_pred"),
            F.col("n_gold").cast("long").alias("n_gold"),
            F.col("n_match").cast("long").alias("n_match"),
        )
    )
