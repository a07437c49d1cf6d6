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
    """Exact-match accuracy + mean (1 - normalized edit distance)."""
    j = pred.select(key, pred_col).join(gold.select(key, gold_col), key)
    lev = F.levenshtein(F.col(pred_col), F.col(gold_col)).cast("double")
    mx = F.greatest(F.length(pred_col), F.length(gold_col)).cast("double")
    norm = F.when(mx == 0, F.lit(0.0)).otherwise(lev / mx)
    return j.agg(
        F.avg((F.col(pred_col) == F.col(gold_col)).cast("double")).alias("exact_acc"),
        F.avg(F.lit(1.0) - norm).alias("norm_edit_sim"),
        F.count("*").alias("n_docs"),
    )


def det_metric(pred_spans: DataFrame, gold_spans: DataFrame, key: str = "url",
               min_overlap: float = 0.5) -> DataFrame:
    """Span-level P/R/F1: a predicted [start,end) matches a golden span
    when intersection / union >= min_overlap (IoU-matched hmean analog,
    det_metric.py:24-71). Expects (key, start, end) on both sides."""
    p = pred_spans.select(key, F.col("start").alias("ps"), F.col("end").alias("pe"))
    g = gold_spans.select(key, F.col("start").alias("gs"), F.col("end").alias("ge"))
    inter = F.greatest(
        F.lit(0), F.least("pe", "ge") - F.greatest("ps", "gs")
    ).cast("double")
    union = (F.greatest("pe", "ge") - F.least("ps", "gs")).cast("double")
    matched = (
        p.join(g, key)
        .filter((inter / union) >= min_overlap)
        .select(key, "ps", "pe")
        .distinct()
    )
    n_pred = p.count()
    n_gold = g.count()
    n_match = matched.count()
    precision = n_match / n_pred if n_pred else 0.0
    recall = n_match / n_gold if n_gold else 0.0
    f1 = (2 * precision * recall / (precision + recall)) if precision + recall else 0.0
    spark = pred_spans.sparkSession
    return spark.createDataFrame(
        [(float(precision), float(recall), float(f1), n_pred, n_gold, n_match)],
        "precision double, recall double, f1 double, n_pred long, n_gold long, n_match long",
    )
