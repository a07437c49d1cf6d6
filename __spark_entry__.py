"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (the full
detect→filter→CTC-collapse→assemble staging from
paddleocr_spark/operators/extract.py) over HTML-wrapped sf0.001
documents. ``queries()`` / ``oracle_sql()`` expose every implemented
operator family from SURVEY.md §2 plus the training-data operators
(dedup, similarity search, text analysis, multimodal plumbing); the
registry lives in paddleocr_spark/queries.py with the cross-engine
determinism rules documented there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from paddleocr_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["extract_flagship"](spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Driver-window rotation. The driver's CORRECTNESS check covers the
# FIRST 50 queries() entries per round; rounds 1-2 checked the same 50,
# leaving 30 registry entries with local-parity evidence only. Round 3
# front-loads exactly those 30 (dataset_split first: it FAILED round 1
# and has never had a green driver row since) plus the queries new this
# round, then fills the window with re-confirmations (the extraction
# family — bench-watch items — and one representative per dedup/
# similarity family). ROUND 4: rotate the remaining 31 previously-green
# entries (region_revenue, topk_per_group, rollup_status,
# customers_no_orders, multi_supplier_parts, event_type_reach,
# events_hourly, token_stats, quality_score, langid, fingerprint,
# simhash, events_asof_purchase, dup_clusters, containment_suppress,
# shipping_priority, promo_share, top_terms, user_setops,
# events_moving_sum, median_acctbal, cls_argmax_embed,
# doc_len_histogram, sim_ann_ivf, lang_dict_lookup, json_props,
# event_pivot, value_band_join, purchasers_semi, cube_status,
# redact_text) back to the front.
# ---------------------------------------------------------------------------
_WINDOW_PRIORITY = [
    # -- the 30 entries with no driver row yet (r2 VERDICT item 1) --
    "dataset_split",        # r1 FAIL; fixed in r2, driver-confirm now
    "orders_monthly_delta",  # r2 bench-regression watch item
    "sim_batch_topk",
    "warp_spans",
    "softmax_decode",
    "repetition_stats",
    "event_reach_approx",   # rows-only by design (HLL sketch)
    "embed_near_dup_banded",
    "events_session_window",
    "decontaminate",
    "tfidf_top_terms",
    "source_cap",
    "stratified_sample",
    "unigram_logprob",
    "dup_ngram_spans",
    "block_dedup",
    "seq_packing",
    "url_filter",
    "quality_linear",
    "semantic_dedup",
    "dsir_weights",
    "len_percentiles",
    "source_skew",
    "host_link_graph",
    "host_pagerank",
    "doc_authority",
    "anchor_text_terms",
    "url_canonical",
    "latest_snapshot",
    "sanitize_text",
    # -- new in round 3 --
    "kie_links",
    "dup_ngram_spans_bcast",  # skew-safe mode, same oracle as window mode
    # -- re-confirmations (19 slots): extraction family incl. the
    #    flagship bench-watch, plus one per operator family
    #    (rec_metric yielded its slot to dup_ngram_spans_bcast: green
    #    in r1 AND r2, and covered by metric unit tests) --
    "extract_flagship",
    "extract_fused",
    "extract_blocks",
    "pricing_summary",
    "top_customers",
    "events_sessionize",
    "events_run_collapse",
    "dedup_exact",
    "minhash_sigs",
    "lsh_pairs",
    "simhash64",
    "simhash_near_dup",
    "dup_clusters_twophase",
    "ngram_jaccard",
    "sim_topk",
    "sim_ann_lsh",
    "embed_near_dup",
    "multimodal_meta",
]


def _recorded_green_rounds() -> dict[str, int]:
    """name -> latest round with a fully-green driver CORRECTNESS row,
    from the CORRECTNESS_r*.json files committed in the repo root."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") or row.get("hash_match") is None)
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _rotated(d: dict) -> dict:
    """Order queries so the driver's 50-row window maximizes coverage:
    entries with NO green driver row ever come first (in registry
    order), then previously-green entries, least-recently-confirmed
    first. Queries with no DuckDB oracle (the driver can only record a
    rows-only ``no_oracle`` row for them, never a fully-green one) are
    ordered LAST so they never pin a verification slot (r3 VERDICT
    "What's wrong" #2). Self-maintaining — each round's recorded
    CORRECTNESS file rotates the next round's window automatically.
    Falls back to the hand-rotation above if the records are
    unreadable."""
    no_oracle = {k for k in QUERIES if k not in ORACLES}
    try:
        latest = _recorded_green_rounds()
    except Exception:
        latest = None
    if not latest:
        out = {k: d[k] for k in _WINDOW_PRIORITY if k in d}
        out.update({k: v for k, v in d.items() if k not in out})
        return out
    names = list(d)
    order = sorted(
        range(len(names)),
        key=lambda i: (names[i] in no_oracle, latest.get(names[i], 0), i),
    )
    return {names[i]: d[names[i]] for i in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return _rotated(ORACLES)
