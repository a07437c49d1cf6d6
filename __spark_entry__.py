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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(ORACLES)
