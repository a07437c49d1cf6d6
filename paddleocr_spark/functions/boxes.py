"""Box re-projection and distribution decode as native column exprs.

The last two §2.8 scalar-function rows, re-expressed on the byte-stream
data model:

- ``warp_spans``: the `warp_boxes` rescale+clip (ppocr/postprocess/
  picodet_postprocess.py:129-152, same round/clip discipline as
  db_postprocess.py:101-104,152-155). Detection ran on a canonicalized
  (scaled) document; spans are projected back to original coordinates
  with ``round(x / ratio)`` and clipped to ``[0, doc_len]``, order
  preserved.

- ``softmax_expectation``: the distribution-to-distance decode
  (picodet_postprocess.py:194-199): softmax over a score vector, then
  the expected index Σ i·p_i — the regression-by-distribution trick,
  usable over any per-position score array. Numerically stabilized by
  max-subtraction with left-to-right fold order so a DuckDB oracle
  reproduces it bitwise (before 6-dp rounding).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def warp_span_bound(x: Column, ratio: Column | float, doc_len: Column) -> Column:
    """One coordinate: round(x / ratio), clipped to [0, doc_len]."""
    r = F.lit(ratio) if isinstance(ratio, (int, float)) else ratio
    back = F.round(x.cast("double") / r).cast("bigint")
    return F.least(F.greatest(back, F.lit(0).cast("bigint")), doc_len.cast("bigint"))


def warp_spans(start: Column, end: Column, ratio: Column | float, doc_len: Column):
    """(start', end') back-projected with min/max re-ordering (the
    reference recomputes min/max over the warped corners)."""
    a = warp_span_bound(start, ratio, doc_len)
    b = warp_span_bound(end, ratio, doc_len)
    return F.least(a, b), F.greatest(a, b)


def softmax_expectation(arr: Column) -> Column:
    """Expected index under softmax(arr): Σ i * exp(x_i - m) / Σ exp(x_i - m)."""
    m = F.array_max(arr)
    exps = F.transform(arr, lambda x: F.exp(x.cast("double") - m.cast("double")))
    denom = F.aggregate(exps, F.lit(0.0), lambda acc, x: acc + x)
    num = F.aggregate(
        F.zip_with(
            exps,
            F.sequence(F.lit(0), F.size(arr) - 1),
            lambda e, i: e * i.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return num / denom


# ---------------------------------------------------------------- SQL mirrors

def sql_warp_span_bound(x: str, ratio: str, doc_len: str) -> str:
    return (
        f"least(greatest(cast(round(({x})::DOUBLE / ({ratio})) as bigint), 0), "
        f"cast({doc_len} as bigint))"
    )


def sql_softmax_expectation(arr: str) -> str:
    exps = f"list_transform({arr}, x -> exp(x::DOUBLE - list_max({arr})::DOUBLE))"
    num = (
        f"list_sum(list_transform(range(len({arr})), i -> "
        f"({exps})[i+1] * i::DOUBLE))"
    )
    return f"({num}) / list_sum({exps})"
