"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet files, and
compare row count, column names, and order-insensitive values.

This is the same comparison shape as the reference's golden regression
harness (test_tipc/compare_results.py: predicted log vs --gt_file), with
exact equality since our operators are engine-portable by construction.
"""

from __future__ import annotations

import duckdb
import pytest

import paddleocr_spark.queries as Q
from paddleocr_spark.contract import (
    register_views,
    rowset as _rowset,
    typed_diffs,
    unsortable_columns,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_views(con, SF_DIR)
    return con


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = Q.QUERIES[name](spark, SF_DIR)
    if name not in Q.ORACLES:
        # oracle-less entry (engine-specific values, e.g. HLL sketches):
        # the driver records a rows-only check; mirror that here
        assert len(sdf.collect()) > 0
        return
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(Q.ORACLES[name])
    dcols = res.columns
    drows = res.fetchall()

    # Driver-faithful dtype gate (r4 postmortem): the driver hashes
    # pandas frames, so an uncast DuckDB HUGEINT (→ float64) or a
    # list-typed column fails its hash even when values are equal.
    # Compare Arrow type families for BOTH engines before values.
    s_schema = sdf.limit(0).toArrow().schema
    d_schema = duck.sql(
        f"select * from ({Q.ORACLES[name]}) limit 0"
    ).fetch_arrow_table().schema
    tdiffs = typed_diffs(s_schema, d_schema)
    assert not tdiffs, (
        f"{name}: Arrow type-family mismatch (driver hash would fail "
        f"even on equal values): {tdiffs}"
    )
    bad_cols = unsortable_columns(s_schema) + unsortable_columns(d_schema)
    assert not bad_cols, (
        f"{name}: list-typed output columns {sorted(set(bad_cols))} are "
        "unhashable in the driver canonicalizer — serialize to strings"
    )

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sset = _rowset(scols, srows)
    dset = _rowset(dcols, drows)
    if sset != dset:
        diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_typed_gate_fires_on_r4_failure_classes():
    """The dtype gate itself, pinned: an uncast DuckDB HUGEINT
    (decimal128 in Arrow) and container-typed columns must be flagged —
    these are exactly the two classes that shipped red in round 4."""
    import pyarrow as pa

    from paddleocr_spark.contract import (
        arrow_family,
        typed_diffs,
        unsortable_columns,
    )

    spark_side = pa.schema([("k", pa.int64()), ("s", pa.int64())])
    duck_side = pa.schema([("k", pa.int64()), ("s", pa.decimal128(38, 0))])
    assert typed_diffs(spark_side, duck_side) == [
        ("s", "int", "decimal(38,0)")
    ]

    containers = pa.schema(
        [
            ("ok", pa.string()),
            ("l", pa.list_(pa.int64())),
            ("fl", pa.list_(pa.float32(), 4)),
            ("st", pa.struct([("a", pa.int64())])),
            ("m", pa.map_(pa.string(), pa.int64())),
        ]
    )
    assert unsortable_columns(containers) == ["fl", "l", "m", "st"]

    # families collapse what the driver's value canonicalization
    # cannot distinguish (int widths) and split what it can (float)
    assert arrow_family(pa.int32()) == arrow_family(pa.int64()) == "int"
    assert arrow_family(pa.float64()) == "float"
    assert arrow_family(pa.large_string()) == arrow_family(pa.string())
