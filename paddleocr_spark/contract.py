"""The driver-gate comparison, in ONE place: canonical rowset hashing
shared by the committed sf0.001 mirror (tests/test_driver_contract.py)
and the sf0.01 driver-scale replay tool (tools/contract_driver_scale.py)
so the two can never drift onto different comparison semantics — the
tool exists to predict the mirror's gate exactly.

Shape mirrors the driver's CORRECTNESS check: sort columns by name,
canonicalize values (floats to 9 significant digits, NaN and null as
sentinels), compare the order-insensitive multiset.
"""

from __future__ import annotations

import math

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(con, sf_dir: str) -> None:
    """Register the standard tables as DuckDB views over sf_dir."""
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )


def canon(v):
    if v is None:
        return "\x00<null>"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return str(v)


def rowset(cols, rows):
    """Order-insensitive canonical rowset: columns sorted by name,
    every value canonicalized, rows sorted."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


# -- driver-faithful typed comparison -----------------------------------
#
# The driver hashes pandas frames, where dtype leaks into the hash: a
# DuckDB HUGEINT (sum of BIGINT) materializes as float64 and
# hash-mismatches Spark's int64 even when every value is equal, and a
# list-typed column is unsortable in the driver's canonicalizer
# (TypeError: unhashable type: 'list'). The round-4 mirror compared
# Python values only (int128 == int64), which is exactly the blind spot
# that let six uncast oracles ship. These helpers make the mirror
# dtype-faithful: both engines materialize to Arrow and the TYPE FAMILY
# of every column must match before values are even looked at.

def arrow_family(t) -> str:
    """Collapse an Arrow type to the family the driver's pandas hash is
    sensitive to. int8..int64 all land in pandas int64 after
    canonicalization, so they share a family; HUGEINT (int128 /
    decimal128(38,0)), floats, and lists each get their own."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int128" if t.bit_width > 64 else "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return f"list<{arrow_family(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(
            f"{f.name}:{arrow_family(f.type)}" for f in t
        ) + ">"
    if pa.types.is_map(t):
        return f"map<{arrow_family(t.key_type)},{arrow_family(t.item_type)}>"
    return str(t)


def families(schema) -> dict:
    """{column: family} for an Arrow schema."""
    return {f.name: arrow_family(f.type) for f in schema}


def typed_diffs(s_schema, d_schema) -> list:
    """Columns whose Arrow type family differs between the Spark result
    and the DuckDB oracle — every entry is a driver hash-mismatch
    waiting to happen (the r4 HUGEINT class)."""
    sf, df = families(s_schema), families(d_schema)
    return sorted(
        (c, sf.get(c), df.get(c))
        for c in set(sf) | set(df)
        if sf.get(c) != df.get(c)
    )


def unsortable_columns(schema) -> list:
    """Columns the driver's pandas canonicalizer cannot sort/hash —
    list/struct/map values all materialize as unhashable Python
    containers there (the r4 retention_keep_k class was a list).
    Oracle-backed queries must serialize these to strings."""
    return sorted(
        c
        for c, fam in families(schema).items()
        if fam.startswith(("list<", "struct<", "map<"))
    )
