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
