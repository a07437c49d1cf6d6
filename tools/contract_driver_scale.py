"""One-off driver-gate de-risk: run the contract mirror comparison at
sf0.01 (the DRIVER's scale — the committed mirror runs at sf0.001) for
a chosen subset of queries. Usage:

    python tools/contract_driver_scale.py [name ...]

With no names, runs the first 50 of the rotated window (exactly what
the driver will verify this round).
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import paddleocr_spark.queries as Q  # noqa: E402
from paddleocr_spark.contract import (  # noqa: E402
    register_views,
    rowset as _rowset,
)
from paddleocr_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main():
    names = sys.argv[1:]
    if not names:
        import __spark_entry__ as e
        names = list(e.queries().keys())[:50]
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    register_views(con, SF_DIR)
    bad = []
    for name in names:
        t0 = time.time()
        try:
            sdf = Q.QUERIES[name](spark, SF_DIR)
            if name not in Q.ORACLES:
                n = len(sdf.collect())
                print(f"  {name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                continue
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.sql(Q.ORACLES[name])
            dcols = res.columns
            drows = res.fetchall()
            ok = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and _rowset(scols, srows) == _rowset(dcols, drows)
            )
        except Exception as ex:  # noqa: BLE001 - report, keep going
            bad.append(name)
            print(f"  {name}: ERROR {ex} [{time.time()-t0:.1f}s]")
            continue
        status = "OK" if ok else "MISMATCH"
        if not ok:
            bad.append(name)
        print(f"  {name}: {status} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - len(bad)}/{len(names)} green at sf0.01")
    if bad:
        print("FAILING:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
