"""One-off: driver-mimic typed comparison — Spark result Arrow types vs
DuckDB oracle Arrow types for every oracle-backed query at sf0.01.
Flags any column whose Arrow type family differs (the r1 hugeint bug
class). Uses the SAME family classifier as the committed sf0.001 gate
(paddleocr_spark.contract.arrow_family) so tool and gate cannot drift."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402

import paddleocr_spark.queries as Q  # noqa: E402
from paddleocr_spark.contract import arrow_family as family  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .appName("typecheck").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    bad = []
    names = sorted(n for n in Q.QUERIES if n in Q.ORACLES)
    for name in names:
        try:
            sdf = Q.QUERIES[name](spark, SF_DIR)
            sb = sdf.toArrow() if hasattr(sdf, "toArrow") else pa.Table.from_pandas(sdf.toPandas())
            db = con.sql(Q.ORACLES[name]).fetch_arrow_table()
        except Exception as e:
            bad.append((name, "ERROR", str(e)[:200]))
            print(f"{name}: ERROR {e}", flush=True)
            continue
        sput = {f.name: family(f.type) for f in sb.schema}
        dput = {f.name: family(f.type) for f in db.schema}
        diffs = [(c, sput.get(c), dput.get(c)) for c in set(sput) | set(dput)
                 if sput.get(c) != dput.get(c)]
        if diffs:
            bad.append((name, "TYPE", diffs))
            print(f"{name}: TYPE DIFF {diffs}", flush=True)
        else:
            print(f"{name}: ok", flush=True)
    print("\n==== SUMMARY ====")
    for b in bad:
        print(b)
    print(f"{len(names) - len(bad)}/{len(names)} type-clean")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
