"""One-off: driver-mimic typed comparison — Spark result Arrow types vs
DuckDB oracle Arrow types for every oracle-backed query at sf0.01.
Flags any column whose Arrow type family differs (the r1 hugeint bug class)."""
import sys

import duckdb
import pyarrow as pa

from pyspark.sql import SparkSession

import paddleocr_spark.queries as Q

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def family(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return f"int{t.bit_width}" if t.bit_width > 64 else "int<=64"
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
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{family(t.value_type)}>"
    return str(t)


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
