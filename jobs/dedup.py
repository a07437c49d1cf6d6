"""Corpus near-dedup job — the ``spark-submit --py-files`` entrypoint
for the training-data curation pass.

Pipeline: exact dedup (md5 hash-groupBy) -> MinHash-LSH candidate
pairs -> connected components -> keep one representative per near-dup
cluster (min doc_id). Writes:

- <out>/corpus/    the deduplicated corpus (parquet)
- <out>/clusters/  (doc_id, cluster_id) for every clustered doc

Usage:
    spark-submit --master local[N] --driver-memory 8g \
        --py-files dist/paddleocr_spark.zip jobs/dedup.py \
        --input <documents.parquet> --output <dir> [--algorithm twophase]

Prints ONE JSON line with input/exact-dup/near-dup/output counts.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--algorithm", default="propagation", choices=["propagation", "twophase"]
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from paddleocr_spark.functions import dedup
    from paddleocr_spark.functions.graph import (
        connected_components,
        connected_components_two_phase,
    )

    spark = SparkSession.builder.appName("paddleocr-spark-dedup").getOrCreate()
    t0 = time.time()

    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    # 1) exact dedup: keep min doc_id per content hash
    hashed = docs.withColumn("__h", dedup.content_hash(F.col("text")))
    from pyspark.sql import Window

    w = Window.partitionBy("__h").orderBy("doc_id")
    exact = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )
    n_exact = exact.count()

    # 2) near-dup clusters over the exact-deduped survivors
    pairs = dedup.lsh_candidate_pairs(exact)
    cc_fn = (
        connected_components_two_phase
        if args.algorithm == "twophase"
        else connected_components
    )
    clusters = cc_fn(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")

    # 3) winners: cluster representative = min doc_id (== cluster_id);
    #    docs not in any cluster pass through
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    corpus = exact.join(F.broadcast(losers), "doc_id", "left_anti")
    corpus.write.mode("overwrite").parquet(f"{args.output}/corpus")
    n_out = spark.read.parquet(f"{args.output}/corpus").count()
    n_clustered = clusters.count()

    print(
        json.dumps(
            {
                "n_input": n_input,
                "n_after_exact": n_exact,
                "n_clustered_docs": n_clustered,
                "n_output": n_out,
                "algorithm": args.algorithm,
                "wall_sec": round(time.time() - t0, 3),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
