"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline: a broadcast of the query
vector against a single pass over the table — no shuffle at all, the
top-k is a TakeOrdered (per-partition heap + driver merge of k rows),
which is exactly the plan you want at 10^12 rows.

The scale path is LSH bucketing (random-hyperplane signs): a 4-bit
bucket id computed per-row from deterministic integer hyperplanes; the
search then touches only the query's bucket (~1/16 of the data; in a
real deployment the bucket is an Iceberg partition key so the scan
prunes to it). An IVF variant would replace hyperplanes with centroids;
the plumbing is identical.

All arithmetic is float→double elementwise, summed left-to-right, so
the DuckDB oracle agrees bitwise (verified before rounding at 6 dp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 4  # LSH hyperplane count => 2^4 buckets


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in double, left-to-right (order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def plane_coef(i: str | int, j: int) -> str:
    """Deterministic pseudo-random hyperplane coefficient in [-3, 3]:
    ((i+1)*(j+3)) % 7 - 3 for element index i (0-based), plane j."""
    return f"(({i}+1)*({j}+3)) % 7 - 3"


def plane_dot(a: Column, j: int) -> Column:
    """Dot of a vector with deterministic hyperplane j."""
    return F.aggregate(
        F.transform(
            a,
            lambda x, i: x.cast("double")
            * (((i + 1) * (j + 3)) % 7 - 3).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(a: Column, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket id over the deterministic hyperplanes."""
    acc = F.lit(0)
    for j in range(n_planes):
        acc = acc + F.when(plane_dot(a, j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc.cast("int")


def topk_cosine(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k by cosine to the (single-row) query."""
    q = F.broadcast(query_df.select(F.col(vec_col).alias("__qv")))
    j = df.crossJoin(q)
    scored = j.select(
        id_col, F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def topk_cosine_lsh(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict the scan to the query's LSH bucket, then exact
    top-k within it (bucket predicate prunes ~15/16 of the data)."""
    q = F.broadcast(
        query_df.select(
            F.col(vec_col).alias("__qv"), lsh_bucket(F.col(vec_col)).alias("__qb")
        )
    )
    cand = df.withColumn("__b", lsh_bucket(F.col(vec_col))).crossJoin(q).filter(
        F.col("__b") == F.col("__qb")
    )
    scored = cand.select(
        id_col,
        F.col("__b").alias("bucket"),
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


# ---------------------------------------------------------------- SQL mirrors

def sql_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(list_zip({a}, {b}), x -> x[1]::DOUBLE * x[2]::DOUBLE))"


def sql_cosine(a: str, b: str) -> str:
    sq = "list_sum(list_transform({v}, x -> x::DOUBLE * x::DOUBLE))"
    return (
        f"{sql_dot(a, b)} / (sqrt({sq.format(v=a)}) * sqrt({sq.format(v=b)}))"
    )


def sql_plane_dot(vec: str, j: int, dim: int = 64) -> str:
    return (
        f"list_sum(list_transform(range({dim}), i -> {vec}[i+1]::DOUBLE * "
        f"(({plane_coef('i', j)})::DOUBLE)))"
    )


def sql_lsh_bucket(vec: str, n_planes: int = N_PLANES, dim: int = 64) -> str:
    terms = " + ".join(
        f"(case when {sql_plane_dot(vec, j, dim)} > 0 then {1 << j} else 0 end)"
        for j in range(n_planes)
    )
    return f"cast({terms} as int)"


# ---------------------------------------------------------------- IVF variant

N_CENTROIDS = 8  # coarse-quantizer cells
_IVF_DIM = 64


def centroid_coef(i: str | int, j: str | int) -> str:
    """Deterministic pseudo-random centroid coefficient in [-5, 5]:
    ((i+1)*(j+5)) % 11 - 5 for element i, centroid j. A real
    deployment trains centroids with offline k-means and broadcasts
    them; the plumbing (cell assignment, probe, in-cell search) is
    identical and is what this implements."""
    return f"(({i}+1)*({j}+5)) % 11 - 5"


def centroid_dots(a: Column, n: int = N_CENTROIDS) -> Column:
    """array<double> of v·c_j for j in 0..n-1 (nested higher-order
    functions, no UDF)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda j: F.aggregate(
            F.transform(
                a,
                lambda x, i: x.cast("double")
                * (((i + 1) * (j + 5)) % 11 - 5).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def ivf_cell(a: Column) -> Column:
    """Cell id 1..N_CENTROIDS: first argmax of the centroid dots
    (max-inner-product coarse assignment, ties to the lowest j)."""
    d = centroid_dots(a)
    return F.array_position(d, F.array_max(d)).cast("int")


def topk_cosine_ivf(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: assign every row to its coarse cell, probe the query's
    nprobe best cells, exact cosine top-k within them. The probe-cell
    computation collects ONE row (the query) — at scale the cell is an
    Iceberg partition key, so the IN-filter prunes the scan to
    nprobe/N_CENTROIDS of the data."""
    qrow = query_df.select(
        F.col(vec_col).alias("qv"), centroid_dots(F.col(vec_col)).alias("qd")
    ).collect()[0]
    dots = list(qrow["qd"])
    probe = [
        j + 1
        for j in sorted(range(len(dots)), key=lambda j: (-dots[j], j))[:nprobe]
    ]
    q = F.broadcast(query_df.select(F.col(vec_col).alias("__qv")))
    cand = (
        df.withColumn("cell", ivf_cell(F.col(vec_col)))
        .filter(F.col("cell").isin(probe))
        .crossJoin(q)
    )
    scored = cand.select(
        id_col,
        "cell",
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def sql_centroid_dots(vec: str, n: int = N_CENTROIDS, dim: int = _IVF_DIM) -> str:
    return (
        f"list_transform(range({n}), j -> "
        f"list_sum(list_transform(range({dim}), i -> "
        f"{vec}[i+1]::DOUBLE * (({centroid_coef('i', 'j')})::DOUBLE))))"
    )


def sql_ivf_cell(vec: str) -> str:
    d = sql_centroid_dots(vec)
    return f"cast(list_position({d}, list_max({d})) as int)"
