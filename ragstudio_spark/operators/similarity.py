"""Similarity search over embedding columns — first-class DataFrame APIs.

* ``with_cosine``       — JVM-side cosine via sequential-fold ``aggregate``
  over ``zip_with`` products (no UDF; deterministic accumulation order).
* ``brute_force_topk``  — exact top-k for a query set (cross join + window
  rank). The correctness baseline.
* ``ivf_assign`` / ``ivf_topk`` — coarse quantization to leader centroids;
  search only the query's cell. The 100 TB path: the cross join shrinks
  from |Q|×N to |Q|×(N/C), and cells can be bucketed/partitioned.
* ``hyperplane_buckets`` — sign-bit sketch over fixed hyperplanes: the
  LSH-bucketed near-dup path (candidates only within a bucket).

Rank outputs use (score desc, id asc) total orders so results are
deterministic and engine-portable (the DuckDB oracle twins in
entry_queries.py compare rank-for-rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rank, similarity) for each query vector."""
    q_id = query_id_col or id_col
    q = queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec"))
    sims = (
        q.crossJoin(v)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("similarity", cosine(F.col("q_vec"), F.col("v_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("similarity"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "similarity")
    )


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroid_id_col: str = "cid") -> DataFrame:
    """Assign each vector to its nearest centroid (cosine, id tie-break)."""
    v = vectors.select(F.col(id_col), F.col(vec_col))
    c = centroids.select(F.col(centroid_id_col), F.col(vec_col).alias("c_vec"))
    scored = v.crossJoin(c).withColumn("sim", cosine(F.col(vec_col), F.col("c_vec")))
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc(centroid_id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, centroid_id_col)
    )


def ivf_topk(vectors: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 3, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: search only the query's centroid cell."""
    assign = ivf_assign(vectors, centroids, id_col, vec_col)
    v = vectors.join(assign, on=id_col)
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .join(assign.withColumnRenamed(id_col, "query_id"), on="query_id")
    )
    cand = q.join(
        v.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec"), "cid"),
        on="cid",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.withColumn("similarity", cosine(F.col("q_vec"), F.col("v_vec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "similarity")
    )


def hyperplane_buckets(vectors: DataFrame, planes: DataFrame,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       plane_id_col: str = "plane") -> DataFrame:
    """Sign-bit LSH bucket per vector: bucket = Σ (dot(v, plane_p) > 0) << p."""
    v = vectors.select(F.col(id_col), F.col(vec_col))
    p = planes.select(F.col(plane_id_col), F.col(vec_col).alias("p_vec"))
    bits = v.crossJoin(p).select(
        id_col, plane_id_col,
        F.when(dot(F.col(vec_col), F.col("p_vec")) > 0, 1).otherwise(0).alias("bit"),
    )
    return bits.groupBy(id_col).agg(
        F.sum(F.col("bit").cast("bigint")
              * F.pow(2, F.col(plane_id_col)).cast("bigint")).cast("bigint").alias("bucket")
    )
