"""Similarity search over embedding columns — first-class DataFrame APIs.

* ``with_cosine``       — JVM-side cosine via sequential-fold ``aggregate``
  over ``zip_with`` products (no UDF; deterministic accumulation order).
* ``brute_force_topk``  — exact top-k for a query set (cross join + window
  rank). The correctness baseline.
* ``ivf_assign`` / ``ivf_topk`` — coarse quantization to leader centroids;
  search only the query's cell. The 100 TB path: the cross join shrinks
  from |Q|×N to |Q|×(N/C), and cells can be bucketed/partitioned.
* ``kmeans_centroids`` — deterministic Lloyd iterations to TRAIN the IVF
  quantizer (scale mode: k×dim-cell partial aggregation; exact mode:
  order-fixed folds for the DuckDB oracle).
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


def _l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance in double precision."""
    diff = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")))
    return F.aggregate(diff, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def kmeans_centroids(vectors: DataFrame, k: int = 16, iters: int = 2,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exact: bool = False) -> DataFrame:
    """Deterministic Lloyd k-means for the IVF coarse quantizer: init from
    the k lowest-id vectors, assign by squared L2 (ties → lowest cid),
    recompute means, ``iters`` rounds. Returns (cid, embedding).

    Two mean modes with identical semantics up to float summation order:

    * default (scale path) — posexplode to (cid, dim) cells, one partial-
      aggregated ``sum``/``count`` shuffle on k×dim keys, reassemble. Never
      materializes a cluster in one task.
    * ``exact=True`` (oracle path) — members of a cluster are collected
      sorted by id and folded sequentially, so centroid doubles are
      bit-identical to the DuckDB twin. Memory-bounded by cluster size —
      for the correctness gate only, never for a 100 TB run.

    Empty clusters keep their previous centroid (deterministic)."""
    cents = (
        vectors.orderBy(F.asc(id_col)).limit(k)
        .select(F.col(id_col).cast("int").alias("cid"),
                F.col(vec_col).alias("c_vec"))
    )
    v = vectors.select(F.col(id_col), F.col(vec_col))
    for _ in range(iters):
        scored = v.crossJoin(F.broadcast(cents)).withColumn(
            "d", _l2sq(F.col(vec_col), F.col("c_vec")))
        w = Window.partitionBy(id_col).orderBy(F.asc("d"), F.asc("cid"))
        assign = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).select(id_col, vec_col, "cid")
        )
        if exact:
            grouped = assign.groupBy("cid").agg(
                F.count("*").alias("n"),
                F.array_sort(F.collect_list(F.struct(F.col(id_col).alias("i"),
                                                     F.col(vec_col).alias("v"))))
                .alias("ms"),
            )
            zero = F.transform(F.element_at("ms", 1)["v"],
                               lambda _x: F.lit(0.0).cast("double"))
            summed = F.aggregate(
                "ms", zero,
                lambda acc, m: F.zip_with(acc, m["v"],
                                          lambda a, b: a + b.cast("double")))
            new = grouped.select(
                "cid",
                F.transform(summed, lambda s: s / F.col("n")).alias("c_vec"))
        else:
            cells = assign.select(
                "cid", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            dims = (
                cells.groupBy("cid", "pos")
                .agg((F.sum(F.col("x").cast("double")) / F.count("*")).alias("m"))
            )
            new = (
                dims.groupBy("cid")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("dm"))
                .select("cid", F.transform("dm", lambda s: s["m"]).alias("c_vec"))
            )
        # empty clusters keep their previous centroid
        cents = (
            cents.alias("o").join(new.alias("n"), on="cid", how="left")
            .select("cid", F.coalesce(F.col("n.c_vec"), F.col("o.c_vec")).alias("c_vec"))
        )
    return cents.select("cid", F.col("c_vec").alias(vec_col))


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
