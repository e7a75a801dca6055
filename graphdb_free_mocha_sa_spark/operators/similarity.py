"""Vector similarity search over embedding columns (E2).

Baseline: brute-force cosine top-k — the dot product is a JVM higher-order
``aggregate(zip_with(...))`` (no Python per row), top-k via window rank.
Scale path: random-hyperplane LSH bucketing — query and corpus vectors land
in sign-bit buckets; the join is bucket-local so the candidate set shrinks
~2^bits-fold; multi-probe widens recall.

100 TB design: corpus pre-bucketed and written partitioned by bucket id;
queries broadcast; per-bucket brute force stays cache-resident.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbours per query vector.

    queries: (query_id, embedding). Small query sets broadcast; corpus scan
    is a single pass (no shuffle before the per-query window rank).
    """
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col,
        cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def hyperplane_bits(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id = sign bits of dot(vec, plane_i), packed into a long."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a * b),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(d > 0, F.lit(2 ** i).cast("long")).otherwise(0)
    return bucket


def random_planes(dim: int, bits: int = 8, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             bits: int = 8, vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id", seed: int = 42) -> DataFrame:
    """Approximate top-k: bucket-join on hyperplane sign bits, then exact
    cosine within the bucket. Recall < 1 by construction (documented)."""
    planes = random_planes(dim, bits, seed)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"),
                      hyperplane_bits(F.col(vec_col), planes).alias("__b"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"),
                       hyperplane_bits(F.col(vec_col), planes).alias("__b"))
    scored = c.join(F.broadcast(q), "__b").select(
        query_id_col, id_col, cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def pairwise_topk(corpus: DataFrame, k: int = 3, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """All-pairs exact top-k neighbours within one table (self cross join).

    Fixture-scale oracle-checkable variant; at scale use lsh_topk with the
    corpus as its own query set."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    scored = (a.join(b, F.col("id_a") != F.col("id_b"))
              .select("id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cos")))
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))

def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.999,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos >= threshold).

    Brute-force all-pairs baseline (exact, SQL-oracle-checkable). At 100 TB
    scale the same verification runs on LSH-bucketed candidates instead
    (compose hyperplane_bits bucketing with this verify step) — the
    all-pairs form is the correctness reference.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    cosine(F.col("__va"), F.col("__vb")).alias("cos"))
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b"))
