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
import pandas as pd
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

def _pair_dot_pandas():
    """Arrow-batched pair dot product: one einsum per batch instead of an
    interpreted array-lambda per row (~50x on all-pairs workloads)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def dot(a: "pd.Series", b: "pd.Series") -> "pd.Series":
        A = np.vstack(a.to_numpy())
        B = np.vstack(b.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return dot


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.999,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos >= threshold).

    Exact all-pairs via **block matrix multiply**: the L2-normalized corpus
    is broadcast once (N×d floats); each partition computes its block's
    similarity matrix against it with one numpy matmul inside mapInPandas
    and emits only the above-threshold pairs — the quadratic pair set is
    never materialized or shuffled. This is the archetypal one-side-tiled
    brute force; at 100 TB the broadcast side becomes LSH/IVF bucket tiles
    (hyperplane_bits / ivf_topk) and the same kernel verifies per tile.
    """
    spark = df.sparkSession
    normed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    pdf_all = normed.toPandas()
    ids_all = pdf_all["id"].to_numpy()
    M = np.vstack(pdf_all["v"].to_numpy()).astype("float64")
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids_all)
    b_mat = spark.sparkContext.broadcast(M)

    def block(batches):
        oids, omat = b_ids.value, b_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.vstack(pdf["v"].to_numpy()).astype("float64")
            A /= np.linalg.norm(A, axis=1, keepdims=True)
            sims = A @ omat.T
            ai = pdf["id"].to_numpy()
            ii, jj = np.nonzero(sims >= threshold)
            ia, ib = ai[ii], oids[jj]
            keep = ia < ib
            yield pd.DataFrame({"id_a": ia[keep], "id_b": ib[keep]})

    return normed.mapInPandas(block, "id_a long, id_b long")

def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id") -> DataFrame:
    """IVF-style approximate top-k cosine search (E2 scale path).

    Coarse quantizer: ``n_centroids`` stride-sampled corpus vectors (cheap,
    deterministic stand-in for k-means — swap in trained centroids at will).
    Corpus vectors are assigned to their nearest centroid with a pure-JVM
    expression over a literal centroid array (no shuffle, no Python); each
    query probes its ``n_probe`` nearest centroid buckets and brute-forces
    only those. At 100 TB the corpus is written partitioned by ``__cid`` so
    a probe reads only matching partitions.
    """
    ids = [r[0] for r in
           corpus.select(id_col).orderBy(id_col).limit(100000).collect()]
    stride = max(len(ids) // n_centroids, 1)
    cent_ids = set(ids[::stride][:n_centroids])
    cents = corpus.where(F.col(id_col).isin(*cent_ids)) \
                  .select(id_col, vec_col).collect()
    cent_lit = F.array(*[
        F.struct(F.lit(int(r[0])).alias("cid"),
                 F.array(*[F.lit(float(x)) for x in r[1]]).alias("cv"))
        for r in cents])

    def scored(vec):
        return F.transform(cent_lit, lambda c: F.struct(
            cosine(vec, c["cv"]).alias("score"), c["cid"].alias("cid")))

    assigned = corpus.withColumn(
        "__cid", F.array_max(scored(F.col(vec_col)))["cid"])

    probes = queries.select(
        query_id_col, F.col(vec_col).alias("__qv"),
        F.explode(F.transform(
            F.slice(F.reverse(F.array_sort(scored(F.col(vec_col)))),
                    1, n_probe),
            lambda s: s["cid"])).alias("__cid"))

    cand = assigned.join(F.broadcast(probes), "__cid").select(
        query_id_col, id_col,
        cosine(F.col("__qv"), F.col(vec_col)).alias("cos"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
