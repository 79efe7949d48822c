"""Similarity search over an embedding column (array<float/double>).

- brute-force cosine top-k: the exact baseline; JVM-side zip_with/aggregate
  dot products (no UDF).
- hyperplane LSH buckets: deterministic seeded random hyperplanes -> sign
  bits -> bucket id; ANN search probes only matching buckets (the scale
  path: the bucket join shuffles on bucket id instead of an all-pairs
  crossJoin).
- knn label vote: majority label among the top-k.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id",
                emb_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine against one query vector (brute force)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_col(F.col(emb_col), q)
    return (embeddings
            .select(id_col, sim.alias("cosine"))
            .orderBy(F.desc("cosine"), id_col)
            .limit(k))


def knn_label_vote(embeddings: DataFrame, query_vec: list[float],
                   k: int = 10, id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Majority label among the k nearest neighbours (ties -> smaller
    label)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_col(F.col(emb_col), q)
    top = (embeddings.select(label_col, sim.alias("cosine"), id_col)
           .orderBy(F.desc("cosine"), id_col).limit(k))
    return (top.groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("votes"))
            .orderBy(F.desc("votes"), label_col)
            .limit(1))


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic seeded hyperplanes — identical on every executor."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(emb: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from hyperplane projections (JVM-side dot
    products; planes are broadcast as literals)."""
    bits = None
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(emb, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("int")


def with_lsh_buckets(embeddings: DataFrame, dim: int, n_planes: int = 16,
                     seed: int = 42,
                     emb_col: str = "embedding") -> DataFrame:
    planes = hyperplanes(dim, n_planes, seed)
    return embeddings.withColumn("bucket",
                                 lsh_bucket_col(F.col(emb_col), planes))


def ann_topk(embeddings: DataFrame, query_vec: list[float], dim: int,
             k: int = 10, n_planes: int = 8, seed: int = 42,
             id_col: str = "vec_id",
             emb_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket or
    any bucket at Hamming distance 1 (multi-probe). At scale this prunes
    the candidate set by ~2^n_planes/(1+n_planes) while the brute-force
    kernel stays identical."""
    planes = hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=float)
    q_bucket = int(sum((1 << i) for i, p in enumerate(planes)
                       if float(np.dot(q, p)) >= 0))
    probes = [q_bucket] + [q_bucket ^ (1 << i) for i in range(n_planes)]
    bucketed = with_lsh_buckets(embeddings, dim, n_planes, seed, emb_col)
    cand = bucketed.where(F.col("bucket").isin(probes))
    qc = F.array(*[F.lit(float(x)) for x in query_vec])
    return (cand.select(id_col, cosine_col(F.col(emb_col), qc).alias("cosine"))
            .orderBy(F.desc("cosine"), id_col).limit(k))


def all_pairs_topk(embeddings: DataFrame, dim: int, k: int = 5,
                   id_col: str = "vec_id",
                   emb_col: str = "embedding") -> DataFrame:
    """Per-vector top-k neighbours inside LSH buckets (bucketed self-join;
    the scale-path replacement for a quadratic crossJoin). ``dim`` is the
    embedding dimensionality — passed in rather than sniffed with a
    driver-side action."""
    bucketed = with_lsh_buckets(embeddings, dim, 8)
    left = bucketed.select(F.col("bucket"), F.col(id_col).alias("id_a"),
                           F.col(emb_col).alias("e_a"))
    right = bucketed.select(F.col("bucket"), F.col(id_col).alias("id_b"),
                            F.col(emb_col).alias("e_b"))
    pairs = (left.join(right, "bucket")
             .where(F.col("id_a") != F.col("id_b"))
             .select("id_a", "id_b",
                     cosine_col(F.col("e_a"), F.col("e_b")).alias("cosine")))
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), "id_b")
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("id_a", "id_b", "cosine", "rank"))
