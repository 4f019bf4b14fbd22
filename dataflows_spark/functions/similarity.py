"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k as the exact baseline, and an LSH
(random-hyperplane) bucketed variant as the scale path.

Dot products are higher-order array expressions (``zip_with`` +
``aggregate``) — fully JVM-side, no Python in the scan. The LSH variant
reduces the candidate set per query from N to N/2^bits on average; at
100 TB, bucket signatures would be precomputed and the table bucketed
on them (bucket-join, no shuffle at query time).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k for one query vector. One scan,
    one narrow projection, one ordered limit (Spark's TakeOrdered —
    no full sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col), cosine_sim(F.col(vec_col).cast("array<double>"), q).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.standard_normal((bits, dim)).tolist()


def lsh_signature(vec_col: str, dim: int, bits: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane signature: bit i = sign(v · h_i). Deterministic
    (Philox-seeded planes)."""
    planes = _hyperplanes(dim, bits, seed)
    sig = F.lit(0)
    v = F.col(vec_col).cast("array<double>")
    for i, p in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in p])
        sig = sig + F.when(dot(v, h) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig.cast("int")


def lsh_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to vectors whose LSH
    bucket is within ``probe_hamming`` bits of the query's bucket
    (multi-probe), then brute-force inside the candidate set."""
    dim = dim or len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qsig |= 1 << i
    sig = lsh_signature(vec_col, dim, bits, seed)
    cand = df.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    return cosine_topk(cand.drop("__sig"), vec_col, id_col, query_vec, k)
