"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; sign-LSH bucketing is
the scale path (search only the query's bucket — an IVF-style candidate
cut). Dot products run as JVM higher-order functions (zip_with +
aggregate), not Python.

Scale design: brute-force is a map-side scan + a single top-k (no
shuffle beyond the final k rows when expressed as orderBy+limit with AQE;
for per-query batched top-k use a window over query_id). The LSH variant
shuffles only bucket-matched rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision (deterministic
    summation order — reproducible across runs and engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(a: Column, num_bits: int = 8) -> Column:
    """Random-hyperplane-style LSH bucket: the sign pattern of the first
    num_bits dimensions (deterministic planes = coordinate axes; swap in
    seeded hyperplanes for production skew control)."""
    bits = [F.when(F.element_at(a, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(num_bits)]
    return F.concat(*bits)


def brute_force_topk(embeddings: DataFrame, query_vec: list[float],
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     round_digits: int = 6) -> DataFrame:
    """Exact cosine top-k vs one query vector. Scores rounded for
    cross-engine comparability; ties broken by id."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_digits).alias("cos_sim"))
    return (scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
                  .limit(k))


def lsh_bucketed_topk(embeddings: DataFrame, query_vec: list[float],
                      k: int = 10, num_bits: int = 8,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      round_digits: int = 6) -> DataFrame:
    """ANN: search only vectors sharing the query's sign-LSH bucket.
    At scale the bucket filter prunes ~2^-num_bits of the corpus before
    any distance math; misses are the recall trade-off."""
    qbits = "".join("1" if v >= 0 else "0" for v in query_vec[:num_bits])
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    candidates = embeddings.filter(sign_bucket(F.col(vec_col), num_bits) == qbits)
    scored = candidates.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_digits).alias("cos_sim"))
    return (scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
                  .limit(k))
