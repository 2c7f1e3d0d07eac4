"""Similarity search over the embeddings table (array<float> column).

- brute-force cosine top-k: the exactness baseline. Q query vectors x N
  candidates via broadcast of the (small) query side; the dot product is
  a JVM higher-order fn (zip_with + aggregate) in float64 — no UDF, no
  Python. At 100 TB the candidate scan is embarrassingly parallel;
  the top-k per query is a windowed rank over Q x N scored rows,
  shuffled by query_id (Q keys -> fine for small Q; for large Q use
  repartition on query_id).
- LSH bucket variant (scale path): deterministic random-hyperplane
  signatures from md5-nibble weights; candidates = bucket collisions,
  exact cosine re-rank inside buckets. Signature is map-only; the join
  is equi on (signature) instead of a cross product.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("l2_norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector (brute force)."""
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            # round BEFORE ranking: fold-order double noise (~1e-15) can
            # differ between engines and flip ranks of near-ties; ranking
            # on round(cos, 6) + cand_id is deterministic everywhere.
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.sqrt(_dot(F.col("qvec"), F.col("qvec")))
                   * F.sqrt(_dot(F.col("cvec"), F.col("cvec")))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 nibbles (public
    construction: sign-random-projection LSH, Charikar STOC'02)."""
    w = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        w.append((int(h[:2], 16) - 127.5) / 127.5)
    return w


def lsh_signatures(
    emb: DataFrame, n_planes: int = 8, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Map-only bit-signature: bit_p = sign(<v, h_p>)."""
    bits = []
    for p in range(n_planes):
        w = F.array(*[F.lit(x) for x in _hyperplane(p, dim)])
        bits.append(
            F.when(_dot(F.col(vec_col), w) >= 0, F.lit(1)).otherwise(F.lit(0))
            * (2 ** p)
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return emb.withColumn("lsh_sig", sig.cast("int"))


def lsh_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10, n_planes: int = 8
) -> DataFrame:
    """ANN top-k: candidates share the signature bucket; exact cosine
    re-rank within bucket. Recall < 1 by construction (graded vs the
    brute-force baseline in tests)."""
    s = lsh_signatures(emb, n_planes=n_planes)
    q = s.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        "lsh_sig",
    )
    c = s.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cvec"), "lsh_sig"
    )
    scored = (
        c.join(F.broadcast(q), "lsh_sig")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.sqrt(_dot(F.col("qvec"), F.col("qvec")))
                   * F.sqrt(_dot(F.col("cvec"), F.col("cvec")))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )
