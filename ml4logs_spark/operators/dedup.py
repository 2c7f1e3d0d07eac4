"""Deduplication operators over the documents table.

Beyond the reference's scope (ml4logs has no corpus dedup), these are the
operations a large-scale training-data pipeline needs; all are expressed
with JVM-side higher-order functions — no Python in the hot path — and
every hash is md5-hex so the DuckDB oracle reproduces results exactly.

Scale notes
-----------
- exact dedup: one hash-groupBy shuffle on md5(text) — the canonical
  content-addressed dedup; at 100 TB, AQE + high shuffle parallelism on
  the digest key (uniform by construction, no skew).
- MinHash: signatures are per-row projections (map-only). LSH banding
  explodes each doc into #bands rows and shuffles by (band, hash) —
  candidate generation cost is O(docs x bands), never O(docs^2); only
  bucket-colliding pairs are joined and Jaccard-verified.
- lexicographic min of md5 hex strings == numeric min of the 128-bit
  hash value, so signatures avoid any engine-specific int conversion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8
LSH_BANDS = 4  # rows-per-band = N_MINHASH / LSH_BANDS = 2
SHINGLE_K = 3


def with_text_hash(docs: DataFrame) -> DataFrame:
    return docs.withColumn("text_hash", F.md5("text"))


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Content-hash groups: (text_hash, n_docs, keep_id=min doc_id)."""
    return with_text_hash(docs).groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keep_id"),
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Surviving rows after exact dedup (keep lowest doc_id per hash).

    Implemented as a min-aggregate + semi join rather than a window so
    the heavy side only shuffles once on the digest.
    """
    keep = exact_dup_groups(docs).select(F.col("keep_id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi")


def shingles_col(text_col: str = "text", k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles (JVM higher-order fns, no UDF)."""
    toks = F.split(F.col(text_col), " ")
    n = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1))
    sh = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(sh)


def with_shingles(docs: DataFrame) -> DataFrame:
    return docs.withColumn("shingles", shingles_col())


def minhash_col(i: int) -> Column:
    return F.array_min(
        F.transform(F.col("shingles"), lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
    )


def minhash_signatures(docs: DataFrame, n: int = N_MINHASH) -> DataFrame:
    """(doc_id, mh0..mh{n-1}) — per-row, map-only."""
    sh = with_shingles(docs)
    return sh.select(
        "doc_id", *[minhash_col(i).alias(f"mh{i}") for i in range(n)]
    )


def lsh_bands(sig: DataFrame, bands: int = LSH_BANDS, n: int = N_MINHASH) -> DataFrame:
    """Fold the signature into band hashes and explode to (doc_id, band, h)."""
    if n % bands != 0:
        raise ValueError(
            f"signature length ({n}) must be divisible by bands ({bands}); "
            "a remainder would silently drop hashes and change recall"
        )
    r = n // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat(*[F.col(f"mh{b * r + j}") for j in range(r)])).alias("h"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bh")
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Near-dup candidate pairs: docs sharing any LSH band bucket."""
    b = lsh_bands(minhash_signatures(docs))
    a = b.alias("a")
    c = b.alias("b")
    return (
        a.join(c, ["band", "h"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (verification step)."""
    sh = with_shingles(docs).select("doc_id", "shingles")
    out = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a")
                     .withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
                .withColumnRenamed("shingles", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.select(
        "doc_a", "doc_b",
        F.round(inter / union, 6).alias("jaccard"),
    )


def near_dups(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """LSH candidates -> exact-Jaccard verify -> thresholded pairs."""
    return jaccard_pairs(docs, lsh_candidate_pairs(docs)).filter(
        F.col("jaccard") >= threshold
    )


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs via pigeonhole banding — EXACT for
    the given radius: a 16-bit signature splits into 4 nibble bands;
    any pair within hamming distance <= 3 must agree on at least one
    whole band (pigeonhole), so the banded equi-join generates a
    COMPLETE candidate set and the bit_count(xor) verify filters it.
    O(docs x 4) candidate rows, never all-pairs — the production
    simhash search shape (Manku et al., WWW'07)."""
    s = simhash16(docs)
    bands = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", 4 * b).bitwiseAND(F.lit(15)).alias("nib"),
                )
                for b in range(4)
            ])
        ).alias("bn"),
    ).select("doc_id", "simhash", F.col("bn.band").alias("band"), F.col("bn.nib").alias("nib"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, ["band", "nib"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash via md5-nibble projections (portable variant).

    Each hex digit position d of md5(token) is one projection: tokens
    vote +1 if nibble >= 8 else -1; bit d = (sum >= 0). Deterministic in
    both engines (no platform hash), vectorized via higher-order fns.

    Single-pass: each token is md5-hashed exactly ONCE; all 16 bit votes
    accumulate in one ``aggregate`` with an array accumulator (round 1
    re-hashed every token 16x — same answer, 16x the md5 cost). A hex
    char ``c >= '8'`` is exactly ``nibble >= 8`` because [0-9a-f] are
    lexicographically ordered.
    """
    toks = F.array_distinct(F.split(F.col("text"), " "))
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), 16),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.split(F.substring(F.md5(t), 1, 16), ""),
                lambda c: F.when(c >= F.lit("8"), F.lit(1)).otherwise(F.lit(-1)),
            ),
            lambda a, v: a + v,
        ),
    )
    weights = F.array(*[F.lit(2**d) for d in range(16)])
    sim = F.aggregate(
        F.zip_with(votes, weights, lambda v, w: F.when(v >= 0, w).otherwise(F.lit(0))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return docs.select("doc_id", sim.cast("long").alias("simhash"))
