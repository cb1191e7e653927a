"""Similarity search over embedding columns (SURVEY.md §2.11).

- cosine_topk: brute-force exact top-k — crossJoin of a *small* query
  set against the corpus; the dot product is a JVM-side higher-order
  fold (zip_with + aggregate), no Python in the loop. Correct baseline;
  O(|Q|·N) — only for bounded |Q|.
- lsh_topk: the scale path — random-hyperplane (SimHash) bucketing:
  sign-bit sketch of each vector against FIXED pseudo-random
  hyperplanes (deterministic, seed-free: hyperplane component h_{p,d} is
  a hash of (p,d) mapped to ±1), candidates = same-bucket pairs
  (multi-probe via all buckets at Hamming distance ≤ 1), exact cosine
  re-rank within candidates. At 100 TB: buckets shard the corpus, each
  query touches P+1 buckets instead of N rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

N_PLANES = 8  # 256 buckets


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).
    Returns (vec_id, neighbor_id, rank, cosine)."""
    # Norms are computed once per vector, not per pair — at N corpus
    # rows × Q queries that's N+Q norm folds instead of N·Q.
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (_dot(F.col("q_vec"), F.col("c_vec"))
             / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias(id_col),
            F.col("c_id").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


def cosine_pairs_gemm(df: DataFrame, threshold: float,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine >= threshold via a vectorized Pandas UDF:
    the corpus matrix (normalized rows) is captured into the closure and
    each Arrow batch does one numpy GEMM against it — ~100× faster than
    a per-pair JVM fold at fixture scale.

    Scale contract: the captured side must fit in executor memory
    (N×dim floats — 2000×64 ≈ 512 KB here; viable to ~10M×64). Beyond
    that, generate candidates with the SimHash buckets (lsh_topk) and
    re-score exactly, or block the GEMM by bucket.

    Returns (id_a, id_b, cosine) with id_a < id_b.
    """
    import numpy as np

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    rows = df.select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)

    out_schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType()),
         StructField("cosine", DoubleType())]
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a = np.array(list(pdf[vec_col]), dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ mat.T
            ii, jj = np.nonzero((sims >= threshold) & (a_ids[:, None] < ids[None, :]))
            yield pd.DataFrame(
                {"id_a": a_ids[ii], "id_b": ids[jj], "cosine": sims[ii, jj]}
            )

    return df.select(id_col, vec_col).mapInPandas(score, schema=out_schema)


def _hyperplane_sketch(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Deterministic sign-bit sketch: bit p = sign(Σ_d ±v_d) where the ±
    pattern for plane p is xxhash64(p, d) parity — a fixed pseudo-random
    hyperplane shared by every row without shipping any matrix."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(vec, lambda _, i: F.xxhash64(F.lit(p), i)),
                lambda x, h: F.when(h % 2 == 0, x.cast("double")).otherwise(-x.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(df: DataFrame, k: int, id_col: str = "vec_id",
             vec_col: str = "embedding", n_planes: int = N_PLANES) -> DataFrame:
    """Approximate top-k cosine neighbors for every vector via SimHash
    buckets with Hamming≤1 multi-probe. Returns (vec_id, neighbor_id,
    rank, cosine) — rank within retrieved candidates."""
    sk = df.select(
        F.col(id_col), F.col(vec_col),
        _hyperplane_sketch(F.col(vec_col), n_planes).alias("bucket"),
        _norm(F.col(vec_col)).alias("norm"),
    )
    # multi-probe: each vector is also registered in every bucket at
    # Hamming distance 1 (n_planes extra copies) on the *query* side only.
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(2 ** p)) for p in range(n_planes)],
    )
    q = sk.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col("norm").alias("q_norm"),
        F.explode(probes).alias("bucket"),
    )
    c = sk.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"), "bucket",
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id",
            (_dot(F.col("q_vec"), F.col("c_vec"))
             / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
        )
        .dropDuplicates(["q_id", "c_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias(id_col), F.col("c_id").alias("neighbor_id"),
                "rank", "cosine")
    )
