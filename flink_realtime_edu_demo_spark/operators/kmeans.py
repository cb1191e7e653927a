"""Distributed k-means (Lloyd's algorithm) over an embedding column —
the iterative-algorithm demonstrator (SURVEY.md §2.11; genuinely
non-SQL-expressible, hence rows-only + a numpy-reference unit test).

Driver-loop shape done right for 100 TB:
- per iteration the ONLY driver-side state is the k×dim centroid
  matrix (k=8, dim=64 → 4 KB) — the assignment pass never collects
  data rows;
- assignment is one Arrow-batched pandas UDF with the centroid matrix
  in the closure (numpy argmin over a (batch × k) distance GEMM);
- the update pass reuses the posexplode + exact-decimal mean layout of
  q_llm_centroids, so partition order cannot perturb centroids and the
  iteration is bit-deterministic run-to-run;
- ties (equidistant centroids) break to the lowest cluster id, and
  empty clusters keep their previous centroid — both deterministic.

Init is deterministic too: the k vectors with the smallest ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kmeans_assign(df: DataFrame, centroids: list[list[float]],
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """One assignment pass: (id_col, cluster) for the given centroids."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import IntegerType

    C = np.array(centroids, dtype=np.float64)  # k × dim, tiny closure

    def _assign(v):
        X = np.array(list(v), dtype=np.float64)
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row →
        # argmin over -2x·c + ||c||², ties to the lowest cluster id
        # (np.argmin returns the first minimal index).
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    # functional form: string type hints don't resolve under
    # `from __future__ import annotations` with locally-imported pandas
    assign = F.pandas_udf(_assign, IntegerType())

    return df.select(F.col(id_col), assign(F.col(vec_col)).cast("int").alias("cluster"))


def kmeans(df: DataFrame, k: int = 8, n_iter: int = 5,
           id_col: str = "vec_id", vec_col: str = "embedding"):
    """Lloyd's iterations; returns (assignments DataFrame, centroids).

    Each iteration: one Arrow assignment pass + one exact-decimal
    centroid aggregation (two shuffles), k×dim floats to the driver.
    The input is persisted for the duration of the loop (the canonical
    Spark idiom for iterative algorithms — every iteration re-reads the
    same working set) and released before returning; the returned
    assignment frame is locally checkpointed so its lineage doesn't
    depend on the unpersisted input.
    """
    df = df.persist()
    first = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(map(float, r[0])) for r in first]

    for _ in range(n_iter):
        assigned = kmeans_assign(df, centroids, id_col, vec_col)
        per_dim = (
            df.join(assigned, id_col)
            .select("cluster", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .collect()  # k × dim scalar means — driver state, not data rows
        )
        new_c = [list(c) for c in centroids]  # empty cluster keeps previous
        by_cluster: dict[int, dict[int, float]] = {}
        for r in per_dim:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        for c, dims in by_cluster.items():
            new_c[c] = [dims[i] for i in range(len(dims))]
        centroids = new_c

    out = kmeans_assign(df, centroids, id_col, vec_col).localCheckpoint(eager=True)
    df.unpersist()
    return out, centroids
