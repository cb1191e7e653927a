"""LLM-data-pipeline operators (SURVEY.md §2.11, driver extension):
dedup (exact / fuzzy / MinHash-LSH), similarity search (brute-force,
SimHash-LSH-bucketed ANN, hash-verified IVF), vector quantization, text
analysis (tokens, TF-IDF, quality, language-ID, fingerprinting) over
the documents/embeddings fixtures.

Scale design: nothing here crossJoins the corpus against itself except
the bounded brute-force kNN baseline (|queries| fixed). Fuzzy dedup
goes through an inverted shingle index; ANN goes through SimHash
buckets; all text metrics are JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..operators.annsearch import (
    cosine_topk,
    lsh_topk_scaled,
    lsh_topk_scaled_oracle_sql,
)
from ..operators.kmeans import kmeans_oracle_sql as _kmeans_oracle_sql
from ..operators.graph import connected_components
from ..operators.packing import greedy_pack
from ..operators.minhash import (
    MAX_DF,
    jaccard_pairs,
    lsh_candidate_pairs_md5,
    lsh_oracle_sql_md5,
    minhash_signatures_md5,
    shingles,
)
from ..registry import query
from ..tables import load, load_spread

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")


@query(
    "q_llm_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies,
           md5(text) AS text_md5
    FROM documents
    GROUP BY text
    """,
)
def q_llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group identical texts, keep the smallest doc_id —
    the output is the full survivor manifest (one row per distinct
    text, with its copy count), i.e. the deduplicated corpus. The
    manifest form rather than a HAVING>1 duplicate report keeps the
    key non-vacuous: the small fixtures contain no exact duplicates
    (first appear at sf0.1), so a duplicates-only output would be
    empty==empty and verify nothing. At 100 TB group on a hash of the
    text (shuffle moves 16-byte keys, not documents) — md5 doubles as
    the oracle-checkable fingerprint."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.md5(F.col("text").cast("binary")).alias("text_md5"),
        )
        .select("keep_doc_id", "n_copies", "text_md5")
    )


@query(
    "q_llm_dedup_fuzzy",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS shingle
           FROM words, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS t(i)),
    counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    sdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM sh a JOIN sh b USING (shingle) JOIN sdf USING (shingle)
             WHERE a.doc_id < b.doc_id),
    common AS (SELECT cand.id_a, cand.id_b, COUNT(*) AS n_common
               FROM cand
               JOIN sh a ON a.doc_id = cand.id_a
               JOIN sh b ON b.doc_id = cand.id_b AND b.shingle = a.shingle
               GROUP BY 1, 2)
    SELECT id_a, id_b, n_common,
           ca.n_sh AS n_a, cb.n_sh AS n_b,
           n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) AS jaccard
    FROM common
    JOIN counts ca ON ca.doc_id = id_a
    JOIN counts cb ON cb.doc_id = id_b
    WHERE n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) >= 0.5
    """,
)
def q_llm_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by 3-word-shingle Jaccard >= 0.5 through a
    df-capped inverted shingle index (operators/minhash.jaccard_pairs,
    max_df=64): candidates come only from shingles shared by 2..64
    docs — bounding per-shingle pair expansion at max_df²/2 — and every
    candidate is then verified with the exact full-set intersection, so
    emitted jaccard values are exact. The oracle implements the same
    df-cap rule, so this is hash-checked end to end. 100 TB-safe: no
    crossJoin, no uncapped quadratic term."""
    d = load_spread(spark, sf_dir, "documents")
    return jaccard_pairs(shingles(d), threshold=0.5, max_df=MAX_DF)


@query("q_llm_minhash_lsh", oracle=lsh_oracle_sql_md5())
def q_llm_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (64 hashes) + banded LSH (16×4) candidate pairs — the
    sub-quadratic scale path whose recall target is the q_llm_dedup_fuzzy
    exact answer (tests assert recall=1.0 on the fixtures at j>=0.85).

    Hash-verified since r4: the md5-string construction
    (operators/minhash.minhash_signatures_md5 + lsh_candidate_pairs_md5)
    is deterministic and engine-portable, so the DuckDB oracle replays
    the exact 64-hash/16-band pipeline and the driver hash-matches the
    candidate set — LSH is probabilistic over the *hash-function draw*,
    which both engines share, not over runtime randomness."""
    d = load_spread(spark, sf_dir, "documents")
    return lsh_candidate_pairs_md5(minhash_signatures_md5(shingles(d)))


@query(
    "q_llm_knn",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS vec_id, c.vec_id AS c_id,
               list_reduce(list_transform(generate_series(1, len(q.e)),
                                          i -> q.e[i] * c.e[i]), (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(c.e, x -> x * x), (a, b) -> a + b)))
                   AS cosine
        FROM q, v c
        WHERE q.vec_id <> c.vec_id
    )
    SELECT vec_id, c_id AS neighbor_id, rank, round(cosine, 6) AS cosine_r
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cosine DESC, c_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
)
def q_llm_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 cosine neighbors for 10 query vectors
    (operators/annsearch.cosine_topk). The dot product is a left fold
    seeded at 0.0 in both engines → bit-identical doubles; cosine is
    surfaced rounded to 6."""
    e = load(spark, sf_dir, "embeddings")
    out = cosine_topk(e.filter(F.col("vec_id") < 10), e, k=5)
    return out.select(
        "vec_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine_r")
    )


# q_llm_dedup_embed (exact all-pairs embedding-cosine near-dup pairs)
# was RETIRED as a declared key in round 8 (VERDICT r7 #3), exactly as
# q_llm_knn_ivf was retired in round 6: exact all-pairs is inherently
# O(N²·d) however it is blocked, and a declared key must have a
# 100 TB-shaped plan. The operator survives as
# operators/annsearch.cosine_pairs_blocked — now behind a plan-time
# max_vectors gate — with its DuckDB oracle replay retained as a unit
# test (tests/test_operators.py::test_cosine_pairs_blocked_oracle_replay,
# oracle SQL in annsearch.cosine_pairs_oracle_sql). The DEPLOYMENT
# forms for embedding near-dup at scale are q_llm_semantic_dedup
# (cluster-bucketed SemDeDup, queries/llm3.py) and
# q_llm_knn_ivf_scaled (SimHash-bucketed ANN) — both declared, green,
# and soak-measured ~linear.


@query("q_llm_knn_ivf_scaled", oracle=lsh_topk_scaled_oracle_sql(k=5))
def q_llm_knn_ivf_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table SimHash ANN with the plane count AUTO-SCALED from
    the corpus size (m = smallest value in [4,24] with 256·2^m >= N,
    8 tables, numpy bucket scoring, exact re-rank over the candidate
    union) — the deployment form the round-5 100x soak proved
    load-bearing: fixed fixture-tuned m keeps bucket width growing
    with the corpus and the within-bucket exact kernel goes quadratic;
    scaled m holds expected width ~constant and total candidate volume
    ~linear (N · target · L).

    Hash-verified INCLUDING the scaling decision: the oracle
    (operators/annsearch.lsh_topk_scaled_oracle_sql) derives the same
    m from COUNT(*) with the same integer arithmetic, the plane matrix
    is md5-derived (seed-free), and every float reduction —
    projections, norms, dots — is an ascending-dimension left fold, so
    buckets, candidates, and cosines replay bit-for-bit at any fixture
    scale. 'Approximate' describes recall vs exact kNN, not
    nondeterminism. The fixed-m form (lsh_topk with explicit n_planes)
    stays a unit-tested operator for recall/bucket-cap semantics."""
    e = load_spread(spark, sf_dir, "embeddings")
    return lsh_topk_scaled(e, k=5).select(
        "vec_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine_r")
    )


@query(
    "q_llm_tfidf",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, t.tok FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        WHERE length(t.tok) > 0
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tokens GROUP BY 1, 2),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.tok AS token, tf.tf, df.df,
           round(ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0, 6) AS idf_r,
           round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf_r
    FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    WHERE tf.doc_id < 50
    """,
)
def q_llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts + smoothed TF-IDF (sklearn-style idf = ln((N+1)/(df+1))+1).
    tf/df are exact ints; idf rounded to 6 (ln is the only 1-ulp risk).
    df is computed over the FULL corpus; output restricted to doc_id<50."""
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("token")
    ).filter(F.length("token") > 0)
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a 1-row agg crossJoined into the plan (broadcast
    # nested loop of a single row) — one job, no separate d.count()
    # driver action / extra scan.
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(idf, 6).alias("idf_r"),
            F.round(F.col("tf") * idf, 6).alias("tfidf_r"),
        )
    )


@query(
    "q_llm_quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w,
               length(text) AS len_txt,
               length(replace(text, ' ', '')) AS len_nospace
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
           len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio,
           len_nospace * 1.0 / len(w) AS avg_token_len,
           CAST(len(list_filter(w, t -> list_contains(['the','a','of','and','in','to','is'], t)))
                AS BIGINT) AS n_stop,
           len(list_filter(w, t -> list_contains(['the','a','of','and','in','to','is'], t)))
               * 1.0 / len(w) AS stop_ratio,
           (n_chars BETWEEN 100 AND 2000)
               AND len(w) >= 20
               AND len(list_distinct(w)) * 1.0 / len(w) >= 0.2 AS passes_quality
    FROM toks
    """,
)
def q_llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token stats, type-token ratio,
    stopword ratio, and a Gopher-style length/diversity filter flag.
    All ratios are int/int divisions on identical operands → exact."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_tok = F.size(w)
    n_dis = F.size(F.array_distinct(w))
    n_stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        "lang",
        n_tok.cast("long").alias("n_tokens"),
        n_dis.cast("long").alias("n_distinct"),
        (n_dis / n_tok).alias("distinct_ratio"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n_tok).alias(
            "avg_token_len"
        ),
        n_stop.cast("long").alias("n_stop"),
        (n_stop / n_tok).alias("stop_ratio"),
        (
            F.col("n_chars").between(100, 2000)
            & (n_tok >= 20)
            & ((n_dis / n_tok) >= 0.2)
        ).alias("passes_quality"),
    )


@query(
    "q_llm_lang_id",
    oracle="""
    WITH sc AS (
        SELECT doc_id, lang AS lang_label, string_split(text, ' ') AS w FROM documents
    ),
    scored AS (
        SELECT doc_id, lang_label,
               len(list_filter(w, t -> list_contains(['the','and','of','is','a'], t))) AS s_en,
               len(list_filter(w, t -> list_contains(['le','la','et','un','est'], t))) AS s_fr,
               len(list_filter(w, t -> list_contains(['el','y','de','que','es'], t))) AS s_es,
               len(list_filter(w, t -> list_contains(['der','und','die','das','ist'], t))) AS s_de
        FROM sc
    )
    SELECT doc_id, lang_label, s_en, s_fr, s_es, s_de,
           CASE WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
                WHEN s_es >= s_de THEN 'es'
                ELSE 'de' END AS lang_pred
    FROM scored
    """,
)
def q_llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (n-gram/stopword scoring with a
    deterministic argmax tie-break order en>fr>es>de). The fixture text
    is synthetic word-soup, so the interesting output is the score
    columns + deterministic prediction, compared exactly."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    markers = {
        "s_en": ("the", "and", "of", "is", "a"),
        "s_fr": ("le", "la", "et", "un", "est"),
        "s_es": ("el", "y", "de", "que", "es"),
        "s_de": ("der", "und", "die", "das", "ist"),
    }
    def marker_count(ms: tuple[str, ...]):
        return lambda t: t.isin(*ms)

    scores = {
        k: F.size(F.filter(w, marker_count(ms))).cast("long").alias(k)
        for k, ms in markers.items()
    }
    scored = d.select("doc_id", F.col("lang").alias("lang_label"), *scores.values())
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de")),
            "en",
        )
        .when((F.col("s_fr") >= F.col("s_es")) & (F.col("s_fr") >= F.col("s_de")), "fr")
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
    )
    return scored.withColumn("lang_pred", pred)


@query(
    "q_llm_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           substring(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 8)
               AS fp_prefix,
           length(regexp_replace(text, '\\s+', ' ', 'g')) AS norm_len
    FROM documents
    """,
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text (the content-defined key used for cross-shard dedup joins at
    100 TB — the shuffle moves 16-byte keys, never documents)."""
    d = load(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    fp = F.md5(norm.cast("binary"))
    return d.select(
        "doc_id",
        fp.alias("fp"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
        F.length(F.regexp_replace("text", r"\s+", " ")).cast("long").alias("norm_len"),
    )


@query(
    "q_llm_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))
                AS BIGINT) AS n_bpe,
           round(n_chars * 1.0 /
                 len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')), 6)
               AS chars_per_tok
    FROM documents
    """,
)
def q_llm_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for pipeline budgeting: whitespace tokens and a
    BPE-ish pre-tokenizer regex (GPT-2-style ' ?letters | ?digits |
    ?punct' alternation — disjoint first-char classes, so leftmost-first
    (Java) and RE2 (DuckDB) agree), plus chars-per-token, the standard
    tokens-from-bytes estimator. All JVM-side regex — no UDF."""
    d = load(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), F.lit(0))
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws"),
        F.size(bpe).cast("long").alias("n_bpe"),
        F.round(F.col("n_chars") / F.size(bpe), 6).alias("chars_per_tok"),
    )


_SIMHASH_BIT_SUMS = ",\n           ".join(
    f"SUM(CASE WHEN (h1 >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS a{i},"
    f" SUM(CASE WHEN (h2 >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
    for i in range(32)
)
_SIMHASH_S1 = " + ".join(f"(CASE WHEN a{i} >= 0 THEN {2**i} ELSE 0 END)" for i in range(32))
_SIMHASH_S2 = " + ".join(f"(CASE WHEN b{i} >= 0 THEN {2**i} ELSE 0 END)" for i in range(32))


@query(
    "q_llm_dedup_simhash",
    oracle=f"""
    WITH toks AS (SELECT DISTINCT doc_id, t.tok
                  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
                  WHERE length(t.tok) > 0),
    h AS (SELECT doc_id,
                 CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) AS h1,
                 CAST(concat('0x', substring(md5(tok), 9, 8)) AS BIGINT) AS h2
          FROM toks),
    bits AS (SELECT doc_id,
           {_SIMHASH_BIT_SUMS}
             FROM h GROUP BY doc_id),
    sim AS (SELECT doc_id, CAST({_SIMHASH_S1} AS BIGINT) AS s1,
                           CAST({_SIMHASH_S2} AS BIGINT) AS s2 FROM bits)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s1, b.s1)) + bit_count(xor(a.s2, b.s2)) AS BIGINT)
               AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s1, b.s1)) + bit_count(xor(a.s2, b.s2)) <= 3
    """,
)
def q_llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash text dedup (Charikar / Manku WWW'07): 64-bit md5-derived
    fingerprint per document (two 32-bit halves, signed-BIGINT-safe),
    then all pairs within Hamming distance 3 — found EXACTLY via
    pigeonhole banding (4×16-bit bands; a pair ≤3 bits apart must agree
    on one band) as a bucket equi-join, not the oracle's naive
    self-join. operators/minhash.simhash_md5 + simhash_pairs."""
    from ..operators.minhash import simhash_md5, simhash_pairs

    d = load_spread(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
        .distinct()
    )
    return simhash_pairs(simhash_md5(toks), max_hamming=3)


@query(
    "q_llm_winnow",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id, i, array_to_string(list_slice(w, i, i + 2), ' ') AS shingle
           FROM words, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS t(i)),
    h AS (SELECT doc_id, i,
                 CAST(concat('0x', substring(md5(shingle), 1, 8)) AS BIGINT) AS h
          FROM sh),
    fps AS (SELECT doc_id,
                   min(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
            FROM h)
    SELECT DISTINCT doc_id, fp FROM fps
    """,
)
def q_llm_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    MOSS scheme): hash every 3-word shingle in position order (rolling
    k-gram hashes), slide a window of 4 over the hash sequence, record
    the window minimum — a position-robust fingerprint set ~1/4 the
    shingle count. All relational: posexplode + one window min + distinct;
    md5-derived 32-bit hashes keep it engine-reproducible."""
    from ..operators.minhash import shingle_array

    d = load_spread(spark, sf_dir, "documents")
    pos = d.select("doc_id", F.posexplode(shingle_array()).alias("i", "shingle"))
    h = F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(-3, 0)
    return (
        pos.select("doc_id", F.min(h).over(w).alias("fp"))
        .distinct()
    )


@query(
    "q_llm_centroids",
    oracle="""
    SELECT label,
           CAST(i - 1 AS BIGINT) AS dim,
           CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS centroid,
           COUNT(*) AS n_vecs
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    GROUP BY label, i
    """,
)
def q_llm_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the reduce step of k-means / the
    class-prototype builder): posexplode to (label, dim, value) and
    aggregate per (label, dim) — the array never travels through the
    shuffle whole, and the sum is decimal-exact so partition order
    cannot perturb the mean. Output is (label, dim, centroid) rows, the
    shuffle-friendly layout; re-assembly to array<float> is a narrow
    collect_list sorted by dim when a consumer needs vectors."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .select("label", F.col("dim").cast("long").alias("dim"), "centroid", "n_vecs")
    )


@query(
    "q_llm_dedup_chargram",
    oracle="""
    WITH raw_grams AS (
        SELECT DISTINCT doc_id, substring(text, i, 4) AS shingle
        FROM documents,
             unnest(generate_series(1, greatest(length(text) - 3, 1))) AS t(i)
    ),
    grams AS (SELECT * FROM raw_grams
              WHERE CAST(concat('0x', substring(md5(shingle), 1, 8)) AS BIGINT) % 4 = 0),
    counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM grams GROUP BY 1),
    gdf AS (SELECT shingle FROM grams GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM grams a JOIN grams b USING (shingle) JOIN gdf USING (shingle)
             WHERE a.doc_id < b.doc_id),
    common AS (SELECT cand.id_a, cand.id_b, COUNT(*) AS n_common
               FROM cand
               JOIN grams a ON a.doc_id = cand.id_a
               JOIN grams b ON b.doc_id = cand.id_b AND b.shingle = a.shingle
               GROUP BY 1, 2)
    SELECT id_a, id_b, n_common,
           ca.n_sh AS n_a, cb.n_sh AS n_b,
           n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) AS jaccard
    FROM common
    JOIN counts ca ON ca.doc_id = id_a
    JOIN counts cb ON cb.doc_id = id_b
    WHERE n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) >= 0.6
    """,
)
def q_llm_dedup_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-4-gram Jaccard near-dup pairs (threshold 0.6) — the
    language-agnostic n-gram variant (robust to tokenization and
    whitespace differences, the standard CJK-safe fallback), over a
    deterministic 1/4 MOD-sample of the gram universe (Broder's sketch
    family: J over A∩S vs B∩S for a fixed hash-defined S is an unbiased
    Jaccard estimate, and both engines select the identical S from the
    md5-derived gram hash). Char-grams are ~4× denser than word
    shingles; the sample keeps the inverted index the same size as the
    word variant's. Same df-capped candidates + exact-verify machinery
    downstream — only the shingling and sampling change."""
    d = load_spread(spark, sf_dir, "documents")
    # per-position substring generation (A/B-measured faster than char-
    # array zipping for ASCII text) with row-level distinct AFTER the
    # 1/4 sample — a whole-array array_distinct is O(len²) per doc and
    # dominated this query before the restructure
    idx = F.sequence(F.lit(1), F.greatest(F.length("text") - 3, F.lit(1)))
    grams = (
        d.select(
            "doc_id",
            F.explode(
                F.transform(idx, lambda i: F.substring(F.col("text"), i, 4))
            ).alias("shingle"),
        )
        .filter(
            (F.length("shingle") > 0)
            & (
                F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10)
                .cast("long") % 4 == 0
            )
        )
        .distinct()
    )
    return jaccard_pairs(grams, threshold=0.6, max_df=MAX_DF)


@query(
    "q_llm_clean_corpus",
    oracle="""
    WITH q AS (
        SELECT doc_id, text, lang, n_chars,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' '))) AS n_dis
        FROM documents
    ),
    filtered AS (
        SELECT * FROM q
        WHERE n_chars BETWEEN 100 AND 2000
          AND n_tok >= 20
          AND n_dis * 1.0 / n_tok >= 0.2
          AND lang IN ('en', 'fr', 'es', 'de')
    ),
    deduped AS (
        SELECT min(doc_id) AS doc_id, text,
               min(lang) AS lang, min(n_tok) AS n_tok
        FROM filtered GROUP BY text
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN n_tok > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
    FROM deduped
    GROUP BY lang
    """,
)
def q_llm_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning pipeline as ONE plan: quality
    filters (length / token count / type-token ratio) → language
    whitelist → exact dedup keeping the smallest doc_id → per-language
    token budget report. The shape every LLM data pipeline runs nightly;
    here it is narrow-ops + two shuffles (dedup groupBy text-hash, final
    agg), with all filters pushed ahead of the dedup shuffle so
    discarded docs never shuffle at all."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_tok, n_dis = F.size(w), F.size(F.array_distinct(w))
    filtered = (
        d.select("doc_id", "text", "lang", "n_chars",
                 n_tok.alias("n_tok"), n_dis.alias("n_dis"))
        .filter(
            F.col("n_chars").between(100, 2000)
            & (F.col("n_tok") >= 20)
            & (F.col("n_dis") / F.col("n_tok") >= 0.2)
            & F.col("lang").isin("en", "fr", "es", "de")
        )
    )
    deduped = filtered.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("n_tok").alias("n_tok"),
    )
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("n_tok") > 50, 1).otherwise(0)).cast("long").alias("n_long"),
    )


@query(
    "q_llm_substring_dedup",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    win AS (SELECT doc_id,
                   md5(array_to_string(list_slice(w, i, i + 19), ' ')) AS win_md5
            FROM words,
                 unnest(generate_series(1, len(w) - 19)) AS t(i))
    SELECT win_md5,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM win
    GROUP BY win_md5
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def q_llm_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SUBSTRING-level dedup (the Lee et al., ACL'22 'Deduplicating
    Training Data' shape): every 20-token sliding window (stride 1, full
    windows only) is hashed, and windows occurring in ≥2 distinct docs
    are reported with corpus occurrence counts and the canonical keeper.
    Downstream, a cutter removes the duplicated spans from non-keeper
    docs — the reporting half is the distributed-heavy part.

    One groupBy shuffle over (window-hash, doc_id); windows travel as
    16-byte md5 strings, never text. At 100 TB the stride-1 window
    stream is ~20× the token stream — apply the chargram query's
    MOD-sampling (deterministic hash-defined sample S; matches on A∩S
    estimate the full overlap unbiasedly) or a stride >1; both engines
    would select the identical S, keeping the oracle exact.

    Window construction is per-position slice+join, not the n-pass
    zip_with chain the w=3 shingles use: at w=20 the chain's
    intermediate strings copy ~w²/2 chars per window and its 19-deep
    expression tree bloats codegen; the crossover favors slices for
    large w (A/B-measured). Spark's sequence(1, 0) is DESCENDING, not
    empty, so short docs are guarded to an empty array explicitly."""
    d = load_spread(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    windows = F.when(
        F.size(arr) >= 20,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 19),
            lambda i: F.array_join(F.slice(arr, i, 20), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    win = d.select(
        "doc_id",
        F.explode(windows).alias("win"),
    ).select("doc_id", F.md5(F.col("win").cast("binary")).alias("win_md5"))
    return (
        win.groupBy("win_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "q_llm_bigram_score",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 1), ' ') AS bigram
           FROM words,
                unnest(generate_series(1, len(w) - 1)) AS t(i)),
    cnt AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS df FROM bg GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(df) AS BIGINT) AS sum_df,
           CAST(SUM(df) AS BIGINT) * 1.0 / COUNT(*) AS avg_df
    FROM bg JOIN cnt USING (bigram)
    GROUP BY doc_id
    """,
)
def q_llm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram LM familiarity score — the relational heart
    of perplexity-style quality filtering: count every bigram over the
    whole corpus, then score each document by the mean corpus frequency
    of its bigrams (all occurrences, duplicates included). Low scores
    flag gibberish/outlier docs; high scores flag boilerplate — both
    tails get cut in real pipelines.

    Integer-exact across engines: counts are BIGINT sums, and avg_df is
    the single double division at the end (int/int, same operands both
    engines). Two shuffles (corpus bigram count; per-doc score agg) plus
    one equi-join on the bigram key — big-big sort-merge at 100 TB,
    where the bigram count table is itself corpus-sized before the
    usual min-df floor."""
    d = load_spread(spark, sf_dir, "documents")
    from ..operators.minhash import _ngram_zip

    arr = F.split(F.col("text"), " ")
    bg = d.select(
        "doc_id",
        F.explode(_ngram_zip(arr, 2, " ", keep_partial=False)).alias("bigram"),
    )
    cnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("df"))
    return (
        bg.join(cnt, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("df").cast("long").alias("sum_df"),
            (F.sum("df").cast("long") * F.lit(1.0) / F.count(F.lit(1))).alias("avg_df"),
        )
    )


@query("q_llm_kmeans", oracle=_kmeans_oracle_sql(k=8, n_iter=5))
def q_llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 5 iterations) over the embedding
    corpus (operators/kmeans.py): Arrow-batched assignment against a
    4 KB broadcast centroid matrix + exact-decimal centroid update —
    the iterative-driver-loop pattern where per-iteration driver state
    is k×dim scalars, never data rows. Unit-tested against a pure-numpy
    reference (>=99% label agreement).

    Hash-verified since r4: with deterministic init (first k ids),
    ordered-fold distances, exact-DECIMAL centroid means, and a FIXED
    iteration count, the whole run is a pure function of the input — the
    DuckDB oracle (operators/kmeans.kmeans_oracle_sql) unrolls the 5
    iterations into chained CTEs and matches the final assignment
    bit-for-bit."""
    from ..operators.kmeans import kmeans

    e = load(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(e, k=8, n_iter=5)
    return assigned


# Fixed literal centroids for the oracle-able assignment step: k=4,
# dim=64, every component an EXACT 4-decimal value ((h-500)*4/10000 for
# an integer hash h < 1000), so the decimal literal in the oracle SQL
# and the Python float in the Spark plan parse to the same double.
def _assign_centroids(k: int = 4, dim: int = 64) -> list[list[float]]:
    return [
        [
            ((((ki * dim + d) * 2654435761) % 1000) - 500) * 4 / 10000.0
            for d in range(dim)
        ]
        for ki in range(k)
    ]


def _sqdist_sql() -> str:
    """SQL expressions d0..d{k-1}: squared distance of ``embedding`` to
    each literal centroid, left-fold accumulation (== Spark's
    0.0-seeded ascending F.aggregate, bit-identical)."""
    dists = []
    for ki, c in enumerate(_assign_centroids()):
        lits = "[" + ", ".join(repr(v) for v in c) + "]"
        dists.append(
            f"list_reduce(list_transform(embedding, (x, i) ->"
            f" (CAST(x AS DOUBLE) - ({lits})[i])"
            f" * (CAST(x AS DOUBLE) - ({lits})[i])), (a, b) -> a + b) AS d{ki}"
        )
    return ",\n               ".join(dists)


_SQL_ARGMIN4 = """CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
                WHEN d1 <= d2 AND d1 <= d3 THEN 1
                WHEN d2 <= d3 THEN 2
                ELSE 3 END"""


def _sqdist_cols(vec_d):
    """Spark twins of _sqdist_sql: one distance Column per centroid."""
    cols = []
    for ki, c in enumerate(_assign_centroids()):
        lit = F.array(*[F.lit(v) for v in c])
        cols.append(
            F.aggregate(
                F.zip_with(vec_d, lit, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias(f"d{ki}")
        )
    return cols


def _argmin4_col():
    return (
        F.when((F.col("d0") <= F.col("d1")) & (F.col("d0") <= F.col("d2"))
               & (F.col("d0") <= F.col("d3")), 0)
        .when((F.col("d1") <= F.col("d2")) & (F.col("d1") <= F.col("d3")), 1)
        .when(F.col("d2") <= F.col("d3"), 2)
        .otherwise(3)
    )


def _assign_oracle() -> str:
    d = _sqdist_sql()
    return f"""
    WITH dist AS (
        SELECT vec_id, label,
               {d}
        FROM embeddings
    )
    SELECT vec_id, label,
           CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
                WHEN d1 <= d2 AND d1 <= d3 THEN 1
                WHEN d2 <= d3 THEN 2
                ELSE 3 END AS cluster
    FROM dist
    """


@query("q_llm_kmeans_assign", oracle=_assign_oracle())
def q_llm_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means ASSIGNMENT step with fixed literal centroids — the
    oracle-able derivative of the (rows-only) iterative q_llm_kmeans:
    argmin over k squared distances is plain relational algebra, so the
    driver hash-checks this one. Pure JVM higher-order folds (zip_with +
    aggregate, ascending-dimension accumulation seeded 0.0 — the exact
    fold order of the oracle's list_reduce), ties to the lowest cluster
    id via the CASE chain, identical in both engines because every
    distance is bit-identical. No UDF, no shuffle: a narrow map over the
    embedding scan. Cross-checked against operators/kmeans.kmeans_assign
    (the numpy/BLAS twin) in tests."""
    e = load(spark, sf_dir, "embeddings")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dist = e.select("vec_id", "label", *_sqdist_cols(vec_d))
    return dist.select(
        "vec_id", "label", _argmin4_col().cast("int").alias("cluster")
    )


def _ivf_oracle() -> str:
    d = _sqdist_sql()
    qd_union = "\n          UNION ALL ".join(
        f"SELECT vec_id, {ki} AS c, d{ki} AS d FROM dist WHERE vec_id < 10"
        for ki in range(4)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    dist AS (
        SELECT vec_id,
               {d}
        FROM embeddings
    ),
    asgn AS (
        SELECT v.vec_id, v.e,
               {_SQL_ARGMIN4} AS cluster
        FROM dist JOIN v ON v.vec_id = dist.vec_id
    ),
    qd AS ({qd_union}),
    qp AS (SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM qd) WHERE rn <= 2),
    scored AS (
        SELECT q.vec_id, a.vec_id AS c_id,
               list_reduce(list_transform(generate_series(1, len(q.e)),
                                          i -> q.e[i] * a.e[i]), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(q.e, x -> x * x), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(a.e, x -> x * x), (x, y) -> x + y)))
                   AS cosine
        FROM qp
        JOIN v q ON q.vec_id = qp.vec_id
        JOIN asgn a ON a.cluster = qp.c AND a.vec_id <> q.vec_id
    )
    SELECT vec_id, c_id AS neighbor_id, rank, round(cosine, 6) AS cosine_r
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cosine DESC, c_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """


@query("q_llm_ann_ivf", oracle=_ivf_oracle())
def q_llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors, fully
    hash-verified: corpus vectors are assigned to their nearest literal
    coarse centroid (the trained-quantizer role q_llm_kmeans plays at
    scale), each query probes its nprobe=2 nearest clusters, and only
    those clusters' members are exactly re-ranked — the candidate set is
    ~nprobe/k of the corpus instead of all of it. Everything is
    relational: JVM distance folds (bit-identical to the oracle's
    list_reduce), a tiny probe table broadcast onto the cluster-
    partitioned assignment, one window for the top-5. At 100 TB the
    assignment is a narrow map over the embedding scan (optionally
    written bucketed BY cluster so probes prune partitions), and recall
    tunes with nprobe/k like any IVF index. Complements the SimHash-LSH
    path (q_llm_knn_ivf_scaled): that one is rows-only/probabilistic, this one
    is deterministic and driver-hash-checked end to end."""
    from ..operators.annsearch import _dot, _norm

    e = load(spark, sf_dir, "embeddings")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dist = e.select("vec_id", vec_d.alias("e"), *_sqdist_cols(vec_d))
    asgn = dist.select(
        "vec_id", "e", _argmin4_col().cast("int").alias("cluster")
    )
    qd = dist.filter(F.col("vec_id") < 10).select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(ki).alias("c"), F.col(f"d{ki}").alias("d"))
            for ki in range(4)
        ])).alias("p"),
    ).select("vec_id", "p.c", "p.d")
    wq = Window.partitionBy("vec_id").orderBy("d", "c")
    qp = (
        qd.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select(F.col("vec_id").alias("q_id"), F.col("c").alias("cluster"))
    )
    q = asgn.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("q_e")
    )
    scored = (
        asgn.join(F.broadcast(qp), "cluster")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(F.broadcast(q), "q_id")
        .select(
            F.col("q_id").alias("vec_id"),
            F.col("vec_id").alias("c_id"),
            (_dot(F.col("q_e"), F.col("e"))
             / (_norm(F.col("q_e")) * _norm(F.col("e")))).alias("cosine"),
        )
    )
    wr = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("vec_id", F.col("c_id").alias("neighbor_id"), "rank",
                F.round("cosine", 6).alias("cosine_r"))
    )


@query(
    "q_llm_embed_quant",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    n AS (SELECT vec_id, e,
                 sqrt(list_reduce(list_transform(e, x -> x * x),
                                  (a, b) -> a + b)) AS nrm
          FROM v)
    SELECT vec_id,
           CAST(i - 1 AS INT) AS dim,
           CAST(floor(127.0 * e[i] / nrm) AS INT) AS q8,
           round(nrm, 6) AS norm_r
    FROM n, unnest(generate_series(1, len(e))) AS t(i)
    WHERE nrm > 0
    """,
)
def q_llm_embed_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 vector quantization (the compression step before an
    ANN index ships to serving): L2-normalize each embedding and floor
    each component into [-127, 127]. floor (not round) because Spark
    rounds HALF_UP and DuckDB HALF_EVEN — floor is the deterministic
    cross-engine choice; the norm fold is the usual 0.0-seeded ascending
    accumulation, bit-identical to the oracle's list_reduce. Output is
    posexploded (vec_id, dim, q8) — arrays don't survive the driver's
    pandas canonicalization, and the long layout is what a columnar
    quantized index stores anyway. Zero-norm vectors are excluded
    (normalization undefined)."""
    from ..operators.annsearch import _norm

    e = load(spark, sf_dir, "embeddings")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    n = e.select("vec_id", _norm(F.col("embedding")).alias("nrm"),
                 F.posexplode(vec_d).alias("dim", "v")).filter(F.col("nrm") > 0)
    return n.select(
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.lit(127.0) * F.col("v") / F.col("nrm")).cast("int").alias("q8"),
        F.round("nrm", 6).alias("norm_r"),
    )


@query(
    "q_llm_split",
    oracle="""
    SELECT doc_id, lang,
           (doc_id * 2654435761 + 104729) % 4294967296 % 100 AS bucket,
           CASE WHEN (doc_id * 2654435761 + 104729) % 4294967296 % 100 < 80
                THEN 'train'
                WHEN (doc_id * 2654435761 + 104729) % 4294967296 % 100 < 90
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_llm_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by key hash — the
    reproducible-split idiom every training pipeline needs: membership
    is a pure function of doc_id, so re-runs, backfills, and incremental
    appends land each doc in the same split with no stored assignment
    table. Narrow map, zero shuffle, zero UDF. The mixer here is a
    Knuth multiplicative hash kept exactly expressible in both engines'
    int64 arithmetic; at 100 TB swap in xxhash64(doc_id) — same shape,
    same guarantees — once cross-engine verification isn't needed."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        (F.col("doc_id") * F.lit(2654435761) + F.lit(104729))
        % F.lit(4294967296) % F.lit(100)
    )
    return d.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "q_llm_repetition",
    oracle="""
    WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM documents),
    wc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_words,
           COUNT(*) AS n_uniq,
           round(COUNT(*) * 1.0 / SUM(c), 6) AS uniq_ratio_r,
           round(MAX(c) * 1.0 / SUM(c), 6) AS top_share_r
    FROM wc GROUP BY doc_id
    """,
)
def q_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition / diversity quality signals (the Gopher-style filters
    that catch boilerplate and degenerate generations): per-doc word
    count, unique-word count, unique ratio, and top-word share. Lowered
    as explode → two-level aggregate with map-side partial combine; the
    first groupBy keys on (doc_id, word) so the heavy stream shrinks
    before the per-doc rollup. Ratios are single double divisions of
    exact integer counts — bit-identical cross-engine."""
    d = load_spread(spark, sf_dir, "documents")
    wc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rep = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_uniq"),
        F.max("c").alias("top_c"),
    )
    return rep.select(
        "doc_id",
        "n_words",
        "n_uniq",
        F.round(F.col("n_uniq") / F.col("n_words"), 6).alias("uniq_ratio_r"),
        F.round(F.col("top_c") / F.col("n_words"), 6).alias("top_share_r"),
    )


@query(
    "q_llm_dup_groups",
    oracle="""
    WITH RECURSIVE
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(w, i, i + 2), ' ') AS shingle
           FROM words,
                unnest(generate_series(1, greatest(len(w) - 2, 1))) AS t(i)),
    counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    sdf AS (SELECT shingle FROM sh GROUP BY shingle
            HAVING COUNT(*) BETWEEN 2 AND 64),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM sh a JOIN sh b USING (shingle) JOIN sdf USING (shingle)
             WHERE a.doc_id < b.doc_id),
    common AS (SELECT cand.id_a, cand.id_b, COUNT(*) AS n_common
               FROM cand
               JOIN sh a ON a.doc_id = cand.id_a
               JOIN sh b ON b.doc_id = cand.id_b AND b.shingle = a.shingle
               GROUP BY 1, 2),
    edges AS (SELECT id_a, id_b FROM common
              JOIN counts ca ON ca.doc_id = id_a
              JOIN counts cb ON cb.doc_id = id_b
              WHERE n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) >= 0.5),
    sym AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b, id_a FROM edges),
    reach AS (
        SELECT DISTINCT a AS id, a AS label FROM sym
        UNION
        SELECT s.a AS id, r.label FROM sym s JOIN reach r ON r.id = s.b
    ),
    comp AS (SELECT id AS doc_id, MIN(label) AS group_id
             FROM reach GROUP BY id)
    SELECT c.doc_id, c.group_id, s.n_members
    FROM comp c
    JOIN (SELECT group_id, COUNT(*) AS n_members
          FROM comp GROUP BY 1) s USING (group_id)
    """,
)
def q_llm_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate GROUPS (not just pairs): connected components over
    the exact-verified jaccard>=0.5 edge list, labelling every member
    with its group's min doc_id — the step that turns pairwise dedup
    output into 'keep one doc per cluster' decisions. Spark side is
    operators/graph.py connected_components (default: min-label rounds
    with a pointer-jumping shortcut, O(log diameter) rounds on any
    graph shape, so one long-chain component can't cost diameter-many
    jobs; a size-gated driver union-find absorbs tiny edge lists —
    which this fixture's dup graph is at every tested scale, 23 nodes
    even at the 100x soak; driver holds only per-round scalar probes);
    the oracle is the same fixpoint via a recursive CTE.
    Deterministic: the fixpoint is unique, so the iterative path
    hash-matches exact SQL."""
    d = load_spread(spark, sf_dir, "documents")
    pairs = jaccard_pairs(shingles(d), threshold=0.5, max_df=MAX_DF).select(
        "id_a", "id_b"
    )
    labels = connected_components(pairs)
    # group size via a window over the SAME label partitioning — no
    # groupBy+self-join (which Catalyst would clone, since labels is an
    # uncached iterative result): one shuffle, reused for count and output
    w = Window.partitionBy("label")
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("group_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_members"),
    )


@query(
    "q_llm_canonical_pick",
    oracle="""
    WITH RECURSIVE
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(w, i, i + 2), ' ') AS shingle
           FROM words,
                unnest(generate_series(1, greatest(len(w) - 2, 1))) AS t(i)),
    counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    sdf AS (SELECT shingle FROM sh GROUP BY shingle
            HAVING COUNT(*) BETWEEN 2 AND 64),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM sh a JOIN sh b USING (shingle) JOIN sdf USING (shingle)
             WHERE a.doc_id < b.doc_id),
    common AS (SELECT cand.id_a, cand.id_b, COUNT(*) AS n_common
               FROM cand
               JOIN sh a ON a.doc_id = cand.id_a
               JOIN sh b ON b.doc_id = cand.id_b AND b.shingle = a.shingle
               GROUP BY 1, 2),
    edges AS (SELECT id_a, id_b FROM common
              JOIN counts ca ON ca.doc_id = id_a
              JOIN counts cb ON cb.doc_id = id_b
              WHERE n_common * 1.0 / (ca.n_sh + cb.n_sh - n_common) >= 0.5),
    sym AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b, id_a FROM edges),
    reach AS (
        SELECT DISTINCT a AS id, a AS label FROM sym
        UNION
        SELECT s.a AS id, r.label FROM sym s JOIN reach r ON r.id = s.b
    ),
    comp AS (SELECT id AS doc_id, MIN(label) AS group_id
             FROM reach GROUP BY id),
    sized AS (SELECT c.doc_id, c.group_id,
                     CAST(length(d.text) AS BIGINT) AS n_chars
              FROM comp c JOIN documents d USING (doc_id)),
    pick AS (SELECT doc_id, group_id, n_chars,
                    first_value(doc_id) OVER (
                        PARTITION BY group_id
                        ORDER BY n_chars DESC, doc_id) AS canonical_id
             FROM sized)
    SELECT p.doc_id, p.group_id, s.n_members, p.n_chars, p.canonical_id,
           p.doc_id = p.canonical_id AS keep
    FROM pick p
    JOIN (SELECT group_id, COUNT(*) AS n_members
          FROM comp GROUP BY 1) s USING (group_id)
    """,
)
def q_llm_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-cluster CANONICALIZATION — the pipeline stage between
    near-dup grouping and corpus filtering: inside every connected
    dup cluster keep exactly one document (longest text wins, doc_id
    breaks ties — the standard 'keep the most complete copy'
    heuristic) and mark the rest as drops. Same edge list + components
    machinery as q_llm_dup_groups; the pick is one first_value window
    over the SAME group partitioning the member count uses, so
    canonical selection adds no extra shuffle. Emits one decision row
    per clustered doc (singletons never enter the edge list — they are
    trivially keeps and would only pad the output)."""
    d = load_spread(spark, sf_dir, "documents")
    pairs = jaccard_pairs(shingles(d), threshold=0.5, max_df=MAX_DF).select(
        "id_a", "id_b"
    )
    labels = connected_components(pairs)
    sized = labels.join(
        d.select(F.col("doc_id").alias("id"),
                 F.length("text").cast("long").alias("n_chars")),
        "id",
    )
    w = Window.partitionBy("label")
    wo = w.orderBy(F.col("n_chars").desc(), F.col("id"))
    return sized.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("group_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_members"),
        F.col("n_chars"),
        F.first("id").over(wo).alias("canonical_id"),
    ).withColumn("keep", F.col("doc_id") == F.col("canonical_id"))


@query(
    "q_llm_entropy",
    oracle="""
    WITH chars AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
                   FROM documents),
    hist AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars
             WHERE ch <> '' GROUP BY 1, 2),
    folded AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_chars,
               COUNT(*) AS n_distinct,
               list_reduce(
                   list_transform(list(CAST(c AS DOUBLE) ORDER BY ch),
                                  x -> x * log2(x)),
                   (a, b) -> a + b) AS acc
        FROM hist GROUP BY doc_id
    )
    SELECT doc_id, n_chars, n_distinct,
           round(log2(n_chars) - acc / n_chars, 6) AS entropy_r
    FROM folded
    """,
)
def q_llm_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal (bits/char): low entropy flags
    degenerate/repetitive text, high flags binary junk — a standard
    cheap corpus filter. Uses H = log2(N) - (1/N)·Σ c·log2(c) so the
    only float accumulation is the Σ c·log2(c) fold, which BOTH engines
    evaluate over the per-doc histogram sorted by character — identical
    fold order, bit-stable cross-engine. Explode → two map-side-combined
    shuffles on shrinking keys (histogram rows ≤ alphabet size per doc),
    then a narrow fold; no UDF."""
    d = load_spread(spark, sf_dir, "documents")
    hist = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    folded = hist.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ch", "c"))),
                lambda s: s["c"].cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x * F.log2(x),
        ).alias("acc"),
    )
    return folded.select(
        "doc_id",
        "n_chars",
        "n_distinct",
        F.round(F.log2("n_chars") - F.col("acc") / F.col("n_chars"), 6)
        .alias("entropy_r"),
    )


@query(
    "q_llm_stratified_sample",
    oracle="""
    SELECT doc_id, source,
           (doc_id * 2246822519 + 3266489917) % 4294967296 % 100 AS bucket
    FROM documents
    WHERE (doc_id * 2246822519 + 3266489917) % 4294967296 % 100 <
          CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 50 ELSE 20 END
    """,
)
def q_llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: each source stratum keeps its
    own rate (50% / 20% here; a real pipeline reads rates from a config
    dim) with membership a pure hash of doc_id — the reproducible
    downsampling idiom for re-balancing a training mix. Unlike
    ``TABLESAMPLE`` this is stable across re-runs, backfills, and
    partitioning changes, and it's a narrow map: zero shuffle, zero UDF,
    filter pushed to the scan. The mixer is a Knuth-style multiplicative
    hash (decorrelated from q_llm_split's constants so split and sample
    decisions are independent); like q_llm_split, at 100 TB key ranges
    swap in xxhash64(doc_id) — the multiplicative form would overflow
    int64 under ANSI for doc_id ≳ 4e9 and exists for cross-engine
    oracle expressibility."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        (F.col("doc_id") * F.lit(2246822519) + F.lit(3266489917))
        % F.lit(4294967296) % F.lit(100)
    )
    rate = F.when(
        F.substring("source", 4, 8).cast("int") % 2 == 0, F.lit(50)
    ).otherwise(F.lit(20))
    return (
        d.select("doc_id", "source", bucket.alias("bucket"), rate.alias("r"))
        .filter(F.col("bucket") < F.col("r"))
        .drop("r")
    )


@query(
    "q_llm_mix_weights",
    oracle="""
    WITH src AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
        FROM documents GROUP BY source
    )
    SELECT source, src_tokens,
           round(src_tokens * 1.0 / SUM(src_tokens) OVER (), 6) AS share_r,
           round((1.0 / COUNT(*) OVER ()) /
                 (src_tokens * 1.0 / SUM(src_tokens) OVER ()), 6) AS weight_r
    FROM src
    """,
)
def q_llm_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing weights: per-source token share and the up/down-
    sampling multiplier that flattens the mix to uniform (target share =
    1/n_sources; swap the literal target for a config dim join in a real
    pipeline — the DoReMi/data-mixing prep step). Token totals reduce
    with map-side partial aggregation to one row per source; the
    unpartitioned window then runs over n_sources rows (20 here, maybe
    thousands at 100 TB) — trivially single-partition AFTER the
    reduction, which is the only safe place for a global window."""
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("src_tokens")
    )
    w = Window.partitionBy()
    share = F.col("src_tokens") / F.sum("src_tokens").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    return src.select(
        "source",
        "src_tokens",
        F.round(share, 6).alias("share_r"),
        F.round(target / share, 6).alias("weight_r"),
    )


@query(
    "q_llm_pack_chunks",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    )
    SELECT doc_id, source, n_tok,
           CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n_tok AS BIGINT) AS start_off,
           CAST((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tok) // 256 AS BIGINT) AS chunk_id
    FROM toks
    """,
)
def q_llm_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concatenate-then-chunk): within each source
    stream, docs are laid head-to-tail in doc_id order and cut into
    256-token training chunks; each doc gets its byte^W token offset and
    chunk id. This is the GPT-style packing layout expressed as a pure
    running-sum window — one hash exchange on source, per-partition
    sort, no stateful scan needed because chunk boundaries are fixed
    multiples of the budget (close-on-overflow greedy packing is the
    applyInPandas variant; this form stays whole-stage-codegen). Offsets
    and chunk ids are exact int64 in both engines: chunk_id is integer
    division (`div` / `//`), never a double round-trip."""
    d = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    start = F.sum("n_tok").over(w) - F.col("n_tok")
    return toks.select(
        "doc_id",
        "source",
        "n_tok",
        start.alias("start_off"),
    ).withColumn("chunk_id", F.expr("start_off div 256"))


@query(
    "q_llm_decontam",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(w, i, i + 4), ' ') AS shingle
           FROM words,
                unnest(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
    SELECT s.doc_id,
           CAST(COUNT(b.shingle) AS BIGINT) AS n_hits,
           COUNT(b.shingle) >= 1 AS contaminated
    FROM sh s LEFT JOIN bench b USING (shingle)
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    """,
)
def q_llm_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any 5-word
    shingle with the held-out benchmark set (docs with doc_id % 97 = 0
    stand in for an eval suite). The benchmark gram set is small by
    nature — eval suites are MBs while training corpora are TBs — so it
    broadcasts, and the check is a broadcast left join counted per doc:
    the 100 TB plan never shuffles the training-side grams. Shingling
    reuses the dedup machinery (operators/minhash.py shingles, w=5).
    This is the published n-gram-overlap decontamination scheme from
    public LM reports (GPT-2/GPT-3 appendices use 8/13-gram overlap;
    5-gram here to fire on fixture-scale documents)."""
    d = load_spread(spark, sf_dir, "documents")
    sh = shingles(d, w=5)
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % 97 != 0)
    joined = train.join(F.broadcast(bench), "shingle", "left")
    # count of non-null markers == the oracle's COUNT(b.shingle)
    n_hits = F.count("hit")
    return joined.groupBy("doc_id").agg(
        n_hits.alias("n_hits"),
        (n_hits >= 1).alias("contaminated"),
    )


@query(
    "q_llm_pack_greedy",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ),
    pack AS (
        SELECT source, rn, doc_id, n_tok,
               CAST(0 AS BIGINT) AS bin_id, n_tok AS fill_after
        FROM toks WHERE rn = 1
        UNION ALL
        SELECT t.source, t.rn, t.doc_id, t.n_tok,
               CASE WHEN p.fill_after + t.n_tok > 256
                    THEN p.bin_id + 1 ELSE p.bin_id END,
               CASE WHEN p.fill_after + t.n_tok > 256
                    THEN t.n_tok ELSE p.fill_after + t.n_tok END
        FROM toks t
        JOIN pack p ON t.source = p.source AND t.rn = p.rn + 1
    )
    SELECT doc_id, source, n_tok, bin_id, fill_after FROM pack
    """,
)
def q_llm_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy close-on-overflow sequence packing: within each source
    stream (doc_id order), a bin closes when the next doc would push it
    past the 256-token budget — the first-fit packing loaders use when
    docs must not split. This is inherently a stateful sequential scan
    (bin state depends on every prior doc), so it lowers to
    applyInPandas per source — the batch analog of a Flink keyed
    ProcessFunction: groups are independent, parallelism = stream
    count, and each group is one Arrow batch scanned once in pandas.
    The oracle proves the exact same assignment via a recursive CTE.
    At 100 TB a single giant stream would serialize; shard sources
    first (the chunked q_llm_pack_chunks form is the fully-parallel
    alternative)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    return greedy_pack(toks, budget=256)


@query(
    "q_llm_sample_exact_k",
    oracle="""
    SELECT doc_id, source, pos
    FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY (doc_id * 2971215073 + 433494437) % 4294967296, doc_id
               ) AS pos
        FROM documents
    )
    WHERE pos <= 10
    """,
)
def q_llm_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-stratum sampling: exactly 10 docs per source (fewer
    if the stratum is smaller), chosen by ranking on a deterministic
    doc_id hash — the eval-set/holdout idiom when you need a fixed
    COUNT per stratum rather than q_llm_stratified_sample's fixed RATE.
    Reproducible across re-runs and partitioning changes; one hash
    exchange on source, per-partition top-k (rank ≤ k prunes with a
    WindowGroupLimit before the full sort materializes). Same 100 TB
    note as the other mixers: swap xxhash64 in once cross-engine
    expressibility isn't needed; the doc_id tie-break keeps the order
    total so both engines pick identical rows."""
    d = load(spark, sf_dir, "documents")
    mix = (F.col("doc_id") * F.lit(2971215073) + F.lit(433494437)) % F.lit(4294967296)
    w = Window.partitionBy("source").orderBy(mix, "doc_id")
    return (
        d.select(
            "doc_id", "source",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .filter(F.col("pos") <= 10)
    )
