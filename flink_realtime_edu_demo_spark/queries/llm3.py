"""LLM-data-pipeline operators, wave 3 (round 7): model-based quality
filtering, Bloom-filter decontamination, and SemDeDup-style semantic
deduplication.

All three are published, public techniques re-expressed Spark-first:
- quality classifier: the CCNet / fasttext-style linear filter (a
  fixed-weight linear model over cheap lexical features) that every
  large-corpus pipeline runs before training;
- Bloom decontamination: the constant-size variant of n-gram benchmark
  decontamination (the exact-set form is q_llm_decontam) — at 100 TB
  the eval-suite gram set is replaced by an m-bit Bloom filter whose
  size is independent of the benchmark, at the cost of a quantified
  false-positive rate which this key *surfaces* (n_bloom >= n_exact);
- SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings,
  then near-duplicate-prune *within* clusters only, turning the O(N²)
  cosine dedup into per-cluster blocks.

Determinism: the classifier decision is exact BIGINT arithmetic (the
real-weight model is scaled by 100·n_words into an integer score, so
no float comparison ever decides a label); Bloom bits are md5-derived
(engine-portable, same trick as operators/minhash); cosines are
ascending-dimension left folds exactly as q_llm_knn's oracle spells
them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.kmeans import assign_udf
from ..operators.minhash import shingles
from ..registry import query
from ..tables import load, load_spread

# the STOPWORDS tuple of queries/llm.py, inlined in SQL form once
_STOP_SQL = "('the','a','of','and','in','to','is')"


@query(
    "q_llm_quality_clf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, t.tok
        FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        WHERE length(t.tok) > 0
    ),
    f AS (
        SELECT doc_id,
               COUNT(*) AS n_words,
               CAST(SUM(CASE WHEN tok IN {_STOP_SQL} THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_stop,
               SUM(CASE WHEN length(tok) <= 2 THEN 1 ELSE 0 END) AS n_short,
               SUM(length(tok)) AS sum_wlen
        FROM toks GROUP BY doc_id
    ),
    s AS (
        SELECT doc_id, n_words, n_stop,
               CAST(1200 * n_stop - 800 * n_short + 50 * sum_wlen
                    + n_words * n_words - 347 * n_words AS BIGINT) AS score_x
        FROM f
    )
    SELECT doc_id, n_words, n_stop, score_x,
           CAST(floor((score_x * 10000.0) / n_words) AS BIGINT) AS logit_u,
           score_x > 0 AS keep
    FROM s
    """,
)
def q_llm_quality_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier filter (CCNet/fasttext shape): logit =
    -3.47 + 12·stop_ratio − 8·short_ratio + 0.5·mean_word_len +
    0.01·n_words, keep iff logit > 0. The decision is computed as the
    EXACT integer score 100·n_words·logit = 1200·n_stop − 800·n_short
    + 50·sum_wlen + n_words² − 347·n_words, so the keep label never
    depends on a float comparison (the fixture corpus has docs whose
    rational logit is exactly 0 — a 1-ulp float boundary the integer
    form sidesteps; such docs are dropped, logit > 0 strictly). The
    surfaced logit is floor(logit·1e6): these rationals DO land on
    exact decimal ties (sf0.1 has -3262/6400 = -0.5096875) where
    Spark's half-up and DuckDB's half-even round() disagree, so the
    surface is floored micro-units — floor of a bit-identical IEEE
    double — rather than round(·, 6).

    One shuffle (groupBy doc_id over exploded tokens, all algebraic
    partial aggs); the model is four integer weights in the plan — at
    100 TB this is a single map-side-combined pass over the corpus,
    which is exactly how the real fasttext-filter pass is deployed."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    stop = F.col("tok").isin("the", "a", "of", "and", "in", "to", "is")
    f = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.when(stop, 1).otherwise(0)).alias("n_stop"),
        F.sum(F.when(F.length("tok") <= 2, 1).otherwise(0)).alias("n_short"),
        F.sum(F.length("tok")).alias("sum_wlen"),
    )
    score = (
        F.lit(1200) * F.col("n_stop")
        - F.lit(800) * F.col("n_short")
        + F.lit(50) * F.col("sum_wlen")
        + F.col("n_words") * F.col("n_words")
        - F.lit(347) * F.col("n_words")
    ).cast("long")
    return f.select(
        "doc_id",
        "n_words",
        "n_stop",
        score.alias("score_x"),
        F.floor((F.col("score_x") * F.lit(10000.0)) / F.col("n_words"))
        .cast("long").alias("logit_u"),
        (F.col("score_x") > 0).alias("keep"),
    ).select("doc_id", "n_words", "n_stop", "score_x", "logit_u", "keep")


_BLOOM_M = 16384  # bits
_BLOOM_K = 3      # hash functions


def _bloom_bit_spark(col: F.Column, j: int) -> F.Column:
    """Bit j of a shingle: md5(shingle || '!j') hex chars 1-8 as a
    32-bit int, mod m — the engine-portable md5 draw of
    operators/minhash (separator '!' keeps the draw independent of the
    minhash '#' family)."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(f"!{j}")).cast("binary")), 1, 8), 16, 10)
        .cast("long") % _BLOOM_M
    )


def _bloom_bit_sql(expr: str, j: int) -> str:
    return (
        f"CAST(concat('0x', substring(md5({expr} || '!{j}'), 1, 8)) AS BIGINT)"
        f" % {_BLOOM_M}"
    )


@query(
    "q_llm_decontam_bloom",
    oracle=f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(w, i, i + 4), ' ') AS shingle
           FROM words,
                unnest(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    bbits AS (SELECT DISTINCT bit FROM (
        SELECT {_bloom_bit_sql('shingle', 0)} AS bit FROM bench
        UNION ALL SELECT {_bloom_bit_sql('shingle', 1)} FROM bench
        UNION ALL SELECT {_bloom_bit_sql('shingle', 2)} FROM bench)),
    tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
    trb AS (
        SELECT doc_id, shingle, {_bloom_bit_sql('shingle', 0)} AS bit FROM tr
        UNION ALL SELECT doc_id, shingle, {_bloom_bit_sql('shingle', 1)} FROM tr
        UNION ALL SELECT doc_id, shingle, {_bloom_bit_sql('shingle', 2)} FROM tr),
    gram AS (SELECT t.doc_id, t.shingle, COUNT(b.bit) AS nb
             FROM trb t LEFT JOIN bbits b USING (bit) GROUP BY 1, 2),
    ex AS (SELECT doc_id, shingle, 1 AS hit FROM tr JOIN bench USING (shingle)),
    agg AS (SELECT g.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN g.nb = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_bloom_hits,
                   CAST(SUM(CASE WHEN e.hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_exact_hits
            FROM gram g LEFT JOIN ex e
              ON g.doc_id = e.doc_id AND g.shingle = e.shingle
            GROUP BY g.doc_id)
    SELECT doc_id, n_grams, n_bloom_hits, n_exact_hits,
           n_bloom_hits >= 1 AS contaminated
    FROM agg
    """,
)
def q_llm_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination: the q_llm_decontam
    5-gram-overlap check with the benchmark gram SET replaced by an
    m=16384-bit / k=3 Bloom filter, realized relationally as the
    distinct set of set bits (|bits| <= k·|bench grams|, here ~1k
    rows) broadcast against the training grams' k probe bits. A
    training gram is flagged iff all k of its bits are set — the
    standard Bloom membership test, so n_bloom_hits >= n_exact_hits
    with equality up to false positives, and the output carries BOTH
    counts so the FP rate is observable (the fixtures do produce FPs:
    the whole point of declaring the Bloom variant separately).

    Scale story: the exact-set broadcast of q_llm_decontam grows with
    the eval suite; the Bloom bitmap is a CONSTANT m bits regardless —
    the form you ship when the benchmark side is itself large (e.g.
    decontaminating against a 1 B-gram held-out split). The training
    side is never shuffled: probe bits are computed in-map and the
    per-(doc,gram) verdict is a broadcast join + map-side-combinable
    count. md5-derived bits make the filter engine-portable, so the
    oracle replays bit-for-bit."""
    d = load_spread(spark, sf_dir, "documents")
    sh = shingles(d, w=5)
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    # Build the ACTUAL m-bit filter: the set bits collapse to m//64
    # driver-side longs (bounded by the CONSTANT m = 2 KB here, never
    # by the benchmark size) embedded in the plan as a literal array.
    # Membership is then pure JVM bit arithmetic per probe —
    # element_at into the literal words + getbit — so the Bloom side
    # of the plan has NO join at all; only the exact-hit comparison
    # join (the thing a Bloom filter replaces) remains a broadcast.
    # For a filter too big to inline (e.g. 1e9 bits against a web-scale
    # eval suite) the same bits table broadcast-joins per probe column
    # instead — semantics identical, oracle unchanged.
    bit_rows = (
        bench.select(
            F.explode(
                F.array(*[_bloom_bit_spark(F.col("shingle"), j)
                          for j in range(_BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
        .collect()
    )
    words = [0] * (_BLOOM_M // 64)
    for r in bit_rows:
        words[r["bit"] >> 6] |= 1 << (r["bit"] & 63)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    # explicit long cast: a saturated filter produces small-magnitude
    # words (e.g. -1), which F.lit would type as INT — and getbit on an
    # INT rejects positions >= 32. Found by the 100x soak (the filter
    # saturates there); the cast makes the literal width independent of
    # the filter's fill level.
    warr = F.array(*[F.lit(w).cast("long") for w in words])
    tr = sh.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", "shingle",
        *[_bloom_bit_spark(F.col("shingle"), j).alias(f"bit{j}")
          for j in range(_BLOOM_K)],
    )
    probes = [
        F.getbit(
            F.element_at(warr, (F.col(f"bit{j}") / F.lit(64)).cast("int") + 1),
            F.col(f"bit{j}") % 64,
        )
        for j in range(_BLOOM_K)
    ]
    tr = tr.join(F.broadcast(bench.withColumn("hit", F.lit(1))), "shingle", "left")
    bloom_hit = F.when(sum(probes) == _BLOOM_K, 1).otherwise(0)
    n_bloom = F.sum(bloom_hit)
    n_exact = F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
    return tr.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        n_bloom.alias("n_bloom_hits"),
        n_exact.alias("n_exact_hits"),
    ).select(
        "doc_id", "n_grams", "n_bloom_hits", "n_exact_hits",
        (F.col("n_bloom_hits") >= 1).alias("contaminated"),
    )


_SEM_K_MIN = 8   # anchor-cluster floor (tiny fixtures)
_SEM_TAU = 0.30  # within-cluster cosine prune threshold

# ordered-fold arithmetic shared with operators/kmeans.kmeans_oracle_sql
_SEM_DIST = (
    "(-2.0 * list_reduce(list_transform(generate_series(1, len(e)),"
    " i -> e[i] * cv[i]), (x, y) -> x + y)"
    " + list_reduce(list_transform(cv, x -> x * x), (x, y) -> x + y))"
)
_SEM_COS = (
    "list_reduce(list_transform(generate_series(1, len(hi.e)),"
    " i -> hi.e[i] * lo.e[i]), (x, y) -> x + y)"
    " / (sqrt(list_reduce(list_transform(hi.e, x -> x * x), (x, y) -> x + y))"
    " * sqrt(list_reduce(list_transform(lo.e, x -> x * x), (x, y) -> x + y)))"
)


@query(
    "q_llm_semantic_dedup",
    oracle=f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    kv AS (SELECT GREATEST({_SEM_K_MIN},
                           CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS k
           FROM emb),
    c AS (SELECT CAST(rn - 1 AS INTEGER) AS cluster, e AS cv
          FROM (SELECT row_number() OVER (ORDER BY vec_id) AS rn, e
                FROM emb), kv
          WHERE rn <= kv.k),
    a AS (SELECT vec_id, cluster FROM (
            SELECT emb.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY emb.vec_id
                                      ORDER BY {_SEM_DIST}, c.cluster) AS rn
            FROM emb, c) WHERE rn = 1),
    v AS (SELECT a.vec_id, a.cluster, e FROM emb JOIN a USING (vec_id)),
    mc AS (SELECT hi.vec_id, max({_SEM_COS}) AS m
           FROM v hi JOIN v lo
             ON hi.cluster = lo.cluster AND lo.vec_id < hi.vec_id
           GROUP BY hi.vec_id)
    SELECT a.vec_id, a.cluster,
           round(mc.m, 6) AS max_cos_r,
           COALESCE(mc.m >= {_SEM_TAU}, FALSE) AS is_dup
    FROM a LEFT JOIN mc USING (vec_id)
    """,
)
def q_llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign every embedding to its
    nearest of k anchor centroids (the k lowest-id vectors —
    deterministic, and the same ordered-fold distance + lowest-cluster
    tie-break as operators/kmeans, whose q_llm_kmeans_assign key proved
    the arithmetic oracle-portable), then mark a vector a semantic
    duplicate iff some LOWER-id vector in the SAME cluster has cosine
    >= 0.30 with it — the keep-first-seen prune of the paper, made
    order-deterministic by using vec_id as the scan order. Output is
    the per-vector manifest (cluster, max cosine to a lower-id
    cluster-mate, is_dup).

    k AUTO-SCALES with the corpus (round 8, the q_llm_knn_ivf_scaled
    precedent): k = max(8, ceil(sqrt(N))), derived from COUNT(*) with
    the SAME arithmetic in the oracle SQL, so the scaling decision
    itself is hash-verified. sqrt(N) balances the two cost terms —
    assignment is O(N·k·d), the within-cluster pair scan is
    O(N·(N/k)·d); both are O(N^1.5·d) at k = sqrt(N), so the plan has
    no quadratic term at ANY scale (fixed k would leave the pair term
    O(N²/k) — the same fixture-tuned trap the r6 soak caught in the
    fixed-m ANN). The paper's k=50k over 5 B embeddings is the same
    regime. One shuffle on cluster id; the anchor assignment stays an
    Arrow-batched map with the k×dim matrix broadcast in the closure
    (k×dim floats on the driver — 448×64 at the 100x soak, ~36 MB even
    at 5 B vectors), never a shuffle of the corpus."""
    e = load_spread(spark, sf_dir, "embeddings")
    n_vec = e.count()
    k = max(_SEM_K_MIN, math.ceil(math.sqrt(n_vec)))
    first = e.orderBy("vec_id").limit(k).select("embedding").collect()
    centroids = [list(map(float, r[0])) for r in first]
    # assignment INLINED as a column (operators/kmeans.assign_udf), then
    # the assigned frame is locally checkpointed: the self-join below
    # references it from BOTH branches, and without materialization
    # Catalyst duplicates the subtree — the corpus would be GEMM-scored
    # twice (round-7 verdict's 9-shuffle flag). One eager checkpoint =
    # one assignment pass; on a real cluster this is a persist() /
    # reliable checkpoint of the assigned working set, the canonical
    # idiom for self-joined derived frames (same precedent as
    # operators/kmeans.kmeans).
    assign = assign_udf(centroids)
    v = (
        e.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
            assign(F.col("embedding")).cast("int").alias("cluster"),
        )
        .localCheckpoint(eager=True)
    )
    hi = v.select(F.col("vec_id"), F.col("e").alias("ea"), "cluster")
    lo = v.select(F.col("vec_id").alias("lo_id"), F.col("e").alias("eb"), "cluster")
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = lambda col: F.sqrt(F.aggregate(  # noqa: E731 — local fold helper
        F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x,
    ))
    cos = dot / (nrm(F.col("ea")) * nrm(F.col("eb")))
    # pair filter relaxed to lo_id <= vec_id so the self-pair keeps every
    # vector alive through the aggregation — the per-vector max is then
    # max(cos | lo_id < vec_id), null when only the self-pair exists,
    # and the old left-join-back-to-v (2 extra shuffles) disappears.
    # groupBy keys include `cluster`, which the join already hash-
    # partitioned on, so the aggregation reuses that exchange: the whole
    # plan is the two join-side shuffles and nothing else.
    return (
        hi.join(lo, "cluster")
        .filter(F.col("lo_id") <= F.col("vec_id"))
        .select(
            "vec_id", "cluster",
            F.when(F.col("lo_id") < F.col("vec_id"), cos).alias("cos"),
        )
        .groupBy("vec_id", "cluster")
        .agg(F.max("cos").alias("m"))
        .select(
            "vec_id", "cluster",
            F.round("m", 6).alias("max_cos_r"),
            F.coalesce(F.col("m") >= _SEM_TAU, F.lit(False)).alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training — pair-count merge iterations (VERDICT r8 #6)
# ---------------------------------------------------------------------------

_BPE_ITERS = 4


def _bpe_chain_ctes(iters: int) -> list[str]:
    """The shared CTE chain of the BPE oracles: word-frequency
    vocabulary, character symbolization, and ``iters`` unrolled merge
    steps (the q_llm_kmeans precedent — DuckDB 1.0's list_reduce is
    unsound, and the relational gaps-and-islands merge needs no fold
    anyway)."""
    ctes = ["""
    words AS (
        SELECT t.w AS word
        FROM documents, unnest(regexp_extract_all(text, '[a-z]+')) AS t(w)
    ),
    vocab AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
              FROM words GROUP BY word),
    m0 AS (
        SELECT word, cnt, CAST(p AS BIGINT) AS pos,
               substr(word, CAST(p AS INT), 1) AS sym
        FROM vocab, unnest(generate_series(1, length(word))) AS t(p)
    )"""]
    for i in range(1, iters + 1):
        ctes.append(f"""
    w{i} AS (SELECT word, cnt, pos, sym,
                   lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
            FROM m{i - 1}),
    t{i} AS (SELECT sym AS lhs, nxt AS rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count
            FROM w{i} WHERE nxt IS NOT NULL GROUP BY sym, nxt
            ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
    c{i} AS (SELECT w.*, (w.sym = t.lhs AND w.nxt = t.rhs) AS cand
            FROM w{i} w CROSS JOIN t{i} t),
    d{i} AS (SELECT *, (cand AND NOT COALESCE(
                          lag(cand) OVER (PARTITION BY word ORDER BY pos),
                          FALSE)) AS rstart
            FROM c{i}),
    e{i} AS (SELECT *, MAX(CASE WHEN rstart THEN pos END)
                      OVER (PARTITION BY word ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS run_pos
            FROM d{i}),
    f{i} AS (SELECT word, cnt, pos, sym, nxt,
                   CASE WHEN cand THEN (pos - run_pos) % 2 = 0
                        ELSE FALSE END AS mstart
            FROM e{i}),
    g{i} AS (SELECT *, COALESCE(lag(mstart) OVER (PARTITION BY word ORDER BY pos),
                               FALSE) AS prevm
            FROM f{i}),
    m{i} AS (SELECT word, cnt,
                   CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT) AS pos,
                   CASE WHEN mstart THEN sym || nxt ELSE sym END AS sym
            FROM g{i} WHERE NOT prevm)""")
    return ctes


def _bpe_merge_oracle_sql(iters: int) -> str:
    """DuckDB SQL replaying :func:`q_llm_bpe_merges` (the chain's
    per-iteration top pairs, unioned)."""
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS iter, lhs, rhs, lhs || rhs AS merged,"
        f" pair_count FROM t{i}"
        for i in range(1, iters + 1)
    )
    return "WITH" + ",".join(_bpe_chain_ctes(iters)) + "\n    " + unions


def _bpe_encode_oracle_sql(iters: int) -> str:
    """DuckDB SQL replaying :func:`q_llm_bpe_encode`: the same chain,
    then per-word post-merge symbol counts joined back to each
    document's word stream."""
    return ("WITH" + ",".join(_bpe_chain_ctes(iters)) + f""",
    wt AS (SELECT word, CAST(count(*) AS BIGINT) AS n_tok
           FROM m{iters} GROUP BY word),
    dw AS (SELECT doc_id, t.w AS word
           FROM documents, unnest(regexp_extract_all(text, '[a-z]+')) AS t(w))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(SUM(length(dw.word)) AS BIGINT) AS n_chars,
           CAST(SUM(wt.n_tok) AS BIGINT) AS n_tokens
    FROM dw JOIN wt USING (word)
    GROUP BY doc_id""")


def _bpe_chain(docs: DataFrame):
    """Shared BPE training chain: returns (merge_rows, final_rows) —
    the per-iteration top-pair DataFrames and the fully-merged vocab
    symbol rows (word, cnt, pos, sym) after _BPE_ITERS merges. See
    :func:`q_llm_bpe_merges` for the plan shape."""
    """BPE tokenizer training — the pair-count merge loop (Sennrich et
    al. 2016), the one standard training-data pipeline stage SURVEY §2
    had no key for: count adjacent symbol pairs over the word-frequency
    vocabulary, merge the most frequent pair (ties broken
    lexicographically), repeat. Returns the merge table —
    ``iter, lhs, rhs, merged, pair_count`` — for ``_BPE_ITERS``
    iterations, the artifact a tokenizer trainer persists.

    Spark-first shape (the q_llm_kmeans unrolled-iterations precedent):
    the only corpus-scale work is ONE map-side-combined word count;
    every merge iteration then runs on the VOCABULARY (unique words ×
    symbols — Heaps'-law bounded, millions of rows at 100 TB, not
    corpus-scale), so iterations cost narrow vocab-sized shuffles and
    the top pair is ONE collected row of bounded driver state per
    iteration (the k-means-centroid precedent), re-entering the plan
    as literals (round 16 — the r15 broadcast-cross-join spelling
    round-tripped the same row through the driver anyway, plus a
    persist, a BroadcastExchange and a join per iteration).
    The greedy left-to-right
    non-overlapping merge (``aaaa`` + (a,a) → ``aa aa``) is pure
    relational gaps-and-islands: candidate runs share ``pos − cumsum``
    islands and merge at even offsets — no fold, no Python, exact
    BIGINT counts (deterministic in both engines)."""
    from pyspark.sql.window import Window

    vocab = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(text, '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cur = vocab.select(
        "word", "cnt",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("p"),
    ).select(
        "word", "cnt",
        F.col("p").cast("long").alias("pos"),
        F.col("word").substr(F.col("p"), F.lit(1)).alias("sym"),
    )

    w = Window.partitionBy("word").orderBy("pos")
    spark = docs.sparkSession
    merge_schema = ("iter bigint, lhs string, rhs string, merged string,"
                    " pair_count bigint")
    merge_rows = []
    for it in range(1, _BPE_ITERS + 1):
        # Persist PAIRED, not the post-merge cur (round 17): the
        # top-pair collect below materializes it, and the merge-apply
        # windows then read the cache — one corpus scan total and one
        # lead-window pass per iteration. Persisting cur instead (the
        # r16 spelling) recomputed each iteration's lead window twice
        # (once for the top-pair job, once when the NEXT iteration
        # materialized its cache) and scanned the corpus twice.
        paired = cur.withColumn("nxt", F.lead("sym").over(w)).persist()
        # The top pair is ONE row of bounded driver state (the k-means
        # initial-centroid / Bloom-literal precedent): collect it and
        # re-enter it as LITERALS instead of the round-15 broadcast
        # cross join — the broadcast already round-tripped the same row
        # through the driver, plus a persist, a BroadcastExchange and a
        # join per iteration; literal re-entry removes all three from
        # every iteration's plan (guide §1.2: fix the algorithm's
        # shape first). Values are identical by construction, so the
        # merge table and the final vocab are bit-identical.
        top_rows = (
            paired.where(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("cnt").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("sym"), F.asc("nxt"))
            .limit(1)
            .collect()
        )
        if not top_rows:
            # no adjacent pair anywhere (degenerate corpus): the old
            # empty-crossJoin behavior — no merge row this iteration
            # and an annihilated chain — reproduced literally
            empty = spark.createDataFrame([], merge_schema)
            merge_rows.extend([empty] * (_BPE_ITERS - it + 1))
            cur = cur.where(F.lit(False))
            break
        lhs_v, rhs_v, cnt_v = (top_rows[0]["sym"], top_rows[0]["nxt"],
                               top_rows[0]["pair_count"])
        merge_rows.append(
            spark.createDataFrame(
                [(it, lhs_v, rhs_v, lhs_v + rhs_v, cnt_v)], merge_schema
            )
        )
        # Greedy non-overlap: candidate runs merge at even offsets from
        # their run START — found with a running max over the SAME
        # (word, pos) window as everything else, so the whole apply
        # step reuses one partitioning (no (word, island) re-shuffle).
        j = (
            paired
            .withColumn(
                "cand", (F.col("sym") == F.lit(lhs_v))
                & (F.col("nxt") == F.lit(rhs_v))
            )
            .withColumn(
                "rstart",
                F.col("cand")
                & ~F.coalesce(F.lag("cand").over(w), F.lit(False)),
            )
            .withColumn(
                "run_pos",
                F.max(F.when(F.col("rstart"), F.col("pos"))).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        )
        j = j.withColumn(
            "mstart",
            F.when(
                F.col("cand"), (F.col("pos") - F.col("run_pos")) % 2 == 0
            ).otherwise(F.lit(False)),
        ).withColumn(
            "prevm", F.coalesce(F.lag("mstart").over(w), F.lit(False))
        )
        cur = (
            j.where(~F.col("prevm"))
            .select(
                "word", "cnt",
                F.row_number().over(w).cast("long").alias("new_pos"),
                F.when(F.col("mstart"), F.concat("sym", "nxt"))
                .otherwise(F.col("sym")).alias("sym"),
            )
            .withColumnRenamed("new_pos", "pos")
            # NOT persisted: cur has exactly one consumer (the next
            # iteration's paired, itself persisted above) — the
            # iteration cut lives on the paired cache
        )

    return merge_rows, cur


@query("q_llm_bpe_merges", oracle=_bpe_merge_oracle_sql(_BPE_ITERS))
def q_llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training — the pair-count merge table (see the
    chain docstring above for semantics and the 100 TB plan shape:
    one corpus-scale word count, vocab-scale iterations, persisted
    1-row tops broadcast back, gaps-and-islands greedy merge)."""
    merge_rows, _ = _bpe_chain(load(spark, sf_dir, "documents"))
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out


@query("q_llm_bpe_encode", oracle=_bpe_encode_oracle_sql(_BPE_ITERS))
def q_llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — encode the corpus with the learned
    merges, the stage every training-data pipeline runs after
    tokenizer training to budget sequence lengths: per document, the
    token count after _BPE_ITERS merges vs raw word/char counts.

    Spark-first shape: the training chain already leaves the VOCAB
    fully merged (final rows = (word, cnt, pos, sym)), so encoding is
    a per-word symbol count over that vocab-sized table BROADCAST back
    into each document's word stream — the corpus-scale side is one
    explode + one broadcast-hash join + one map-side-combined
    aggregation; no per-document merge work at all. At 100 TB the
    vocabulary stays Heaps'-bounded and broadcastable; if it ever
    outgrew the broadcast threshold the join degrades to a hash join
    on the word key, still one shuffle."""
    docs = load(spark, sf_dir, "documents")
    _, cur = _bpe_chain(docs)
    wtok = cur.groupBy("word").agg(
        F.count("*").cast("long").alias("n_tok")
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(text, '[a-z]+', 0)")
        ).alias("word"),
    )
    return (
        words.join(F.broadcast(wtok), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
