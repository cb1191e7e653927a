"""MinHash + LSH near-duplicate detection (SURVEY.md §2.11) — the 100 TB
scale path for fuzzy dedup (Broder's MinHash, banded LSH as in MMDS ch.3).

Everything is DataFrame composition — no crossJoin anywhere:

1. shingles(): w-word shingles per doc via a sliding slice over the
   tokenized text (distinct per doc).
2. minhash_signatures(): one groupBy producing NUM_HASHES min-hash
   values as independent aggregate columns; hash_j(s) = xxhash64(s, j)
   — a keyed 64-bit hash, all JVM-side.
3. lsh_candidate_pairs(): split each signature into BANDS bands of
   ROWS_PER_BAND values, hash each band, explode → (band_id, band_hash)
   buckets, self-join buckets, distinct pairs. Collision probability of
   a pair with Jaccard j is 1-(1-j^r)^b (r=4, b=16 → ~0.5 at j≈0.5).

Shuffle profile at scale: shingle explode is a narrow map; signatures
are one shuffle on doc_id; banding is a narrow map + one shuffle on
(band, hash); the bucket self-join only pairs within buckets —
worst-case skew (a degenerate bucket) is bounded by capping bucket
width (MAX_BUCKET, drop pathological buckets, standard LSH practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NUM_HASHES = 64
BANDS = 16
ROWS_PER_BAND = NUM_HASHES // BANDS
MAX_BUCKET = 64  # drop degenerate buckets wider than this (skew guard)


def _ngram_zip(arr: F.Column, n: int, sep: str,
               keep_partial: bool = True) -> F.Column:
    """n-gram array over ``arr`` in O(len): zip n shifted copies with
    ``concat_ws`` (which skips the nulls zip_with pads with), then slice
    to the full windows — plus the single partial for short inputs when
    ``keep_partial`` (the shingle convention), or full windows only
    (empty array for short inputs) otherwise. A per-position
    ``slice``/``substring`` is O(len²) per doc and dominated every
    shingle-family query before this form."""
    zipped = arr
    for k in range(1, n):
        shifted = F.slice(arr, k + 1, F.greatest(F.size(arr) - k, F.lit(0)))
        zipped = F.zip_with(zipped, shifted, lambda x, y: F.concat_ws(sep, x, y))
    floor = F.lit(1) if keep_partial else F.lit(0)
    return F.slice(zipped, 1, F.greatest(F.size(arr) - (n - 1), floor))


def shingle_array(text_col: str = "text", w: int = 3) -> F.Column:
    """w-word shingle array for a text column, O(words) per doc; docs
    shorter than w yield their single partial shingle, matching the
    oracle's ``list_slice`` spelling exactly."""
    return _ngram_zip(F.split(F.col(text_col), r"\s+"), w, " ")


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             w: int = 3) -> DataFrame:
    """Distinct w-word shingles per document: (id_col, shingle)."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.array_distinct(shingle_array(text_col, w))).alias("shingle"),
        )
        .filter(F.length("shingle") > 0)
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = NUM_HASHES) -> DataFrame:
    """(id_col, sig: array<bigint>[num_hashes]) — one aggregation, num_hashes
    min() columns assembled into an array."""
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(j))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col), F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded LSH buckets."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # One shuffle: gather each bucket's members; the skew guard (cap at
    # MAX_BUCKET, dropping degenerate buckets) and the pairwise expansion
    # are then narrow higher-order expressions — no bucket self-join, no
    # window. Pair count per bucket is bounded by MAX_BUCKET²/2.
    members = (
        buckets.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_set(id_col)).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET))
    )
    pairs = members.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def minhash_signatures_md5(sh: DataFrame, id_col: str = "doc_id",
                           num_hashes: int = NUM_HASHES) -> DataFrame:
    """Oracle-replayable MinHash: (id_col, h0..h{n-1}) where
    h_{4j+r} = lexicographic MIN over shingles of hex chars
    [8r+1, 8r+8] of md5(shingle || '#j') — i.e. each md5 call yields
    FOUR independent 32-bit draws (8 hex chars each), so 64 hash
    functions cost 16 md5 calls per shingle, not 64. Every ingredient —
    md5 of a UTF-8 string, substring, lexicographic min — is
    bit-identical in any engine with an md5(), so a DuckDB oracle
    replays the full 64-hash/16-band construction (the same trick
    simhash_md5 uses). 32-bit minhash values collide at ~n²/2³³ per
    doc — immaterial for real shingle-set sizes. xxhash64
    ``minhash_signatures`` stays the raw-throughput path; this one is
    the verified path `q_llm_minhash_lsh` ships.

    The md5 columns are materialized in a narrow projection BEFORE the
    groupBy so each is computed once per shingle regardless of
    aggregate-side common-subexpression behavior; the shuffle then
    carries (id, 16 md5 hex strings) and runs num_hashes algebraic
    min() aggregates over substrings — same single-shuffle profile as
    the xxhash64 variant."""
    n_calls = (num_hashes + 3) // 4
    proj = sh.select(
        F.col(id_col),
        *[
            F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")).cast("binary")).alias(f"m{j}")
            for j in range(n_calls)
        ],
    )
    mins = [
        F.min(F.substring(F.col(f"m{j // 4}"), 8 * (j % 4) + 1, 8)).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return proj.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs_md5(sigs: DataFrame, id_col: str = "doc_id",
                            bands: int = BANDS,
                            rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Banded LSH over :func:`minhash_signatures_md5` columns: band b's
    bucket key is md5(h_{4b} || '|' || ... || h_{4b+3}); candidates are
    distinct (id_a < id_b) pairs sharing any band bucket, with the same
    MAX_BUCKET skew guard (degenerate buckets dropped) and the same
    single-shuffle collect_set + narrow pairwise expansion as the
    xxhash64 path."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                    ).cast("binary")
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    members = (
        buckets.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_set(id_col)).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET))
    )
    pairs = members.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def lsh_oracle_sql_md5(w: int = 3, num_hashes: int = NUM_HASHES,
                       bands: int = BANDS,
                       rows_per_band: int = ROWS_PER_BAND,
                       max_bucket: int = MAX_BUCKET) -> str:
    """DuckDB SQL replaying minhash_signatures_md5 + lsh_candidate_pairs_md5
    on the documents view, generated for the given geometry."""
    mins = ",\n             ".join(
        f"min(substring(md5(shingle || '#{j // 4}'), {8 * (j % 4) + 1}, 8)) AS h{j}"
        for j in range(num_hashes)
    )
    branches = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({expr}) AS bucket FROM sigs".format(
            b=b,
            expr=" || '|' || ".join(
                f"h{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(w, i, i + {w - 1}), ' ') AS shingle
           FROM words,
                unnest(generate_series(1, greatest(len(w) - {w - 1}, 1))) AS t(i)),
    sigs AS (SELECT doc_id,
             {mins}
             FROM sh GROUP BY doc_id),
    buckets AS (
      {branches}
    ),
    sized AS (SELECT band, bucket FROM buckets
              GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND {max_bucket})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a
    JOIN buckets b USING (band, bucket)
    JOIN sized USING (band, bucket)
    WHERE a.doc_id < b.doc_id
    """


def jaccard_pairs_prefix(sh: DataFrame, id_col: str = "doc_id",
                         threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard pairs via prefix filtering (the all-pairs similarity
    trick from Bayardo et al., WWW'07): for Jaccard >= t, doc A must
    share at least one shingle with B among A's first
    |A| - ceil(t*|A|) + 1 shingles in a global rarity order (overlap >=
    t*max(|A|,|B|) >= t*|A|). Candidates therefore come from exploding
    only the rare-shingle prefixes; verification intersects the full
    shingle-hash arrays per candidate pair — narrow per-pair work.

    Same exact output as jaccard_pairs (tested). Trade-off measured on
    the fixtures: at t=0.5 on the dense word-soup corpus the prefix is
    ~half of each doc's shingles, so the candidate reduction does NOT
    pay for the extra joins (sf0.1: 11s vs 6.4s naive) — jaccard_pairs
    stays the default. Prefix filtering wins when the threshold is high
    and/or the shingle distribution is Zipfian-sparse (prefix length
    (1-t)·|A|+1 → tiny), which is the realistic web-corpus shape.
    """
    # global rarity order: hash shingles to 64-bit, order by (freq, hash)
    hashed = sh.select(F.col(id_col), F.xxhash64("shingle").alias("h"))
    freq = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("f"))
    ranked = hashed.join(freq, "h").select(
        F.col(id_col), F.struct(F.col("f"), F.col("h")).alias("fh")
    )
    docs = ranked.groupBy(id_col).agg(
        F.array_sort(F.collect_list("fh")).alias("fhs")
    ).select(
        F.col(id_col),
        F.transform("fhs", lambda s: s.getField("h")).alias("hs"),
        F.size("fhs").alias("n_sh"),
    )
    # prefix length: n - ceil(t*n) + 1
    prefix = docs.select(
        F.col(id_col),
        F.slice(
            "hs",
            1,
            (F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold)) + 1).cast("int"),
        ).alias("pre"),
    )
    cand = (
        prefix.select(F.col(id_col), F.explode("pre").alias("h"))
        .groupBy("h")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ids",
                        lambda x, i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    da = docs.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a"),
                     F.col("n_sh").alias("n_a"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b"),
                     F.col("n_sh").alias("n_b"))
    verified = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("hs_a", "hs_b")).cast("long"))
        .withColumn(
            "jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select(
        "id_a", "id_b", "n_common",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "jaccard",
    )


# Candidate-side document-frequency cap (skew guard). Tightened 256 ->
# 64 after the round-5 10x soak: with a dense (small-vocabulary) corpus
# the df distribution shifts up until NO shingle is capped, and raw
# candidate volume goes Sum(df^2)/2 — 130M pairs at 10x, a 40x
# super-linear wall. At 64 the verified pair set is IDENTICAL at both
# oracle scales (checked caps 32/64/256 at sf0.01 and sf0.1 — real
# near-dup pairs always share a rare shingle, the fact prefix-filtering
# exploits), and the soak key returns to linear scaling. Pairs similar
# ONLY through >64-df shingles are corpus boilerplate — the documented
# recall trade of the capped contract.
MAX_DF = 64


def jaccard_pairs(sh: DataFrame, id_col: str = "doc_id",
                  threshold: float = 0.5, max_df: int | None = None) -> DataFrame:
    """Shingle-Jaccard similar pairs via an inverted index, optionally
    df-capped. The DEFAULT is exact (``max_df=None``): callers opt into
    the reduced-recall capped behavior explicitly (the ``q_llm_dedup_*``
    scale queries pass ``max_df=MAX_DF``) so nobody mistakes the capped
    operator for the exact one.

    Candidate generation explodes only inverted lists of width in
    [2, max_df]; a shingle shared by D documents otherwise expands to
    D²/2 pairs, so one stopword-like shingle across 1M docs is 5·10¹¹
    rows — the cap bounds per-shingle expansion at max_df²/2, same
    spirit as the LSH path's MAX_BUCKET. Verification then computes the
    intersection per candidate pair (array_intersect of full per-doc
    shingle-hash sets — narrow per-pair work), exact modulo 64-bit
    xxhash64 shingle collisions (a collision within or across a pair's
    shingle sets perturbs n_common/df by 1 — at P(collision) ≈ n²/2⁶⁵
    per doc pair, never observed on fixtures, and the string-intersecting
    DuckDB oracle would catch one as a hash mismatch); the cap affects
    only recall: a qualifying
    pair is missed iff every one of its ≥ t·max(|A|,|B|) common
    shingles occurs in more than max_df documents — i.e. the pair is
    similar only through corpus-wide boilerplate, the class near-dup
    pipelines intentionally ignore. ``max_df=None`` removes the cap
    (fixture-scale baseline; both paths agree on the fixtures, tested).

    Returns (id_a, id_b, n_common, n_a, n_b, jaccard) with id_a < id_b
    and jaccard >= threshold. The division is int/int on identical
    operands → engine-exact.

    Lowering (round 17 — the candidate→verify restructure): a shared
    shingle has df >= 2 by definition, so the FULL intersection splits
    exactly into capped shared shingles (2 <= df <= max_df) plus hot
    shared shingles (df > max_df). The capped part is counted BY THE
    CANDIDATE AGGREGATION ITSELF — the exploded per-shingle pairs are
    grouped with COUNT instead of DISTINCT (same exchange, one row per
    candidate pair, each capped shared shingle contributes exactly one
    pair row) — and the hot part is an array_intersect of tiny per-doc
    HOT-shingle arrays (only corpus boilerplate lands there; empty on
    every fixture scale — zero shingles exceed df 64 even at sf0.1 —
    and bounded by shingles/doc always). This replaces the previous
    shape's array_intersect of FULL 50+-element per-doc arrays over
    every candidate pair (~1.1M pairs at sf0.1) and the two
    array-carrying verification joins against a persisted per-doc
    index; per-doc sizes ride the posting rows, so no verify join
    touches an array at all on the max_df=None path. The df filter
    stays a WINDOW COUNT over the `h` partitioning, applied BEFORE any
    collect_list: a hot shingle (present in most of the corpus — think
    boilerplate) never materializes its full posting list as one
    in-memory array; its rows stream through the spillable window
    buffer. Building the lists first and dropping them by size
    afterwards went 40x super-linear on the 10x soak (small
    vocabulary -> every shingle hot) and is exactly the 100 TB hazard;
    the per-doc HOT arrays are safe — bounded by shingles/doc, not by
    corpus df. The previous persist is gone too: the scan→shingle→
    aggregate subtree now has ONE consumer chain (the capped and hot
    branches share the `h` exchange via ReusedExchange).
    """
    from pyspark.sql.window import Window

    hashed = sh.select(F.col(id_col), F.xxhash64("shingle").alias("h"))
    per_doc = hashed.groupBy(id_col).agg(
        F.collect_set("h").alias("hs"), F.count(F.lit(1)).alias("n_sh")
    )
    posting = per_doc.select(
        F.col(id_col), F.col("n_sh"), F.explode("hs").alias("h")
    )
    marked = posting.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    if max_df is not None:
        # The capped branch and the two hot-side lookups below all read
        # `marked`; Catalyst does not recognize the filter-differing
        # subtrees as one exchange (measured: 3 full scan→shingle→agg
        # copies in the plan), so persist the windowed postings — the
        # same ~1%-of-corpus, spillable cache class as the per-doc
        # index the r16 shape persisted. Single-consumer when
        # max_df is None — no cache needed there.
        from pyspark import StorageLevel

        marked = marked.persist(StorageLevel.MEMORY_AND_DISK)
    width_ok = F.col("__df") >= 2
    if max_df is not None:
        width_ok = width_ok & (F.col("__df") <= max_df)
    inverted = (
        marked.filter(width_ok)
        .groupBy("h")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("n_sh").alias("n"))
                )
            ).alias("ids")
        )
    )
    # id is unique within a posting list, so struct sort == id sort and
    # generated pairs keep id_a < id_b.
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(
                    x["id"].alias("id_a"), x["n"].alias("n_a"),
                    y["id"].alias("id_b"), y["n"].alias("n_b"),
                ),
            ),
        )
    )
    cand = (
        inverted
        .select(F.explode(pair_structs).alias("p"))
        .groupBy("p.id_a", "p.n_a", "p.id_b", "p.n_b")
        .agg(F.count(F.lit(1)).alias("c_cap"))
    )
    if max_df is not None:
        # per-doc hot-shingle arrays (df > max_df): the only shingles a
        # candidate pair can share beyond its capped count
        empty = F.array().cast("array<bigint>")
        hots = (
            marked.filter(F.col("__df") > max_df)
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list("h")).alias("hot"))
        )
        cand = (
            cand.join(
                hots.select(F.col(id_col).alias("id_a"),
                            F.col("hot").alias("hot_a")),
                "id_a", "left")
            .join(
                hots.select(F.col(id_col).alias("id_b"),
                            F.col("hot").alias("hot_b")),
                "id_b", "left")
        )
        n_common = (
            F.col("c_cap")
            + F.size(F.array_intersect(
                F.coalesce(F.col("hot_a"), empty),
                F.coalesce(F.col("hot_b"), empty),
            ))
        ).cast("long")
    else:
        # uncapped: every shared shingle has df >= 2 and is counted
        n_common = F.col("c_cap").cast("long")
    return (
        cand.withColumn("n_common", n_common)
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def simhash_md5(tokens: DataFrame, id_col: str = "doc_id",
                tok_col: str = "tok") -> DataFrame:
    """Per-document 64-bit SimHash (Charikar STOC'02; Manku WWW'07 uses
    the same 64-bit size) over a (id, token) frame → (id_col, s1, s2):
    two 32-bit halves, bits from md5 hex chars 1-8 and 9-16.

    Token hashes come from md5 rather than xxhash64 so the construction
    is reproducible in any engine with an md5 function (that keeps the
    whole fingerprint oracle-checkable); the two-halves layout keeps
    every value inside a signed BIGINT. Bit i of each half is the sign
    of Σ_tokens (±1 on hash bit i). One groupBy with 64 algebraic
    aggregates — a single shuffle of (id, token-hash) pairs at scale.

    The two conv(substring(md5)) longs are materialized in a narrow
    projection BEFORE the groupBy (round 16 — the documented
    minhash_signatures_md5 rationale applied here too): each md5/conv
    is then computed once per token regardless of aggregate-side
    common-subexpression behavior, and the 64 aggregate inputs are
    plain shift/mask ops over two long columns — a much smaller
    codegen unit.
    """
    proj = tokens.select(
        F.col(id_col),
        *[
            F.conv(
                F.substring(F.md5(F.col(tok_col).cast("binary")), s, 8),
                16, 10,
            ).cast("long").alias(n)
            for s, n in ((1, "__h1"), (9, "__h2"))
        ],
    )

    def half(hcol: str, prefix: str) -> list:
        h = F.col(hcol)
        return [
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"{prefix}{i}")
            for i in range(32)
        ]

    agg = proj.groupBy(id_col).agg(*half("__h1", "a"), *half("__h2", "b"))

    def assemble(prefix: str) -> F.Column:
        sim = None
        for i in range(32):
            term = F.when(F.col(f"{prefix}{i}") >= 0, F.lit(2**i)).otherwise(F.lit(0))
            sim = term if sim is None else sim + term
        return sim.cast("long")

    return agg.select(F.col(id_col), assemble("a").alias("s1"), assemble("b").alias("s2"))


def simhash_pairs(sims: DataFrame, id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """All pairs with 64-bit Hamming distance <= max_hamming — EXACT,
    but without the all-pairs join: the fingerprint is split into
    max_hamming+1 bands of 64/(max_hamming+1) bits, and by pigeonhole
    any pair within the Hamming budget agrees exactly on at least one
    band → candidates are a bucket equi-join on (band, band_bits),
    verified with bit_count(xor). Same output as a naive self-join (the
    oracle's spelling), one narrow bucket shuffle at scale (Manku et
    al.'s rotated-table scheme, WWW'07).

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    halves = {1: F.col("s1"), 2: F.col("s2")}

    def band_bits(b: int) -> F.Column:
        # bands tile s1 then s2 (each half holds 32 bits)
        start = b * width
        half, off = (1, start) if start < 32 else (2, start - 32)
        return (
            F.shiftright(halves[half], off)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bits")
        )

    bands = F.array(
        *[F.struct(F.lit(b).alias("band"), band_bits(b)) for b in range(n_bands)]
    )
    buckets = sims.select(
        F.col(id_col), "s1", "s2", F.explode(bands).alias("bb")
    ).select(
        F.col(id_col), "s1", "s2",
        F.col("bb.band").alias("band"), F.col("bb.bits").alias("bits"),
    )
    a = buckets.select(F.col(id_col).alias("id_a"), F.col("s1").alias("a1"),
                       F.col("s2").alias("a2"), "band", "bits")
    b = buckets.select(F.col(id_col).alias("id_b"), F.col("s1").alias("b1"),
                       F.col("s2").alias("b2"), "band", "bits")
    ham = (
        F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
        + F.bit_count(F.col("a2").bitwiseXOR(F.col("b2")))
    ).cast("long")
    return (
        a.join(b, ["band", "bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
