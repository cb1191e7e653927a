"""Multimodal columns (SURVEY.md §2.11): image/audio/video as opaque
BinaryType payloads + typed metadata, with the full Spark-side plumbing
— schema, partition-friendly layout, Arrow-batched UDF boundaries —
real and tested, and only the codec itself stubbed (no image/audio
libraries exist in this container).

100 TB layout rules encoded here:
- payload is ONE BinaryType column; metadata is a flat struct so
  predicates on it prune row groups without touching payload bytes
  (parquet column pruning keeps scans narrow — filtering by mime/width
  never reads the media bytes);
- payload-hash dedup ships 16-byte md5 keys through the shuffle, never
  payloads;
- decode/feature-extract run via mapInPandas (Arrow batches, bounded
  batch size) so a 100 MB video row can't blow a worker: batches are
  bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

_KINDS = ("image", "audio", "video")
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table derived from the documents
    fixture (no media fixtures exist): payload = utf8 bytes of the text,
    kind/meta derived from doc_id/n_chars. Fully expressible in SQL, so
    metadata/dedup queries stay oracle-checkable."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    mime = F.element_at(
        F.array(*[F.lit(_MIMES[k]) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            mime.alias("mime"),
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payloads to fixed-shape feature vectors via mapInPandas.

    ``fake=True`` (default in this container) runs a deterministic
    stand-in decoder: 8 pseudo-features from the payload's md5 — the
    Spark plumbing (schema, Arrow batching, partition behavior) is
    identical to a real codec. ``fake=False`` is the real-codec slot and
    raises NotImplementedError until PIL/ffmpeg exist in the image.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if not fake:
            raise NotImplementedError(
                "real media decode requires PIL/soundfile/ffmpeg, not present "
                "in this container; use fake=True for the deterministic stub"
            )
        for pdf in batches:
            feats = [
                [b / 255.0 for b in hashlib.md5(p).digest()[:8]]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return df.mapInPandas(run, schema=out_schema)


def dedup_by_payload(df: DataFrame) -> DataFrame:
    """Exact media dedup on md5(payload) — the shuffle carries 16-byte
    hashes + ids only."""
    return (
        df.groupBy(F.md5("payload").alias("payload_md5"))
        .agg(F.min("media_id").alias("keep_media_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def resize_media(media: DataFrame, box: int = 256,
                 fake: bool = True) -> DataFrame:
    """Image resize-to-fit (square ``box``, aspect preserved): the
    metadata math (target dims) is exact integer arithmetic — scale =
    box / max(w, h), i.e. ``new_w = w * box div max(w, h, 1)``, scaled
    dims clamped to >= 1 px (a real codec cannot emit a 0-height image,
    so extreme aspect ratios fit to 1 px like PIL's thumbnail does) —
    and the re-encoded payload is the deterministic stub
    md5(payload ‖ WxH) until PIL exists in the image (``fake=False``
    raises). The shape that matters at 100 TB: resize is a narrow map —
    no shuffle, no payload duplication, and the real decoder drops in
    behind the same column contract (mapInPandas, like decode_media)."""
    if not fake:
        raise NotImplementedError(
            "real image resize needs PIL, not present in this container; "
            "use fake=True for the deterministic stub"
        )
    imgs = media.filter(F.col("kind") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    fits = (w <= box) & (h <= box)

    def scaled(dim: str) -> F.Column:
        return F.greatest(
            F.expr(f"div(meta.{dim} * {box}, greatest(meta.width, meta.height, 1))"),
            F.lit(1),
        ).cast("int")

    new_w = F.when(fits, w).otherwise(scaled("width"))
    new_h = F.when(fits, h).otherwise(scaled("height"))
    return imgs.select(
        "media_id",
        w.cast("long").alias("width"),
        h.cast("long").alias("height"),
        new_w.cast("long").alias("new_width"),
        new_h.cast("long").alias("new_height"),
        F.md5(
            F.concat(
                F.col("payload").cast("string"),
                new_w.cast("string"), F.lit("x"), new_h.cast("string"),
            )
        ).alias("resized_md5"),
    )


def register_queries() -> None:
    """Register the oracle-checkable multimodal queries."""
    from .registry import query
    from .tables import load

    @query(
        "q_mm_meta_filter",
        oracle="""
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
               CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                               ELSE 'video/mp4' END AS mime,
               n_chars % 1920 AS width,
               length(text) AS payload_bytes
        FROM documents
        WHERE (n_chars % 1920) >= 200 AND doc_id % 3 = 0
        """,
    )
    def q_mm_meta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Metadata predicate over media without touching payloads: the
        filter runs on meta/kind columns only (parquet would prune the
        payload column entirely — verified by ReadSchema in .explain)."""
        media = media_from_documents(load(spark, sf_dir, "documents"))
        return media.filter(
            (F.col("meta.width") >= 200) & (F.col("kind") == "image")
        ).select(
            "media_id",
            "kind",
            F.col("meta.mime").alias("mime"),
            F.col("meta.width").cast("long").alias("width"),
            F.length("payload").cast("long").alias("payload_bytes"),
        )

    @query(
        "q_mm_dedup_payload",
        oracle="""
        SELECT md5(text) AS payload_md5,
               min(doc_id) AS keep_media_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
        """,
    )
    def q_mm_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Binary payload dedup by content hash — survivor manifest
        (one row per distinct payload with its copy count), not a
        HAVING>1 duplicate report: the small fixtures have no byte-
        identical payloads, so duplicates-only output would be an
        empty==empty vacuous oracle match."""
        media = media_from_documents(load(spark, sf_dir, "documents"))
        return dedup_by_payload(media).select(
            "payload_md5", "keep_media_id", "n_copies"
        )

    @query(
        "q_mm_frames",
        oracle="""
        WITH vids AS (
            SELECT doc_id AS media_id, md5(text) AS pmd5,
                   (n_chars * 10) // 1000 AS n_frames
            FROM documents WHERE doc_id % 3 = 2
        )
        SELECT media_id,
               CAST(k.k AS BIGINT) AS frame_idx,
               CAST(k.k * 1000 AS BIGINT) AS t_ms,
               md5(concat(pmd5, CAST(k.k AS VARCHAR))) AS frame_md5
        FROM vids, unnest(generate_series(0, greatest(CAST(n_frames AS INT) - 1, 0)))
             AS k(k)
        """,
    )
    def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Video frame sampling (1 frame/s): narrow explode over the frame
        grid with payload-derived deterministic fingerprints — the stub
        decoder is SQL-expressible, so even this path is hash-checked."""
        media = media_from_documents(load(spark, sf_dir, "documents"))
        return sample_frames(media, every_ms=1000)

    @query(
        "q_mm_resize",
        oracle="""
        WITH dims AS (
            SELECT doc_id AS media_id, text,
                   n_chars % 1920 AS w, n_chars % 1080 AS h,
                   greatest(greatest(n_chars % 1920, n_chars % 1080), 1) AS m
            FROM documents WHERE doc_id % 3 = 0
        )
        SELECT media_id, w AS width, h AS height,
               CASE WHEN w <= 256 AND h <= 256 THEN CAST(w AS BIGINT)
                    ELSE greatest(w * 256 // m, 1) END AS new_width,
               CASE WHEN w <= 256 AND h <= 256 THEN CAST(h AS BIGINT)
                    ELSE greatest(h * 256 // m, 1) END AS new_height,
               md5(concat(text,
                   CASE WHEN w <= 256 AND h <= 256 THEN CAST(w AS BIGINT)
                        ELSE greatest(w * 256 // m, 1) END,
                   'x',
                   CASE WHEN w <= 256 AND h <= 256 THEN CAST(h AS BIGINT)
                        ELSE greatest(h * 256 // m, 1) END)) AS resized_md5
        FROM dims
        """,
    )
    def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Image resize-to-fit (256 box): exact integer target-dim math +
        stubbed re-encode fingerprint, hash-checked end-to-end. The real
        PIL decoder slot sits behind fake=False (NotImplementedError in
        this container); everything Spark-side — filter on kind,
        metadata arithmetic, payload-hash contract — is the real path."""
        media = media_from_documents(load(spark, sf_dir, "documents"))
        return resize_media(media, box=256)

    @query(
        "q_mm_features",
        oracle="""
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
               8 AS dim,
               array_to_string(list_transform(range(8), i ->
                   printf('%.6f', CAST(CAST(
                       CAST(concat('0x', substring(md5(text), 2*i+1, 2)) AS INT)
                       / 255.0 AS FLOAT) AS DOUBLE))), ',') AS features_str
        FROM documents
        """,
    )
    def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
        """mapInPandas decode → fixed-shape feature vectors (stubbed codec,
        real Arrow/schema/partition plumbing). The stub decoder (md5-byte
        features) is deliberately SQL-expressible, so even the Arrow UDF
        boundary is hash-checked against the oracle; features surface as a
        '%.6f'-joined string (driver canon can't hash list cells), with the
        float32→double widening replicated on the oracle side."""
        media = media_from_documents(load(spark, sf_dir, "documents"))
        feats = decode_media(media, fake=True)
        return feats.select(
            "media_id",
            "kind",
            F.size("features").alias("dim"),
            F.array_join(
                F.transform(
                    F.col("features"),
                    lambda x: F.format_string("%.6f", x.cast("double")),
                ),
                ",",
            ).alias("features_str"),
        )


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  fake: bool = True) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled frame with
    (media_id, frame_idx, t_ms, frame_md5). ``fake=True`` derives a
    deterministic frame fingerprint from md5(payload ‖ idx) — the real
    decoder slot (ffmpeg seek + decode) raises until media libs exist.
    The plumbing is the part that matters at scale: frame expansion is
    a narrow explode over sequence(0, duration/step), so a 2-hour video
    fans out to rows without the payload being copied per frame
    (payload column is dropped before the explode)."""
    if not fake:
        raise NotImplementedError(
            "real frame sampling needs ffmpeg/PyAV, not present in this "
            "container; use fake=True for the deterministic stub"
        )
    vids = media.filter(F.col("kind") == "video")
    n_frames = F.floor(F.col("meta.duration_ms") / F.lit(every_ms)).cast("int")
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
        "frame_idx"
    )
    frames = vids.select(
        "media_id",
        F.md5(F.col("payload")).alias("_pmd5"),
        F.col("meta.duration_ms").alias("duration_ms"),
        idx,
    )
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("frame_idx") * every_ms).cast("long").alias("t_ms"),
        F.md5(F.concat(F.col("_pmd5"), F.col("frame_idx").cast("string")).cast("binary"))
        .alias("frame_md5"),
    )
