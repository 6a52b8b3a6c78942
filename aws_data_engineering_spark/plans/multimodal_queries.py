"""Multimodal-column queries: binary blobs with typed metadata, decode /
feature-extract / frame-sample via Arrow-batched mapInPandas.

m01 runs pure-JVM metadata over real bytes (utf-8 of documents.text — the
oracle builds the identical blob with ``encode()``). m02/m03 exercise the
full Python decode path over the deterministic FIMG fake format
(operators/multimodal.py): because the fake pixels are a closed-form
function of the id, DuckDB can replicate the decode *outputs* exactly —
so even the mapInPandas decode pipeline is oracle-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_data_engineering_spark.operators import multimodal as M
from aws_data_engineering_spark.plans.registry import register
from aws_data_engineering_spark.sources.tables import load_table


@register(
    "m01_media_metadata",
    """
    SELECT doc_id AS id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256_hex
    FROM documents
    """,
    "binary-column metadata pass: size + sha256 digest, no decode (JVM-only)",
)
def m01_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode("text", "utf-8").alias("data"))
    return M.media_metadata(blobs, "data", "doc_id")


@register(
    "m02_image_decode_features",
    """
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(4 + doc_id % 16 AS INT) AS width,
             CAST(4 + doc_id % 12 AS INT) AS height
      FROM documents
    )
    SELECT id, width, height,
           CAST(width AS BIGINT) * height AS n_pixels,
           CAST(list_aggregate([CAST((id + k) * 31 % 256 AS DOUBLE)
                                FOR k IN generate_series(0, width * height - 1)],
                               'sum') AS DOUBLE)
             / (width * height) AS mean_pixel,
           'image/x-fimg' AS mime
    FROM dims
    """,
    "image decode + feature extraction via mapInPandas (FIMG fake format; "
    "real JPEG/PNG decode stubbed — needs PIL, absent here)",
)
def m02_image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    images = M.synthesize_fake_images(docs, "doc_id")
    return M.decode_images(images, "id", "data", "mime")


@register(
    "m03_video_frame_sample",
    """
    WITH v AS (
      SELECT doc_id AS id,
             CAST(2 + doc_id % 8 AS INT) AS n_frames,
             12 + (4 + doc_id % 4) * 4 AS frame_size
      FROM documents
    )
    SELECT id, n_frames,
           CAST((n_frames + 1) // 2 AS INT) AS n_sampled,
           CAST(((n_frames + 1) // 2) * frame_size AS BIGINT) AS frame_bytes
    FROM v
    """,
    "video frame sampling via mapInPandas (every 2nd FIMG frame; mp4/pyav "
    "path stubbed — library absent here)",
)
def m03_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    videos = M.synthesize_fake_videos(docs, "doc_id")
    sampled = M.sample_frames(videos, "id", "data", every_k=2)
    return sampled.select(
        "id",
        "n_frames",
        F.size("sampled_frames").alias("n_sampled"),
        "frame_bytes",
    )


@register(
    "m04_audio_decode_features",
    """
    WITH a AS (
      SELECT doc_id AS id,
             CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
             CAST(256 + doc_id % 512 AS INT) AS n_samples
      FROM documents
    )
    SELECT id, sample_rate, n_samples,
           CAST(list_aggregate([(id + k) * 31 % 256
                                FOR k IN generate_series(0, n_samples - 1)],
                               'sum') AS BIGINT) AS sum_amplitude,
           CAST(n_samples // 512 AS INT) AS n_frames
    FROM a
    """,
    "audio decode + feature extraction over binary FAUD clips via "
    "mapInPandas (real soundfile/pyav decode stubbed — absent here); "
    "closed-form oracle over the deterministic fake codec",
)
def m04_audio_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clips = M.synthesize_fake_audio(docs, "doc_id")
    return M.decode_audio_features(clips, "id", "data")


@register(
    "m05_png_decode_features",
    """
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(4 + doc_id % 16 AS INT) AS width,
             CAST(4 + doc_id % 12 AS INT) AS height
      FROM documents
    )
    SELECT id, width, height,
           CAST(width AS BIGINT) * height AS n_pixels,
           CAST(list_aggregate([CAST((id + k) * 31 % 256 AS DOUBLE)
                                FOR k IN generate_series(0, width * height - 1)],
                               'sum') AS DOUBLE)
             / (width * height) AS mean_pixel,
           'image/png' AS mime
    FROM dims
    """,
    "REAL image decode end-to-end: genuine PNG blobs (zlib IDAT, CRC'd "
    "chunks, filter type cycling 0-4 per image) decoded by the pure-Python "
    "codec inside mapInPandas — the oracle's closed-form pixel sum only "
    "matches if every scanline unfilters correctly",
)
def m05_png_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    images = M.synthesize_png_images(docs, "doc_id")
    return M.decode_images(images, "id", "data", "mime")


@register(
    "m06_wav_decode_features",
    """
    WITH a AS (
      SELECT doc_id AS id,
             CAST(8000 + doc_id % 4 * 4000 AS INT) AS sample_rate,
             CAST(256 + doc_id % 512 AS INT) AS n_samples
      FROM documents
    )
    SELECT id, sample_rate, CAST(1 AS INT) AS n_channels, n_samples,
           CAST(list_aggregate([(id + k) * 31 % 256 - 128
                                FOR k IN generate_series(0, n_samples - 1)],
                               'sum') AS BIGINT) AS sum_amplitude,
           CAST(list_aggregate([abs((id + k) * 31 % 256 - 128)
                                FOR k IN generate_series(0, n_samples - 1)],
                               'max') AS INT) AS peak_amplitude,
           n_samples * 1000.0 / sample_rate AS duration_ms
    FROM a
    """,
    "REAL audio decode end-to-end: genuine RIFF/WAVE 16-bit PCM blobs "
    "(canonical fmt /data chunks, little-endian samples) decoded by the "
    "pure-Python codec inside mapInPandas — the closed-form amplitude "
    "sum/peak only match if the signed 16-bit decode is exact; duration is "
    "the same two IEEE ops on both engines, so no rounding needed",
)
def m06_wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clips = M.synthesize_wav_audio(docs, "doc_id")
    return M.decode_wav_features(clips, "id", "data")


@register(
    "m07_jpeg_decode_features",
    """
    WITH dims AS (
      SELECT doc_id AS id,
             CAST(4 + doc_id % 16 AS INT) AS width,
             CAST(4 + doc_id % 12 AS INT) AS height,
             CAST((4 + doc_id % 16 + 7) // 8 AS INT) AS bx_n,
             CAST((4 + doc_id % 12 + 7) // 8 AS INT) AS by_n
      FROM documents
    )
    SELECT id, width, height,
           CAST(width AS BIGINT) * height AS n_pixels,
           CAST(list_aggregate(
                  [(id + b) * 31 % 256
                     * least(8, width - b % bx_n * 8)
                     * least(8, height - b // bx_n * 8)
                   FOR b IN generate_series(0, bx_n * by_n - 1)],
                  'sum') AS BIGINT) AS sum_pixel,
           CAST(list_aggregate(
                  [(id + b) * 31 % 256
                     * least(8, width - b % bx_n * 8)
                     * least(8, height - b // bx_n * 8)
                   FOR b IN generate_series(0, bx_n * by_n - 1)],
                  'sum') AS DOUBLE) / (width * height) AS mean_pixel
    FROM dims
    """,
    "REAL JPEG decode end-to-end: genuine baseline SOF0 grayscale blobs "
    "(Annex-K Huffman tables, byte stuffing, zigzag, unit DQT) decoded by "
    "the pure-Python codec (full float IDCT) inside mapInPandas. The "
    "encoder emits constant 8x8 blocks — the one family a lossy codec maps "
    "through bit-exactly — so the closed-form per-block pixel sum only "
    "matches if Huffman, DC prediction, dequant, and IDCT are all correct",
)
def m07_jpeg_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    images = M.synthesize_jpeg_images(docs, "doc_id")
    return M.decode_jpeg_features(images, "id", "data")


@register(
    "m13_phash_dedup_census",
    """
    WITH dims AS (
      SELECT doc_id AS id, CAST(4 + doc_id % 16 AS INT) AS w,
             CAST(4 + doc_id % 12 AS INT) AS h
      FROM documents
    ), px AS (
      SELECT id, w, h, w * h AS wh,
             list_transform(range(0, w * h), k -> (id + k) * 31 % 256) AS pix
      FROM dims
    ), sig AS (
      SELECT id, w, h,
             list_sum(list_transform(range(0, least(wh, 48)),
               k -> CASE WHEN pix[k + 1] * wh > list_sum(pix)
                    THEN (CAST(1 AS BIGINT) << CAST(k AS INT))
                    ELSE 0 END)) AS sig
      FROM px
    ), grp AS (
      SELECT w, h, sig, COUNT(*) AS n FROM sig GROUP BY 1, 2, 3
    )
    SELECT CAST(n AS INT) AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups
    FROM grp GROUP BY n
    """,
    "perceptual-hash (aHash) dedup census over decoded images: brighter-"
    "than-mean bit signature from integer ops only, identical images "
    "collide on (dims, sig); census of signature-group sizes. The "
    "multimodal twin of d06's simhash dedup — oracle reproduces the "
    "signature closed-form from the FIMG pixel formula",
)
def m13_phash_dedup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    images = M.synthesize_fake_images(docs, "doc_id")
    sig = M.perceptual_hash(images, "id", "data", "mime")
    grp = sig.groupBy("width", "height", "sig").agg(
        F.count(F.lit(1)).alias("n")
    )
    return grp.groupBy(F.col("n").cast("int").alias("group_size")).agg(
        F.count(F.lit(1)).alias("n_groups")
    )
