"""Binary image/audio/video decode and feature plumbing.

Moved verbatim from the single-file catalog in the round-8 package
split; see _shared for the helpers and _registry for the decorator.
"""

from noaa_ais_glue_lakehouse_spark.plans.catalog._registry import (  # noqa: F401
    get_query,
    register,
)
from noaa_ais_glue_lakehouse_spark.plans.catalog._shared import *  # noqa: F401,F403


@register(
    "q43_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS asset_bytes,
           md5(text) AS asset_fingerprint
    FROM documents
    """,
)
def q43_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — opaque binary payload (document bytes stand in for an
    image blob) + typed metadata columns, all JVM-side expressions."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import binary_metadata

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = binary_metadata(docs, "payload")
    return out.select("doc_id", "asset_bytes", "asset_fingerprint")



@register(
    "q44_image_decode_stub",
    oracle="""
    SELECT doc_id AS id,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 7) % 640 AS INT) END AS width,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 13) % 480 AS INT) END AS height,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 31) % 4 AS INT) END AS channels,
           octet_length(encode(text)) > 0 AS decode_ok
    FROM documents
    """,
)
def q44_image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — Arrow-batched ``mapInPandas`` decode plumbing run in
    ``use_stub=True`` mode. NAMING NOTE: "stub" here is the
    ORACLE-REPRODUCIBILITY mode, not a placeholder decoder — the REAL
    header decoders (PNG/JPEG/GIF/BMP byte parsing) exist in
    ``operators/multimodal.py`` and are hash-checked by q259 over
    synthesized-valid payloads. This entry deliberately feeds arbitrary
    (non-image) bytes through the same mapInPandas pipeline with the
    deterministic fake decoder, because arbitrary bytes have no real
    header to parse yet the SQL oracle must still reproduce every output
    value — it pins the Arrow batch plumbing, schema, and null handling
    independently of decode logic. The name is kept for driver-gate
    continuity (the per-round CORRECTNESS artifacts key on it)."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import decode_images

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_images(docs, "doc_id", "payload", use_stub=True)



@register(
    "q45_frame_sample",
    oracle="""
    SELECT event_id,
           CAST(unnest(range(0, CAST(event_id % 50 AS BIGINT), 7)) AS BIGINT) AS frame_idx
    FROM events
    """,
)
def q45_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — frame-sampling keep-rule as a pure Spark plan
    (sequence + explode); the decode of kept frames would chain a
    mapInPandas step like q44."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import sample_frames

    ev = load(spark, sf_dir, "events").withColumn(
        "n_frames", (F.col("event_id") % 50).cast("long")
    )
    return sample_frames(ev, "event_id", "n_frames", 7)



@register(
    "q122_image_decode_arrow",
    oracle="""
    SELECT doc_id AS id,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 7) % 640 AS INT) END AS width,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 13) % 480 AS INT) END AS height,
           CASE WHEN octet_length(encode(text)) > 0
                THEN CAST(1 + (octet_length(encode(text)) * 31) % 4 AS INT) END AS channels,
           octet_length(encode(text)) > 0 AS decode_ok
    FROM documents
    """,
)
def q122_image_decode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — the q44 decode as ``mapInArrow``: RecordBatches in
    and out, metadata computed from Arrow buffer offsets, binary payloads
    never copied into Python objects (the pandas boxing q44's
    mapInPandas pays per batch). Same oracle as q44, so the two Python
    execution paths are pinned bit-identical."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        decode_images_arrow,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_images_arrow(docs, "doc_id", "payload")



@register("q201_audio_features")  # rows-only: per-sample PCM math is not SQL-expressible
def q201_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X128 — multimodal audio path: document bytes stand in for raw
    PCM16 payloads; per-frame RMS energy + zero-crossing rate extracted
    with the REAL numpy feature math (PCM needs no codec — this is the
    one multimodal decode that runs fully, not as a stub) inside
    Arrow-batched mapInPandas. Known-waveform values are pinned in
    tests/test_multimodal.py; the per-frame explode happens inside the
    Arrow batch and payloads never reach the driver.
    """
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = extract_audio_features(docs, "doc_id", "payload", frame_samples=64)
    return out.select(
        F.col("id").alias("doc_id"),
        "frame_idx",
        "n_samples",
        F.round("rms", 6).alias("rms"),
        F.round("zcr", 6).alias("zcr"),
    )


# ---------------------------------------------------------------------------
# Statistical audits: KS drift, Gini, HHI (X129-X131)
# ---------------------------------------------------------------------------



@register(
    "q259_image_header_decode",
    oracle="""
    SELECT doc_id AS id,
           CAST(1 + doc_id % 48 AS INT) AS width,
           CAST(1 + doc_id % 32 AS INT) AS height,
           CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 3 END AS INT) AS channels,
           TRUE AS decode_ok
    FROM documents
    """,
)
def q259_image_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X188 — REAL image header decode, end-to-end hash-checked: real
    PNG/GIF/BMP/JPEG payloads (CRC-correct chunks, valid zlib IDAT,
    marker-walked SOF frames) are synthesized on the executors with
    dimensions derived from doc_id, then ``decode_images`` recovers the
    dimensions by parsing the ACTUAL format headers — pure Python, no
    imaging library, no length stub anywhere on this path. The oracle
    recomputes the expected dimensions from the doc_id formulas, so a
    parser that mis-reads any byte offset hash-mismatches immediately.
    Channels: gif is palette-indexed (1 band); png(rgb)/bmp(24bpp)/
    jpeg(YCbCr) are 3. The stub remains only for payloads whose magic
    bytes nothing recognizes (q44 pins that mode).

    Scale shape: two chained Arrow-batched ``mapInPandas`` stages
    (synthesize → decode), zero shuffles, payload bytes never leave the
    executors — the plan a 100 TB thumbnail-metadata backfill wants.
    """
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        decode_images,
        synthesize_image_assets,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    assets = synthesize_image_assets(docs, "doc_id")
    return decode_images(assets, "id", "payload", use_stub=False)



@register(
    "q380_image_header_decode_ext",
    oracle="""
    SELECT doc_id AS id,
           CAST(1 + doc_id % 48 AS INT) AS width,
           CAST(1 + doc_id % 32 AS INT) AS height,
           CAST(CASE WHEN doc_id % 6 = 1 THEN 1 ELSE 3 END AS INT) AS channels,
           TRUE AS decode_ok
    FROM documents
    """,
)
def q380_image_header_decode_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X310 — q259's end-to-end header-decode gate EXTENDED to all six
    supported raster formats (round 6 adds WebP and TIFF): real
    PNG/GIF/BMP/JPEG/WebP-VP8L/TIFF payloads synthesized on the
    executors with doc_id-derived dimensions, decoded back by parsing
    the actual format bytes (RIFF chunk walk + VP8L bit unpacking; TIFF
    IFD entry walk in either byte order). The oracle recomputes the
    expected dimensions from the doc_id formulas — any mis-read byte
    offset in the two new parsers hash-mismatches here. Channels: gif
    is palette-indexed (1); png(rgb)/bmp(24bpp)/jpeg(YCbCr)/
    webp(VP8L, no alpha bit)/tiff(SamplesPerPixel=3) are 3.

    Scale shape: identical to q259 — two chained Arrow-batched
    ``mapInPandas`` stages, zero shuffles, payloads never leave the
    executors."""
    from noaa_ais_glue_lakehouse_spark.operators.multimodal import (
        _ASSET_FORMAT_CYCLE_EXT,
        decode_images,
        synthesize_image_assets,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    assets = synthesize_image_assets(
        docs, "doc_id", formats=_ASSET_FORMAT_CYCLE_EXT
    )
    return decode_images(assets, "id", "payload", use_stub=False)


