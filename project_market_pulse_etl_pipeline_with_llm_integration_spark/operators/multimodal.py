"""Multimodal column plumbing (north-star mandate).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata; the expensive decode/feature steps are Pandas UDFs
over ``mapInPandas`` so each Arrow batch crosses the JVM<->Python
boundary once.  The media codecs themselves are NOT in this container,
so the decode step is stubbed (deterministic fake by default,
``NotImplementedError`` when a real codec is demanded) — the Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import cached_scan

FEATURE_DIM = 8

# Pluggable media decoder (verdict r8 #6), mirroring enrich.set_transport:
# a real deployment installs PIL/torchaudio/ffmpeg here and every feature
# operator picks it up WITHOUT any operator change.  bytes -> feature
# vector; must be cloudpickle-shippable to Python workers (a local/
# nested function or one from a worker-importable module — NOT a
# function from a module only the driver can import, which pickles by
# reference and fails on the worker).  Module globals do NOT propagate
# to worker processes, so the operators capture the codec at plan-build
# time exactly like enrich captures its transport (enrich.py:168).
Codec = Callable[[bytes], list[float]]
_codec: Codec | None = None


def set_codec(fn: Codec | None) -> None:
    global _codec
    _codec = fn


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata —
    stands in for raw image/audio bytes ingested from object storage."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return (
        df.withColumn("payload", payload)
        .withColumn("payload_len", F.octet_length(payload).cast("long"))
        .withColumn("payload_md5", F.md5(payload))
        .withColumn("media_type", F.lit("application/octet-stream"))
    )


def decode_stub(payload: bytes, real_codec: bool = False) -> list[float]:
    """Deterministic fake 'decode + feature-extract' for one media blob.

    A real deployment swaps this for PIL/torchaudio/ffmpeg; those libs
    are not in this container, so demanding a real codec raises."""
    if real_codec:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg/torchaudio) are not available in this "
            "environment; decode_stub provides deterministic fake features"
        )
    # 8 bucketed byte-histogram features — stable, content-derived.
    feats = [0.0] * FEATURE_DIM
    for b in payload:
        feats[b % FEATURE_DIM] += 1.0
    total = max(len(payload), 1)
    return [round(f / total, 6) for f in feats]


def extract_features(
    df: DataFrame, payload_col: str = "payload", codec: Codec | None = None
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.  Input columns
    pass through; appends array<double> ``features`` (FEATURE_DIM-wide).
    Arrow moves the binary batches; Python touches each blob once.
    Decode = the installed codec (``set_codec`` / the ``codec`` arg),
    falling back to the deterministic stub."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", features array<double>"
    codec_fn = codec or _codec  # captured at plan-build time (see Codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                list(codec_fn(bytes(p))) if codec_fn is not None else decode_stub(bytes(p))
                for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features_arrow(
    df: DataFrame, payload_col: str = "payload", codec: Codec | None = None
) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: the batch stays
    a pyarrow RecordBatch end-to-end — no Arrow->pandas->Arrow
    round-trip, which for binary-heavy columns skips two full copies of
    every payload per batch.  Same output contract (append
    ``features`` array<double>); pinned feature-identical to the pandas
    path by test.  The pandas path remains the default for readability;
    this is the documented escape hatch when the payload bytes dominate
    batch transfer cost (the 100 TB media-column case)."""
    import pyarrow as pa

    names = [f.name for f in df.schema.fields]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", features array<double>"
    codec_fn = codec or _codec  # captured at plan-build time (see Codec)

    def run(batches):
        for batch in batches:
            payloads = batch.column(names.index(payload_col))
            feats = [
                list(codec_fn(p.as_py() or b""))
                if codec_fn is not None
                else decode_stub(p.as_py() or b"")
                for p in payloads
            ]
            arrays = [batch.column(i) for i in range(batch.num_columns)]
            arrays.append(pa.array(feats, type=pa.list_(pa.float64())))
            yield pa.RecordBatch.from_arrays(arrays, names=[*names, "features"])

    return df.mapInArrow(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = 256,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling over opaque media blobs: slice each payload into
    fixed-size frames, keeping at most ``max_frames`` — the video
    frame-sample / audio chunking pattern.  Real codecs would decode
    before slicing (stubbed here, see decode_stub); the Arrow plumbing
    and frame-boundary math are real."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", frames array<binary>, n_frames bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            all_frames, counts = [], []
            for p in pdf[payload_col]:
                b = bytes(p)
                n = min((len(b) + frame_bytes - 1) // frame_bytes, max_frames)
                frames = [b[i * frame_bytes : (i + 1) * frame_bytes] for i in range(n)]
                all_frames.append(frames)
                counts.append(n)
            pdf["frames"] = all_frames
            pdf["n_frames"] = counts
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_payload(
    df: DataFrame, payload_col: str = "payload", target_bytes: int = 64
) -> DataFrame:
    """'Resize' over opaque media blobs: deterministic stride resampling
    down to <= ``target_bytes`` (keep every stride-th byte, stride =
    ceil(len/target)) — the image-resize / audio-downsample pattern with
    the codec swapped for byte arithmetic (see decode_stub).  Appends
    ``resized`` (binary), ``stride`` and ``resized_len``; the length law
    resized_len = ceil(len/stride) is SQL-checkable, the bytes are
    pinned by pytest."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", resized binary, stride bigint, resized_len bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            resized, strides, lens = [], [], []
            for p in pdf[payload_col]:
                b = bytes(p)
                stride = max((len(b) + target_bytes - 1) // target_bytes, 1)
                r = b[::stride]
                resized.append(r)
                strides.append(stride)
                lens.append(len(r))
            pdf["resized"] = resized
            pdf["stride"] = strides
            pdf["resized_len"] = lens
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize slice with an arithmetic oracle: stride and resized length
    are pure functions of payload size and the target."""
    df = cached_scan(spark, f"{sf_dir}/documents.parquet")
    resized = resize_payload(with_binary_payload(df).select("doc_id", "payload"))
    return resized.select("doc_id", "stride", "resized_len")


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling slice with an arithmetic oracle: frame counts and
    first/last frame byte lengths are pure functions of payload size."""
    df = cached_scan(spark, f"{sf_dir}/documents.parquet")
    framed = sample_frames(with_binary_payload(df).select("doc_id", "payload"))
    first_len = F.when(
        F.col("n_frames") > 0, F.octet_length(F.element_at("frames", 1))
    ).otherwise(0)
    last_len = F.when(
        F.col("n_frames") > 0, F.octet_length(F.element_at("frames", -1))
    ).otherwise(0)
    return framed.select(
        "doc_id",
        "n_frames",
        first_len.cast("long").alias("first_frame_len"),
        last_len.cast("long").alias("last_frame_len"),
    )


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the multimodal pipeline: binary payload
    length + md5 (the metadata law an engine must preserve end-to-end)."""
    df = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return with_binary_payload(df).select("doc_id", "payload_len", "payload_md5", "media_type")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full plumbing incl. the stubbed decode (rows-only check: the fake
    features are engine-defined, not SQL-expressible)."""
    df = cached_scan(spark, f"{sf_dir}/documents.parquet")
    feats = extract_features(with_binary_payload(df).select("doc_id", "payload"))
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 2), 6).alias("f1"),
        F.size("features").alias("feature_dim"),
    )


def q_multimodal_shape_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible contract row for the rows-only
    ``multimodal_features`` (the shape-law pattern): the feature
    extractor must be a total function of the corpus that emits
    fixed-shape, normalized vectors —

    * ``n_rows_ok`` — exactly one feature row per document (mapInPandas
      neither drops nor duplicates rows across Arrow batches).
    * ``dim_ok`` — every vector is exactly FEATURE_DIM wide.
    * ``sum_ok`` — the bucketed byte histogram is normalized: per-doc
      component sum within 8 rounding steps of 1.0 for non-empty
      payloads, exactly 0.0 for empty ones.
    * ``range_ok`` — every component in [0, 1].

    All four booleans are structural (hold at any sf); together they
    pin the Arrow plumbing's row alignment and the stub's declared
    output domain without hashing engine-defined float values."""
    df = cached_scan(spark, f"{sf_dir}/documents.parquet")
    feats = extract_features(
        with_binary_payload(df).select("doc_id", "payload_len", "payload")
    )
    fsum = F.aggregate(
        F.col("features"), F.lit(0.0), lambda acc, x: acc + x
    )
    per_doc = feats.select(
        F.size("features").alias("dim"),
        fsum.alias("fsum"),
        F.array_min("features").alias("fmin"),
        F.array_max("features").alias("fmax"),
        (F.col("payload_len") == 0).alias("empty"),
    )
    tol = 8 * 5e-7 + 1e-12  # FEATURE_DIM components each rounded at 1e-6
    checks = per_doc.agg(
        F.count("*").alias("n_rows"),
        F.sum(((F.col("dim") != FEATURE_DIM)).cast("long")).alias("n_bad_dim"),
        F.sum(
            F.when(
                F.col("empty"), (F.col("fsum") != 0.0).cast("long")
            ).otherwise((F.abs(F.col("fsum") - 1.0) > tol).cast("long"))
        ).alias("n_bad_sum"),
        F.sum(
            ((F.col("fmin") < 0.0) | (F.col("fmax") > 1.0)).cast("long")
        ).alias("n_bad_range"),
    )
    n_docs = df.agg(F.count("*").alias("n_docs"))
    return checks.crossJoin(n_docs).select(
        F.lit("multimodal_features").alias("method"),
        (F.col("n_rows") == F.col("n_docs")).alias("n_rows_ok"),
        (F.col("n_bad_dim") == 0).alias("dim_ok"),
        (F.col("n_bad_sum") == 0).alias("sum_ok"),
        (F.col("n_bad_range") == 0).alias("range_ok"),
    )


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over OPAQUE BINARY payloads by content digest — the
    multimodal sibling of ``dedup.dedup_exact``: identical media blobs
    (re-crawled images, mirrored audio files) collapse on md5(payload)
    with min-id survivor election and per-digest byte accounting (the
    'how much storage do duplicates burn' number a crawl audit leads
    with).

    Scale posture: the digest is computed IN the scan projection, so
    only (32-char md5, id, length) ever shuffles — payloads, like
    document bodies in the text family, never leave their partition.
    One hash agg with map-side combine; at 100 TB the shuffle is
    O(rows x 48 bytes) regardless of blob sizes."""
    docs = cached_scan(spark, f"{sf_dir}/documents.parquet")
    return (
        with_binary_payload(docs)
        .groupBy("payload_md5")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("dup_count"),
            F.min("payload_len").cast("long").alias("payload_bytes"),
            (F.sum("payload_len") - F.min("payload_len")).cast("long")
            .alias("wasted_bytes"),
        )
    )
