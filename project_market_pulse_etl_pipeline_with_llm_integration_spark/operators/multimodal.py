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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_DIM = 8


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


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.  Input columns
    pass through; appends array<double> ``features`` (FEATURE_DIM-wide).
    Arrow moves the binary batches; Python touches each blob once."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [decode_stub(bytes(p)) for p in pdf[payload_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


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
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    resized = resize_payload(with_binary_payload(df).select("doc_id", "payload"))
    return resized.select("doc_id", "stride", "resized_len")


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling slice with an arithmetic oracle: frame counts and
    first/last frame byte lengths are pure functions of payload size."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_binary_payload(df).select("doc_id", "payload_len", "payload_md5", "media_type")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full plumbing incl. the stubbed decode (rows-only check: the fake
    features are engine-defined, not SQL-expressible)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_features(with_binary_payload(df).select("doc_id", "payload"))
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 2), 6).alias("f1"),
        F.size("features").alias("feature_dim"),
    )
