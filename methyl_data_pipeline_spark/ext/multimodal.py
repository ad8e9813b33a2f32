"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns + a typed metadata struct
(`modality`, `mime`, `n_bytes`), flowing through the same long-form
engine as any other column. Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` — per-partition batch iterators so a
decoder amortizes model/codec init across a batch, the shape a real
image/audio library needs.

The actual decoders are STUBS (no PIL/ffmpeg/torchaudio in this
container): ``decode_features`` computes deterministic digest-based
pseudo-features so the Spark-side plumbing (schema, batching,
partitioning, UDF signature) is real and testable end-to-end, and
``decode_image``/``decode_audio`` raise ``NotImplementedError`` behind
an import-try, marking exactly where a real codec plugs in.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F


MEDIA_SCHEMA = (
    "id long, modality string, mime string, n_bytes long, content binary"
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a column as an opaque media row (binary + metadata struct).
    Used by tests/fixtures to exercise the plumbing with utf-8 payloads
    standing in for image bytes."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        F.lit("text").alias("modality"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(content).cast("long").alias("n_bytes"),
        content.alias("content"),
    )


def decode_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Batch feature extraction over binary content via ``mapInPandas``.

    STUB decode: features are md5-digest bytes scaled to [0,1] —
    deterministic, library-free, same batch shape a real extractor
    (resize → CNN embed / mel spectrogram) would produce.
    """
    out_schema = (
        "id long, modality string, n_bytes long, "
        "digest string, features array<double>"
    )

    def extract(batches):
        for pdf in batches:
            digests = []
            feats = []
            for content in pdf["content"]:
                raw = bytes(content) if content is not None else b""
                d = hashlib.md5(raw).hexdigest()
                digests.append(d)
                feats.append(
                    [int(d[2 * i : 2 * i + 2], 16) / 255.0 for i in range(feature_dim)]
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "digest": digests,
                    "features": feats,
                }
            )

    return media.mapInPandas(extract, out_schema)


def decode_image(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Real image decode/resize — requires an imaging library."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL/opencv (not in this container); "
            "plumbing is exercised via decode_features"
        ) from e
    raise NotImplementedError("wire PIL decode here when the image lib lands")


def decode_audio(media: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """Real audio decode/resample — requires an audio library."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "audio decode needs soundfile/ffmpeg (not in this container); "
            "plumbing is exercised via decode_features"
        ) from e
    raise NotImplementedError("wire soundfile decode here when the audio lib lands")


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling stub — same contract as decode_image but
    yields multiple rows per input (1:N mapInPandas)."""
    raise NotImplementedError(
        "video frame sampling needs ffmpeg (not in this container)"
    )
