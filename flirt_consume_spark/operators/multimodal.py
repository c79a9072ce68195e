"""Multimodal (binary-asset) columns for the training-data pipeline (L5).

Images/audio/video ride through the engine as opaque BinaryType
columns plus a typed metadata struct, processed by Arrow-batched
``mapInPandas`` — the schema, partitioning, UDF signature, and batch
shape are real and tested. The actual media decode is STUBBED
(``decode_image`` raises NotImplementedError: no image/audio libs in
this container); ``extract_features`` computes deterministic
byte-level features so the full Spark plumbing is verifiable
end-to-end against a SQL oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_assets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a synthetic binary asset per document (utf-8 bytes of the
    text standing in for image bytes) + typed metadata struct — the
    storage layout for multimodal corpora: content-addressed bytes,
    queryable metadata, partition-prunable without touching payloads."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        F.struct(
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            F.lit("fake/utf8").alias("mime"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("sha", StringType()),
        StructField("brightness", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


# Probe for a real image codec at import. The container this engine is
# developed in has none (verified: PIL/soundfile/cv2 all absent), so
# decode_image stays a loud stub there — but the probe means dropping
# the package into an environment WITH pillow lights up real decode
# with zero code change.
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - the tested path here
    _PILImage = None
    HAS_PIL = False


def decode_image(data: bytes):
    """Decode image bytes to (width, height, mode, mean_luma).

    With pillow present, a real decode (any format PIL reads) +
    8x8-thumbnail mean luminance — a deterministic, cheap stand-in for
    the usual resize/feature step. Without it, NotImplementedError:
    the Spark-side plumbing (binary column → Arrow batch → per-batch
    Python) is identical either way, and extract_features' byte-level
    features keep the pipeline oracle-checkable in codec-less
    environments."""
    if not HAS_PIL:
        raise NotImplementedError(
            "media decoding needs pillow (not in this container); "
            "extract_features' byte-level features are the tested "
            "stand-in here"
        )
    import io as _io

    img = _PILImage.open(_io.BytesIO(data))
    img.load()
    luma = img.convert("L").resize((8, 8))
    pixels = list(luma.getdata())
    return (img.width, img.height, img.mode, sum(pixels) // len(pixels))


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.
    Deterministic byte-level 'features' (length, sha256, md5-derived
    brightness) stand in for decoded image stats; swap the lambda
    bodies for decode_image(...) results when media libs exist.

    The batch fn is a *closure* on purpose: cloudpickle ships nested
    functions by value, so executor Python workers never need this
    package importable (the external driver does not control their
    PYTHONPATH)."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf["data"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": data.map(len).astype("int64"),
                    "sha": data.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "brightness": data.map(
                        lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:2], 16)
                    ).astype("int32"),
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                }
            )

    flat = assets.select(
        "doc_id", "data", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)
