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


def _build_decoder():
    """Factory returning (decode_image, decode_ppm, decode_bmp).

    Everything is defined INSIDE this function so the returned
    callables have factory-local qualnames: cloudpickle then ships
    them by VALUE to executor Python workers (a plain module-level
    function pickles by reference and the external driver's executors
    cannot import this package — the closure rule every pandas-UDF
    path in this repo follows)."""

    def mean_luma(rgb_rows, width, height):
        # Integer mean of BT.601 luma (floored per pixel) over every
        # pixel — deterministic across platforms, no float-order issues.
        total = 0
        for row in rgb_rows:
            for x in range(width):
                r, g, b = row[3 * x], row[3 * x + 1], row[3 * x + 2]
                total += (299 * r + 587 * g + 114 * b) // 1000
        return total // (width * height)

    def decode_ppm(data: bytes):
        # P6 (binary) PPM: ASCII header (with #-comment support:
        # magic + width/height/maxval ints), one whitespace byte,
        # packed RGB raster. Returns (w, h, 'RGB', luma).
        if not data.startswith(b"P6"):
            raise ValueError("not a P6 PPM")
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while pos < len(data) and data[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"P6 maxval {maxval} unsupported (only 8-bit)")
        raster = data[pos : pos + 3 * w * h]
        if len(raster) < 3 * w * h:
            raise ValueError("truncated PPM raster")
        rows = [raster[3 * w * y : 3 * w * (y + 1)] for y in range(h)]
        return (w, h, "RGB", mean_luma(rows, w, h))

    def decode_bmp(data: bytes):
        # Uncompressed 24-bit BMP (Windows DIB layout: 14-byte file
        # header, BITMAPINFOHEADER, BGR rows padded to 4 bytes,
        # bottom-up unless height is negative). (w, h, 'RGB', luma).
        import struct

        if not data.startswith(b"BM"):
            raise ValueError("not a BMP")
        (pix_off,) = struct.unpack_from("<I", data, 10)
        hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
        if hdr_size < 40:
            raise ValueError(f"BMP header size {hdr_size} unsupported")
        _planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
        if bpp != 24 or compression != 0:
            raise ValueError(
                f"only 24bpp uncompressed BMP (got {bpp}/{compression})"
            )
        h = abs(h_signed)
        stride = (3 * w + 3) & ~3  # rows padded to 4-byte boundary
        rows = []
        for y in range(h):
            src_y = (h - 1 - y) if h_signed > 0 else y
            off = pix_off + src_y * stride
            bgr = data[off : off + 3 * w]
            if len(bgr) < 3 * w:
                raise ValueError("truncated BMP raster")
            rgb = bytearray(3 * w)
            rgb[0::3] = bgr[2::3]
            rgb[1::3] = bgr[1::3]
            rgb[2::3] = bgr[0::3]
            rows.append(bytes(rgb))
        return (w, h, "RGB", mean_luma(rows, w, h))

    def decode_png(data: bytes):
        # Non-interlaced 8-bit PNG via stdlib zlib: IHDR/IDAT walk,
        # inflate, per-row unfilter (None/Sub/Up/Average/Paeth per the
        # PNG spec §9), then exact integer luma. Greyscale (0), RGB
        # (2), grey+alpha (4) and RGBA (6) — the common corpus
        # formats; palette/16-bit/interlaced raise ValueError so the
        # chain falls through to the loud stub.
        import struct
        import zlib

        if not data.startswith(b"\x89PNG\r\n\x1a\n"):
            raise ValueError("not a PNG")
        pos = 8
        w = h = bit_depth = color_type = interlace = None
        idat = bytearray()
        while pos + 8 <= len(data):
            length, ctype = struct.unpack_from(">I4s", data, pos)
            chunk = data[pos + 8 : pos + 8 + length]
            if ctype == b"IHDR":
                try:
                    (w, h, bit_depth, color_type, _comp, _filt, interlace) = (
                        struct.unpack(">IIBBBBB", chunk)
                    )
                except struct.error as exc:
                    # A truncated IHDR must stay inside the decode()
                    # ValueError contract, not escape as struct.error.
                    raise ValueError(f"truncated PNG IHDR: {exc}") from exc
            elif ctype == b"IDAT":
                idat += chunk
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + CRC
        if w is None:
            raise ValueError("PNG missing IHDR")
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
        if bit_depth != 8 or channels is None or interlace != 0:
            raise ValueError(
                f"PNG depth={bit_depth}/color={color_type}/"
                f"interlace={interlace} unsupported (8-bit "
                "grey/RGB/LA/RGBA, non-interlaced only)"
            )
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error as exc:
            # Corrupt IDAT must stay inside the decode() ValueError
            # contract so decode() falls through to the loud stub.
            raise ValueError(f"corrupt PNG IDAT: {exc}") from exc
        stride = w * channels
        if len(raw) < h * (stride + 1):
            raise ValueError("truncated PNG raster")
        prev = bytearray(stride)
        rows = []
        rpos = 0
        for _y in range(h):
            ft = raw[rpos]
            line = bytearray(raw[rpos + 1 : rpos + 1 + stride])
            rpos += 1 + stride
            if ft == 1:  # Sub
                for i in range(channels, stride):
                    line[i] = (line[i] + line[i - channels]) & 0xFF
            elif ft == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ft == 3:  # Average
                for i in range(stride):
                    a = line[i - channels] if i >= channels else 0
                    line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(stride):
                    a = line[i - channels] if i >= channels else 0
                    b = prev[i]
                    c = prev[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a
                        if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                    line[i] = (line[i] + pred) & 0xFF
            elif ft != 0:
                raise ValueError(f"bad PNG filter type {ft}")
            rows.append(bytes(line))
            prev = line
        if color_type == 2:
            return (w, h, "RGB", mean_luma(rows, w, h))
        if color_type == 6:  # strip alpha for luma
            rgb = [
                bytes(
                    byte
                    for x in range(w)
                    for byte in r[4 * x : 4 * x + 3]
                )
                for r in rows
            ]
            return (w, h, "RGBA", mean_luma(rgb, w, h))
        if color_type == 0:
            return (w, h, "L", sum(sum(r) for r in rows) // (w * h))
        total = sum(r[2 * x] for r in rows for x in range(w))
        return (w, h, "LA", total // (w * h))

    def decode(data: bytes, _pil=_PILImage, _has_pil=HAS_PIL):
        # With pillow: real decode of any PIL-readable format +
        # 8x8-thumbnail mean luminance. Without it: pure-Python decode
        # of the two struct-parseable formats (P6 PPM, 24-bit BMP)
        # with exact integer luma — decode genuinely executes even in
        # codec-less containers; only exotic formats raise
        # NotImplementedError there.
        if _has_pil:
            import io as _io

            img = _pil.open(_io.BytesIO(data))
            img.load()
            luma = img.convert("L").resize((8, 8))
            pixels = list(luma.getdata())
            return (img.width, img.height, img.mode, sum(pixels) // len(pixels))
        for pure in (decode_png, decode_ppm, decode_bmp):
            try:
                return pure(data)
            except ValueError:
                continue
        raise NotImplementedError(
            "media decoding for this format needs pillow (not in this "
            "container); pure-Python PNG (8-bit, non-interlaced) / P6 "
            "PPM / 24-bit BMP decode and extract_features' byte-level "
            "features are the tested paths here"
        )

    return decode, decode_png, decode_ppm, decode_bmp


#: decode_image(data) -> (width, height, mode, mean_luma); the pure
#: single-format decoders are exposed for direct unit testing.
decode_image, decode_png, decode_ppm, decode_bmp = _build_decoder()


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("mean_luma", IntegerType()),
    ]
)


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode over the binary column: each batch's
    bytes go through ``decode_image`` (PIL when present, pure-Python
    PPM/BMP otherwise) and come back as typed image stats. Same batch
    shape and closure-shipping rules as ``extract_features``; this is
    the path a resize/feature-extract stage would extend."""

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads decode to NULL stats (nullable Int32 —
            # NULL-in-NULL-out, same convention as extract_features).
            decoded = [
                decode_image(bytes(b))
                if b is not None
                else (None, None, None, None)
                for b in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series(
                        [d[0] for d in decoded], dtype="Int32"
                    ),
                    "height": pd.Series(
                        [d[1] for d in decoded], dtype="Int32"
                    ),
                    "mode": [d[2] for d in decoded],
                    "mean_luma": pd.Series(
                        [d[3] for d in decoded], dtype="Int32"
                    ),
                }
            )

    return assets.select("doc_id", "data").mapInPandas(
        decode_batches, schema=DECODE_SCHEMA
    )


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
            # NULL payloads (a doc whose content column was NULLed
            # upstream) yield NULL features — NULL-in-NULL-out like
            # every SQL expression, via pandas nullable dtypes (plain
            # int64 astype would crash on None; the oracle's
            # sha256(NULL)/length(NULL) are NULL too).
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": data.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "sha": data.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "brightness": data.map(
                        lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:2], 16)
                        if b is not None
                        else None
                    ).astype("Int32"),
                    "width": pdf["width"].astype("Int32"),
                    "height": pdf["height"].astype("Int32"),
                }
            )

    flat = assets.select(
        "doc_id", "data", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)
