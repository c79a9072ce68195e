"""L5 media decode: the pure-Python PPM/BMP paths must really execute
in this (codec-less) container — locally and through the Spark
mapInPandas plumbing — with exact, hand-computable pixel stats."""

from __future__ import annotations

import struct

import pytest

from flirt_consume_spark.operators.multimodal import (
    HAS_PIL,
    decode_assets,
    decode_bmp,
    decode_image,
    decode_ppm,
)

# 2x2 test image, row-major RGB: red, green, blue, white.
_PIXELS = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
# Per-pixel floored BT.601 luma: 76 + 149 + 29 + 255 = 509; mean 127.
_EXPECT_LUMA = 127


def make_ppm(w: int, h: int, pixels, comment: bool = False) -> bytes:
    hdr = b"P6\n"
    if comment:
        hdr += b"# test comment\n"
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + b"".join(bytes(p) for p in pixels)


def make_bmp(w: int, h: int, pixels, top_down: bool = False) -> bytes:
    stride = (3 * w + 3) & ~3
    pix_off = 14 + 40
    rows = []
    order = range(h) if top_down else reversed(range(h))
    for y in order:
        row = b"".join(
            bytes((b, g, r)) for (r, g, b) in pixels[y * w : (y + 1) * w]
        )
        rows.append(row + b"\x00" * (stride - 3 * w))
    raster = b"".join(rows)
    file_hdr = struct.pack("<2sIHHI", b"BM", pix_off + len(raster), 0, 0, pix_off)
    h_signed = -h if top_down else h
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h_signed, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + raster


def test_ppm_decode_exact():
    w, h, mode, luma = decode_ppm(make_ppm(2, 2, _PIXELS))
    assert (w, h, mode, luma) == (2, 2, "RGB", _EXPECT_LUMA)


def test_ppm_decode_with_comment():
    assert decode_ppm(make_ppm(2, 2, _PIXELS, comment=True))[3] == _EXPECT_LUMA


def test_bmp_decode_exact_bottom_up_and_top_down():
    assert decode_bmp(make_bmp(2, 2, _PIXELS)) == (2, 2, "RGB", _EXPECT_LUMA)
    assert decode_bmp(make_bmp(2, 2, _PIXELS, top_down=True)) == (
        2, 2, "RGB", _EXPECT_LUMA,
    )


def test_bmp_row_padding():
    # Odd width forces per-row padding (stride 12 for 3*3=9 bytes).
    pixels = [(10, 20, 30)] * 3
    w, h, mode, luma = decode_bmp(make_bmp(3, 1, pixels))
    assert (w, h) == (3, 1)
    assert luma == (299 * 10 + 587 * 20 + 114 * 30) // 1000


def test_truncated_inputs_raise_value_error():
    with pytest.raises(ValueError):
        decode_ppm(make_ppm(2, 2, _PIXELS)[:-1])
    with pytest.raises(ValueError):
        # Cut past the 2 padding bytes into real pixel data (stride 8,
        # row bytes 6): a 1-byte truncation is absorbed by padding.
        decode_bmp(make_bmp(2, 2, _PIXELS)[:-4])


@pytest.mark.skipif(HAS_PIL, reason="with pillow the PIL path decodes PNG")
def test_unknown_format_still_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_decode_image_dispatches_pure_paths():
    """decode_image must execute (not stub out) on PPM and BMP bytes
    regardless of whether pillow is installed."""
    if HAS_PIL:
        # PIL reads both formats; sizes must match, luma is PIL's
        # 8x8-thumbnail variant so only bounded.
        for data in (make_ppm(2, 2, _PIXELS), make_bmp(2, 2, _PIXELS)):
            w, h, _mode, luma = decode_image(data)
            assert (w, h) == (2, 2) and 0 <= luma <= 255
    else:
        assert decode_image(make_ppm(2, 2, _PIXELS))[3] == _EXPECT_LUMA
        assert decode_image(make_bmp(2, 2, _PIXELS))[3] == _EXPECT_LUMA


def test_decode_assets_through_spark(spark):
    """The real decode runs inside Arrow-batched mapInPandas: mixed
    PPM/BMP binary rows come back with exact dimensions and (on the
    pure path) exact luma."""
    rows = [
        (1, bytearray(make_ppm(2, 2, _PIXELS))),
        (2, bytearray(make_bmp(2, 2, _PIXELS))),
        (3, bytearray(make_bmp(3, 1, [(10, 20, 30)] * 3))),
    ]
    assets = spark.createDataFrame(rows, "doc_id long, data binary")
    got = {r.doc_id: r for r in decode_assets(assets).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1].width, got[1].height) == (2, 2)
    assert (got[2].width, got[2].height) == (2, 2)
    assert (got[3].width, got[3].height) == (3, 1)
    if not HAS_PIL:
        assert got[1].mean_luma == _EXPECT_LUMA
        assert got[2].mean_luma == _EXPECT_LUMA


# --- PNG (VERDICT r10 task 4: stdlib-zlib decode) -------------------------


def make_png(
    w: int,
    h: int,
    pixels,
    color_type: int = 2,
    filters=None,
) -> bytes:
    """Spec-faithful PNG encoder for tests: applies the REQUESTED
    filter type per row (so decode exercises every unfilter branch),
    deflates with stdlib zlib, emits IHDR/IDAT/IEND with real CRCs."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = w * channels
    filters = filters or [0] * h
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = bytes(
            byte for px in pixels[y * w : (y + 1) * w] for byte in px
        )
        ft = filters[y]
        out = bytearray(line)
        if ft == 1:  # Sub
            for i in range(stride - 1, channels - 1, -1):
                out[i] = (out[i] - line[i - channels]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                out[i] = (out[i] - prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                out[i] = (out[i] - (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out[i] = (out[i] - pred) & 0xFF
        raw.append(ft)
        raw += out
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_exact_all_filters():
    from flirt_consume_spark.operators.multimodal import decode_png

    # Filter type 0 baseline:
    assert decode_png(make_png(2, 2, _PIXELS)) == (2, 2, "RGB", _EXPECT_LUMA)
    # A 5-row image exercising every filter type (0..4) — pixel data
    # varied so each predictor actually predicts something nonzero.
    px = [(r * 37 % 256, (r * 59 + 11) % 256, (r * 83 + 7) % 256)
          for r in range(10)]
    data = make_png(2, 5, px, filters=[0, 1, 2, 3, 4])
    w, h, mode, luma = decode_png(data)
    expect = sum(
        (299 * r + 587 * g + 114 * b) // 1000 for r, g, b in px
    ) // 10
    assert (w, h, mode, luma) == (2, 5, "RGB", expect)


def test_png_rgba_grey_and_la_modes():
    from flirt_consume_spark.operators.multimodal import decode_png

    rgba = [(255, 0, 0, 10), (0, 255, 0, 20), (0, 0, 255, 30),
            (255, 255, 255, 40)]
    assert decode_png(
        make_png(2, 2, rgba, color_type=6, filters=[1, 4])
    ) == (2, 2, "RGBA", _EXPECT_LUMA)  # alpha ignored for luma
    grey = [(10,), (20,), (30,), (40,)]
    assert decode_png(make_png(2, 2, grey, color_type=0)) == (2, 2, "L", 25)
    la = [(10, 1), (20, 2), (30, 3), (40, 4)]
    assert decode_png(
        make_png(2, 2, la, color_type=4, filters=[2, 3])
    ) == (2, 2, "LA", 25)


def test_png_rejects_unsupported_and_truncated():
    from flirt_consume_spark.operators.multimodal import decode_png

    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n")  # no IHDR
    good = make_png(2, 2, _PIXELS)
    # Corrupt the bit depth to 16 in IHDR (offset 8+8+8 = byte 24).
    bad = bytearray(good)
    bad[24] = 16
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # Truncated raster: drop the last row from the inflate stream.
    import struct as _s
    import zlib as _z

    raw = bytearray()
    raw.append(0)
    raw += bytes(b for p in _PIXELS[:2] for b in p)  # one row only
    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", _z.crc32(ctype + data)))

    short = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", _z.compress(bytes(raw))) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(short)


def test_png_corrupt_idat_and_truncated_ihdr_raise_valueerror():
    """ADVICE r11: corrupt IDAT used to escape as zlib.error and a
    truncated IHDR chunk as struct.error — both outside the decode()
    'except ValueError' fallthrough, crashing mapInPandas with an
    opaque error. Both must surface as ValueError so decode() falls
    through to the documented loud stub."""
    import struct as _s
    import zlib as _z

    from flirt_consume_spark.operators.multimodal import decode_png

    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", _z.crc32(ctype + data)))

    # Corrupt IDAT: valid IHDR, garbage (non-deflate) IDAT bytes.
    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    corrupt = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", b"\xff\xfe\xfd\xfc not deflate")
               + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        decode_png(corrupt)

    # Truncated IHDR: chunk shorter than the 13-byte IHDR layout.
    trunc = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr[:5])
             + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated PNG IHDR"):
        decode_png(trunc)


def test_png_through_spark_mapinpandas(spark):
    """Done-bar for VERDICT r10 task 4: a synthesized PNG decodes
    bit-exactly on the mapInPandas path (exact luma asserted on the
    pure path; with pillow present sizes still must match)."""
    rows = [
        (1, bytearray(make_png(2, 2, _PIXELS, filters=[1, 2]))),
        (2, bytearray(make_ppm(2, 2, _PIXELS))),
    ]
    assets = spark.createDataFrame(rows, "doc_id long, data binary")
    got = {r.doc_id: r for r in decode_assets(assets).collect()}
    assert (got[1].width, got[1].height) == (2, 2)
    assert (got[2].width, got[2].height) == (2, 2)
    if not HAS_PIL:
        assert got[1].mode == "RGB"
        assert got[1].mean_luma == _EXPECT_LUMA
        assert got[2].mean_luma == _EXPECT_LUMA
