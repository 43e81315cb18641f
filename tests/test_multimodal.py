"""Golden-bytes tests for the REAL pure-stdlib image-header decoder (r9,
VERDICT r8 #7): hand-assembled PNG and BMP fixtures — every byte written
from the published format layouts, nothing copied from a binary — decoded
both directly and end-to-end through mm_decode_meta's exact mapInPandas
kernel, alongside a text payload proving the fake-decode fallback and the
dispatch's misroute protection.
"""

from __future__ import annotations

import struct
import zlib

import pandas as pd
import pytest

from data_ingestion_ex8_producer_spark.operators.multimodal import (
    _DECODE_SCHEMA,
    _decode_batches,
    _fake_decode,
    decode_image_real,
    decode_meta,
)


def make_png(width: int, height: int, bit_depth: int = 8) -> bytes:
    """Minimal valid PNG prefix: 8-byte signature + IHDR chunk (length,
    type, 13-byte payload, CRC32 over type+payload per the spec)."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def make_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    """BMP file header (14 bytes, reserved zeroed) + BITMAPINFOHEADER
    (40 bytes); height < 0 encodes top-down row order."""
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, 0, 2835, 2835, 0, 0
    )
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40, 0, 0, 14 + 40)
    return file_header + dib


def make_core_bmp(width: int, height: int, bpp: int = 8) -> bytes:
    """The ancient BITMAPCOREHEADER variant (12-byte DIB, u16 dims)."""
    dib = struct.pack("<IHHHH", 12, width, height, 1, bpp)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 12, 0, 0, 14 + 12)
    return file_header + dib


def test_png_header_decodes_real_dimensions() -> None:
    assert decode_image_real(make_png(640, 360, 8)) == (640, 360, 8)
    assert decode_image_real(make_png(1, 1, 16)) == (1, 1, 16)
    assert decode_image_real(make_png(65535, 4096, 1)) == (65535, 4096, 1)


def test_bmp_header_decodes_real_dimensions() -> None:
    assert decode_image_real(make_bmp(123, 45, 24)) == (123, 45, 24)
    # Negative height = top-down row order; dimensions are magnitudes.
    assert decode_image_real(make_bmp(1920, -1080, 32)) == (1920, 1080, 32)
    assert decode_image_real(make_core_bmp(320, 200, 8)) == (320, 200, 8)


def test_unknown_format_raises_not_silently_fakes() -> None:
    with pytest.raises(NotImplementedError):
        decode_image_real(b"GIF89a" + b"\x00" * 32)
    with pytest.raises(ValueError):
        # BMP magic but an unsupported DIB size.
        bad = struct.pack("<2sIHHI", b"BM", 14 + 16, 0, 0, 30) + struct.pack(
            "<I", 16
        ) + b"\x00" * 12
        decode_image_real(bad)


def test_dispatch_real_vs_fake_and_misroute_protection() -> None:
    png = make_png(800, 600)
    assert decode_meta(png) == (800, 600, 1)
    # Text payloads take the md5 fake path the SQL oracle mirrors.
    text = "BACEN reclamacoes ranking".encode()
    assert decode_meta(text) == _fake_decode(text)
    # A document whose TEXT starts with "BM" must not be misrouted: BMP's
    # reserved bytes 6..10 are zero in any real file, and text has no NULs.
    trap = b"BMW sales rose 4% in the quarter, the report said........"
    assert decode_meta(trap) == _fake_decode(trap)


def test_corrupt_image_payloads_degrade_not_crash() -> None:
    """ADVICE r9: a payload that passes the magic sniff but is structurally
    corrupt must DEGRADE to the deterministic fake row inside decode_meta —
    never raise out of the scored mapInPandas kernel (one corrupt image on
    a real corpus must not kill the job)."""
    # Truncated PNG: signature only, no room for an IHDR chunk.
    trunc = b"\x89PNG\r\n\x1a\n" + b"\x00" * 4
    assert decode_meta(trunc) == _fake_decode(trunc)
    # PNG-signed but the first chunk is not IHDR (spec violation).
    bad_chunk = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"teXt" + b"\x00" * 17
    assert decode_meta(bad_chunk) == _fake_decode(bad_chunk)
    # BMP with zeroed reserved bytes but an unsupported DIB header size:
    # passes the sniff, raises in decode_image_real, must still degrade.
    odd_dib = (
        struct.pack("<2sIHHI", b"BM", 14 + 16, 0, 0, 30)
        + struct.pack("<I", 16)
        + b"\x00" * 12
    )
    assert decode_meta(odd_dib) == _fake_decode(odd_dib)
    # Truncated BMP: magic + zero reserved but shorter than any DIB header.
    trunc_bmp = struct.pack("<2sIHHI", b"BM", 26, 0, 0, 26) + b"\x00" * 2
    assert decode_meta(trunc_bmp) == _fake_decode(trunc_bmp)
    # Well-formed fixtures still take the REAL path after the guards.
    assert decode_meta(make_png(800, 600)) == (800, 600, 1)
    assert decode_meta(make_core_bmp(320, 200, 8)) == (320, 200, 1)


def test_mm_decode_meta_kernel_decodes_real_fixture_bytes(spark) -> None:
    """Real PNG/BMP bytes through the scored operator's exact mapInPandas
    kernel (same function object mm_decode_meta passes to mapInPandas),
    mixed with a text payload in one Arrow batch."""
    png = make_png(640, 360)
    bmp = make_bmp(123, 45)
    text = "plain text payload".encode()
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)), (3, bytearray(text))],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in df.mapInPandas(_decode_batches, _DECODE_SCHEMA).collect()
    }
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_frames"]) == (
        640, 360, 1,
    )
    assert rows[1]["n_bytes"] == len(png)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["n_frames"]) == (
        123, 45, 1,
    )
    fw, fh, fn = _fake_decode(text)
    assert (rows[3]["width"], rows[3]["height"], rows[3]["n_frames"]) == (
        fw, fh, fn,
    )


def test_decode_batches_is_what_the_operator_ships() -> None:
    """Pin the wiring: a one-batch pandas run of the kernel matches
    decode_meta row-for-row (no drift between kernel and dispatcher)."""
    payloads = [make_png(32, 16), make_bmp(7, 9), b"abc"]
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "payload": payloads})
    out = pd.concat(_decode_batches(iter([pdf])))
    for i, p in enumerate(payloads):
        w, h, n = decode_meta(p)
        assert (
            out.iloc[i]["width"], out.iloc[i]["height"], out.iloc[i]["n_frames"]
        ) == (w, h, n)


def test_png_bmp_header_roundtrip_property() -> None:
    """Property: any (width, height, depth) in the formats' legal ranges
    survives the assemble -> decode round trip exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=2**31 - 1),
        h=st.integers(min_value=1, max_value=2**31 - 1),
        depth=st.sampled_from([1, 2, 4, 8, 16]),
    )
    def png_case(w: int, h: int, depth: int) -> None:
        assert decode_image_real(make_png(w, h, depth)) == (w, h, depth)

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=2**31 - 1),
        h=st.integers(min_value=-(2**31), max_value=2**31 - 1).filter(
            lambda v: v != 0 and v != -(2**31)
        ),
        bpp=st.sampled_from([1, 4, 8, 16, 24, 32]),
    )
    def bmp_case(w: int, h: int, bpp: int) -> None:
        assert decode_image_real(make_bmp(w, h, bpp)) == (w, abs(h), bpp)

    png_case()
    bmp_case()


def make_jpeg(
    width: int, height: int, precision: int = 8, sof: int = 0xC0
) -> bytes:
    """Minimal JPEG header per ITU-T T.81: SOI, a JFIF APP0 segment, a
    COM segment (exercising the marker walk), then a SOFn frame header
    (precision u8, height u16, width u16, 3 components x 3 bytes)."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    comment = b"synthetic fixture"
    sof_payload = struct.pack(">BHHB", precision, height, width, 3)
    sof_payload += bytes((1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xfe" + struct.pack(">H", 2 + len(comment)) + comment
        + bytes((0xFF, sof)) + struct.pack(">H", 2 + len(sof_payload))
        + sof_payload
    )


def test_jpeg_sof_decodes_real_dimensions() -> None:
    # Baseline (SOF0) and progressive (SOF2) both carry the same layout.
    assert decode_image_real(make_jpeg(1024, 768, 8, sof=0xC0)) == (1024, 768, 8)
    assert decode_image_real(make_jpeg(320, 240, 12, sof=0xC2)) == (320, 240, 12)
    # A restart-marker fill before the SOF must not desynchronize the walk.
    j = make_jpeg(64, 48)
    with_rst = j[:2] + b"\xff\x01" + j[2:]
    assert decode_image_real(with_rst) == (64, 48, 8)


def test_jpeg_corruption_degrades_not_crashes() -> None:
    # SOS before any SOF: dimensions unobtainable -> fake row, not a crash.
    no_sof = b"\xff\xd8\xff\xda\x00\x04\x00\x00"
    assert decode_meta(no_sof) == _fake_decode(no_sof)
    # Truncated mid-segment.
    trunc = make_jpeg(1024, 768)[:12]
    assert decode_meta(trunc) == _fake_decode(trunc)
    # Desynchronized marker stream (garbage where a marker must be).
    desync = b"\xff\xd8" + b"not a marker chain" + b"\x00" * 8
    assert decode_meta(desync) == _fake_decode(desync)
    # The sniff itself: SOI magic but no following marker byte -> fake
    # path without even attempting the real decoder.
    bare = b"\xff\xd8" + b"\x00\x00\x00\x00"
    assert decode_meta(bare) == _fake_decode(bare)
    # And a healthy JPEG still takes the real path end-to-end.
    assert decode_meta(make_jpeg(1920, 1080)) == (1920, 1080, 1)


def test_jpeg_header_roundtrip_property() -> None:
    """Property: any legal (width, height, precision, SOF variant, filler
    segment sizes) survives the assemble -> decode round trip exactly —
    including arbitrary APPn padding before the SOF, so the marker walk
    is exercised at every segment-length boundary."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=65535),
        h=st.integers(min_value=1, max_value=65535),
        precision=st.sampled_from([8, 12, 16]),
        sof=st.sampled_from([0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC9]),
        pad=st.integers(min_value=0, max_value=300),
    )
    def jpeg_case(w: int, h: int, precision: int, sof: int, pad: int) -> None:
        base = make_jpeg(w, h, precision, sof=sof)
        # Splice an APP1 segment of arbitrary length right after SOI.
        app1 = b"\xff\xe1" + struct.pack(">H", 2 + pad) + b"x" * pad
        payload = base[:2] + app1 + base[2:]
        assert decode_image_real(payload) == (w, h, precision)
        assert decode_meta(payload) == (w, h, 1)

    jpeg_case()
