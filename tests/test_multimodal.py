"""Multimodal plumbing: blob stats, deterministic fake decode, feature
extraction, frame sampling ([EXT] — SURVEY §2 multimodal mandate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators import multimodal as MM
from write_optimized_vector_database_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", MM.blob_column("text").alias("blob")).cache()


def test_blob_stats(blobs):
    out = MM.blob_stats(blobs).collect()
    assert all(r.blob_size == len(bytes(r.blob)) for r in out)
    assert all(len(r.blob_md5) == 32 for r in out)


def test_decode_image_is_stubbed_without_codec(blobs):
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG1234")


def test_fake_decode_meta_deterministic(spark, blobs):
    a = {r.doc_id: r.meta for r in MM.with_decoded_meta(blobs).collect()}
    b = {r.doc_id: r.meta for r in MM.with_decoded_meta(blobs).collect()}
    assert a == b
    m = next(iter(a.values()))
    assert 64 <= m.width < 256 and 64 <= m.height < 256 and 1 <= m.n_channels <= 3


def test_byte_histogram_features_shape(blobs):
    feats = MM.byte_histogram_features(blobs).collect()
    assert all(len(r.features) == MM.FEATURE_DIM for r in feats)
    for r in feats[:10]:
        assert abs(sum(r.features) - 1.0) < 1e-5  # normalized histogram


def test_frame_sample_fanout(blobs):
    frames = MM.frame_sample(blobs, n_frames=4)
    counts = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in counts)
    assert frames.count() == blobs.count() * 4


def test_sniff_mime():
    assert MM.sniff_mime(b"\x89PNGxxxx") == "image/png"
    assert MM.sniff_mime(b"\xff\xd8\xffxx") == "image/jpeg"
    assert MM.sniff_mime(b"plain text") == "application/octet-stream"
    assert MM.sniff_mime(b"") == "application/octet-stream"


class TestPngCodec:
    """Real stdlib PNG codec: roundtrip plus every scanline filter."""

    def test_roundtrip_rgb(self):
        from write_optimized_vector_database_spark.operators.multimodal import (
            decode_image,
            decode_png,
            encode_png,
        )

        pixels = [
            [((x * 31 + y * 7) % 256, (x * 3) % 256, (y * 5) % 256) for x in range(9)]
            for y in range(5)
        ]
        blob = encode_png(pixels)
        assert blob.startswith(b"\x89PNG")
        w, h, nch, px = decode_png(blob)
        assert (w, h, nch) == (9, 5, 3)
        flat = bytes(c for row in pixels for p in row for c in p)
        assert px == flat
        # decode_image dispatches to the stdlib decoder without PIL
        assert decode_image(blob) == (9, 5, 3)

    def test_all_filter_types_unfiltered_correctly(self):
        """Hand-build IDAT streams using filters 1-4 (sub/up/average/
        Paeth) and check the decoder reconstructs the same image the
        filter-0 encoding represents."""
        import struct
        import zlib

        from write_optimized_vector_database_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        pixels = [
            [((x * 11 + y * 17) % 256, (x + y) % 256, (x * y) % 256) for x in range(6)]
            for y in range(4)
        ]
        ref = decode_png(encode_png(pixels))[3]
        w, h, nch = 6, 4, 3
        stride = w * nch
        rows = [ref[y * stride : (y + 1) * stride] for y in range(h)]

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        def filtered(ft, y):
            cur = rows[y]
            prev = rows[y - 1] if y else bytes(stride)
            out = bytearray()
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                pred = {1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ft]
                out.append((cur[x] - pred) & 0xFF)
            return bytes([ft]) + bytes(out)

        for ft in (1, 2, 3, 4):
            raw = b"".join(filtered(ft, y) for y in range(h))
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

            def chunk(tag, data):
                return (
                    struct.pack(">I", len(data))
                    + tag
                    + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
                )

            blob = (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )
            dw, dh, dn, px = decode_png(blob)
            assert (dw, dh, dn) == (w, h, nch)
            assert px == ref, f"filter {ft} mis-decoded"

    def test_grayscale_decode(self):
        import struct
        import zlib

        from write_optimized_vector_database_spark.operators.multimodal import decode_png

        w, h = 4, 3
        rows = [bytes((x * 40 + y * 9) % 256 for x in range(w)) for y in range(h)]
        raw = b"".join(b"\x00" + r for r in rows)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # grayscale

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        dw, dh, dn, px = decode_png(blob)
        assert (dw, dh, dn) == (w, h, 1)
        assert px == b"".join(rows)


class TestHeaderParsers:
    """parse_media_header: the dimensions-only codec seam (PNG/JPEG/GIF)."""

    def test_jpeg_marker_walk(self):
        from write_optimized_vector_database_spark.operators.multimodal import (
            encode_jpeg_stub,
            parse_media_header,
        )

        # SOF0 sits after APP0 and COM segments — the walk must skip by
        # length fields, not scan for 0xFFC0 (which can occur in payloads)
        assert parse_media_header(encode_jpeg_stub(641, 479, 3)) == (
            "image/jpeg", 641, 479, 3,
        )
        assert parse_media_header(encode_jpeg_stub(1, 1, 1)) == (
            "image/jpeg", 1, 1, 1,
        )

    def test_gif_little_endian_dims(self):
        from write_optimized_vector_database_spark.operators.multimodal import (
            encode_gif_stub,
            parse_media_header,
        )

        # 300 = 0x012C exercises both bytes of the LE u16
        assert parse_media_header(encode_gif_stub(300, 513)) == (
            "image/gif", 300, 513, 3,
        )

    def test_png_ihdr(self):
        from write_optimized_vector_database_spark.operators.multimodal import (
            encode_png,
            parse_media_header,
        )

        blob = encode_png([[(0, 0, 0)] * 7 for _ in range(2)])
        assert parse_media_header(blob) == ("image/png", 7, 2, 3)

    def test_unknown_and_truncated(self):
        from write_optimized_vector_database_spark.operators.multimodal import (
            parse_media_header,
        )

        assert parse_media_header(None)[0] == "application/octet-stream"
        assert parse_media_header(b"")[0] == "application/octet-stream"
        assert parse_media_header(b"plain text")[0] == "application/octet-stream"
        # JPEG magic but no SOF → jpeg with zero dims, no crash
        assert parse_media_header(b"\xff\xd8\xff\xe0") == ("image/jpeg", 0, 0, 0)


def test_graceful_decode_meta_without_pil(blobs):
    """VERDICT r04 #8: a JPEG/GIF blob in a codec-less container degrades
    to header metadata (via='header') instead of raising; PNG still
    decodes pixels; garbage is 'opaque'. Never raises."""
    png = MM.encode_png([[(1, 2, 3)] * 4] * 3)
    jpg = MM.encode_jpeg_stub(33, 21, 3)
    gif = MM.encode_gif_stub(7, 9)
    assert MM.decode_image_meta(png) == ("image/png", 4, 3, 3, "pixels")
    assert MM.decode_image_meta(jpg) == ("image/jpeg", 33, 21, 3, "header")
    assert MM.decode_image_meta(gif) == ("image/gif", 7, 9, 3, "header")
    assert MM.decode_image_meta(b"not an image")[4] == "opaque"
    assert MM.decode_image_meta(None) == ("unknown", 0, 0, 0, "opaque")
    # corrupt PNG body with valid magic: falls back, never raises
    fmt, w, h, c, via = MM.decode_image_meta(png[:20])
    assert via in ("header", "opaque")
    assert MM.decode_capability(jpg) == "header"


def test_gif_codec_round_trip():
    """Real GIF: palette + LZW encode, full LZW decode — pixel-exact,
    including the mid-stream CLEAR reset past 4095 codes."""
    px = [[((x % 8) * 30, (y % 8) * 30, ((x + y) % 4) * 60) for x in range(40)]
          for y in range(30)]
    w, h, nch, rgb = MM.decode_gif(MM.encode_gif(px))
    assert (w, h, nch) == (40, 30, 3)
    assert rgb == bytes(c for row in px for p in row for c in p)
    # 256-color max palette over 16384 px forces the 12-bit CLEAR reset
    big = [[(i, (i * 3) % 256, (i * 7) % 256) for i in range(256)] for _ in range(64)]
    assert MM.decode_gif(MM.encode_gif(big))[3] == bytes(
        c for row in big for p in row for c in p
    )


def test_gif_now_decodes_pixels_without_pil():
    px = [[(9, 8, 7)] * 5 for _ in range(4)]
    blob = MM.encode_gif(px)
    assert MM.decode_capability(blob) == "pixels"
    assert MM.decode_image(blob) == (5, 4, 3)
    assert MM.decode_image_meta(blob) == ("image/gif", 5, 4, 3, "pixels")
    # the header-only stub still degrades gracefully (no pixel data)
    stub = MM.encode_gif_stub(7, 9)
    assert MM.decode_image_meta(stub) == ("image/gif", 7, 9, 3, "header")
    # interlaced flag -> decoder raises -> meta falls back to header
    import struct
    inter = MM.encode_gif(px)
    idx = inter.index(b"\x2c")
    packed = inter[idx + 9]
    inter = inter[: idx + 9] + bytes([packed | 0x40]) + inter[idx + 10 :]
    assert MM.decode_image_meta(inter)[4] == "header"
