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

def test_gif_interlaced_deinterlace_pixel_exact():
    """VERDICT r05 #8: 4-pass interlaced GIFs now decode (rows written
    in 0,8../4,12../2,6../1,3.. order, un-shuffled on read) — checked
    with a row-varying image so a wrong pass order can't hide."""
    px = [[((y * 17) % 256, (x * 11) % 256, (x + y) % 256) for x in range(11)]
          for y in range(13)]
    blob = MM.encode_gif(px, interlace=True)
    w, h, nch, rgb = MM.decode_gif(blob)
    assert (w, h, nch) == (11, 13, 3)
    assert rgb == bytes(c for row in px for p in row for c in p)
    assert MM.decode_capability(blob) == "pixels"
    assert MM.decode_image_meta(blob)[4] == "pixels"


class TestJpegCodec:
    """Baseline JPEG (SOF0) round-trips, stdlib+numpy only (r05 #5)."""

    def test_flat_grayscale_pixel_exact(self):
        import numpy as np

        blob = MM.encode_jpeg([[77] * 16 for _ in range(16)])
        w, h, nch, raw = MM.decode_jpeg(blob)
        assert (w, h, nch) == (16, 16, 1)
        assert (np.frombuffer(raw, np.uint8) == 77).all()

    def test_checker_ac_coefficients_pixel_exact(self):
        """DC + F(4,4) content: with quant=1 the coefficients quantize
        losslessly, so the decode is bit-exact THROUGH the AC path —
        ZRL runs, amplitude extend, EOB — not just flat DC."""
        import numpy as np

        s = [1, -1, -1, 1, 1, -1, -1, 1]
        px = [[100 + 5 * s[x % 8] * s[y % 8] for x in range(16)]
              for y in range(16)]
        w, h, nch, raw = MM.decode_jpeg(MM.encode_jpeg(px))
        assert (np.frombuffer(raw, np.uint8).reshape(16, 16)
                == np.array(px, np.uint8)).all()

    def test_non_multiple_of_8_dims(self):
        import numpy as np

        w, h, nch, raw = MM.decode_jpeg(MM.encode_jpeg([[33] * 13] * 11))
        assert (w, h) == (13, 11)
        assert (np.frombuffer(raw, np.uint8) == 33).all()

    def test_rgb_444_close(self):
        import numpy as np

        px = [[(x * 3 % 200 + 20, y * 5 % 200 + 20, (x + y) * 2 % 200 + 20)
               for x in range(16)] for y in range(16)]
        w, h, nch, raw = MM.decode_jpeg(MM.encode_jpeg(px))
        assert nch == 3
        got = np.frombuffer(raw, np.uint8).reshape(16, 16, 3).astype(int)
        assert np.abs(got - np.array(px, int)).max() <= 2  # color rounding only

    def test_rgb_420_subsampled_close(self):
        import numpy as np

        px = [[(100, 80 + y, 90 + x) for x in range(16)] for y in range(16)]
        w, h, nch, raw = MM.decode_jpeg(MM.encode_jpeg(px, subsample=2))
        got = np.frombuffer(raw, np.uint8).reshape(16, 16, 3).astype(int)
        assert np.abs(got - np.array(px, int)).max() <= 4  # 2x2 chroma mean

    def test_real_quant_table_lossy_but_close(self):
        import numpy as np

        px = [[(x * 7 + y * 3) % 256 for x in range(24)] for y in range(17)]
        w, h, nch, raw = MM.decode_jpeg(MM.encode_jpeg(px, quant=[16] * 64))
        got = np.frombuffer(raw, np.uint8).reshape(17, 24).astype(int)
        assert np.abs(got - np.array(px, int)).max() < 40

    def test_capability_lattice(self):
        full = MM.encode_jpeg([[50] * 8 for _ in range(8)])
        assert MM.decode_capability(full) == "pixels"
        assert MM.decode_image_meta(full) == ("image/jpeg", 8, 8, 1, "pixels")
        # a scan-less header stub stays 'header' (the capability probe
        # requires SOF0 AND an SOS — ADVICE r05 #3's per-format probe)
        stub = MM.encode_jpeg_stub(20, 10, 3)
        assert MM.decode_capability(stub) == "header"
        # real progressive (SOF2) is decodable as of r07
        prog = MM.encode_jpeg_progressive([[50] * 8 for _ in range(8)])
        assert MM.decode_capability(prog) == "pixels"
        assert MM.decode_image_meta(prog) == ("image/jpeg", 8, 8, 1, "pixels")
        # arithmetic SEQUENTIAL (SOF9) is a real decode path as of
        # round 10 (Annexes D+F QM coder)
        arith = MM.encode_jpeg_arith([[50] * 8 for _ in range(8)])
        assert MM.decode_capability(arith) == "pixels"
        assert MM.decode_image_meta(arith) == ("image/jpeg", 8, 8, 1, "pixels")
        # arithmetic PROGRESSIVE (SOF10) decodes too (Annex G.2)
        parith = MM.encode_jpeg_progressive_arith([[50] * 8 for _ in range(8)])
        assert MM.decode_capability(parith) == "pixels"
        assert MM.decode_image_meta(parith) == ("image/jpeg", 8, 8, 1, "pixels")
        # differential-arithmetic / exotic SOF markers still degrade
        exotic = full.replace(b"\xff\xc0", b"\xff\xce", 1)
        assert MM.decode_capability(exotic) == "header"
        assert MM.decode_image_meta(exotic)[4] == "header"

    def test_12bit_extended_sequential_roundtrip(self):
        """SOF1 12-bit (T.81 extended sequential) is a REAL decode path
        as of round 9 (VERDICT r08 missing #2): precision-12 SOF1 with
        widened DHT tables (DC sizes to 15, AC to 14), 2048 level shift,
        uint16-LE output. Flat blocks and the F(4,4) checker round-trip
        pixel-exactly at 12-bit amplitudes — the same oracle property
        the 8-bit codec pins — and the AC path exercises size categories
        (9-10 bits here) the 8-bit tables also have, plus DC diffs only
        a 12-bit range can produce."""
        import numpy as np

        # flat gray blocks spanning the 12-bit range (DC diffs up to
        # ±3584·8 between blocks — sizes the 8-bit DC table can't hold)
        pix = [[(r // 8) * 3584 + 256 for _ in range(16)] for r in range(16)]
        blob = MM.encode_jpeg(pix, precision=12)
        sof, has_sos, prec = MM._jpeg_scan_markers(blob)
        assert (sof, has_sos, prec) == (0xC1, True, 12)
        assert MM.decode_capability(blob) == "pixels"
        w, h, nch, raw = MM.decode_jpeg(blob)
        assert (w, h, nch) == (16, 16, 1)
        got = np.frombuffer(raw, dtype="<u2").reshape(16, 16)
        assert got.tolist() == pix
        # DC + F(4,4) checker at 12-bit amplitude: bit-exact through the
        # AC path (runs, amplitude extend, EOB)
        s = [1, -1, -1, 1, 1, -1, -1, 1]
        px = [[2048 + 300 * s[x % 8] * s[y % 8] for x in range(16)]
              for y in range(16)]
        w2, h2, _n, raw2 = MM.decode_jpeg(MM.encode_jpeg(px, precision=12))
        got2 = np.frombuffer(raw2, dtype="<u2").reshape(16, 16)
        assert got2.tolist() == px
        # RGB 4:4:4 at 12-bit: YCbCr centered at 2048, color rounding only
        rgb = [[(x * 48 % 3200 + 320, y * 80 % 3200 + 320,
                 (x + y) * 32 % 3200 + 320) for x in range(16)]
               for y in range(16)]
        w3, h3, n3, raw3 = MM.decode_jpeg(MM.encode_jpeg(rgb, precision=12))
        assert n3 == 3
        got3 = np.frombuffer(raw3, dtype="<u2").reshape(16, 16, 3).astype(int)
        assert np.abs(got3 - np.array(rgb, int)).max() <= 2

    def test_unknown_precision_degrades(self):
        """Precisions outside {8, 12} (nothing in T.81 sequential) must
        still refuse rather than mis-shift, and capability must not
        claim 'pixels' (precision gate, ADVICE r06 — now two-valued)."""
        import pytest

        full = MM.encode_jpeg([[50] * 8 for _ in range(8)])
        i = full.index(b"\xff\xc0")
        weird = (
            full[:i] + b"\xff\xc1" + full[i + 2 : i + 4]
            + bytes([16]) + full[i + 5 :]
        )
        sof, has_sos, prec = MM._jpeg_scan_markers(weird)
        assert (sof, has_sos, prec) == (0xC1, True, 16)
        assert MM.decode_capability(weird) == "header"
        assert MM.decode_image_meta(weird)[4] == "header"
        with pytest.raises(NotImplementedError, match="precision"):
            MM.decode_jpeg(weird)
        with pytest.raises(ValueError, match="precision"):
            MM.encode_jpeg([[1]], precision=10)

    def test_truncated_stream_degrades(self):
        full = MM.encode_jpeg([[50] * 8 for _ in range(8)])
        fmt, w, h, c, via = MM.decode_image_meta(full[:-20])
        assert via in ("header", "opaque")  # never raises


class TestJpegProgressive:
    """Progressive JPEG (SOF2) — T.81 Annex G spectral selection +
    successive approximation; cross-certified against the baseline
    codec (same DCT/quantize front half ⇒ identical pixels)."""

    def _assert_matches_baseline(self, pixels, **kw):
        import numpy as np

        base = MM.decode_jpeg(MM.encode_jpeg(pixels, **kw))
        prog = MM.decode_jpeg_progressive(MM.encode_jpeg_progressive(pixels, **kw))
        assert base[:3] == prog[:3]
        assert np.array_equal(
            np.frombuffer(base[3], np.uint8), np.frombuffer(prog[3], np.uint8)
        )
        return prog

    def test_flat_grayscale_pixel_exact(self):
        import numpy as np

        w, h, nch, raw = self._assert_matches_baseline([[77] * 16] * 16)
        assert (w, h, nch) == (16, 16, 1)
        assert (np.frombuffer(raw, np.uint8) == 77).all()

    def test_checker_sa_refinement_paths(self):
        """DC + F(4,4) content: the default scan script decodes the
        (4,4) coefficient in the Al=2 band-6-63 first scan (after a
        ZRL-coded zero run) then refines it twice; DC goes through a
        first scan at Al=1 plus a refinement — all SA paths load-bearing
        for pixel-exactness."""
        s = [1, -1, -1, 1, 1, -1, -1, 1]
        px = [[100 + 5 * s[x % 8] * s[y % 8] for x in range(16)]
              for y in range(16)]
        self._assert_matches_baseline(px)

    def test_eob_runs_across_blocks(self):
        """A large mostly-flat image: the band-1-5 AC scan is all zeros
        over 64 blocks, forcing multi-block EOBn run coding (r up to 6)
        on encode and the eobrun skip/refine paths on decode."""
        px = [[60 + (1 if (x, y) == (4, 4) else 0) for x in range(64)]
              for y in range(64)]
        self._assert_matches_baseline(px)

    def test_random_grayscale_odd_dims(self):
        import numpy as np

        rng = np.random.default_rng(11)
        self._assert_matches_baseline(rng.integers(0, 256, (23, 37)).tolist())

    def test_random_rgb_444_and_420(self):
        import numpy as np

        rng = np.random.default_rng(12)
        px = [
            [(int(r), int(g), int(b)) for r, g, b in row]
            for row in rng.integers(0, 256, (21, 19, 3))
        ]
        self._assert_matches_baseline(px)
        self._assert_matches_baseline(px, subsample=2)

    def test_real_quant_table(self):
        import numpy as np

        rng = np.random.default_rng(13)
        q = [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
             14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
             18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113,
             92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112,
             100, 103, 99]
        px = rng.integers(0, 256, (17, 24)).tolist()
        self._assert_matches_baseline(px, quant=q)

    def test_restart_markers(self):
        """DRI + RSTn in every scan: DC predictors, EOB runs, and
        buffered correction bits reset at each boundary; the decoder
        byte-aligns across the markers. Interval 1 forces a restart
        between EVERY data unit — the harshest case."""
        import numpy as np

        rng = np.random.default_rng(21)
        px = rng.integers(0, 256, (33, 41)).tolist()
        for ri in (1, 2, 7):
            base = MM.decode_jpeg(MM.encode_jpeg(px))
            prog = MM.decode_jpeg_progressive(
                MM.encode_jpeg_progressive(px, restart_interval=ri)
            )
            assert base[:3] == prog[:3]
            assert base[3] == prog[3], f"restart_interval={ri}"
        # flat image: multi-block EOB runs interrupted by restarts
        flat = [[50] * 64 for _ in range(64)]
        assert (
            MM.decode_jpeg_progressive(
                MM.encode_jpeg_progressive(flat, restart_interval=5)
            )[3]
            == MM.decode_jpeg(MM.encode_jpeg(flat))[3]
        )

    def test_decode_image_dispatches_sof2(self):
        blob = MM.encode_jpeg_progressive([[90] * 12] * 9)
        assert MM.decode_image(blob) == (12, 9, 1)

    def test_16bit_dqt_tables(self):
        """DQT pq=1 (16-bit quantizer entries, T.81 B.2.4.1): both
        decoders read the wide form; same values ⇒ same pixels. The
        encoders only emit pq=0, so the stream is rewritten in place."""
        import struct

        import numpy as np

        def widen_dqt(blob: bytes) -> bytes:
            i = blob.index(b"\xff\xdb")
            (length,) = struct.unpack(">H", blob[i + 2 : i + 4])
            payload = blob[i + 4 : i + 2 + length]
            assert payload[0] >> 4 == 0
            wide = bytes([0x10 | (payload[0] & 0x0F)]) + b"".join(
                struct.pack(">H", v) for v in payload[1:65]
            )
            return (
                blob[:i]
                + struct.pack(">BBH", 0xFF, 0xDB, len(wide) + 2)
                + wide
                + blob[i + 2 + length :]
            )

        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (17, 23)).tolist()
        base = MM.encode_jpeg(px)
        assert MM.decode_jpeg(base)[3] == MM.decode_jpeg(widen_dqt(base))[3]
        prog = MM.encode_jpeg_progressive(px)
        assert (
            MM.decode_jpeg_progressive(prog)[3]
            == MM.decode_jpeg_progressive(widen_dqt(prog))[3]
        )

    def test_truncated_progressive_degrades(self):
        blob = MM.encode_jpeg_progressive([[90] * 16] * 16)
        fmt, w, h, c, via = MM.decode_image_meta(blob[:-30])
        assert via in ("header", "opaque")  # never raises


class TestDecodeRobustness:
    """decode_image_meta promises never-raises on arbitrary bytes — the
    graceful-degradation contract a 100 TB mixed-corpus scan depends on.
    Round-7 fuzzing found two holes, both pinned here."""

    def test_truncation_and_bitflip_fuzz(self):
        """Truncations + byte flips across all four codec families must
        degrade (pixels/header/opaque), never raise. The seed count is
        kept small for suite time; the off-by-one this found crashed on
        SOF-truncated JPEGs (parse_media_header read past the guard)."""
        import numpy as np

        rng = np.random.default_rng(99)
        # 8x8 seeds keep corrupt-dimension grids bounded. Case count is
        # deliberately small: a byte-flipped stream that still parses as
        # valid entropy data costs 1-3 s of garbage decode before it
        # errors (measured), which is CORRECT behavior but adds up — the
        # wide 4800-case sweep ran once during round 7 and lives in the
        # commit message record, not the suite.
        seeds = [
            MM.encode_jpeg_progressive(rng.integers(0, 256, (8, 8)).tolist()),
            MM.encode_jpeg(rng.integers(0, 256, (8, 8)).tolist()),
            MM.encode_jpeg_arith(rng.integers(0, 256, (8, 8)).tolist()),
            MM.encode_png([[(1, 2, 3)] * 9] * 7),
            MM.encode_gif([[(250, 0, 0)] * 6] * 5),
            MM.encode_gif_animated(
                [[[(40 * f, 9, 9)] * 5] * 4 for f in range(3)]),
            MM.encode_jpeg_hierarchical(
                rng.integers(0, 256, (9, 9)).tolist(), arithmetic=True),
        ]
        for seed_blob in seeds:
            cases = [bytes(seed_blob[:n]) for n in (3, 9, 21, len(seed_blob) // 2,
                                                    len(seed_blob) - 7)]
            for _ in range(4):  # a few byte flips (the slow class)
                b = bytearray(seed_blob)
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
                cases.append(bytes(b))
            for b in cases:
                out = MM.decode_image_meta(b)
                assert isinstance(out, tuple) and len(out) == 5
                assert out[4] in ("pixels", "header", "opaque")

    def test_implausible_dims_refused_before_allocation(self):
        """A corrupt SOF claiming 65535x65535 must be refused BEFORE the
        decoders allocate dims-sized plane/coefficient arrays (~34 GB) —
        the fuzz-found executor-stall hazard."""
        import struct

        import pytest

        for enc in (MM.encode_jpeg, MM.encode_jpeg_progressive):
            blob = enc([[50] * 8 for _ in range(8)])
            i = blob.index(b"\xff\xc0" if enc is MM.encode_jpeg else b"\xff\xc2")
            huge = (
                blob[: i + 5]
                + struct.pack(">HH", 65535, 65535)
                + blob[i + 9 :]
            )
            dec = (
                MM.decode_jpeg if enc is MM.encode_jpeg
                else MM.decode_jpeg_progressive
            )
            with pytest.raises(ValueError, match="implausible"):
                dec(huge)
            # and the graceful wrapper degrades instead of raising
            assert MM.decode_image_meta(huge)[4] in ("header", "opaque")


def test_png_capability_is_per_variant():
    """The PNG capability gate mirrors the decoder's ACTUAL matrix
    (round 10: depths 1/2/4/8/16, all color types, Adam7 — so 16-bit
    and interlaced now probe as 'pixels'); spec-invalid combinations
    (bad depth, sub-byte RGB) still degrade."""
    png = MM.encode_png([[(1, 2, 3)] * 4] * 3)
    assert MM.decode_capability(png) == "pixels"
    deep = png[:24] + bytes([16]) + png[25:]  # IHDR bit depth 8 → 16
    assert MM.decode_capability(deep) == "pixels"
    inter = png[:28] + bytes([1]) + png[29:]  # IHDR interlace → Adam7
    assert MM.decode_capability(inter) == "pixels"
    bad = png[:24] + bytes([3]) + png[25:]  # depth 3 is spec-invalid
    assert MM.decode_capability(bad) == "header"
    subrgb = png[:24] + bytes([4]) + png[25:]  # 4-bit RGB is invalid
    assert MM.decode_capability(subrgb) == "header"


class TestJpegLosslessHierarchical:
    """Lossless JPEG (SOF3, T.81 Annex H) and hierarchical JPEG
    (DHP/EXP + differential lossless SOF7 correction, Annex J) — round
    10, the 'last exotic variants' item. Unlike the DCT family these
    round-trip bit-exactly on ARBITRARY images, so the gates use
    deterministic pseudo-random content, not oracle-shaped blocks."""

    def _rand(self, h, w, hi=256, seed=7, ch=1):
        import numpy as np

        rng = np.random.RandomState(seed)
        a = rng.randint(0, hi, (h, w) if ch == 1 else (h, w, ch))
        return a.tolist()

    def test_lossless_every_predictor_exact(self):
        import numpy as np

        img = self._rand(13, 17)
        for sel in range(1, 8):
            blob = MM.encode_jpeg_lossless(img, predictor=sel)
            w, h, nch, px = MM.decode_jpeg_lossless(blob)
            assert (w, h, nch) == (17, 13, 1)
            got = np.frombuffer(px, np.uint8).reshape(h, w)
            assert got.tolist() == img, f"predictor {sel}"

    def test_lossless_rgb_no_color_transform(self):
        import numpy as np

        img = self._rand(9, 11, ch=3)
        blob = MM.encode_jpeg_lossless(img, predictor=4)
        w, h, nch, px = MM.decode_jpeg_lossless(blob)
        assert nch == 3
        got = np.frombuffer(px, np.uint8).reshape(h, w, 3)
        assert got.tolist() == img  # exact — lossless never converts color

    def test_lossless_16bit_and_point_transform(self):
        import numpy as np

        img16 = self._rand(8, 8, hi=65536, seed=3)
        blob = MM.encode_jpeg_lossless(img16, predictor=7, precision=16)
        w, h, _n, px = MM.decode_jpeg_lossless(blob)
        assert np.frombuffer(px, "<u2").reshape(h, w).tolist() == img16
        # Pt=2: samples coded >>2, decoder re-shifts — exact when the
        # low bits are zero (the Annex-H near-lossless contract)
        imgpt = (np.array(self._rand(6, 6, hi=64, seed=5)) * 4).tolist()
        blob = MM.encode_jpeg_lossless(imgpt, point_transform=2)
        w, h, _n, px = MM.decode_jpeg_lossless(blob)
        assert np.frombuffer(px, np.uint8).reshape(h, w).tolist() == imgpt

    def test_lossless_dispatch_and_capability(self):
        img = self._rand(5, 7)
        blob = MM.encode_jpeg_lossless(img)
        sof, has_sos, prec = MM._jpeg_scan_markers(blob)
        assert (sof, has_sos, prec) == (0xC3, True, 8)
        assert MM.decode_capability(blob) == "pixels"
        assert MM.decode_image(blob) == (7, 5, 1)
        assert MM.decode_image_meta(blob) == ("image/jpeg", 7, 5, 1, "pixels")
        # the sequential decoder still refuses SOF3 (dispatch owns it)
        import pytest

        with pytest.raises(NotImplementedError, match="SOF3|non-baseline"):
            MM.decode_jpeg(blob)

    def test_hierarchical_exact_on_arbitrary_image(self):
        import numpy as np

        img = self._rand(21, 19, seed=11)
        blob = MM.encode_jpeg_hierarchical(img)
        w, h, nch, px = MM.decode_jpeg_hierarchical(blob)
        assert (w, h, nch) == (19, 21, 1)
        got = np.frombuffer(px, np.uint8).reshape(h, w)
        # the DCT coarse stage is lossy; the SOF7 differential-lossless
        # correction makes the PYRAMID exact — the Annex-J promise
        assert got.tolist() == img

    def test_hierarchical_header_capability_dispatch(self):
        img = self._rand(12, 10, seed=2)
        blob = MM.encode_jpeg_hierarchical(img)
        # DHP carries the FULL resolution; the header walk must report
        # it, not the coarse frame's half resolution
        assert MM.parse_media_header(blob) == ("image/jpeg", 10, 12, 1)
        sof, has_sos, _prec = MM._jpeg_scan_markers(blob)
        assert (sof, has_sos) == (0xDE, True)
        assert MM._jpeg_hier_decodable(blob)
        assert MM.decode_capability(blob) == "pixels"
        assert MM.decode_image(blob) == (10, 12, 1)
        assert MM.decode_image_meta(blob)[4] == "pixels"

    def test_hierarchical_three_stage_sof5_exact(self):
        import numpy as np

        img = self._rand(21, 19, seed=13)
        blob = MM.encode_jpeg_hierarchical(img, stages=3)
        assert blob.count(b"\xff\xc5") >= 1  # the differential DCT stage
        w, h, nch, px = MM.decode_jpeg_hierarchical(blob)
        got = np.frombuffer(px, np.uint8).reshape(h, w)
        assert got.tolist() == img  # SOF0 -> EXP -> SOF5 -> EXP -> SOF7
        assert MM.decode_capability(blob) == "pixels"
        # a lossy coarse quantizer changes the stages' split of the
        # work, never the pyramid's exactness
        blob_q = MM.encode_jpeg_hierarchical(img, quant=[16] * 64, stages=3)
        _w, _h, _n, px_q = MM.decode_jpeg_hierarchical(blob_q)
        assert np.frombuffer(px_q, np.uint8).reshape(h, w).tolist() == img

    def test_hierarchical_unsupported_stage_degrades(self):
        img = self._rand(12, 10, seed=2)
        blob = MM.encode_jpeg_hierarchical(img)
        # rewrite the correction frame SOF7 -> SOF2 (non-differential
        # PROGRESSIVE inside a pyramid, not implemented — SOF6/SOF14
        # became real later in round 10): capability must fall to
        # 'header', the walker must refuse, decode_image_meta must not
        # raise
        mut = blob.replace(b"\xff\xc7", b"\xff\xc2", 1)
        assert not MM._jpeg_hier_decodable(mut)
        assert MM.decode_capability(mut) == "header"
        assert MM.decode_image_meta(mut)[4] == "header"
        import pytest

        with pytest.raises(NotImplementedError, match="0xc2"):
            MM.decode_jpeg_hierarchical(mut)

    def test_lossless_dri_refused_not_misdecoded(self):
        img = self._rand(5, 7)
        blob = MM.encode_jpeg_lossless(img)
        # inject a DRI segment before SOS: the decoder has no restart
        # support in the lossless path, so capability must refuse
        i = blob.index(b"\xff\xda")
        mut = blob[:i] + b"\xff\xdd\x00\x04\x00\x08" + blob[i:]
        assert MM._jpeg_has_dri(mut)
        assert MM.decode_capability(mut) == "header"
        assert MM.decode_image_meta(mut)[4] == "header"


class TestJpegArithmetic:
    """Arithmetic-coded sequential JPEG (SOF9, T.81 Annexes D + F) —
    round 10, closing the last JPEG process family that degraded to the
    header walk. Two independent contracts: (1) the pixel-exact oracle
    shapes (flat / F(4,4) checker with all-ones quant) round-trip
    exactly, as for every other codec in the family; (2) the
    DIFFERENTIAL gate — decode_jpeg_arith(arith stream) is bit-identical
    to decode_jpeg(Huffman stream) of the same image and quant table,
    because only the entropy layer differs. The differential gate is the
    strong one: it pins the whole QM coder + Annex F statistical model
    stack against an already-oracle-checked decoder on arbitrary
    images."""

    def test_qm_coder_bit_roundtrip_fuzz(self):
        """The raw QM coder must round-trip arbitrary decision sequences
        over arbitrary context sets — independent of any JPEG model.
        Exercises carry propagation, 0xFF stuffing, stacked-byte
        resolution, and the conditional-exchange branches."""
        import random

        rng = random.Random(4242)
        for _trial in range(60):
            n = rng.randint(0, 600)
            nctx = rng.randint(1, 10)
            p = rng.random()
            bits = [(rng.randint(0, nctx - 1), int(rng.random() < p))
                    for _ in range(n)]
            enc = MM._QMEncoder()
            st = bytearray(nctx)
            for ctx, b in bits:
                enc.encode(st, ctx, b)
            data = enc.flush() + b"\xff\xd9"
            dec = MM._QMDecoder(data, 0)
            st2 = bytearray(nctx)
            for j, (ctx, b) in enumerate(bits):
                assert dec.decode(st2, ctx) == b, (_trial, j)

    def test_flat_and_checker_pixel_exact(self):
        import numpy as np

        px = [[128] * 24 for _ in range(16)]
        w, h, c, data = MM.decode_jpeg_arith(MM.encode_jpeg_arith(px))
        assert (w, h, c) == (24, 16, 1)
        assert set(data) == {128}
        # F(4,4) checker — the oracle shape (exact integer DCT point)
        n = np.arange(8)
        col = 0.5 * np.cos((2 * n + 1) * 4 * np.pi / 16.0)
        blk = np.round(np.outer(col, col) * 32 + 128).astype(int)
        px = [[int(blk[y % 8][x % 8]) for x in range(32)] for y in range(24)]
        w, h, c, data = MM.decode_jpeg_arith(MM.encode_jpeg_arith(px))
        got = np.frombuffer(data, np.uint8).reshape(24, 32)
        assert np.array_equal(got, np.array(px))

    def test_differential_vs_huffman_on_random_images(self):
        """Same image, same quant → the arithmetic and Huffman streams
        must decode bit-identically (entropy layer is the only delta).
        Covers gray/RGB, 4:4:4/4:2:0, 8/12-bit, quant=1 and lossy."""
        import random

        rng = random.Random(7)
        shapes = [("gray", 1, 8), ("rgb", 1, 8), ("rgb", 2, 8),
                  ("gray", 1, 12), ("rgb", 2, 12)]
        for mode, sub, prec in shapes:
            hh, ww = rng.choice([(17, 23), (16, 16), (9, 40)])
            mx = (1 << prec) - 1
            if mode == "gray":
                px = [[rng.randint(0, mx) for _ in range(ww)]
                      for _ in range(hh)]
            else:
                px = [[(rng.randint(0, mx), rng.randint(0, mx),
                        rng.randint(0, mx)) for _ in range(ww)]
                      for _ in range(hh)]
            quant = ([1] * 64 if rng.random() < 0.5
                     else [rng.randint(1, 16) for _ in range(64)])
            a = MM.decode_jpeg_arith(MM.encode_jpeg_arith(
                px, quant=quant, subsample=sub, precision=prec))
            hf = MM.decode_jpeg(MM.encode_jpeg(
                px, quant=quant, subsample=sub, precision=prec))
            assert a == hf, (mode, sub, prec)

    def test_compresses_better_than_huffman_on_smooth_images(self):
        """The point of arithmetic coding: adaptive probabilities beat
        the static spec-valid Huffman tables on compressible content
        (T.81's own motivation for Annex D)."""
        px = [[(x * 255) // 63 for x in range(64)] for _ in range(64)]
        sa = len(MM.encode_jpeg_arith(px))
        sh = len(MM.encode_jpeg(px))
        assert sa < sh * 0.8, (sa, sh)

    def test_capability_and_dispatch(self):
        blob = MM.encode_jpeg_arith([[7 * i % 256 for i in range(16)]] * 16)
        assert MM.decode_capability(blob) == "pixels"
        assert MM.decode_image(blob) == (16, 16, 1)
        # truncation degrades, never raises (the 100 TB scan contract)
        assert MM.decode_image_meta(blob[:-20])[4] in ("pixels", "header")
        # implausible dims refused before allocation
        import struct

        import pytest

        i = blob.index(b"\xff\xc9")
        huge = blob[: i + 5] + struct.pack(">HH", 65535, 65535) + blob[i + 9:]
        with pytest.raises(ValueError, match="implausible"):
            MM.decode_jpeg_arith(huge)
        assert MM.decode_image_meta(huge)[4] in ("header", "opaque")

    def test_dri_still_degrades(self):
        """The arithmetic decoder refuses restart intervals, so the
        capability probe must not promise pixels for SOF9+DRI."""
        blob = MM.encode_jpeg_arith([[50] * 8 for _ in range(8)])
        i = blob.index(b"\xff\xda")
        mut = blob[:i] + b"\xff\xdd\x00\x04\x00\x08" + blob[i:]
        assert MM.decode_capability(mut) == "header"
        assert MM.decode_image_meta(mut)[4] == "header"

    def test_dc_conditioning_categories_exercised(self):
        """Large alternating DC swings walk the conditioning contexts
        (zero/small/large × sign) — a roundtrip that only passes if
        encoder and decoder track dc_context identically."""
        import numpy as np

        rows = []
        vals = [0, 255, 0, 255, 128, 129, 128, 127]
        for v in vals:
            rows.extend([[v] * 64] * 8)
        px = [list(r) for r in rows]
        w, h, c, data = MM.decode_jpeg_arith(MM.encode_jpeg_arith(px))
        got = np.frombuffer(data, np.uint8).reshape(64, 64)
        assert np.array_equal(got, np.array(px))


class TestMp4Container:
    """ISO-BMFF (MP4) container walk — round 10: the video modality's
    typed-metadata seam. Payload (codec sample) decode is out of scope
    by design; the contract is container metadata from an O(header)
    box walk that skips mdat by size, exactly like the other header
    parsers."""

    def test_roundtrip_both_layouts_and_size_forms(self):
        for layout in (False, True):
            for large in (False, True):
                b = MM.encode_mp4(640, 360, 12345, n_video=1, n_audio=2,
                                  streaming_layout=layout, large_mdat=large)
                assert MM.parse_mp4_meta(b) == (
                    "video/mp4", 640, 360, 12345, 3, "vide,soun,soun",
                )
                assert MM.sniff_mime(b) == "video/mp4"
                assert MM.parse_media_header(b) == ("video/mp4", 640, 360, 3)
                # capability: container metadata only, never 'pixels'
                assert MM.decode_capability(b) == "header"
                assert MM.decode_image_meta(b) == (
                    "video/mp4", 640, 360, 3, "header",
                )

    def test_timescale_conversion_and_audio_only(self):
        b = MM.encode_mp4(64, 48, 1500, timescale=90000)
        assert MM.parse_mp4_meta(b)[3] == 1500
        b = MM.encode_mp4(0, 0, 980, n_video=0, n_audio=1)
        assert MM.parse_mp4_meta(b) == ("video/mp4", 0, 0, 980, 1, "soun")

    def test_truncation_and_corrupt_sizes_degrade(self):
        import struct

        full = MM.encode_mp4(320, 240, 5000)
        for n in (3, 9, 15, 40, len(full) // 2, len(full) - 5):
            out = MM.parse_mp4_meta(full[:n])
            assert isinstance(out, tuple) and len(out) == 6
        # a box claiming to extend past EOF must stop the walk, not
        # over-read or loop
        bad = bytearray(full)
        bad[0:4] = struct.pack(">I", 0xFFFFFFF0)
        assert isinstance(MM.parse_mp4_meta(bytes(bad)), tuple)
        # size==0 (to-end-of-file) form parses
        i = full.index(b"mdat") - 4
        z = full[:i] + struct.pack(">I", 0) + full[i + 4:]
        # moov precedes mdat in the default layout, so metadata survives
        assert MM.parse_mp4_meta(z)[:4] == ("video/mp4", 320, 240, 5000)

    def test_non_mp4_rejected(self):
        assert MM.parse_mp4_meta(b"RIFFxxxxWAVE")[0] == "application/octet-stream"
        assert MM.parse_mp4_meta(None)[0] == "application/octet-stream"
        assert MM.parse_mp4_meta(b"\x00\x00\x00\x08free")[0] == (
            "application/octet-stream"
        )


class TestJpegProgressiveArithmetic:
    """Arithmetic-coded progressive JPEG (SOF10, T.81 Annex G over the
    QM coder) — round 10. The differential gate is three-way: the
    SOF10 stream must decode bit-identically to BOTH the sequential
    (SOF0) and the Huffman-progressive (SOF2) codecs of the same image
    and quant table, pinning the per-scan QM restart, the
    point-transformed DC model, the banded AC model, and the G.1.3.3
    refinement model against two already-oracle-checked decoders."""

    def test_three_way_differential_on_random_images(self):
        import random

        rng = random.Random(11)
        for mode, sub in [("gray", 1), ("rgb", 1), ("rgb", 2)]:
            hh, ww = rng.choice([(17, 23), (16, 16), (9, 40), (24, 24)])
            if mode == "gray":
                px = [[rng.randint(0, 255) for _ in range(ww)]
                      for _ in range(hh)]
            else:
                px = [[(rng.randint(0, 255), rng.randint(0, 255),
                        rng.randint(0, 255)) for _ in range(ww)]
                      for _ in range(hh)]
            quant = ([1] * 64 if rng.random() < 0.5
                     else [rng.randint(1, 16) for _ in range(64)])
            pa = MM.decode_jpeg_progressive_arith(
                MM.encode_jpeg_progressive_arith(px, quant=quant,
                                                 subsample=sub))
            sq = MM.decode_jpeg(MM.encode_jpeg(px, quant=quant,
                                               subsample=sub))
            ph = MM.decode_jpeg_progressive(
                MM.encode_jpeg_progressive(px, quant=quant, subsample=sub))
            assert pa == sq == ph, (mode, sub)

    def test_compresses_better_than_huffman_progressive(self):
        px = [[(x * 255) // 63 for x in range(64)] for _ in range(64)]
        sa = len(MM.encode_jpeg_progressive_arith(px))
        sh = len(MM.encode_jpeg_progressive(px))
        assert sa < sh * 0.8, (sa, sh)

    def test_capability_dims_and_dri_gates(self):
        import struct

        import pytest

        blob = MM.encode_jpeg_progressive_arith(
            [[(3 * x + 5 * y) % 256 for x in range(16)] for y in range(16)])
        assert MM.decode_capability(blob) == "pixels"
        assert MM.decode_image(blob) == (16, 16, 1)
        i = blob.index(b"\xff\xca")
        huge = blob[: i + 5] + struct.pack(">HH", 65535, 65535) + blob[i + 9:]
        with pytest.raises(ValueError, match="implausible"):
            MM.decode_jpeg_progressive_arith(huge)
        assert MM.decode_image_meta(huge)[4] in ("header", "opaque")
        j = blob.index(b"\xff\xda")
        mut = blob[:j] + b"\xff\xdd\x00\x04\x00\x08" + blob[j:]
        assert MM.decode_capability(mut) == "header"
        # truncation degrades, never raises
        assert MM.decode_image_meta(blob[:-25])[4] in ("pixels", "header")


class TestJpegLosslessArithmetic:
    """Arithmetic-coded lossless JPEG (SOF11, T.81 Annex H.1.2.2 — the
    2-D-conditioned QM model) — round 10, completing the arithmetic
    family. Contracts: (1) bit-exact roundtrip on ARBITRARY images (the
    lossless family's native oracle); (2) differential — identical
    decoded bytes to the SOF3 Huffman path; (3) the 2-D conditioning
    demonstrably engages (smooth content compresses far below the
    Huffman SSSS coding)."""

    def test_differential_vs_sof3_across_shapes(self):
        import random

        rng = random.Random(5)
        cases = [("gray", 8), ("gray", 12), ("gray", 16), ("gray", 4),
                 ("rgb", 8)]
        for mode, prec in cases:
            hh, ww = rng.choice([(7, 11), (16, 16), (5, 23)])
            mx = (1 << prec) - 1
            pred = rng.randint(1, 7)
            pt = rng.choice([0, 0, 1])
            if mode == "gray":
                px = [[rng.randint(0, mx) for _ in range(ww)]
                      for _ in range(hh)]
            else:
                px = [[(rng.randint(0, mx), rng.randint(0, mx),
                        rng.randint(0, mx)) for _ in range(ww)]
                      for _ in range(hh)]
            a = MM.decode_jpeg_lossless_arith(MM.encode_jpeg_lossless_arith(
                px, predictor=pred, precision=prec, point_transform=pt))
            hf = MM.decode_jpeg_lossless(MM.encode_jpeg_lossless(
                px, predictor=pred, precision=prec, point_transform=pt))
            assert a == hf, (mode, prec, pred, pt)

    def test_bit_exact_roundtrip_arbitrary_gray(self):
        import numpy as np

        px = [[(31 * y + 7 * x * x) % 256 for x in range(19)]
              for y in range(13)]
        w, h, c, raw = MM.decode_jpeg_lossless_arith(
            MM.encode_jpeg_lossless_arith(px, predictor=4))
        assert (w, h, c) == (19, 13, 1)
        assert np.array_equal(
            np.frombuffer(raw, np.uint8).reshape(13, 19), np.array(px))

    def test_2d_conditioning_compresses_smooth_content(self):
        px = [[(x + y) % 256 for x in range(48)] for y in range(48)]
        sa = len(MM.encode_jpeg_lossless_arith(px, predictor=7))
        sh = len(MM.encode_jpeg_lossless(px, predictor=7))
        assert sa < sh * 0.2, (sa, sh)  # measured ~0.03x

    def test_capability_and_dri_gates(self):
        blob = MM.encode_jpeg_lossless_arith([[9 * i % 256 for i in
                                               range(12)]] * 10)
        assert MM.decode_capability(blob) == "pixels"
        assert MM.decode_image(blob) == (12, 10, 1)
        i = blob.index(b"\xff\xda")
        mut = blob[:i] + b"\xff\xdd\x00\x04\x00\x08" + blob[i:]
        assert MM.decode_capability(mut) == "header"
        assert MM.decode_image_meta(blob[:-15])[4] in ("pixels", "header")


class TestMp3Header:
    """MPEG audio frame-header walk (round 10): ID3v2 syncsafe skip +
    version/layer/bitrate/samplerate tables. Payload decode out of
    scope, as with MP4 — the header IS the 100 TB scan contract."""

    def test_header_roundtrip_variants(self):
        cases = [
            dict(),
            dict(bitrate_kbps=320, samplerate=48000),
            dict(mono=True, id3_size=0),
            dict(mpeg2=True, bitrate_kbps=64, samplerate=22050),
            dict(bitrate_kbps=32, samplerate=32000, id3_size=100),
        ]
        for kw in cases:
            b = MM.encode_mp3_stub(**kw)
            assert MM.parse_mp3_header(b) == (
                "audio/mp3",
                kw.get("bitrate_kbps", 128),
                kw.get("samplerate", 44100),
                1 if kw.get("mono") else 2,
            )
            assert MM.sniff_mime(b) == "audio/mp3"

    def test_bare_frame_sync_and_jpeg_no_collision(self):
        bare = MM.encode_mp3_stub(id3_size=0)[10:]
        assert MM.sniff_mime(bare) == "audio/mp3"
        assert MM.parse_mp3_header(bare)[1] == 128
        # JPEG's FF D8 must never sniff as MP3 frame sync
        assert MM.sniff_mime(MM.encode_jpeg([[1] * 8] * 8)) == "image/jpeg"

    def test_degradations(self):
        # ID3 tag present but frame truncated away → mime only
        assert MM.parse_mp3_header(
            b"ID3\x03\x00\x00\x00\x00\x00\x7f") == ("audio/mp3", 0, 0, 0)
        assert MM.parse_mp3_header(b"RIFFxxxx")[0] == (
            "application/octet-stream")
        assert MM.parse_mp3_header(None)[0] == "application/octet-stream"
        # reserved version/layer bits degrade to zeros
        bad = bytearray(MM.encode_mp3_stub(id3_size=0))
        bad[10 + 1] = 0xE8  # version=01 (reserved)
        assert MM.parse_mp3_header(bytes(bad[10:])) == ("audio/mp3", 0, 0, 0)


class TestTiffHeader:
    """TIFF 6.0 IFD walk (round 10): both byte orders, mixed
    SHORT/LONG tag values, degradation on corrupt offsets."""

    def test_both_byte_orders(self):
        for be in (False, True):
            b = MM.encode_tiff_stub(641, 479, 3, big_endian=be)
            assert MM.parse_tiff_header(b) == ("image/tiff", 641, 479, 3)
            assert MM.sniff_mime(b) == "image/tiff"
            assert MM.parse_media_header(b) == ("image/tiff", 641, 479, 3)
            assert MM.decode_capability(b) == "header"
            assert MM.decode_image_meta(b) == (
                "image/tiff", 641, 479, 3, "header",
            )

    def test_degradations(self):
        full = MM.encode_tiff_stub(32, 16, 1)
        for n in (2, 6, 9, 14, len(full) - 3):
            out = MM.parse_tiff_header(full[:n])
            assert isinstance(out, tuple) and len(out) == 4
        import struct

        bad = full[:4] + struct.pack("<I", 0xFFFFFF) + full[8:]
        assert MM.parse_tiff_header(bad) == ("image/tiff", 0, 0, 0)
        assert MM.parse_tiff_header(b"notatiff")[0] == (
            "application/octet-stream")


class TestHierarchicalArithmetic:
    """Arithmetic pyramid stages (round 10): SOF9 coarse + SOF13
    differential sequential DCT + SOF15 differential lossless — the
    hierarchical matrix's arithmetic column. Same pixel-exact contract
    as the Huffman pyramids (the lossless correction absorbs all DCT
    loss)."""

    def test_pixel_exact_both_depths(self):
        import random

        import numpy as np

        rng = random.Random(3)
        for stages in (2, 3):
            hh, ww = rng.choice([(12, 12), (9, 17), (16, 24)])
            px = [[rng.randint(0, 255) for _ in range(ww)]
                  for _ in range(hh)]
            blob = MM.encode_jpeg_hierarchical(px, stages=stages,
                                               arithmetic=True)
            w, h, c, raw = MM.decode_jpeg_hierarchical(blob)
            assert (w, h, c) == (ww, hh, 1)
            assert np.array_equal(
                np.frombuffer(raw, np.uint8).reshape(hh, ww), np.array(px))
            # measurably smaller than the Huffman pyramid
            hblob = MM.encode_jpeg_hierarchical(px, stages=stages)
            assert len(blob) < len(hblob)

    def test_lossy_quantizer_still_exact(self):
        import numpy as np

        px = [[(7 * x * y + 13 * x) % 256 for x in range(16)]
              for y in range(16)]
        blob = MM.encode_jpeg_hierarchical(px, quant=[4] * 64, stages=3,
                                           arithmetic=True)
        _w, _h, _c, raw = MM.decode_jpeg_hierarchical(blob)
        assert np.array_equal(
            np.frombuffer(raw, np.uint8).reshape(16, 16), np.array(px))

    def test_capability_accepts_arithmetic_pyramids(self):
        blob = MM.encode_jpeg_hierarchical([[60] * 12] * 12, stages=3,
                                           arithmetic=True)
        assert MM._jpeg_hier_decodable(blob)
        assert MM.decode_capability(blob) == "pixels"
        assert MM.decode_image_meta(blob) == ("image/jpeg", 12, 12, 1,
                                              "pixels")
        # arithmetic-progressive NON-differential stages still degrade:
        # rewrite the SOF13 marker to SOF10 (0xCA)
        mut = blob.replace(b"\xff\xcd", b"\xff\xca", 1)
        assert not MM._jpeg_hier_decodable(mut)
        assert MM.decode_capability(mut) == "header"


class TestAnimatedGif:
    """Animated GIF (round 10): multi-frame encode (GCE + NETSCAPE
    loop), frame-enumerating decode with canvas composition, the
    no-LZW metadata walk, and the REAL frame-sampling operator."""

    def test_roundtrip_and_meta(self):
        frames = [
            [[(f * 50, (x * 20) % 256, (y * 30) % 256) for x in range(7)]
             for y in range(5)]
            for f in range(3)
        ]
        blob = MM.encode_gif_animated(frames, delays_cs=[10, 25, 40], loop=2)
        w, h, out = MM.decode_gif_frames(blob)
        assert (w, h, len(out)) == (7, 5, 3)
        for f, (delay, rgb) in enumerate(out):
            assert rgb == bytes(
                c for row in frames[f] for px in row for c in px)
        assert [d for d, _ in out] == [10, 25, 40]
        assert MM.parse_gif_meta(blob) == ("image/gif", 7, 5, 3, 75, 2)
        # first-frame decode_gif still works on animated streams
        assert MM.decode_gif(blob)[:3] == (7, 5, 3)

    def test_subrectangle_composition(self):
        """A hand-built delta frame (2x2 patch at (1,1)) must composite
        onto the previous canvas under do-not-dispose semantics."""
        import struct

        base = [[(10, 20, 30)] * 4 for _ in range(3)]
        blob = bytearray(MM.encode_gif_animated([base], delays_cs=[5]))
        # palette: single color at index 0; append a patch frame using
        # the same global table
        lzw = MM._gif_lzw_encode([0, 0, 0, 0], 2)
        patch = (
            b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, 7, 0) + b"\x00"
            + b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
            + bytes((2,)) + bytes((len(lzw),)) + lzw + b"\x00"
        )
        i = bytes(blob).rindex(b"\x3b")
        mut = bytes(blob[:i]) + patch + b"\x3b"
        w, h, out = MM.decode_gif_frames(mut)
        assert len(out) == 2 and out[1][0] == 7
        # patch pixels painted, rest of canvas preserved
        assert out[1][1] == out[0][1]  # same color everywhere here
        assert MM.parse_gif_meta(mut)[3] == 2

    def test_truncation_degrades(self):
        frames = [[[(9, 9, 9)] * 5] * 4 for _ in range(2)]
        blob = MM.encode_gif_animated(frames)
        for n in (3, 9, 20, len(blob) // 2):
            out = MM.parse_gif_meta(blob[:n])
            assert isinstance(out, tuple) and len(out) == 6
        assert MM.parse_gif_meta(b"notagif")[0] == "application/octet-stream"

    def test_gif_frame_sample_operator(self, spark):
        import pandas as pd

        frames = [[[(f * 30 % 256, 0, 200)] * 6 for _ in range(4)]
                  for f in range(4)]
        good = MM.encode_gif_animated(frames)
        df = spark.createDataFrame(
            pd.DataFrame({
                "doc_id": [1, 2],
                "blob": [good, b"not a gif at all"],
            })
        )
        rows = MM.gif_frame_sample(df, n_frames=2).collect()
        # corrupt blob yields ZERO rows (per-blob degradation), good
        # blob yields 2 evenly-spaced frames
        assert sorted((r.doc_id, r.frame_idx) for r in rows) == [
            (1, 0), (1, 2)]
        assert all(r.width == 6 and r.height == 4 for r in rows)


def test_with_media_meta_universal_routing(spark):
    """The with_media_meta OPERATOR routes every modality to its parser
    in one Arrow pass — including MP3 and null/garbage blobs, which the
    inventory query's corpus doesn't cover."""
    import pandas as pd

    blobs = [
        MM.encode_png([[(1, 2, 3)] * 4] * 3),
        MM.encode_wav([5] * 30, framerate=9000),
        MM.encode_mp3_stub(bitrate_kbps=192, samplerate=32000),
        MM.encode_mp4(100, 60, 700),
        MM.encode_tiff_stub(20, 10, 3),
        b"complete garbage",
        None,
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(7)), "blob": blobs})
    )
    out = {r.doc_id: r for r in MM.with_media_meta(df).collect()}
    assert (out[0].mime, out[0].via, out[0].width) == ("image/png", "pixels", 4)
    assert (out[1].mime, out[1].extra) == ("audio/wav", 9000)
    assert (out[2].mime, out[2].extra) == ("audio/mp3", 192)
    assert (out[3].mime, out[3].width, out[3].extra) == ("video/mp4", 100, 700)
    assert (out[4].mime, out[4].width, out[4].extra) == ("image/tiff", 20, 3)
    assert out[5].via == "opaque" and out[6].via == "opaque"
    assert len(out) == 7  # every blob yields exactly one row, never raises


class TestPngFullMatrix:
    """PNG variant matrix (round 10): depths 1/2/4/8/16, palette with
    PLTE lookup, alpha channels, and Adam7 interlace — every stream
    hand-built independently of the encoder, so these pin the decoder
    against the spec, not against our own writer."""

    @staticmethod
    def _chunk(tag, data):
        import struct
        import zlib

        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    @classmethod
    def _build(cls, w, h, depth, color, interlace, raw, plte=b""):
        import struct
        import zlib

        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
        out = b"\x89PNG\r\n\x1a\n" + cls._chunk(b"IHDR", ihdr)
        if plte:
            out += cls._chunk(b"PLTE", plte)
        return out + cls._chunk(b"IDAT", zlib.compress(raw)) + cls._chunk(
            b"IEND", b"")

    def test_16bit_gray_and_rgb(self):
        import struct

        w, h = 5, 3
        vals = [[(1000 * y + 137 * x) % 65536 for x in range(w)]
                for y in range(h)]
        raw = b"".join(
            b"\x00" + b"".join(struct.pack(">H", v) for v in row)
            for row in vals)
        dw, dh, dn, px = MM.decode_png(self._build(w, h, 16, 0, 0, raw))
        got = [struct.unpack("<H", px[2 * i : 2 * i + 2])[0]
               for i in range(w * h)]
        assert got == [v for row in vals for v in row]
        # RGB with the up filter (bpp=6 byte distance)
        import random

        rng = random.Random(2)
        vals = [[tuple(rng.randint(0, 65535) for _ in range(3))
                 for _ in range(4)] for _ in range(3)]
        rows, prev = [], bytes(24)
        for y in range(3):
            cur = b"".join(struct.pack(">H", c) for p in vals[y] for c in p)
            rows.append(b"\x02" + bytes(
                (cur[i] - prev[i]) & 0xFF for i in range(24)))
            prev = cur
        _w, _h, dn, px = MM.decode_png(
            self._build(4, 3, 16, 2, 0, b"".join(rows)))
        got = [struct.unpack("<H", px[2 * i : 2 * i + 2])[0]
               for i in range(36)]
        assert got == [c for row in vals for p in row for c in p]

    def test_palette_and_subbyte_gray(self):
        plte = b"".join(bytes((i * 16, 255 - i * 16, i * 7))
                        for i in range(16))
        w, h = 7, 4
        idx = [[(x + y) % 16 for x in range(w)] for y in range(h)]
        raw = b""
        for row in idx:
            line = bytearray()
            for i in range(0, w, 2):
                line.append(row[i] << 4 | (row[i + 1] if i + 1 < w else 0))
            raw += b"\x00" + bytes(line)
        dw, dh, dn, px = MM.decode_png(self._build(w, h, 4, 3, 0, raw, plte))
        assert (dw, dh, dn) == (w, h, 3)
        for y in range(h):
            for x in range(w):
                i = idx[y][x]
                assert px[3 * (y * w + x) : 3 * (y * w + x) + 3] == (
                    plte[3 * i : 3 * i + 3])
        # 1-bit gray scales to 0/255
        w, h = 10, 2
        bits = [[(x ^ y) & 1 for x in range(w)] for y in range(h)]
        raw = b""
        for row in bits:
            line = bytearray(2)
            for x, b in enumerate(row):
                if b:
                    line[x // 8] |= 0x80 >> (x % 8)
            raw += b"\x00" + bytes(line)
        _w, _h, _n, px = MM.decode_png(self._build(w, h, 1, 0, 0, raw))
        assert list(px) == [255 if b else 0 for row in bits for b in row]

    def test_rgba_and_adam7(self):
        w, h = 3, 2
        vals = [[(x * 10, y * 20, x + y, 128 + x) for x in range(w)]
                for y in range(h)]
        raw = b"".join(
            b"\x00" + bytes(c for p in row for c in p) for row in vals)
        _w, _h, dn, px = MM.decode_png(self._build(w, h, 8, 6, 0, raw))
        assert dn == 4 and px == bytes(
            c for row in vals for p in row for c in p)
        # Adam7: seven independently-filtered passes scattered on grid
        w = h = 9
        img = [[(13 * y + 7 * x) % 256 for x in range(w)] for y in range(h)]
        raw = b""
        for (x0, y0, dx, dy) in MM._PNG_ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            for j in range(ph):
                raw += b"\x00" + bytes(
                    img[y0 + j * dy][x0 + i * dx] for i in range(pw))
        blob = self._build(w, h, 8, 0, 1, raw)
        _w, _h, _n, px = MM.decode_png(blob)
        assert list(px) == [v for row in img for v in row]
        assert MM.decode_capability(blob) == "pixels"
        assert MM.decode_image(blob) == (9, 9, 1)


class TestRasterDimsGuards:
    """Fuzz-found (round 10, in-round sweep over the new surfaces): a
    corrupt PNG IHDR / GIF descriptor can claim dims whose allocation
    is GBs before any pixel data is read — the same executor-stall
    hazard the JPEG decoders already guard. All three raster decoders
    now refuse implausible dims BEFORE allocating, and the PNG inflate
    is bounded to the geometry's exact byte need (zlib-bomb proof)."""

    def test_png_implausible_dims_refused(self):
        import struct

        import pytest

        png = MM.encode_png([[(1, 2, 3)] * 4] * 3)
        huge = png[:16] + struct.pack(">II", 0xFFFFFFF, 0xFFFFFFF) + png[24:]
        with pytest.raises(ValueError, match="implausible"):
            MM.decode_png(huge)
        assert MM.decode_image_meta(huge)[4] in ("header", "opaque")

    def test_png_zlib_bomb_bounded(self):
        import struct
        import zlib

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        # 64 MB of zeros compresses to ~64 KB; the decode must inflate
        # only the 3x4 geometry's bytes, never the bomb
        ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0)
        bomb = zlib.compress(b"\x00" * (64 << 20))
        blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
        w, h, n, px = MM.decode_png(blob)
        assert (w, h, n) == (4, 3, 1) and len(px) == 12

    def test_gif_implausible_dims_refused(self):
        import struct

        import pytest

        gif = MM.encode_gif([[(9, 9, 9)] * 4] * 3)
        i = gif.index(b"\x2c")
        huge = (gif[: i + 5]
                + struct.pack("<HH", 65535, 65535) + gif[i + 9 :])
        with pytest.raises(ValueError, match="implausible"):
            MM.decode_gif(huge)
        assert MM.decode_image_meta(huge)[4] in ("header", "opaque")

    def test_gif_frame_rect_must_fit_canvas(self):
        import struct

        import pytest

        blob = bytearray(MM.encode_gif_animated(
            [[[(1, 2, 3)] * 4] * 3], delays_cs=[5]))
        i = bytes(blob).index(b"\x2c")
        # frame offset pushed past the logical screen
        mut = (bytes(blob[: i + 1]) + struct.pack("<HH", 3, 2)
               + bytes(blob[i + 5 :]))
        with pytest.raises(ValueError, match="exceeds the logical screen"):
            MM.decode_gif_frames(mut)


def test_gif_lzw_min_code_size_guarded():
    """Fuzz-found (round 10): a mutated LZW minimum-code-size byte of
    up to 255 would attempt a 2^255-entry base table — the decoder must
    refuse outside the spec's 12-bit code ceiling, and the graceful
    wrapper must degrade."""
    import pytest

    gif = MM.encode_gif([[(9, 9, 9)] * 4] * 3)
    i = gif.index(b"\x2c")  # descriptor; min code size follows the 9 bytes
    mut = gif[: i + 10] + bytes([200]) + gif[i + 11 :]
    with pytest.raises(ValueError, match="implausible GIF LZW"):
        MM.decode_gif(mut)
    assert MM.decode_image_meta(mut)[4] in ("header", "opaque")


class TestHierarchicalDifferentialProgressive:
    """Differential PROGRESSIVE pyramid stages (SOF6 Huffman / SOF14
    arithmetic) — the final cell of the JPEG process matrix (round 10).
    The middle differential frame is coded as two spectral-selection
    scans (DC, then the 1-63 AC band, Ah=Al=0 — spec-legal progressive
    without successive approximation); the walker accumulates scans and
    finalizes on the next structural marker. Same pixel-exact pyramid
    contract; successive-approximation streams still degrade."""

    def test_pixel_exact_both_entropies(self):
        import random

        import numpy as np

        rng = random.Random(8)
        for arith in (False, True):
            hh, ww = rng.choice([(12, 12), (9, 17), (16, 24)])
            px = [[rng.randint(0, 255) for _ in range(ww)]
                  for _ in range(hh)]
            blob = MM.encode_jpeg_hierarchical(
                px, stages=3, arithmetic=arith, progressive_middle=True)
            assert (b"\xff\xce" if arith else b"\xff\xc6") in blob
            w, h, c, raw = MM.decode_jpeg_hierarchical(blob)
            assert np.array_equal(
                np.frombuffer(raw, np.uint8).reshape(hh, ww), np.array(px))

    def test_lossy_quant_still_exact(self):
        import numpy as np

        px = [[(11 * x * y + 5 * y) % 256 for x in range(16)]
              for y in range(16)]
        for arith in (False, True):
            blob = MM.encode_jpeg_hierarchical(
                px, quant=[3] * 64, stages=3, arithmetic=arith,
                progressive_middle=True)
            _w, _h, _c, raw = MM.decode_jpeg_hierarchical(blob)
            assert np.array_equal(
                np.frombuffer(raw, np.uint8).reshape(16, 16), np.array(px))

    def test_capability_and_sa_degradation(self):
        px = [[(7 * i) % 256 for i in range(12)]] * 12
        for arith in (False, True):
            blob = MM.encode_jpeg_hierarchical(
                px, stages=3, arithmetic=arith, progressive_middle=True)
            assert MM._jpeg_hier_decodable(blob)
            assert MM.decode_capability(blob) == "pixels"
            assert MM.decode_image_meta(blob)[4] == "pixels"
        # a successive-approximation scan header (Ah=1) must degrade
        blob = MM.encode_jpeg_hierarchical(px, stages=3,
                                           progressive_middle=True)
        i = blob.index(b"\xff\xc6")
        j = blob.index(b"\xff\xda", i)
        mut = blob[: j + 9] + bytes([0x10]) + blob[j + 10 :]
        assert not MM._jpeg_hier_decodable(mut)
        assert MM.decode_capability(mut) == "header"


class TestAdviceR10Fixes:
    """Pins for the ADVICE r10 degrade-contract holes: every one of
    these inputs crashed (or silently corrupted) the universal-inventory
    scan before the fix; all must now degrade per blob."""

    def test_mp3_bitrate_index_15_degrades(self):
        # high nibble 0xF = bitrate index 15 ('bad' per ISO 11172-3 —
        # the tables hold only 0-14): used to IndexError mid-batch
        blob = b"\xff\xfb\xf0\x00" + b"\x00" * 16
        assert MM.parse_mp3_header(blob) == ("audio/mp3", 0, 0, 0)

    def test_sniff_requires_plausible_mp3_header(self):
        # UTF-16LE BOM text sniffed as audio/mp3 and fabricated
        # bitrate/samplerate metadata from text bytes
        txt = b"\xff\xfe" + "hello world".encode("utf-16-le")
        assert MM.sniff_mime(txt) == "application/octet-stream"
        # bitrate-15 / reserved-field sync candidates are rejected too
        assert MM.sniff_mime(b"\xff\xfb\xf0\x00") == "application/octet-stream"
        assert MM.sniff_mime(b"\xff\xe8\x00\x00") == "application/octet-stream"
        # a real tagless frame (ID3 stripped) still sniffs as mp3
        bare = MM.encode_mp3_stub(id3_size=0)[10:]
        assert MM.sniff_mime(bare) == "audio/mp3"
        assert MM.parse_mp3_header(bare)[1] == 128

    def test_png_short_plte_fails_decode_and_degrades(self):
        # palette image with no PLTE: decode must raise (not return a
        # truncated pixel buffer) and the graceful wrapper must fall to
        # the header walk with via='header'
        raw = b"".join(b"\x00" + bytes([x % 4 for x in range(4)])
                       for _ in range(3))
        png = TestPngFullMatrix._build(4, 3, 8, 3, 0, raw)
        with pytest.raises(ValueError, match="palette"):
            MM.decode_png(png)
        fmt, w, h, _c, via = MM.decode_image_meta(png)
        assert (fmt, w, h, via) == ("image/png", 4, 3, "header")
        # short-but-present PLTE (covers indexes 0-1, image uses 3)
        png2 = TestPngFullMatrix._build(4, 3, 8, 3, 0, raw, plte=b"\x00" * 6)
        with pytest.raises(ValueError, match="palette"):
            MM.decode_png(png2)

    def test_truncated_v1_mvhd_degrades(self):
        import struct

        def box(tag, payload):
            return struct.pack(">I", 8 + len(payload)) + tag + payload

        ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isom")
        # v1 mvhd whose payload stops at 28 bytes — the u64 duration
        # field (ends at offset 32) is missing; as the FINAL box this
        # raised struct.error through the walk
        mvhd = box(b"mvhd", bytes([1, 0, 0, 0]) + b"\x00" * 24)
        out = MM.parse_mp4_meta(ftyp + box(b"moov", mvhd))
        assert out[0] == "video/mp4" and out[3] == 0

    def test_with_media_meta_survives_hostile_batch(self, spark):
        # one Arrow batch mixing every ADVICE r10 crash seed with valid
        # blobs: the scan must yield one row per blob, never raise
        seeds = [
            b"\xff\xfb\xf0\x00" + b"\x00" * 8,     # mp3 bitrate idx 15
            b"\xff\xfe" + "hi".encode("utf-16-le"),  # BOM text
            MM.encode_mp3_stub(),                    # valid mp3
            MM.encode_png([[(1, 2, 3)] * 3] * 2),    # valid png
        ]
        import struct
        mvhd = struct.pack(">I", 8 + 28) + b"mvhd" + bytes([1, 0, 0, 0]) + b"\x00" * 24
        seeds.append(
            struct.pack(">I", 20) + b"ftyp" + b"isom\x00\x00\x02\x00isom"
            + struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
        )
        df = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in enumerate(seeds)],
            "doc_id long, blob binary",
        )
        rows = {r.doc_id: r for r in MM.with_media_meta(df).collect()}
        assert len(rows) == len(seeds)
        # rejected sync candidates fall through the image path → opaque
        assert rows[0].mime == "unknown" and rows[0].via == "opaque"
        assert rows[1].mime == "unknown" and rows[1].via == "opaque"
        assert rows[2].mime == "audio/mp3" and rows[2].extra == 128
        assert rows[3].mime == "image/png" and rows[3].width == 3
        assert rows[4].mime == "video/mp4" and rows[4].extra == 0
