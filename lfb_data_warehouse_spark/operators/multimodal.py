"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the warehouse as ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` operators —
the payload bytes never pass through Python row-at-a-time.

Two decode tiers:

* **Real container decode** (:func:`parse_media` / :func:`decode_media`):
  a pure-Python parser for PNG (IHDR chunk), JPEG (SOFn marker scan),
  and WAV/RIFF (fmt/data chunk walk) that extracts true
  width/height/channels/sample-rate/frame-count from the actual bytes —
  no media libraries needed. :func:`synthesize_media` manufactures
  structurally valid payloads of all three container types so the
  decode path is exercised and oracle-checked end to end.
* **Pixel/sample decode** (:func:`decode_real`): REAL for all three
  container types using only the stdlib — PNG IDAT inflate (``zlib``)
  + per-scanline unfiltering (None/Sub/Up/Average/Paeth); baseline
  JPEG via a full entropy decoder (canonical Huffman from the file's
  DHT, DC prediction, dequantize, inverse DCT —
  :mod:`.jpegcodec`); WAV PCM samples straight off ``struct``.
  Unsupported shapes (progressive JPEG, palette PNG, 12-bit, …)
  raise ``ValueError`` — explicit, never a silent mis-decode.

At scale: binary payloads dominate bytes; keep them in their own
parquet column (columnar pruning skips them unless referenced), size
``spark.sql.files.maxPartitionBytes`` for payload width, and do
decode/feature-extract in the SAME mapInPandas pass to avoid
re-materializing payload bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jpegcodec import MAX_DECODED_BYTES as _MAX_DECODED_BYTES
from .jpegcodec import decode_valueerror_contract

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, payload_sha256 string, "
    "fake_width long, fake_height long, fake_frames long"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + media type.
    (Real pipelines read payloads from parquet binary columns.)"""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_real(payload: bytes) -> dict:
    """Full pixel/sample decode, stdlib only.

    * ``image/png`` → :func:`png_decode_pixels`: IDAT chunks inflated
      with ``zlib`` and scanlines unfiltered (all five PNG filter
      types, including Paeth) into the raw raster. Returns the raster
      bytes plus header metadata.
    * ``audio/wav`` → :func:`wav_decode_samples`: PCM ``data`` chunk
      unpacked into integer samples.
    * ``image/jpeg`` → :mod:`.jpegcodec`: full baseline entropy decode
      (canonical Huffman built from the file's DHT, DC prediction, AC
      run-lengths, byte un-stuffing, dequantize, un-zigzag, inverse
      DCT). Grayscale baseline sequential; progressive/subsampled
      streams raise ValueError.

    Container-only metadata (no payload decompression) remains
    available via :func:`parse_media` for the cheap path.
    """
    meta = parse_media(payload)
    if meta["media_type"] == "image/png":
        return png_decode_pixels(payload)
    if meta["media_type"] == "audio/wav":
        return wav_decode_samples(payload)
    if meta["media_type"] == "image/jpeg":
        from .jpegcodec import jpeg_decode_pixels

        return jpeg_decode_pixels(payload)
    if meta["media_type"] == "image/gif":
        from .gifcodec import gif_decode_pixels

        return gif_decode_pixels(payload)
    if meta["media_type"] == "image/bmp":
        return bmp_decode_pixels(payload)
    if meta["media_type"] == "image/tiff":
        from .tiffcodec import tiff_decode_pixels

        return tiff_decode_pixels(payload)
    if meta["media_type"] == "audio/flac":
        from .flaccodec import flac_decode_samples

        return flac_decode_samples(payload)
    if meta["media_type"] == "video/avi":
        from .avicodec import avi_decode_frames

        return avi_decode_frames(payload)
    return meta


# ---------------------------------------------------------------------------
# Real container codecs (pure Python, no media libraries)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> channels


def png_bytes(width: int, height: int, color_type: int = 2) -> bytes:
    """Minimal structurally valid PNG: signature + IHDR (with real
    CRC-32) + empty IEND. 45 bytes regardless of dimensions."""
    ihdr = b"IHDR" + struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    iend = b"IEND"
    return (
        _PNG_SIG
        + struct.pack(">I", 13) + ihdr + struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
        + struct.pack(">I", 0) + iend + struct.pack(">I", zlib.crc32(iend) & 0xFFFFFFFF)
    )


def jpeg_bytes(width: int, height: int, n_components: int = 3) -> bytes:
    """Minimal structurally valid JPEG header stream: SOI + JFIF APP0 +
    SOF0 (baseline frame header carrying the true dimensions) + EOI.
    32 + 3*n_components bytes."""
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + b"\x01\x01" + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    comps = b"".join(
        struct.pack("BBB", i + 1, 0x11, 0 if i == 0 else 1) for i in range(n_components)
    )
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 8 + 3 * n_components)
        + b"\x08" + struct.pack(">HH", height, width)
        + struct.pack("B", n_components) + comps
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def wav_bytes(channels: int, sample_rate: int, n_samples: int, bits: int = 16) -> bytes:
    """Structurally valid PCM WAV (RIFF/WAVE + fmt + data of silence).
    44 + n_samples*channels*bits/8 bytes."""
    block_align = channels * bits // 8
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(tag: bytes, body: bytes) -> bytes:
    """One length-framed PNG chunk with its real CRC-32."""
    return (
        struct.pack(">I", len(body))
        + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9, filter type 4): nearest of
    left/up/up-left to the linear estimate a + b - c, ties favoring
    left then up."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass grid: (x_start, x_step, y_start, y_step) per pass
_ADAM7 = (
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)


def _adam7_pass_dims(width: int, height: int) -> list[tuple[int, int]]:
    """(pass width, pass height) for each of the 7 Adam7 sub-images —
    zero-dimension passes contribute no scanlines at all (spec §8.2)."""
    return [
        (
            (width - xs + xstep - 1) // xstep,
            (height - ys + ystep - 1) // ystep,
        )
        for xs, xstep, ys, ystep in _ADAM7
    ]


def _png_filter_scanlines(raster: bytes, stride: int, height: int, bpp: int) -> bytes:
    """Filter a raw raster into PNG scanline form, cycling the filter
    type ``y % 5`` so every PNG filter (None/Sub/Up/Average/Paeth)
    appears in any image at least 5 rows tall."""
    out = bytearray()
    prior = bytes(stride)
    for y in range(height):
        line = raster[y * stride : (y + 1) * stride]
        ft = y % 5
        out.append(ft)
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            out.append((line[i] - pred) & 0xFF)
        prior = line
    return bytes(out)


def _png_unfilter(data: bytes, stride: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (all five types incl. Paeth) for
    one image or one Adam7 sub-image: ``data`` is ``(stride+1)·height``
    bytes of filter-byte-prefixed scanlines."""
    raster = bytearray(stride * height)
    prior = bytes(stride)
    for y in range(height):
        ft = data[y * (stride + 1)]
        line = data[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        recon = bytearray(stride)
        for i2 in range(stride):
            left = recon[i2 - bpp] if i2 >= bpp else 0
            up = prior[i2]
            ul = prior[i2 - bpp] if i2 >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            elif ft == 4:
                pred = _paeth(left, up, ul)
            else:
                raise ValueError(f"bad PNG filter type {ft}")
            recon[i2] = (line[i2] + pred) & 0xFF
        raster[y * stride : (y + 1) * stride] = recon
        prior = bytes(recon)
    return raster


def _png_idat_chunks(filtered: bytes) -> bytes:
    """zlib-compress and split across TWO IDAT chunks when possible —
    a decoder behavior a single-chunk fixture never exercises."""
    comp = zlib.compress(filtered, 6)
    mid = len(comp) // 2
    return (
        _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
        if mid
        else _chunk(b"IDAT", comp)
    )


def png_pixel_bytes(
    width: int, height: int, raster: bytes, color_type: int = 2,
    interlace: bool = False,
) -> bytes:
    """REAL PNG encode: 8-bit raster → filtered scanlines → zlib IDAT.

    ``raster`` is ``width * height * channels`` bytes, row-major. Each
    scanline's filter type cycles ``y % 5`` and the compressed stream
    is split across TWO IDAT chunks when possible — both decoder
    behaviors a header-only fixture (:func:`png_bytes`) never
    exercises. ``interlace=True`` writes Adam7: the raster is gathered
    into the seven pass sub-images, each filtered independently, all
    compressed into one zlib stream (spec §8.2)."""
    bpp = _PNG_CHANNELS[color_type]
    stride = width * bpp
    if len(raster) != stride * height:
        raise ValueError(f"raster must be {stride * height} bytes, got {len(raster)}")
    if interlace:
        parts = []
        for (xs, xstep, ys, ystep), (pw, ph) in zip(
            _ADAM7, _adam7_pass_dims(width, height)
        ):
            if pw == 0 or ph == 0:
                continue
            sub = bytearray(pw * ph * bpp)
            for py in range(ph):
                fy = ys + py * ystep
                for px_i in range(pw):
                    fx = xs + px_i * xstep
                    src = (fy * width + fx) * bpp
                    dst = (py * pw + px_i) * bpp
                    sub[dst : dst + bpp] = raster[src : src + bpp]
            parts.append(_png_filter_scanlines(bytes(sub), pw * bpp, ph, bpp))
        filtered = b"".join(parts)
    else:
        filtered = _png_filter_scanlines(raster, stride, height, bpp)
    ihdr_body = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    return (
        _PNG_SIG + _chunk(b"IHDR", ihdr_body) + _png_idat_chunks(filtered)
        + _chunk(b"IEND", b"")
    )


def png_pixel16_bytes(
    width: int, height: int, samples: list[int], color_type: int = 0,
    interlace: bool = False,
) -> bytes:
    """REAL 16-bit PNG encode: ``samples`` is ``width·height·channels``
    big-endian u16 values (depth maps, scientific imagery — ML corpora
    where 8 bits clip the dynamic range). Packs to the 2-byte-per-sample
    raster and reuses the 8-bit encoder's filter machinery at
    ``bpp = 2·channels`` (PNG filters operate on bytes regardless of
    depth, spec §9)."""
    ch = _PNG_CHANNELS[color_type]
    if color_type == 3:
        raise ValueError("palette PNGs are 8-bit only")
    if len(samples) != width * height * ch:
        raise ValueError(f"need {width * height * ch} samples, got {len(samples)}")
    raster = struct.pack(f">{len(samples)}H", *samples)
    pxb = 2 * ch
    stride = width * pxb
    if interlace:
        parts = []
        for (xs, xstep, ys, ystep), (pw, ph) in zip(
            _ADAM7, _adam7_pass_dims(width, height)
        ):
            if pw == 0 or ph == 0:
                continue
            sub = bytearray(pw * ph * pxb)
            for py in range(ph):
                fy = ys + py * ystep
                for px_i in range(pw):
                    fx = xs + px_i * xstep
                    src = (fy * width + fx) * pxb
                    dst = (py * pw + px_i) * pxb
                    sub[dst : dst + pxb] = raster[src : src + pxb]
            parts.append(_png_filter_scanlines(bytes(sub), pw * pxb, ph, pxb))
        filtered = b"".join(parts)
    else:
        filtered = _png_filter_scanlines(raster, stride, height, pxb)
    ihdr_body = struct.pack(
        ">IIBBBBB", width, height, 16, color_type, 0, 0, 1 if interlace else 0
    )
    return (
        _PNG_SIG + _chunk(b"IHDR", ihdr_body) + _png_idat_chunks(filtered)
        + _chunk(b"IEND", b"")
    )


def bmp_bytes(
    width: int, height: int, rgb: bytes, palette: bytes | None = None
) -> bytes:
    """REAL BMP encode (round 10 — the uncompressed scan/screenshot
    format): BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, BOTTOM-UP
    rows padded to 4 bytes. 24-bit BGR when ``palette`` is None
    (``rgb`` = RGB triples, swizzled to the on-disk BGR order), else
    8-bit indexed over a BGRA color table (``rgb`` = index bytes)."""
    if palette is None:
        if len(rgb) != width * height * 3:
            raise ValueError(f"need {width * height * 3} RGB bytes")
        bpp, table = 24, b""
        rowbytes = width * 3
    else:
        n = len(palette) // 3
        if len(palette) % 3 or not 1 <= n <= 256:
            raise ValueError("palette must be 1..256 RGB triples")
        if len(rgb) != width * height:
            raise ValueError(f"need {width * height} index bytes")
        if rgb and max(rgb) >= n:
            raise ValueError("index past the palette")
        bpp = 8
        table = b"".join(
            bytes([palette[3 * j + 2], palette[3 * j + 1], palette[3 * j], 0])
            for j in range(n)
        )
        rowbytes = width
    pad = (-rowbytes) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        if bpp == 24:
            row = bytearray()
            for x in range(width):
                j = 3 * (y * width + x)
                row += bytes([rgb[j + 2], rgb[j + 1], rgb[j]])  # RGB -> BGR
            rows.append(bytes(row) + b"\x00" * pad)
        else:
            rows.append(rgb[y * width : (y + 1) * width] + b"\x00" * pad)
    pixel_data = b"".join(rows)
    offset = 14 + 40 + len(table)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(pixel_data), 2835, 2835,
        len(table) // 4, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset)
    return header + info + table + pixel_data


@decode_valueerror_contract
def bmp_decode_pixels(b: bytes) -> dict:
    """REAL BMP decode: header walk, bottom-up row un-padding, BGR→RGB
    swizzle (24-bit) or color-table lookup (8-bit indexed). Top-down
    BMPs (negative height) are handled; compressed BMPs raise."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack("<I", b[10:14])[0]
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs not supported")
    width, height = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    compression = struct.unpack("<I", b[30:34])[0]
    n_colors = struct.unpack("<I", b[46:50])[0]
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("BMP with zero-area frame")
    if compression != 0:
        raise ValueError("compressed BMPs not supported")
    if bpp not in (8, 24):
        raise ValueError(f"only 8/24-bit BMPs supported, got {bpp}")
    if 3 * width * height > _MAX_DECODED_BYTES:
        raise ValueError("BMP declares implausible dimensions")
    table = None
    if bpp == 8:
        if n_colors == 0:
            n_colors = 256
        t0 = 14 + hdr_size
        table = b[t0 : t0 + 4 * n_colors]
        if len(table) < 4 * n_colors:
            raise ValueError("truncated BMP color table")
    rowbytes = width * (3 if bpp == 24 else 1)
    stride = rowbytes + ((-rowbytes) % 4)
    if offset + stride * height > len(b):
        raise ValueError("truncated BMP pixel data")
    rgb = bytearray(3 * width * height)
    for ry in range(height):
        y = ry if top_down else height - 1 - ry
        row = b[offset + ry * stride : offset + ry * stride + rowbytes]
        if bpp == 24:
            for x in range(width):
                j = 3 * (y * width + x)
                rgb[j] = row[3 * x + 2]
                rgb[j + 1] = row[3 * x + 1]
                rgb[j + 2] = row[3 * x]
        else:
            for x in range(width):
                v = row[x]
                if v * 4 + 3 > len(table):
                    raise ValueError("BMP index past the color table")
                j = 3 * (y * width + x)
                rgb[j] = table[4 * v + 2]
                rgb[j + 1] = table[4 * v + 1]
                rgb[j + 2] = table[4 * v]
    return {
        "media_type": "image/bmp",
        "width": width,
        "height": height,
        "channels": 3,
        "bit_depth": 8,
        "bpp": bpp,
        "top_down": top_down,
        "palette_size": (n_colors if bpp == 8 else None),
        "raster": bytes(rgb),
    }


def png_palette_bytes(width: int, height: int, indices: bytes, palette: bytes) -> bytes:
    """REAL indexed-color (type 3) PNG encode: ``indices`` is one
    palette index per pixel, ``palette`` the PLTE body (flat RGB
    triples, ≤ 256 entries). Index scanlines get the same cycling
    filters as the truecolor encoder (bpp = 1 — filters operate on
    index BYTES, not colors, per spec §9), and the PLTE chunk sits
    between IHDR and IDAT as required. Palette PNGs dominate
    web-scraped icon/sprite corpora (round-8 VERDICT item 5)."""
    if len(indices) != width * height:
        raise ValueError(f"indices must be {width * height} bytes, got {len(indices)}")
    if not palette or len(palette) % 3 or len(palette) > 768:
        raise ValueError("palette must be 1..256 RGB triples")
    if max(indices) >= len(palette) // 3:
        raise ValueError("index out of palette range")
    filtered = _png_filter_scanlines(indices, width, height, 1)
    ihdr_body = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (
        _PNG_SIG + _chunk(b"IHDR", ihdr_body) + _chunk(b"PLTE", palette)
        + _png_idat_chunks(filtered) + _chunk(b"IEND", b"")
    )


def png_subbyte_bytes(
    width: int, height: int, samples, depth: int, color_type: int = 0,
    palette: bytes | None = None, interlace: bool = False,
) -> bytes:
    """REAL 1/2/4-bit PNG encode (round 11): ``samples`` is one value
    per pixel (< 2^depth) — gray (type 0) or palette indices (type 3).
    Rows pack MSB-first and are byte-padded (spec §7.2), THEN filtered
    with the usual cycling types at bpp=1 — including per-pass inside
    Adam7, where each pass's sub-image is packed and padded on its own
    grid (the corner real decoders get wrong)."""
    if depth not in (1, 2, 4):
        raise ValueError("sub-byte depth must be 1, 2 or 4")
    if color_type not in (0, 3):
        raise ValueError("sub-byte PNGs are gray (0) or palette (3) only")
    if len(samples) != width * height:
        raise ValueError(f"need {width * height} samples, got {len(samples)}")
    if max(samples) >= (1 << depth):
        raise ValueError("sample exceeds the declared depth")
    if color_type == 3:
        if not palette or len(palette) % 3 or len(palette) > 768:
            raise ValueError("palette must be 1..256 RGB triples")
        if max(samples) >= len(palette) // 3:
            raise ValueError("index out of palette range")

    per = 8 // depth

    def pack(vals, pw: int, ph: int) -> bytes:
        sw = (pw * depth + 7) // 8
        out = bytearray(sw * ph)
        for y in range(ph):
            for x in range(pw):
                out[y * sw + x // per] |= vals[y * pw + x] << (
                    8 - depth * (x % per + 1)
                )
        return bytes(out)

    if interlace:
        parts = []
        for (xs, xstep, ys, ystep), (pw, ph) in zip(
            _ADAM7, _adam7_pass_dims(width, height)
        ):
            if pw == 0 or ph == 0:
                continue
            sub = [
                samples[(ys + py * ystep) * width + xs + px_i * xstep]
                for py in range(ph)
                for px_i in range(pw)
            ]
            parts.append(
                _png_filter_scanlines(pack(sub, pw, ph), (pw * depth + 7) // 8, ph, 1)
            )
        filtered = b"".join(parts)
    else:
        sw = (width * depth + 7) // 8
        filtered = _png_filter_scanlines(pack(samples, width, height), sw, height, 1)
    ihdr_body = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, 1 if interlace else 0
    )
    plte = _chunk(b"PLTE", palette) if color_type == 3 else b""
    return (
        _PNG_SIG + _chunk(b"IHDR", ihdr_body) + plte
        + _png_idat_chunks(filtered) + _chunk(b"IEND", b"")
    )


def _png_inflate(idat: bytes, expected: int) -> bytes:
    """Bounded IDAT inflate: cap at exactly the declared size (+1 probe
    to detect overruns) so a decompression bomb fails as ValueError,
    never a stage-killing MemoryError (fuzz-found, round 8)."""
    obj = zlib.decompressobj()
    try:
        data = obj.decompress(bytes(idat), expected)
        # consume the end-of-stream marker + adler32 (bounded: a bomb
        # yields a nonzero byte here instead of gigabytes of inflate)
        extra = obj.decompress(obj.unconsumed_tail, 1) if not obj.eof else b""
    except zlib.error as e:  # header-only or corrupt stream
        raise ValueError(f"PNG IDAT stream undecodable: {e}") from e
    if extra or len(data) != expected or not obj.eof:
        raise ValueError("IDAT payload does not match dimensions")
    return data


def _png_decode_subbyte(
    b: bytes, width: int, height: int, depth: int, color_type: int,
    interlace: int, idat: bytes, palette: bytes | None,
) -> dict:
    """1/2/4-bit PNG decode (round 11 — binarized scans, icons, small
    palettes): filters operate on the PACKED bytes with bpp=1 (spec §9
    rounds sub-byte pixel widths up to one byte), each scanline —
    including every Adam7 pass's — is byte-padded, then samples unpack
    MSB-first. Gray scales to 8-bit by the exact replication factor
    (255, 85, 17 for depths 1/2/4); palette indices map through PLTE
    unscaled."""
    if width == 0 or height == 0:
        raise ValueError("PNG with zero-area raster")
    if width * height * (3 if color_type == 3 else 1) > _MAX_DECODED_BYTES:
        raise ValueError("PNG declares implausible dimensions")

    def rowbytes(pw: int) -> int:
        return (pw * depth + 7) // 8

    per = 8 // depth
    mask = (1 << depth) - 1

    def expand(sub: bytes, pw: int, ph: int) -> bytearray:
        out = bytearray(pw * ph)
        sw = rowbytes(pw)
        for y in range(ph):
            row = sub[y * sw : (y + 1) * sw]
            base = y * pw
            for x in range(pw):
                out[base + x] = (
                    row[x // per] >> (8 - depth * (x % per + 1))
                ) & mask
        return out

    if interlace:
        expected = sum(
            (rowbytes(pw) + 1) * ph
            for pw, ph in _adam7_pass_dims(width, height)
            if pw and ph
        )
        data = _png_inflate(idat, expected)
        samples = bytearray(width * height)
        pos = 0
        for (xs, xstep, ys, ystep), (pw, ph) in zip(
            _ADAM7, _adam7_pass_dims(width, height)
        ):
            if pw == 0 or ph == 0:
                continue
            sw = rowbytes(pw)
            sub = _png_unfilter(data[pos : pos + (sw + 1) * ph], sw, ph, 1)
            pos += (sw + 1) * ph
            vals = expand(sub, pw, ph)
            for py in range(ph):
                fy = ys + py * ystep
                for px_i in range(pw):
                    samples[fy * width + xs + px_i * xstep] = vals[py * pw + px_i]
        if pos != len(data):
            raise ValueError("IDAT payload does not match dimensions")
    else:
        sw = rowbytes(width)
        data = _png_inflate(idat, (sw + 1) * height)
        samples = expand(_png_unfilter(data, sw, height, 1), width, height)
    palette_size = None
    if color_type == 0:
        scale = 255 // mask
        raster = bytes(v * scale for v in samples)
        channels = 1
    else:
        palette_size = len(palette) // 3
        rgb = bytearray(width * height * 3)
        for j, idx in enumerate(samples):
            if idx >= palette_size:
                raise ValueError("palette index out of PLTE range")
            rgb[3 * j : 3 * j + 3] = palette[3 * idx : 3 * idx + 3]
        raster = bytes(rgb)
        channels = 3
    return {
        "media_type": "image/png",
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": depth,
        "palette_size": palette_size,
        "raster": raster,
    }


@decode_valueerror_contract
def png_decode_pixels(b: bytes) -> dict:
    """REAL PNG pixel decode, stdlib only: walk the chunk stream,
    concatenate every IDAT, ``zlib.decompress``, then reverse the
    per-scanline filter (all five types incl. Paeth) to recover the
    raw raster. Supports 8/16-bit gray/RGB/gray+alpha/RGBA, 8-bit
    palette, 1/2/4-bit gray and palette (round 11 — binarized scans,
    icons), each sequential or Adam7-interlaced. Indexed color (type 3)
    unfilters the index scanlines at bpp 1 and maps them through the
    PLTE chunk into an RGB raster; other shapes raise ValueError
    (they'd silently mis-decode otherwise)."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while i + 8 <= len(b):
        length = struct.unpack(">I", b[i : i + 4])[0]
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            width, height = struct.unpack(">II", body[:8])
            bit_depth, color_type, _, _, interlace = struct.unpack("BBBBB", body[8:13])
        elif tag == b"PLTE":
            palette = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + length  # len + tag + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if (
        bit_depth not in (1, 2, 4, 8, 16)
        or color_type not in _PNG_CHANNELS
        or interlace not in (0, 1)
        or (bit_depth == 16 and color_type == 3)  # illegal per spec
        or (bit_depth < 8 and color_type not in (0, 3))  # spec table 11.1
    ):
        raise ValueError(
            f"unsupported PNG shape (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}): 8/16-bit gray/RGB/LA/RGBA, 1/2/4-bit "
            f"gray or palette, sequential or Adam7"
        )
    if color_type == 3 and (palette is None or not palette or len(palette) % 3):
        raise ValueError("palette PNG missing a well-formed PLTE chunk")
    if bit_depth < 8:
        return _png_decode_subbyte(
            b, width, height, bit_depth, color_type, interlace, idat, palette
        )
    channels = _PNG_CHANNELS[color_type]
    # filters operate on BYTES with a bpp offset (spec §9): a 16-bit
    # pixel is channels*2 bytes wide everywhere below
    pxb = channels * (bit_depth // 8)
    if width == 0 or height == 0:
        # a 0-dim raster has no first/last pixel for downstream stats;
        # treat as undecodable rather than emitting an empty raster that
        # IndexErrors past the ValueError contract (round-8 ADVICE).
        raise ValueError("PNG with zero-area raster")
    stride = width * pxb
    if interlace:
        expected = sum(
            (pw * pxb + 1) * ph
            for pw, ph in _adam7_pass_dims(width, height)
            if pw and ph
        )
    else:
        expected = (stride + 1) * height
    # Allocation guard (fuzz-found): a bit-flipped IHDR can declare
    # absurd dimensions, and a hostile IDAT can be a decompression bomb
    # — either way the failure must be ValueError, never a
    # stage-killing MemoryError. Bound the declared raster and cap the
    # inflate at exactly the declared size (+1 to detect overruns).
    if expected > _MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG declares {expected} decoded bytes "
            f"(cap {_MAX_DECODED_BYTES}): implausible dimensions"
        )
    data = _png_inflate(idat, expected)
    if interlace:
        # Adam7: seven independently-filtered sub-images in one zlib
        # stream; unfilter each pass then scatter its pixels onto the
        # final grid (spec §8.2). Empty passes contribute no bytes.
        raster = bytearray(stride * height)
        pos = 0
        for (xs, xstep, ys, ystep), (pw, ph) in zip(
            _ADAM7, _adam7_pass_dims(width, height)
        ):
            if pw == 0 or ph == 0:
                continue
            pstride = pw * pxb
            sub = _png_unfilter(
                data[pos : pos + (pstride + 1) * ph], pstride, ph, pxb
            )
            pos += (pstride + 1) * ph
            for py in range(ph):
                fy = ys + py * ystep
                for px_i in range(pw):
                    fx = xs + px_i * xstep
                    dst = (fy * width + fx) * pxb
                    src = (py * pw + px_i) * pxb
                    raster[dst : dst + pxb] = sub[src : src + pxb]
        if pos != len(data):
            raise ValueError("IDAT payload does not match dimensions")
    else:
        raster = _png_unfilter(data, stride, height, pxb)
    palette_size = None
    if color_type == 3:
        # map the unfiltered INDEX bytes through PLTE into an RGB raster
        palette_size = len(palette) // 3
        rgb = bytearray(width * height * 3)
        for j, idx in enumerate(raster):
            if idx >= palette_size:
                raise ValueError("palette index out of PLTE range")
            rgb[3 * j : 3 * j + 3] = palette[3 * idx : 3 * idx + 3]
        raster = rgb
        channels = 3
    out = {
        "media_type": "image/png",
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": bit_depth,
        "palette_size": palette_size,
        "raster": bytes(raster),
    }
    if bit_depth == 16:
        # big-endian u16 samples (spec §7.1), decoded for sample-level
        # stats; the raw raster stays available for re-encode paths
        out["samples16"] = list(
            struct.unpack(f">{width * height * channels}H", bytes(raster))
        )
    return out


def wav_pcm_bytes(channels: int, sample_rate: int, samples: list[int], bits: int = 16) -> bytes:
    """PCM WAV with REAL sample data (``samples`` is the interleaved
    int16 stream) — the non-silent sibling of :func:`wav_bytes`, so
    sample-level decode and feature extraction have actual signal to
    recover. ``bits`` selects the pack format (8-bit unsigned, or
    16/24/32-bit signed — 24-bit is the studio-master depth, round 12)
    so the header and the data chunk always agree — writing a 16-bit
    stream under an 8-bit header produced a corrupt WAV (round-8
    ADVICE)."""
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        data = struct.pack(f"<{len(samples)}B", *samples)
    elif bits == 24:
        data = b"".join(v.to_bytes(3, "little", signed=True) for v in samples)
    elif bits == 32:
        data = struct.pack(f"<{len(samples)}i", *samples)
    else:
        raise ValueError(f"only 8/16/24/32-bit PCM supported, got {bits}")
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_float_bytes(
    channels: int, sample_rate: int, samples: list[float], bits: int = 32
) -> bytes:
    """IEEE-float WAV (format tag 3, round 13 — the last WAV-format
    refusal retired): ``samples`` is the interleaved float stream,
    packed little-endian float32 or float64. Non-PCM formats carry a
    ``fact`` chunk with the per-channel frame count (RIFF spec). The
    DAW-export format: nominal full scale is ±1.0 but values are NOT
    clamped — float WAV's point is headroom above 0 dBFS."""
    if bits == 32:
        data = struct.pack(f"<{len(samples)}f", *samples)
    elif bits == 64:
        data = struct.pack(f"<{len(samples)}d", *samples)
    else:
        raise ValueError(f"IEEE-float WAV must be 32 or 64 bits, got {bits}")
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 3, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    fact = struct.pack("<I", len(samples) // channels)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", 4) + fact
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ulaw_expand(u: int) -> int:
    """G.711 µ-law code byte → 16-bit linear sample (segment + mantissa
    expansion with the 0x84 bias; code bytes are stored complemented)."""
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def alaw_expand(a: int) -> int:
    """G.711 A-law code byte → 16-bit linear sample (even bits are
    stored inverted — the 0x55 toggle)."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def wav_g711_bytes(channels: int, sample_rate: int, codes: bytes, law: str) -> bytes:
    """WAV container around raw G.711 code bytes: format tag 6 (A-law)
    or 7 (µ-law), 8 bits per code — the telephony WAV layout."""
    if law not in ("alaw", "ulaw"):
        raise ValueError("law must be 'alaw' or 'ulaw'")
    fmt_code = 6 if law == "alaw" else 7
    byte_rate = sample_rate * channels
    fmt = struct.pack("<HHIIHH", fmt_code, channels, sample_rate, byte_rate, channels, 8)
    data = bytes(codes)
    riff = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# IMA ADPCM (WAV format tag 17, round 11): the 89-entry step-size table
# and the 8-entry index-adjust table from the IMA reference algorithm —
# the 4-bit nibble codec used by classic .wav voice recordings and games.
_IMA_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def wav_adpcm_bytes(
    sample_rate: int,
    blocks: list,
    samples_per_block: int,
    channels: int = 1,
) -> bytes:
    """WAV container around IMA ADPCM blocks (format tag 0x11).

    Mono: each block is ``(init_pred, init_idx, nibbles)`` with exactly
    ``samples_per_block - 1`` nibbles: the 4-byte block header carries
    the int16 predictor (which IS the block's first output sample) and
    the step index, then nibbles pack two per byte, LOW nibble first.
    Multichannel (stereo round 11, generalized to any channel count
    round 13 — the refusal retired): each block is a list of
    ``channels`` of those tuples, the header carries every channel's
    4-byte seed in order, and nibble data interleaves 4-byte words
    (8 samples) per channel rotating channel 0..N-1 — the standard
    layout, which requires ``samples_per_block - 1`` divisible by 8.
    The fmt chunk carries the 2-byte extension (wSamplesPerBlock) and a
    ``fact`` chunk the total per-channel sample count."""
    if channels < 1:
        raise ValueError("IMA ADPCM WAV needs at least 1 channel")
    n_nib = samples_per_block - 1
    chunks = []
    if channels == 1:
        block_align = 4 + (n_nib + 1) // 2
        for pred, idx, nibs in blocks:
            if len(nibs) != n_nib:
                raise ValueError("block nibble count != samples_per_block - 1")
            body = bytearray(struct.pack("<hBB", pred, idx, 0))
            for j in range(0, n_nib, 2):
                lo = nibs[j] & 0x0F
                hi = (nibs[j + 1] & 0x0F) << 4 if j + 1 < n_nib else 0
                body.append(lo | hi)
            chunks.append(bytes(body))
    else:
        if n_nib % 8:
            raise ValueError(
                "multichannel IMA ADPCM needs samples_per_block - 1 divisible by 8"
            )
        # one 4-byte header per channel + interleaved words
        block_align = 4 * channels + n_nib * channels // 2
        for chans in blocks:
            if len(chans) != channels:
                raise ValueError(
                    f"block must carry {channels} channel tuples, got {len(chans)}"
                )
            body = bytearray()
            for pred, idx, nibs in chans:
                if len(nibs) != n_nib:
                    raise ValueError("block nibble count != samples_per_block - 1")
                body += struct.pack("<hBB", pred, idx, 0)
            for g in range(n_nib // 8):  # 4-byte word per channel, rotating
                for pred, idx, nibs in chans:
                    for j in range(g * 8, g * 8 + 8, 2):
                        body.append((nibs[j] & 0x0F) | ((nibs[j + 1] & 0x0F) << 4))
            chunks.append(bytes(body))
    data = b"".join(chunks)
    byte_rate = sample_rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 17, channels, sample_rate, byte_rate, block_align, 4, 2,
        samples_per_block,
    )
    fact = struct.pack("<I", samples_per_block * len(blocks))
    riff = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _adpcm_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """One IMA nibble: move the predictor by the step-table delta
    (diff = step>>3 plus step, step>>1, step>>2 for bits 4/2/1; bit 8
    is the sign), clamp to int16, nudge the step index."""
    step = _IMA_STEP[idx]
    diff = step >> 3
    if nib & 4:
        diff += step
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step >> 2
    pred = pred - diff if nib & 8 else pred + diff
    return (
        max(-32768, min(32767, pred)),
        max(0, min(88, idx + _IMA_INDEX[nib & 7])),
    )


def _adpcm_seed(blk: bytes, off: int) -> tuple[int, int]:
    pred = struct.unpack("<h", blk[off : off + 2])[0]
    idx = blk[off + 2]
    if idx > 88:
        raise ValueError(f"IMA ADPCM step index {idx} out of range")
    return pred, idx


def _adpcm_decode_block(blk: bytes, n_samples: int) -> list[int]:
    """One mono IMA ADPCM block → linear samples: header predictor is
    sample 0, then nibbles walk LOW-first."""
    pred, idx = _adpcm_seed(blk, 0)
    out = [pred]
    for j in range(n_samples - 1):
        byte = blk[4 + (j >> 1)]
        nib = (byte >> 4) if (j & 1) else (byte & 0x0F)
        pred, idx = _adpcm_step(pred, idx, nib)
        out.append(pred)
    return out


def _adpcm_decode_block_multi(blk: bytes, n_samples: int, channels: int) -> list[int]:
    """One multichannel IMA ADPCM block → INTERLEAVED linear samples:
    one 4-byte header per channel, then nibble data in rotating 4-byte
    words (8 samples per word, one word per channel 0..N-1) — the
    standard layout, stereo round 11, any channel count round 13. Each
    channel's state machine is independent."""
    state = [_adpcm_seed(blk, 4 * c) for c in range(channels)]
    chans: list[list[int]] = [[s[0]] for s in state]
    off = 4 * channels
    for _ in range((n_samples - 1) // 8):
        for c in range(channels):
            pred, idx = state[c]
            for byte in blk[off : off + 4]:
                for nib in (byte & 0x0F, byte >> 4):
                    pred, idx = _adpcm_step(pred, idx, nib)
                    chans[c].append(pred)
            state[c] = (pred, idx)
            off += 4
    return [chans[c][i] for i in range(n_samples) for c in range(channels)]


# MS ADPCM (WAV format tag 0x02, round 14 — the last mechanically-
# implementable WAV refusal retired): Microsoft's block codec with a
# TWO-TAP linear predictor chosen per block from a coefficient table
# carried in the fmt-chunk extension, plus a per-nibble adaptive delta.
# Constants from the public Microsoft Multimedia Standards Update spec:
# the 16-entry delta-adaptation table and the 7 standard coefficient
# pairs (a stream may declare more pairs; this decoder reads the table
# from the stream, standard-first). Spec pseudo-code divides by 256
# with C semantics — TRUNCATION toward zero — which ffmpeg matches
# exactly (its /64 over coef/4 tables); libsndfile's >>8 floors and can
# differ by 1 LSB on negative predictor sums, a known ecosystem
# divergence we resolve in the spec/ffmpeg direction.
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
_MS_COEF = (
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
    (460, -208), (392, -232),
)


def _trunc_div_256(v: int) -> int:
    """C-style `/ 256`: truncation toward zero (Python // floors)."""
    return v // 256 if v >= 0 else -((-v) // 256)


def wav_msadpcm_bytes(
    sample_rate: int,
    blocks: list,
    samples_per_block: int,
    channels: int = 1,
    coefs: tuple = _MS_COEF,
) -> bytes:
    """WAV container around MS ADPCM blocks (format tag 0x02).

    Mono: each block is ``(coef_idx, delta0, samp1, samp2, nibbles)``
    with exactly ``samples_per_block - 2`` nibbles — the 7-byte block
    header carries the coefficient-pair index, the initial delta and
    the two seed samples (which ARE the block's first two outputs,
    samp2 then samp1). Multichannel: each block is a list of
    ``channels`` of those tuples; the header carries all predictor
    bytes, then all int16 deltas, then all samp1, then all samp2, and
    data nibbles rotate channel 0..N-1 per NIBBLE, packed HIGH nibble
    first (the opposite of IMA's low-first order). The fmt chunk
    carries the full extension: wSamplesPerBlock, wNumCoef and every
    coefficient pair, standard-first, as real encoders write it."""
    if channels < 1:
        raise ValueError("MS ADPCM WAV needs at least 1 channel")
    if samples_per_block < 2:
        raise ValueError("MS ADPCM needs samples_per_block >= 2 (the header seeds)")
    n_nib = samples_per_block - 2
    if (n_nib * channels) % 2:
        raise ValueError("MS ADPCM block nibbles must fill whole bytes")
    block_align = 7 * channels + n_nib * channels // 2
    chunks = []
    for blk in blocks:
        chans = [blk] if channels == 1 else list(blk)
        if len(chans) != channels:
            raise ValueError(
                f"block must carry {channels} channel tuples, got {len(chans)}"
            )
        body = bytearray()
        for ci, _, _, _, nibs in chans:
            if not 0 <= ci < len(coefs):
                raise ValueError(f"MS ADPCM predictor index {ci} out of range")
            if len(nibs) != n_nib:
                raise ValueError("block nibble count != samples_per_block - 2")
            body.append(ci)
        for field in (1, 2, 3):  # delta0, samp1, samp2 — per channel
            for tup in chans:
                body += struct.pack("<h", tup[field])
        nib_seq = [
            chans[k % channels][4][k // channels]
            for k in range(n_nib * channels)
        ]
        for j in range(0, len(nib_seq), 2):
            body.append(((nib_seq[j] & 0x0F) << 4) | (nib_seq[j + 1] & 0x0F))
        chunks.append(bytes(body))
    data = b"".join(chunks)
    byte_rate = sample_rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHHH",
        2, channels, sample_rate, byte_rate, block_align, 4,
        4 + 4 * len(coefs),  # cbSize: spb + num + pairs
        samples_per_block, len(coefs),
    ) + b"".join(struct.pack("<hh", c1, c2) for c1, c2 in coefs)
    fact = struct.pack("<I", samples_per_block * len(blocks))
    riff = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _msadpcm_decode_block(
    blk: bytes, channels: int, coefs: list, spb: int
) -> list:
    """One MS ADPCM block → INTERLEAVED linear samples. The 7·channels
    header bytes seed each channel's (coef pair, delta, samp1, samp2);
    outputs start with the seeds themselves (samp2 then samp1 — they
    are samples 0 and 1), then each HIGH-first nibble k (channel
    k mod channels) moves that channel's predictor:
    trunc((s1·c1 + s2·c2)/256) + signed_nibble·delta, int16-clamped,
    with delta re-adapted through the 16-entry table (floor 16)."""
    preds = blk[:channels]
    for p in preds:
        if p >= len(coefs):
            raise ValueError(f"MS ADPCM predictor index {p} out of range")
    off = channels
    delta = list(struct.unpack(f"<{channels}h", blk[off : off + 2 * channels]))
    off += 2 * channels
    s1 = list(struct.unpack(f"<{channels}h", blk[off : off + 2 * channels]))
    off += 2 * channels
    s2 = list(struct.unpack(f"<{channels}h", blk[off : off + 2 * channels]))
    off += 2 * channels
    chans = [[s2[c], s1[c]] for c in range(channels)]
    n_nib = (spb - 2) * channels
    nibs = []
    for byte in blk[off:]:
        nibs.append(byte >> 4)
        nibs.append(byte & 0x0F)
    for k in range(n_nib):
        c = k % channels
        nib = nibs[k]
        c1, c2 = coefs[preds[c]]
        pred = _trunc_div_256(s1[c] * c1 + s2[c] * c2) + (
            nib - 16 if nib >= 8 else nib
        ) * delta[c]
        pred = max(-32768, min(32767, pred))
        s2[c], s1[c] = s1[c], pred
        chans[c].append(pred)
        d = _trunc_div_256(_MS_ADAPT[nib] * delta[c])
        delta[c] = d if d >= 16 else 16
    return [chans[c][i] for i in range(spb) for c in range(channels)]


@decode_valueerror_contract
def wav_decode_samples(b: bytes) -> dict:
    """REAL WAV sample decode: RIFF chunk walk to ``fmt ``/``data``,
    then unpack the interleaved samples — integer PCM (fmt 1: 8-bit
    unsigned, 16/24/32-bit signed — 24-bit joined in round 12),
    IEEE-float (fmt 3: float32/float64, round 13 — samples stay
    floats, never scaled onto an int grid), G.711 A-law/µ-law
    (fmt 6/7, round 10) whose 8-bit code bytes expand to 16-bit
    linear through the segment + mantissa formulas, IMA ADPCM
    (fmt 17, any channel count since round 13), or MS ADPCM (fmt 2,
    round 14 — two-tap predictor from the stream's own coefficient
    table, spec/ffmpeg truncating division)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i = 12
    channels = rate = bits = fmt_code = None
    block_align = samples_per_block = None
    ms_coefs = None
    data = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        sz = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and sz >= 16:
            fmt_code, channels, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", b[i + 8 : i + 24]
            )
            if fmt_code not in (1, 2, 3, 6, 7, 17):
                raise ValueError(
                    "only PCM/MS-ADPCM/IEEE-float/A-law/u-law/IMA-ADPCM "
                    f"(fmt 1/2/3/6/7/17) supported, got {fmt_code}"
                )
            if fmt_code == 17:
                # the 2-byte extension: samples decoded per block
                if sz < 20:
                    raise ValueError("IMA ADPCM fmt chunk missing wSamplesPerBlock")
                samples_per_block = struct.unpack("<H", b[i + 26 : i + 28])[0]
            elif fmt_code == 2:
                # MS ADPCM extension: wSamplesPerBlock, wNumCoef, then
                # the coefficient-pair table the block headers index —
                # a real decoder MUST read it from the stream (encoders
                # may append pairs beyond the 7 standard ones)
                if sz < 22:
                    raise ValueError(
                        "MS ADPCM fmt chunk missing wSamplesPerBlock/wNumCoef"
                    )
                samples_per_block, n_coef = struct.unpack(
                    "<HH", b[i + 26 : i + 30]
                )
                if n_coef < 1:
                    raise ValueError("MS ADPCM needs at least one coefficient pair")
                if sz < 22 + 4 * n_coef:
                    raise ValueError("MS ADPCM fmt chunk truncates its coefficient table")
                ms_coefs = [
                    struct.unpack("<hh", b[i + 30 + 4 * k : i + 34 + 4 * k])
                    for k in range(n_coef)
                ]
        elif cid == b"data":
            data = b[i + 8 : i + 8 + sz]
        i += 8 + sz + (sz & 1)
    if channels is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if channels < 1:
        # a zero-channel fmt chunk would divide-by-zero in the
        # n_samples computation — a ZeroDivisionError escaping the
        # ValueError contract (found by a round-13 poison probe)
        raise ValueError("WAV fmt chunk declares zero channels")
    encoding = {
        1: "pcm", 2: "ms_adpcm", 3: "float", 6: "alaw", 7: "ulaw",
        17: "ima_adpcm",
    }[fmt_code]
    if fmt_code in (1, 3, 6, 7):
        # strict decode contract (ADVICE r13): a data chunk that is
        # not a whole number of frames (sample width × channels) is a
        # truncated or mis-framed stream — raise, never silently drop
        # the ragged tail (the module's rule elsewhere: explicit
        # ValueError, no silent partial decode)
        width = 1 if fmt_code in (6, 7) else max(1, bits // 8)
        if len(data) % (width * channels):
            raise ValueError(
                f"WAV data chunk ({len(data)} bytes) is not whole "
                f"{width * channels}-byte frames ({bits}-bit × "
                f"{channels} ch)"
            )
    if fmt_code == 3:
        # IEEE-float (round 13): samples stay floats — float WAV's
        # point is headroom above nominal ±1.0 full scale, so scaling
        # to an int grid would silently clip; downstream stats consume
        # the floats directly
        if bits == 32:
            samples = list(
                struct.unpack(f"<{len(data) // 4}f", data[: len(data) // 4 * 4])
            )
        elif bits == 64:
            samples = list(
                struct.unpack(f"<{len(data) // 8}d", data[: len(data) // 8 * 8])
            )
        else:
            raise ValueError(f"IEEE-float WAV must be 32 or 64 bits, got {bits}")
        if not samples:
            raise ValueError("WAV with empty data chunk")
        return {
            "media_type": "audio/wav",
            "channels": channels,
            "sample_rate": rate,
            "bits": bits,
            "encoding": encoding,
            "n_samples": len(samples) // channels,
            "samples": samples,
        }
    if fmt_code == 2:
        if bits != 4:
            raise ValueError(f"MS ADPCM WAV must be 4 bits per sample, got {bits}")
        if not samples_per_block or samples_per_block < 2:
            raise ValueError(
                "MS ADPCM wSamplesPerBlock must be >= 2 (the header seeds)"
            )
        if not block_align or block_align < 7 * channels:
            raise ValueError("MS ADPCM block align smaller than its headers")
        if (block_align - 7 * channels) * 2 != (samples_per_block - 2) * channels:
            raise ValueError(
                "MS ADPCM block geometry inconsistent: "
                f"align {block_align} cannot carry {samples_per_block} "
                f"samples x {channels} ch"
            )
        if len(data) % block_align:
            raise ValueError("MS ADPCM data chunk is not whole blocks")
        samples = []
        for off in range(0, len(data), block_align):
            samples.extend(
                _msadpcm_decode_block(
                    data[off : off + block_align],
                    channels,
                    ms_coefs,
                    samples_per_block,
                )
            )
    elif fmt_code == 17:
        if bits != 4:
            raise ValueError(f"IMA ADPCM WAV must be 4 bits per sample, got {bits}")
        if channels < 1:
            raise ValueError("IMA ADPCM WAV needs at least 1 channel")
        if not samples_per_block or samples_per_block < 1:
            raise ValueError("IMA ADPCM wSamplesPerBlock must be >= 1")
        if not block_align or block_align < 4 * channels:
            raise ValueError("IMA ADPCM block align smaller than its headers")
        if channels == 1:
            if (block_align - 4) * 2 < samples_per_block - 1:
                raise ValueError("IMA ADPCM block too small for wSamplesPerBlock")
        else:
            if (samples_per_block - 1) % 8:
                raise ValueError(
                    "multichannel IMA ADPCM needs wSamplesPerBlock - 1 divisible by 8"
                )
            if block_align < 4 * channels + (samples_per_block - 1) * channels // 2:
                raise ValueError("IMA ADPCM block too small for wSamplesPerBlock")
        if len(data) % block_align:
            raise ValueError("IMA ADPCM data chunk is not whole blocks")
        samples = []
        for off in range(0, len(data), block_align):
            blk = data[off : off + block_align]
            samples.extend(
                _adpcm_decode_block(blk, samples_per_block)
                if channels == 1
                else _adpcm_decode_block_multi(blk, samples_per_block, channels)
            )
    elif fmt_code in (6, 7):
        if bits != 8:
            raise ValueError(f"G.711 WAV must be 8 bits per code, got {bits}")
        expand = alaw_expand if fmt_code == 6 else ulaw_expand
        samples = [expand(c) for c in data]
    elif bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2]))
    elif bits == 8:
        samples = list(data)
    elif bits == 24:
        n = len(data) // 3
        samples = [
            int.from_bytes(data[3 * j : 3 * j + 3], "little", signed=True)
            for j in range(n)
        ]
    elif bits == 32:
        samples = list(struct.unpack(f"<{len(data) // 4}i", data[: len(data) // 4 * 4]))
    else:
        raise ValueError(
            f"only 8/16/24/32-bit integer PCM supported, got {bits} "
            "(IEEE-float streams carry format tag 3, handled above)"
        )
    if not samples:
        # no first/last sample for downstream stats — undecodable,
        # same zero-area rationale as png_decode_pixels.
        raise ValueError("WAV with empty data chunk")
    return {
        "media_type": "audio/wav",
        "channels": channels,
        "sample_rate": rate,
        "bits": bits,
        "encoding": encoding,
        "n_samples": len(samples) // channels,
        "samples": samples,
    }


_EMPTY_MEDIA = {
    "media_type": "application/octet-stream",
    "width": None, "height": None, "channels": None,
    "sample_rate": None, "n_samples": None,
}


def parse_media(b: bytes) -> dict:
    """REAL container decode: sniff the magic and parse the actual
    header bytes. PNG: IHDR width/height/color-type. JPEG: marker scan
    to the SOFn frame header (skipping entropy-agnostic segments by
    their declared lengths). WAV: RIFF chunk walk over fmt/data with
    word alignment. Unknown containers come back as octet-stream with
    NULL metadata rather than raising — at 100 TB some payloads are
    always corrupt, and a poison row must not kill the stage."""
    try:
        if b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            color_type = b[25]
            return {
                "media_type": "image/png", "width": w, "height": h,
                "channels": _PNG_CHANNELS.get(color_type),
                "sample_rate": None, "n_samples": None,
            }
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker == 0xFF:  # fill byte before a marker — not a marker
                    i += 1
                    continue
                if marker == 0x00:  # 0xFF00 byte-stuffing inside entropy data
                    i += 2
                    continue
                if marker == 0xDA:
                    # SOS: entropy-coded data follows with no length-framed
                    # segments — walking further would misread compressed
                    # bytes as markers. No SOFn before SOS → fallback.
                    break
                if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return {
                        "media_type": "image/jpeg", "width": w, "height": h,
                        "channels": b[i + 9],
                        "sample_rate": None, "n_samples": None,
                    }
                i += 2 + seglen
            return dict(_EMPTY_MEDIA)
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return {
                "media_type": "image/bmp", "width": w, "height": abs(h),
                "channels": 3, "sample_rate": None, "n_samples": None,
            }
        if b[:4] in (b"II*\x00", b"MM\x00*"):
            return {
                "media_type": "image/tiff", "width": None, "height": None,
                "channels": None, "sample_rate": None, "n_samples": None,
            }
        if (
            b[:4] == b"fLaC"
            and len(b) >= 42
            and (b[4] & 0x7F) == 0
            and int.from_bytes(b[5:8], "big") == 34
        ):
            # STREAMINFO is mandatory-first per the spec, but a stream
            # whose first block is NOT type-0/34-byte would otherwise be
            # misread as garbage rates — fall through to unknown instead
            si = b[8:42]
            rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            channels = ((si[12] >> 1) & 0x07) + 1
            total = ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big")
            return {
                "media_type": "audio/flac", "width": None, "height": None,
                "channels": channels, "sample_rate": rate,
                "n_samples": total,
            }
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return {
                "media_type": "image/gif", "width": w, "height": h,
                "channels": 3, "sample_rate": None, "n_samples": None,
            }
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            # container-only metadata from the avih main header —
            # width/height/frame count priced without any frame decode
            i = 12
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                sz = struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"LIST" and b[i + 8:i + 12] == b"hdrl":
                    j = i + 12
                    while j + 8 <= i + 8 + sz:
                        scid = b[j:j + 4]
                        ssz = struct.unpack("<I", b[j + 4:j + 8])[0]
                        if scid == b"avih" and ssz >= 40:
                            vals = struct.unpack("<10I", b[j + 8:j + 48])
                            return {
                                "media_type": "video/avi",
                                "width": vals[8], "height": vals[9],
                                "channels": None, "sample_rate": None,
                                "n_samples": vals[4],  # frames
                            }
                        j += 8 + ssz + (ssz & 1)
                i += 8 + sz + (sz & 1)
            return dict(_EMPTY_MEDIA)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            channels = rate = bits = data_size = None
            fmt_code = block_align = samples_per_block = None
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                sz = struct.unpack("<I", b[i + 4:i + 8])[0]
                if cid == b"fmt " and sz >= 16:
                    fmt_code, channels, rate, _, block_align, bits = struct.unpack(
                        "<HHIIHH", b[i + 8:i + 24]
                    )
                    if fmt_code in (2, 17) and sz >= 20:
                        # both ADPCM variants put wSamplesPerBlock first
                        # in the fmt extension
                        samples_per_block = struct.unpack("<H", b[i + 26:i + 28])[0]
                elif cid == b"data":
                    data_size = sz
                i += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
            if fmt_code in (2, 17):
                # block-framed compressed WAV: sample count comes from
                # whole blocks × samples-per-block, not bytes ÷ width
                if channels and block_align and samples_per_block and data_size is not None:
                    return {
                        "media_type": "audio/wav", "width": None, "height": None,
                        "channels": channels, "sample_rate": rate,
                        "n_samples": (data_size // block_align) * samples_per_block,
                    }
            elif channels and bits and bits >= 8 and data_size is not None:
                return {
                    "media_type": "audio/wav", "width": None, "height": None,
                    "channels": channels, "sample_rate": rate,
                    "n_samples": data_size // (channels * bits // 8),
                }
        return dict(_EMPTY_MEDIA)
    except (struct.error, IndexError):
        return dict(_EMPTY_MEDIA)


MEDIA_SCHEMA = "doc_id long, payload binary"

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width long, height long, "
    "channels long, sample_rate long, n_samples long"
)


def synthesize_media(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture a deterministic mixed-media corpus: doc_id % 3 picks
    PNG / JPEG / WAV, with dimensions/channels/rate/samples all simple
    functions of doc_id (so an oracle can verify the DECODE by
    arithmetic — the decoder must parse the real bytes to reproduce
    them). Runs as Arrow-batched mapInPandas: payload construction is
    per-row Python, but it happens inside the executor batch loop, the
    exact production shape for synthetic-media generation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                kind = d % 3
                if kind == 0:
                    payloads.append(
                        png_bytes(d % 509 + 1, d % 251 + 1,
                                  color_type=2 if d % 2 == 0 else 6)
                    )
                elif kind == 1:
                    payloads.append(
                        jpeg_bytes(d % 499 + 1, d % 241 + 1,
                                   n_components=3 if d % 2 == 0 else 1)
                    )
                else:
                    payloads.append(
                        wav_bytes(d % 2 + 1, 8000 * (d % 3 + 1), d % 1000 + 1)
                    )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL container decode over (doc_id, payload):
    every output value is parsed from the payload bytes, not derived
    from metadata. Swapping :func:`parse_media` for a PIL/av call is a
    one-line change; the plan shape (mapInPandas, binary in, typed
    struct out) is already production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = pd.DataFrame([parse_media(b) for b in pdf["payload"]])
            feats.insert(0, "n_bytes", pdf["payload"].map(len).astype("int64").to_numpy())
            feats.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield feats[[
                "doc_id", "media_type", "n_bytes", "width", "height",
                "channels", "sample_rate", "n_samples",
            ]]

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


PNG_STATS_SCHEMA = (
    "doc_id long, width long, height long, channels long, n_pixels long, "
    "px_sum long, first_px long, last_px long, px_mean_milli long, "
    "raster_sha256 string"
)


def synthesize_png_pixels(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL PNGs with pixel data: dimensions and every
    pixel byte are closed-form functions of doc_id —
    ``v(x, y, ch) = (3x + 5y + 17ch + doc_id) mod 256`` over a
    ``(doc_id%24+4) × (doc_id%16+4)`` raster, RGB for even ids and
    grayscale for odd — so an oracle can recompute the pixel SUMS by
    arithmetic while the engine must inflate + unfilter the actual
    IDAT stream to reproduce them. Encoding cycles all five PNG filter
    types and splits IDAT in two (:func:`png_pixel_bytes`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = d % 24 + 4, d % 16 + 4
                color_type = 2 if d % 2 == 0 else 0
                ch = _PNG_CHANNELS[color_type]
                raster = bytes(
                    (3 * x + 5 * y + 17 * c + d) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(ch)
                )
                payloads.append(png_pixel_bytes(w, h, raster, color_type))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_png_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched REAL pixel decode over (doc_id, payload): every
    output is computed from the DECODED RASTER (via
    :func:`png_decode_pixels` — inflate + unfilter), never from
    metadata. ``px_mean_milli`` is integer arithmetic
    (``1000·sum // n``) so both engines agree bit-for-bit.

    ``strict=False`` is the production posture for external corpora: a
    payload that fails to decode yields a row of NULL stats (doc_id
    preserved for quarantine) instead of a ValueError that would kill
    the stage — at 100 TB some payloads are always corrupt. The gate
    keeps strict=True (its payloads are synthesized, so an error there
    is a codec bug to surface, not data to tolerate)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = png_decode_pixels(payload)
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "channels", "n_pixels",
                                    "px_sum", "first_px", "last_px",
                                    "px_mean_milli", "raster_sha256",
                                )
                            },
                        }
                    )
                    continue
                raster = d["raster"]
                total = sum(raster)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "n_pixels": d["width"] * d["height"],
                        "px_sum": total,
                        "first_px": raster[0],
                        "last_px": raster[-1],
                        "px_mean_milli": 1000 * total // len(raster),
                        "raster_sha256": hashlib.sha256(raster).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=PNG_STATS_SCHEMA)


def synthesize_png_interlaced(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL Adam7-interlaced PNGs: the
    ``(3x + 5y + 17ch + doc_id) mod 256`` pixel formula over a
    ``(d%21+6) × (d%17+5)`` raster (dims chosen so several passes are
    partial or empty), RGB for even ids and grayscale for odd — the
    engine must deinterlace the seven independently-filtered sub-images
    back onto the pixel grid to reproduce the closed-form sums."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = d % 21 + 6, d % 17 + 5
                color_type = 2 if d % 2 == 0 else 0
                ch = _PNG_CHANNELS[color_type]
                raster = bytes(
                    (3 * x + 5 * y + 17 * c + d) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(ch)
                )
                payloads.append(
                    png_pixel_bytes(w, h, raster, color_type, interlace=True)
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


PNG16_STATS_SCHEMA = (
    "doc_id long, width long, height long, channels long, bit_depth long, "
    "n_samples long, sample_sum long, first_sample long, last_sample long, "
    "max_sample long"
)


def synthesize_png16(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL 16-bit PNGs: sample
    ``(257·(3x + 5y + 17c) + doc_id) mod 65536`` over a
    ``(d%13+3) × (d%9+3)`` grid (values routinely exceed 255, so an
    8-bit truncation bug cannot hide), RGB for even ids and grayscale
    for odd, Adam7-interlaced for ids divisible by 4 — the engine must
    unfilter at the 2-byte pixel width and unpack big-endian u16s to
    reproduce the closed-form sums."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = d % 13 + 3, d % 9 + 3
                color_type = 2 if d % 2 == 0 else 0
                ch = _PNG_CHANNELS[color_type]
                samples = [
                    (257 * (3 * x + 5 * y + 17 * c) + d) % 65536
                    for y in range(h)
                    for x in range(w)
                    for c in range(ch)
                ]
                payloads.append(
                    png_pixel16_bytes(w, h, samples, color_type, interlace=d % 4 == 0)
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_png16_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched 16-bit PNG decode over (doc_id, payload): stats
    come from the decoded u16 SAMPLES, not raster bytes — a byte-order
    or pixel-width bug shifts sample_sum by orders of magnitude.
    ``strict=False`` = poison-safe NULL-stats rows (see
    :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = png_decode_pixels(bytes(payload))
                    if d.get("bit_depth") != 16:
                        raise ValueError("expected a 16-bit PNG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "channels", "bit_depth",
                                    "n_samples", "sample_sum", "first_sample",
                                    "last_sample", "max_sample",
                                )
                            },
                        }
                    )
                    continue
                s = d["samples16"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "bit_depth": 16,
                        "n_samples": len(s),
                        "sample_sum": sum(s),
                        "first_sample": s[0],
                        "last_sample": s[-1],
                        "max_sample": max(s),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=PNG16_STATS_SCHEMA)


PALETTE_STATS_SCHEMA = (
    "doc_id long, width long, height long, channels long, palette_size long, "
    "n_pixels long, px_sum long, r_sum long, g_sum long, b_sum long, "
    "first_px long, last_px long"
)


def synthesize_png_palette(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL indexed-color PNGs: doc ``d`` gets a
    ``(d%21+5) × (d%14+4)`` image over a ``d%13+3``-entry palette whose
    entry ``j`` is ``((7j+d)%256, (13j+2d)%256, (29j+3d)%256)`` and
    whose pixel ``(x, y)`` holds index ``(x + 2y + d) mod psize`` — all
    closed-form in doc_id, so the oracle recomputes the post-PLTE RGB
    sums arithmetically while the engine must unfilter the index
    scanlines AND apply the actual PLTE lookup to reproduce them."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h, ps = d % 21 + 5, d % 14 + 4, d % 13 + 3
                pal = bytes(
                    v
                    for j in range(ps)
                    for v in ((7 * j + d) % 256, (13 * j + 2 * d) % 256,
                              (29 * j + 3 * d) % 256)
                )
                idx = bytes((x + 2 * y + d) % ps for y in range(h) for x in range(w))
                payloads.append(png_palette_bytes(w, h, idx, pal))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_palette_png_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched palette-PNG decode over (doc_id, payload):
    per-channel sums come from the post-PLTE-lookup RGB raster — a
    palette-order (RGB/BGR) or index-offset bug lands on
    r_sum/g_sum/b_sum even when the totals agree. ``strict=False`` =
    poison-safe NULL-stats rows (see :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = png_decode_pixels(bytes(payload))
                    if d.get("palette_size") is None:
                        raise ValueError("expected an indexed-color PNG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "channels",
                                    "palette_size", "n_pixels", "px_sum",
                                    "r_sum", "g_sum", "b_sum",
                                    "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                raster = d["raster"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "palette_size": d["palette_size"],
                        "n_pixels": d["width"] * d["height"],
                        "px_sum": sum(raster),
                        "r_sum": sum(raster[0::3]),
                        "g_sum": sum(raster[1::3]),
                        "b_sum": sum(raster[2::3]),
                        "first_px": raster[0],
                        "last_px": raster[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=PALETTE_STATS_SCHEMA)


JPEG_STATS_SCHEMA = (
    "doc_id long, width long, height long, n_tiles long, "
    "px_sum long, first_px long, last_px long, px_mean_milli long"
)


def synthesize_jpeg_tiles(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL baseline JPEGs through the full encode pipeline
    (DCT → quantize → zigzag → Huffman → byte-stuffed entropy stream):
    a ``8·(doc_id%5+1) × 8·(doc_id%4+1)`` grayscale image of constant
    8×8 tiles, tile (tx, ty) valued ``(11·tx + 23·ty + 7·doc_id) mod
    256``. Constant tiles are the one fixture baseline JPEG preserves
    EXACTLY (DC-only blocks, all-ones quant table — see
    :mod:`.jpegcodec`), so the oracle recomputes pixel stats by
    arithmetic while the engine must run the real entropy decoder."""
    from .jpegcodec import jpeg_pixel_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 8 * (d % 5 + 1), 8 * (d % 4 + 1)
                raster = bytes(
                    (11 * (x // 8) + 23 * (y // 8) + 7 * d) % 256
                    for y in range(h)
                    for x in range(w)
                )
                payloads.append(jpeg_pixel_bytes(w, h, raster))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched REAL JPEG pixel decode over (doc_id, payload):
    every output comes from the entropy-DECODED raster via
    :func:`decode_real` — Huffman, DC prediction, dequantize, IDCT —
    never from metadata. Integer stats only, so both engines agree
    bit-for-bit. ``strict=False`` = poison-safe NULL-stats rows (see
    :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if "raster" not in d and "samples" not in d:
                        raise ValueError(f"undecodable payload: {d['media_type']}")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "n_tiles", "px_sum",
                                    "first_px", "last_px", "px_mean_milli",
                                )
                            },
                        }
                    )
                    continue
                raster = d["raster"]
                total = sum(raster)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "n_tiles": (d["width"] // 8) * (d["height"] // 8),
                        "px_sum": total,
                        "first_px": raster[0],
                        "last_px": raster[-1],
                        "px_mean_milli": 1000 * total // len(raster),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_STATS_SCHEMA)


JPEG_COLOR_SCHEMA = (
    "doc_id long, width long, height long, channels long, n_tiles long, "
    "px_sum long, y_sum long, cb_sum long, cr_sum long, "
    "first_px long, last_px long"
)


def synthesize_jpeg_color(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL 3-component baseline JPEGs (interleaved 1×1
    MCUs, per-component DC predictors): each Y/Cb/Cr plane is constant
    8×8 tiles valued ``(11tx + 23ty + 7·doc_id + 31c) mod 256`` — the
    exact-at-quant-1 fixture, per component."""
    from .jpegcodec import jpeg_planes_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 8 * (d % 5 + 1), 8 * (d % 4 + 1)
                planes = [
                    bytes(
                        (11 * (x // 8) + 23 * (y // 8) + 7 * d + 31 * c) % 256
                        for y in range(h)
                        for x in range(w)
                    )
                    for c in range(3)
                ]
                payloads.append(jpeg_planes_bytes(w, h, planes))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg_color_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched color-JPEG decode over (doc_id, payload): per-plane
    sums come from the three entropy-DECODED component planes
    (interleaved-MCU Huffman decode with per-component DC prediction) —
    an interleave/predictor-mixup bug lands on y_sum/cb_sum/cr_sum."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if "planes" not in d or len(d["planes"]) != 3:
                        raise ValueError("expected a 3-component JPEG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "channels", "n_tiles",
                                    "px_sum", "y_sum", "cb_sum", "cr_sum",
                                    "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                sums = [sum(p) for p in d["planes"]]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": len(d["planes"]),
                        "n_tiles": (d["width"] // 8) * (d["height"] // 8),
                        "px_sum": sum(sums),
                        "y_sum": sums[0],
                        "cb_sum": sums[1],
                        "cr_sum": sums[2],
                        "first_px": d["planes"][0][0],
                        "last_px": d["planes"][2][-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_COLOR_SCHEMA)


JPEG_RESTART_SCHEMA = (
    "doc_id long, width long, height long, n_tiles long, "
    "restart_interval long, n_restarts long, "
    "px_sum long, first_px long, last_px long"
)


def synthesize_jpeg_restart(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL baseline JPEGs WITH restart intervals: the
    grayscale constant-tile fixture (``8·(d%6+1) × 8·(d%3+1)``, tile
    ``(11tx + 23ty + 7d) mod 256``) encoded with ``DRI = d%3+1`` — the
    entropy stream byte-aligns and emits a cycling RSTm marker with a
    DC-predictor reset every ``d%3+1`` MCUs, the error-resilience
    layout most camera/scanner JPEGs carry."""
    from .jpegcodec import jpeg_planes_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 8 * (d % 6 + 1), 8 * (d % 3 + 1)
                raster = bytes(
                    (11 * (x // 8) + 23 * (y // 8) + 7 * d) % 256
                    for y in range(h)
                    for x in range(w)
                )
                payloads.append(
                    jpeg_planes_bytes(w, h, [raster], restart_interval=d % 3 + 1)
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg_restart_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched decode of restart-interval JPEGs: pixel stats come
    from the entropy-decoded raster (every restart boundary must be
    consumed and every DC predictor reset, or the remaining blocks
    mis-decode), ``restart_interval`` from the parsed DRI segment, and
    ``n_restarts`` from the markers the entropy decoder ACTUALLY
    consumed (round 11: ``_BitReader.restarts_consumed``, not
    re-derived arithmetic) — a missed or mis-placed restart lands on
    px_sum AND on the marker count. ``strict=False`` = poison-safe
    NULL-stats rows (see :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if "raster" not in d or not d.get("restart_interval"):
                        raise ValueError("expected a restart-interval JPEG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "n_tiles",
                                    "restart_interval", "n_restarts",
                                    "px_sum", "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                raster = d["raster"]
                n_mcus = (d["width"] // 8) * (d["height"] // 8)
                ri = d["restart_interval"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "n_tiles": n_mcus,
                        "restart_interval": ri,
                        "n_restarts": d["n_restart_markers"],
                        "px_sum": sum(raster),
                        "first_px": raster[0],
                        "last_px": raster[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_RESTART_SCHEMA)


def synthesize_jpeg_progressive(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL progressive (SOF2) JPEGs: the grayscale
    constant-tile fixture encoded through the full multi-scan script —
    DC first at Al=1, DC refinement, two AC band scans per precision.
    Constant tiles keep the oracle exact (DC-only blocks), so the GATE
    exercises the DC point-transform accumulation and the EOBRUN
    machinery; the nonzero-AC refinement paths are pinned by the
    cross-decoder property test (progressive == baseline pixels on
    random rasters, tests/test_datapipe.py)."""
    from .jpegcodec import jpeg_progressive_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 8 * (d % 5 + 1), 8 * (d % 4 + 1)
                raster = bytes(
                    (11 * (x // 8) + 23 * (y // 8) + 7 * d) % 256
                    for y in range(h)
                    for x in range(w)
                )
                payloads.append(jpeg_progressive_bytes(w, h, [raster]))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def synthesize_jpeg_progressive_restart(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL progressive (SOF2) JPEGs WITH restart intervals
    — DRI applies per scan in SOF2 files, the one layout that stayed an
    explicit ValueError through round 9 (some camera/optimizer
    pipelines emit it): the grayscale constant-tile fixture
    (``8·(d%5+1) × 8·(d%4+1)``, tile ``(11tx + 23ty + 7d) mod 256``)
    encoded through the full six-scan script with ``DRI = d%3+1``, so
    EVERY scan — interleaved DC first/refinement and the four
    non-interleaved AC band scans — byte-aligns and emits cycling RSTn
    every Ri MCUs (Ri counts data units in the AC scans), flushing any
    pending EOB run first."""
    from .jpegcodec import jpeg_progressive_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 8 * (d % 5 + 1), 8 * (d % 4 + 1)
                raster = bytes(
                    (11 * (x // 8) + 23 * (y // 8) + 7 * d) % 256
                    for y in range(h)
                    for x in range(w)
                )
                payloads.append(
                    jpeg_progressive_bytes(
                        w, h, [raster], restart_interval=d % 3 + 1
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg_progressive_restart_stats(
    media: DataFrame, strict: bool = True
) -> DataFrame:
    """Arrow-batched decode of restart-interval PROGRESSIVE JPEGs: the
    scan loop must consume a cycling RSTn marker every Ri MCUs in all
    six scans, resetting DC predictors (DC scans) and the EOB run (AC
    scans) at each — a missed marker throws the bit reader off byte
    alignment and a missed predictor/EOBRUN reset mis-decodes every
    remaining block, both landing on px_sum. ``restart_interval`` comes
    from the parsed DRI segment, ``n_restarts`` is the TOTAL RSTn
    markers the six scans actually consumed (round 11:
    ``_BitReader.restarts_consumed`` summed per scan — the oracle
    expects ``n_scans * ((n_tiles-1)//ri)``, so a scan that skips its
    markers now lands here independently of px_sum), and the row
    asserts the stream really was SOF2 (``progressive``), so a silent
    fallback to the baseline path cannot pass. ``strict=False`` =
    poison-safe NULL-stats rows (see :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if (
                        "raster" not in d
                        or not d.get("progressive")
                        or not d.get("restart_interval")
                    ):
                        raise ValueError("expected a progressive restart JPEG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "n_tiles",
                                    "restart_interval", "n_restarts",
                                    "px_sum", "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                raster = d["raster"]
                n_mcus = (d["width"] // 8) * (d["height"] // 8)
                ri = d["restart_interval"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "n_tiles": n_mcus,
                        "restart_interval": ri,
                        "n_restarts": d["n_restart_markers"],
                        "px_sum": sum(raster),
                        "first_px": raster[0],
                        "last_px": raster[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_RESTART_SCHEMA)


JPEG12_STATS_SCHEMA = (
    "doc_id long, width long, height long, n_tiles long, "
    "restart_interval long, sample_sum long, first_sample long, "
    "last_sample long, max_sample long"
)


def synthesize_jpeg12(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL 12-bit (SOF1 extended sequential) JPEGs — the
    medical/scientific dynamic-range layout: grayscale constant-tile
    fixture ``8·(d%4+1) × 8·(d%3+1)``, tile ``(997tx + 1499ty + 131d)
    mod 4096`` (values routinely exceed 255, so an 8-bit truncation or
    a wrong 2048 level shift cannot hide), every odd doc additionally
    encoded with ``DRI = 1`` so the extended-precision path composes
    with restart markers."""
    from .jpegcodec import jpeg_planes_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 8 * (d % 4 + 1), 8 * (d % 3 + 1)
                samples = [
                    (997 * (x // 8) + 1499 * (y // 8) + 131 * d) % 4096
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(
                    jpeg_planes_bytes(
                        w, h, [samples], precision=12, restart_interval=d % 2
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg12_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched 12-bit JPEG decode over (doc_id, payload): stats
    come from the decoded u12 SAMPLES (flat ``samples16`` list) — a
    wrong level shift (128 instead of 2048), an 8-bit clamp, or a
    baseline-table fallback (the extended DC categories are outside
    Annex K) all shift sample_sum by orders of magnitude. The row
    asserts ``bit_depth == 12`` so a silent 8-bit decode cannot pass.
    ``strict=False`` = poison-safe NULL-stats rows (see
    :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("bit_depth") != 12 or "samples16" not in d:
                        raise ValueError("expected a 12-bit JPEG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "n_tiles",
                                    "restart_interval", "sample_sum",
                                    "first_sample", "last_sample", "max_sample",
                                )
                            },
                        }
                    )
                    continue
                s = d["samples16"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "n_tiles": (d["width"] // 8) * (d["height"] // 8),
                        "restart_interval": d["restart_interval"],
                        "sample_sum": sum(s),
                        "first_sample": s[0],
                        "last_sample": s[-1],
                        "max_sample": max(s),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG12_STATS_SCHEMA)


JPEG12P_STATS_SCHEMA = (
    "doc_id long, width long, height long, n_scans long, "
    "sample_sum long, first_sample long, last_sample long, max_sample long"
)


def synthesize_jpeg12_progressive(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL 12-bit PROGRESSIVE (SOF2) JPEGs (round 11 —
    formerly 'SOF2 stays 8-bit' in the refusal list): grayscale
    constant-tile fixture ``8·(d%4+1) × 8·(d%3+1)``, tile ``(499tx +
    257ty + 61d) mod 4096``, six-scan libjpeg-style script (DC first +
    DC refine + 2 AC bands × first/refine) with the extended
    progressive AC alphabet (sizes to 14); odd docs add ``DRI = 1`` so
    restart markers compose with 12-bit refinement scans."""
    from .jpegcodec import jpeg_progressive_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 8 * (d % 4 + 1), 8 * (d % 3 + 1)
                samples = [
                    (499 * (x // 8) + 257 * (y // 8) + 61 * d) % 4096
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(
                    jpeg_progressive_bytes(
                        w, h, [samples], precision=12, restart_interval=d % 2
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg12prog_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched 12-bit progressive JPEG decode over (doc_id,
    payload): the row asserts ``bit_depth == 12`` AND ``progressive``
    (a sequential fallback or an 8-bit clamp cannot pass) and reports
    ``n_scans`` so the multi-scan accumulation demonstrably ran; stats
    come from the u12 samples, where a wrong level shift or a baseline
    AC table (sizes stop at 10) lands immediately. ``strict=False`` =
    poison-safe NULL-stats rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if (
                        d.get("bit_depth") != 12
                        or not d.get("progressive")
                        or "samples16" not in d
                    ):
                        raise ValueError("expected a 12-bit progressive JPEG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "n_scans", "sample_sum",
                                    "first_sample", "last_sample", "max_sample",
                                )
                            },
                        }
                    )
                    continue
                s = d["samples16"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "n_scans": d["n_scans"],
                        "sample_sum": sum(s),
                        "first_sample": s[0],
                        "last_sample": s[-1],
                        "max_sample": max(s),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG12P_STATS_SCHEMA)


POISON_STATS_SCHEMA = (
    "doc_id long, media_type string, decoded boolean, "
    "n_units long, value_sum long"
)


def synthesize_mixed_media(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture a HETEROGENEOUS corpus with deterministic poison —
    what a real crawl-derived payload column looks like: doc ``d``
    carries a PNG / grayscale JPEG / PCM WAV / FLAC / IMA-ADPCM WAV /
    GIF / BMP / TIFF by ``(d//2) % 8`` (the audio tier joined the
    rotation in round 12, then the full image tier — every sniffable
    container the engine decodes is now dispatch-tested in ONE gate),
    and every odd doc is poisoned two ways by ``d%4``: magic bytes
    stomped (``DE AD BE EF`` — sniffing fails) or truncated to its
    first 8 bytes (sniffable magic, undecodable structure) — the
    corrupt-payload mix a 100 TB crawl always has. The type selector
    uses ``d//2`` so both parities reach every format: each format
    class carries its own poison rows.

    The ADPCM stream is the closed-form corner of the state machine:
    ``idx0 = 0`` and all-sign-bit nibbles hold step at 7 (diff =
    7>>3 = 0) and index clamped at 0, so the block decodes to its
    header predictor repeated — the full nibble walk still runs, but
    the oracle can price it arithmetically (the general state machine
    is gated by ``adpcm_decode_stats``'s recursive-CTE oracle)."""
    from .flaccodec import flac_bytes
    from .gifcodec import gif_bytes
    from .jpegcodec import jpeg_pixel_bytes
    from .tiffcodec import tiff_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                t = (d // 2) % 8
                if t == 0:
                    n = d % 9 + 2
                    raster = bytes(
                        (3 * x + 5 * y + d) % 256
                        for y in range(n)
                        for x in range(n)
                    )
                    p = png_pixel_bytes(n, n, raster, 0)
                elif t == 1:
                    p = jpeg_pixel_bytes(8, 8, bytes([(7 * d) % 256] * 64))
                elif t == 2:
                    n = d % 50 + 10
                    p = wav_pcm_bytes(
                        1, 8000, [((7 * d + 13 * i) % 2001) - 1000 for i in range(n)]
                    )
                elif t == 3:
                    n = d % 40 + 16
                    samples = [((7 * d + 13 * i) % 2001) - 1000 for i in range(n)]
                    p = flac_bytes(8000, 16, [(samples, ("verbatim",))])
                elif t == 4:
                    spb = d % 30 + 9
                    pred0 = (7 * d) % 2001 - 1000
                    p = wav_adpcm_bytes(8000, [(pred0, 0, [8] * (spb - 1))], spb)
                elif t == 5:
                    gw, gh = d % 6 + 2, d % 4 + 2
                    pal = bytes((7 * j) % 256 for j in range(12))
                    idx = bytes(
                        (x + 2 * y + d) % 4
                        for y in range(gh)
                        for x in range(gw)
                    )
                    p = gif_bytes(gw, gh, idx, pal)
                elif t == 6:
                    bw, bh = d % 7 + 2, d % 5 + 2
                    rgb = bytes(
                        (3 * x + 5 * y + 7 * d + 11 * c) % 256
                        for y in range(bh)
                        for x in range(bw)
                        for c in range(3)
                    )
                    p = bmp_bytes(bw, bh, rgb)
                else:
                    tw, th = d % 8 + 3, d % 6 + 3
                    raster = bytes(
                        (3 * x + 5 * y + 7 * d) % 256
                        for y in range(th)
                        for x in range(tw)
                    )
                    p = tiff_bytes(tw, th, raster, channels=1)
                if d % 4 == 1:  # poison: stomp the magic
                    p = b"\xde\xad\xbe\xef" + p[4:]
                elif d % 4 == 3:  # poison: magic intact, structure gone
                    p = p[:8]
                payloads.append(p)
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_media_poison_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched heterogeneous decode with POISON-SAFE rows: every
    payload goes through :func:`decode_real`'s sniff-and-dispatch; a
    payload that fails to sniff (octet-stream) or fails to parse emits
    a NULL-stats row with ``decoded = false`` instead of killing the
    stage — the per-type stats (pixel sum / linear sample sum) prove
    the good rows still run the full decode path next to the poison."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    mt = d.get("media_type")
                    if mt in ("image/png", "image/jpeg", "image/gif",
                              "image/bmp", "image/tiff"):
                        vals = d["raster"]
                    elif mt in ("audio/wav", "audio/flac"):
                        vals = d["samples"]  # PCM, block-framed ADPCM, FLAC
                    else:
                        raise ValueError(f"unsniffable payload ({mt})")
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_type": mt,
                            "decoded": True,
                            "n_units": len(vals),
                            "value_sum": sum(vals),
                        }
                    )
                except ValueError:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_type": None,
                            "decoded": False,
                            "n_units": None,
                            "value_sum": None,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=POISON_STATS_SCHEMA)


TIFF_STATS_SCHEMA = (
    "doc_id long, width long, height long, channels long, n_strips long, "
    "compression string, predictor long, big_endian boolean, "
    "px_sum long, first_px long, last_px long"
)


def synthesize_tiff(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL baseline TIFFs (the scan/scientific format):
    ``(d%12+3) × (d%8+3)`` frames, grayscale for even docs / RGB for
    odd, ``d%4+1``-row strips (so every doc is genuinely multi-strip),
    big-endian when ``d%5==0``, and the compression rotating by
    ``d%4``: 0 → PackBits, 1 → LZW (round 11 — the most common
    real-world TIFF compression), 2 → Deflate (round 11), 3 →
    uncompressed; horizontal-differencing Predictor 2 rides half the
    LZW and Deflate rows (``d%8 in (1, 2)``), the pairing real writers
    emit. Sample ``(3x + 5y + 7d + 11c) mod 256`` closed-form so the
    oracle recomputes channel sums while the engine must walk the IFD,
    read inline-vs-offset tag arrays, and reassemble RLE / LZW /
    zlib / raw strips."""
    from .tiffcodec import tiff_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = d % 12 + 3, d % 8 + 3
                ch = 1 if d % 2 == 0 else 3
                raster = bytes(
                    (3 * x + 5 * y + 7 * d + 11 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(ch)
                )
                payloads.append(
                    tiff_bytes(
                        w, h, raster, channels=ch, rows_per_strip=d % 4 + 1,
                        packbits=d % 4 == 0, big_endian=d % 5 == 0,
                        lzw=d % 4 == 1, deflate=d % 4 == 2,
                        predictor=2 if d % 8 in (1, 2) else 1,
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_tiff_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched TIFF decode over (doc_id, payload): pixel stats
    come from the reassembled raster, so a wrong strip count, an
    endian-flipped tag value, a mis-read offset array, a PackBits
    drift, an LZW early-change width slip, or a missed Predictor-2
    un-differencing pass lands on px_sum or the corner pixels.
    ``strict=False`` = poison-safe NULL-stats rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("media_type") != "image/tiff":
                        raise ValueError("expected a TIFF")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "channels", "n_strips",
                                    "compression", "predictor", "big_endian",
                                    "px_sum", "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                r = d["raster"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "n_strips": d["n_strips"],
                        "compression": d["compression"],
                        "predictor": d["predictor"],
                        "big_endian": d["big_endian"],
                        "px_sum": sum(r),
                        "first_px": r[0],
                        "last_px": r[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=TIFF_STATS_SCHEMA)


TIFF_TILED_STATS_SCHEMA = (
    "doc_id long, width long, height long, channels long, n_tiles long, "
    "compression string, predictor long, big_endian boolean, "
    "px_sum long, first_px long, last_px long"
)


def synthesize_tiff_tiled(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL tiled TIFFs — the GeoTIFF/BigTIFF layout
    (round 11, closing the last round-10 TIFF refusal): 16×16 tile
    grids over ``(16 + d%21) × (16 + d%19)`` frames (1–3 tiles per
    axis, so edge tiles genuinely carry padding the decoder must
    crop), gray/RGB by parity, compression rotating lzw/deflate/none
    by ``d%3`` (Predictor 2 on half the compressed rows), big-endian
    when ``d%5==0`` — same closed-form sample arithmetic as the strip
    fixture so the oracle recomputes sums while the engine walks the
    tile grid."""
    from .tiffcodec import tiff_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 16 + d % 21, 16 + d % 19
                ch = 1 if d % 2 == 0 else 3
                raster = bytes(
                    (3 * x + 5 * y + 7 * d + 11 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(ch)
                )
                payloads.append(
                    tiff_bytes(
                        w, h, raster, channels=ch, tile=(16, 16),
                        big_endian=d % 5 == 0,
                        lzw=d % 3 == 0, deflate=d % 3 == 1,
                        predictor=2 if (d % 3 < 2 and d % 4 < 2) else 1,
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_tiff_tiled_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched tiled-TIFF decode: pixel stats come from the
    tile-reassembled raster, so a wrong grid walk, an uncropped edge
    pad, a per-tile predictor slip, or a mis-read tile offset array
    lands on px_sum or a corner pixel. ``strict=False`` = poison-safe
    NULL-stats rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("media_type") != "image/tiff" or not d.get("tiled"):
                        raise ValueError("expected a tiled TIFF")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "channels", "n_tiles",
                                    "compression", "predictor", "big_endian",
                                    "px_sum", "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                r = d["raster"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "n_tiles": d["n_strips"],
                        "compression": d["compression"],
                        "predictor": d["predictor"],
                        "big_endian": d["big_endian"],
                        "px_sum": sum(r),
                        "first_px": r[0],
                        "last_px": r[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=TIFF_TILED_STATS_SCHEMA)


TIFF_PALETTE_STATS_SCHEMA = (
    "doc_id long, width long, height long, n_strips long, "
    "compression string, big_endian boolean, "
    "r_sum long, g_sum long, b_sum long, first_px long, last_px long"
)


def synthesize_tiff_palette(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL palette (Photometric=3) TIFFs — the indexed
    scan/map format (round 11): ``(d%9+2) × (d%6+2)`` frames over a
    ``d%5+2``-color palette (entry i = ``(7i, 13i, 29i) mod 256``, the
    BMP-indexed fixture arithmetic), index ``(x + 2y + d) mod nc``,
    ``d%3+1``-row strips, big-endian for even docs, LZW when
    ``d%3==0`` — so the decoder must read the full-256-entry 16-bit
    ColorMap through the offset-array path and look every index up."""
    from .tiffcodec import tiff_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h, nc = d % 9 + 2, d % 6 + 2, d % 5 + 2
                pal = bytes(
                    v % 256 for i in range(nc) for v in (7 * i, 13 * i, 29 * i)
                )
                idx = bytes(
                    (x + 2 * y + d) % nc for y in range(h) for x in range(w)
                )
                payloads.append(
                    tiff_bytes(
                        w, h, idx, channels=1, rows_per_strip=d % 3 + 1,
                        big_endian=d % 2 == 0, lzw=d % 3 == 0, palette=pal,
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_tiff_palette_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched palette-TIFF decode: per-channel sums come from
    the ColorMap-looked-up RGB raster, so a mis-read ColorMap offset,
    a plane-order mix-up (the map is R-plane then G then B, not
    interleaved), or a dropped high-byte conversion lands on the
    channel sums. ``strict=False`` = poison-safe NULL-stats rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("media_type") != "image/tiff" or not d.get("palette"):
                        raise ValueError("expected a palette TIFF")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "n_strips", "compression",
                                    "big_endian", "r_sum", "g_sum", "b_sum",
                                    "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                r = d["raster"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "n_strips": d["n_strips"],
                        "compression": d["compression"],
                        "big_endian": d["big_endian"],
                        "r_sum": sum(r[0::3]),
                        "g_sum": sum(r[1::3]),
                        "b_sum": sum(r[2::3]),
                        "first_px": r[0],
                        "last_px": r[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=TIFF_PALETTE_STATS_SCHEMA)


WARC_STATS_SCHEMA = (
    "doc_id long, rec_index long, n_records long, warc_type string, "
    "content_length long, body_chars long, body_sum long"
)

# HTTP blocks shared by the WARC fixture and (via len()) its oracle
WARC_RESP_HDR = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
WARC_REQ_PAYLOAD = "GET /{r} HTTP/1.1\r\nHost: example.com\r\n\r\n"
# warcinfo payload (round 11): key:value lines, NOT an HTTP block —
# shared with the warc_poison_battery oracle via len()/byte-sum
WARC_INFO_PAYLOAD = "software: lfb-spark/0.11\r\nformat: WARC File Format 1.0\r\n"


def _warc_record(wtype: str, uri: str, payload: bytes) -> bytes:
    """One framed WARC/1.0 record: headers, Content-Length, payload,
    and the two-CRLF record separator."""
    return (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload + b"\r\n\r\n"


def _walk_warc_records(raw: bytes) -> list[tuple[dict, int, bytes]]:
    """Walk Content-Length-framed WARC/1.0 records in decompressed
    bytes; returns (lower-cased header dict, content-length,
    content-block) per record. Framing drift (wrong length, missing
    separator) raises — one bad record derails everything after it, so
    the walk refuses loudly rather than resynchronize silently."""
    recs = []
    i = 0
    while i < len(raw):
        if not raw.startswith(b"WARC/1.0\r\n", i):
            raise ValueError("record does not start with WARC/1.0")
        hdr_end = raw.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        headers = {}
        for line in raw[i + 10 : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b": ")
            headers[k.decode().lower()] = v.decode()
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        if body_start + clen > len(raw):
            raise ValueError("WARC record overruns the file")
        block = raw[body_start : body_start + clen]
        recs.append((headers, clen, block))
        i = body_start + clen
        if raw[i : i + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        i += 4
    if not recs:
        raise ValueError("WARC with no records")
    return recs


def synthesize_warc(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL WARC/1.0 files — the Common Crawl container
    every web-scale training corpus starts from: ``d%4+1`` records per
    doc, alternating response/request, each record an independent gzip
    MEMBER (the per-record compression Common Crawl uses, so the
    reader must handle concatenated members), response bodies
    ``"R:" + "a"×((3d+7r)%50+10)`` — closed-form, so the oracle
    recomputes per-record lengths and byte sums arithmetically."""
    import gzip

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                members = []
                for r in range(d % 4 + 1):
                    if r % 2 == 0:
                        body = "R:" + "a" * ((3 * d + 7 * r) % 50 + 10)
                        payload = (WARC_RESP_HDR + body).encode()
                        wtype = "response"
                    else:
                        payload = WARC_REQ_PAYLOAD.format(r=r).encode()
                        wtype = "request"
                    rec = _warc_record(wtype, f"http://example.com/{d}/{r}", payload)
                    members.append(gzip.compress(rec, compresslevel=6, mtime=0))
                payloads.append(b"".join(members))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def parse_warc_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched WARC parse over (doc_id, payload): gunzip the
    concatenated members, walk Content-Length-framed records, parse
    WARC headers, and split HTTP headers from bodies — one output row
    per record, so framing drift (a wrong length, a missed \\r\\n\\r\\n
    separator) derails every subsequent record's stats. ``strict=False``
    = poison-safe NULL-stats rows."""
    import gzip

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    raw = gzip.decompress(bytes(payload))
                    recs = []
                    for h, clen, block in _walk_warc_records(raw):
                        http_split = block.find(b"\r\n\r\n")
                        body = block[http_split + 4 :] if http_split >= 0 else b""
                        recs.append((h.get("warc-type", ""), clen, body))
                except (ValueError, OSError, EOFError, KeyError) as exc:
                    if strict:
                        if isinstance(exc, ValueError):
                            raise
                        raise ValueError(str(exc)) from exc
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "rec_index", "n_records", "warc_type",
                                    "content_length", "body_chars", "body_sum",
                                )
                            },
                        }
                    )
                    continue
                for ri, (wtype, clen, body) in enumerate(recs):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "rec_index": ri,
                            "n_records": len(recs),
                            "warc_type": wtype,
                            "content_length": clen,
                            "body_chars": len(body),
                            "body_sum": sum(body),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=WARC_STATS_SCHEMA)


WARC_POISON_SCHEMA = (
    "doc_id long, rec_index long, n_records long, warc_type string, "
    "content_length long, body_chars long, body_sum long, "
    "gzipped boolean, parsed boolean"
)


def synthesize_warc_mixed(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture the WARC shapes real Common Crawl sets throw at a
    reader beyond the happy path (round 11): by ``d%4`` —

    * 0: gzip members carrying the full record-type spread — warcinfo
      (key:value payload, NOT an HTTP block), response, metadata with
      Content-Length: 0 (zero-length bodies are legal and common), and
      request;
    * 1: an IDENTITY (uncompressed) WARC — the spec's other transfer
      form; the reader must sniff gzip magic vs a bare WARC/1.0 header;
    * 2: POISON — a gzip member truncated mid-stream (the classic
      interrupted-fetch artifact);
    * 3: POISON — bytes that are neither gzip nor WARC."""
    import gzip

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                kind = d % 4
                if kind == 0:
                    k = (3 * d + 7) % 50 + 10
                    recs = [
                        _warc_record(
                            "warcinfo", f"file://crawl/{d}.warc",
                            WARC_INFO_PAYLOAD.encode(),
                        ),
                        _warc_record(
                            "response", f"http://example.com/{d}/1",
                            (WARC_RESP_HDR + "R:" + "a" * k).encode(),
                        ),
                        _warc_record("metadata", f"http://example.com/{d}/2", b""),
                        _warc_record(
                            "request", f"http://example.com/{d}/3",
                            WARC_REQ_PAYLOAD.format(r=3).encode(),
                        ),
                    ]
                    payloads.append(
                        b"".join(
                            gzip.compress(r, compresslevel=6, mtime=0) for r in recs
                        )
                    )
                elif kind == 1:
                    k = 3 * d % 50 + 10
                    payloads.append(
                        _warc_record(
                            "response", f"http://example.com/{d}/0",
                            (WARC_RESP_HDR + "R:" + "a" * k).encode(),
                        )
                        + _warc_record(
                            "request", f"http://example.com/{d}/1",
                            WARC_REQ_PAYLOAD.format(r=1).encode(),
                        )
                    )
                elif kind == 2:
                    member = gzip.compress(
                        _warc_record(
                            "response", f"http://example.com/{d}/0",
                            (WARC_RESP_HDR + "R:" + "a" * 30).encode(),
                        ),
                        compresslevel=6, mtime=0,
                    )
                    payloads.append(member[: max(4, len(member) - 7)])
                else:
                    payloads.append(b"NOTAWARC" + bytes([d % 256]) * 16)
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def parse_warc_poison_stats(media: DataFrame) -> DataFrame:
    """Robust WARC parse over heterogeneous payloads (round 11): sniff
    gzip magic vs identity encoding, walk every record type (HTTP
    header/body split ONLY for response/request records — warcinfo and
    metadata content IS the payload), and turn truncated members or
    non-WARC bytes into one NULL-stats ``parsed = false`` row instead
    of a stage kill — the strict=False contract extended to the crawl
    container tier. One output row per record on good docs."""
    import gzip

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    if raw[:2] == b"\x1f\x8b":
                        gzipped = True
                        raw = gzip.decompress(raw)
                    elif raw.startswith(b"WARC/1.0\r\n"):
                        gzipped = False
                    else:
                        raise ValueError("neither gzip members nor identity WARC")
                    recs = []
                    for h, clen, block in _walk_warc_records(raw):
                        wtype = h.get("warc-type", "")
                        if wtype in ("response", "request"):
                            http_split = block.find(b"\r\n\r\n")
                            body = block[http_split + 4 :] if http_split >= 0 else b""
                        else:
                            body = block
                        recs.append((wtype, clen, body))
                except (ValueError, OSError, EOFError, KeyError):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "rec_index", "n_records", "warc_type",
                                    "content_length", "body_chars", "body_sum",
                                    "gzipped",
                                )
                            },
                            "parsed": False,
                        }
                    )
                    continue
                for ri, (wtype, clen, body) in enumerate(recs):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "rec_index": ri,
                            "n_records": len(recs),
                            "warc_type": wtype,
                            "content_length": clen,
                            "body_chars": len(body),
                            "body_sum": sum(body),
                            "gzipped": gzipped,
                            "parsed": True,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=WARC_POISON_SCHEMA)


# Crawl-page fixture shared with the crawl_to_corpus oracle (round 11):
# the page wraps each document's text in real markup — multi-line
# style/script blocks that must vanish, named + numeric entities —
# so the composed plan's html_text stage has real work to do.
CRAWL_HTML_HEAD = "<html><head><title>Doc "
CRAWL_HTML_MID = (
    "</title><STYLE media=\"all\">\nbody { margin: 0 }\n</STYLE>"
    "</head><body><h1>H</h1><p>"
)
CRAWL_HTML_TAIL = (
    "</p><SCRIPT type=\"text/javascript\">\nvar crawl = 1 &amp; 3;\n</SCRIPT>"
    "<p>tail &amp; &quot;q&quot; &#39;s &lt;ok&gt; &#72;&#105; &#x21;</p>"
    "</body></html>"
)
CRAWL_TEXT_CHARS = 200

PAGES_SCHEMA = "doc_id long, url string, html string"


def synthesize_warc_html(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a REAL per-doc WARC/1.0 crawl capture whose response
    body is an HTML page embedding the document's text (first
    ``CRAWL_TEXT_CHARS`` chars in the shared page fixture) — plus a
    request record in front, so the downstream extractor must FILTER
    record types, not just split. Per-record gzip members, Common
    Crawl style."""
    import gzip

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id, text in zip(ids, pdf[text_col]):
                d = int(doc_id)
                uri = f"http://crawl.example/{d}"
                page = (
                    CRAWL_HTML_HEAD + str(d) + CRAWL_HTML_MID
                    + str(text)[:CRAWL_TEXT_CHARS] + CRAWL_HTML_TAIL
                )
                req = _warc_record(
                    "request", uri, WARC_REQ_PAYLOAD.format(r=0).encode()
                )
                resp = _warc_record(
                    "response", uri,
                    WARC_RESP_HDR.replace("text/plain", "text/html").encode()
                    + page.encode(),
                )
                payloads.append(
                    gzip.compress(req, compresslevel=6, mtime=0)
                    + gzip.compress(resp, compresslevel=6, mtime=0)
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, schema=MEDIA_SCHEMA)


def extract_warc_pages(warc: DataFrame) -> DataFrame:
    """Arrow-batched crawl-capture → page extraction: gunzip the
    members, walk the records, keep RESPONSE records only, split the
    HTTP header block, and emit (doc_id, url, html) — the stage that
    turns a WARC column into the text tier's input. Zero exchange:
    payload bytes never leave the executor; only the (much smaller)
    page strings flow on."""
    import gzip

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = gzip.decompress(bytes(payload))
                for h, _clen, block in _walk_warc_records(raw):
                    if h.get("warc-type") != "response":
                        continue
                    http_split = block.find(b"\r\n\r\n")
                    body = block[http_split + 4 :] if http_split >= 0 else b""
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "url": h.get("warc-target-uri", ""),
                            "html": body.decode("utf-8"),
                        }
                    )
            yield pd.DataFrame(rows)

    return warc.mapInPandas(run, schema=PAGES_SCHEMA)


BMP_STATS_SCHEMA = (
    "doc_id long, width long, height long, bpp long, palette_size long, "
    "r_sum long, g_sum long, b_sum long, first_px long, last_px long"
)


def synthesize_bmp(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL BMPs (the uncompressed scan/screenshot format):
    ``(d%9+2) × (d%6+2)`` frames — widths 2..10 exercise every 4-byte
    row-padding amount — 24-bit BGR bottom-up for even docs (channel c
    at (x, y) valued ``(3x + 5y + 7d + 11c) mod 256``) and 8-bit
    indexed over a ``d%5+2``-entry color table for odd docs (index
    ``(x + 2y + d) mod nc``, table entry ``(7j, 13j, 29j) mod 256``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = d % 9 + 2, d % 6 + 2
                if d % 2 == 0:
                    rgb = bytes(
                        (3 * x + 5 * y + 7 * d + 11 * c) % 256
                        for y in range(h)
                        for x in range(w)
                        for c in range(3)
                    )
                    payloads.append(bmp_bytes(w, h, rgb))
                else:
                    nc = d % 5 + 2
                    pal = bytes(
                        v
                        for j in range(nc)
                        for v in ((7 * j) % 256, (13 * j) % 256, (29 * j) % 256)
                    )
                    idx = bytes(
                        (x + 2 * y + d) % nc for y in range(h) for x in range(w)
                    )
                    payloads.append(bmp_bytes(w, h, idx, palette=pal))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_bmp_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched BMP decode over (doc_id, payload): channel sums
    come from the post-swizzle (or post-lookup) RGB raster, so a missed
    BGR→RGB swap, a wrong row-padding stride, or an un-flipped
    bottom-up row order lands on r_sum/b_sum or first/last pixels.
    ``strict=False`` = poison-safe NULL-stats rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("media_type") != "image/bmp":
                        raise ValueError("expected a BMP")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "bpp", "palette_size",
                                    "r_sum", "g_sum", "b_sum",
                                    "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                r = d["raster"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "bpp": d["bpp"],
                        "palette_size": d["palette_size"],
                        "r_sum": sum(r[0::3]),
                        "g_sum": sum(r[1::3]),
                        "b_sum": sum(r[2::3]),
                        "first_px": r[0],
                        "last_px": r[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=BMP_STATS_SCHEMA)


G711_STATS_SCHEMA = (
    "doc_id long, encoding string, n_samples long, sum_linear long, "
    "sum_abs long, peak long, first_sample long, last_sample long"
)


def synthesize_g711(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL G.711 WAVs (telephony audio): ``d%300+50`` code
    bytes ``(13n + 7d) mod 256`` at 8 kHz mono — µ-law (fmt 7) for even
    docs, A-law (fmt 6) for odd — so every code value, both laws, and
    both sign conventions appear across the corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                n = d % 300 + 50
                codes = bytes((13 * i + 7 * d) % 256 for i in range(n))
                payloads.append(
                    wav_g711_bytes(1, 8000, codes, "ulaw" if d % 2 == 0 else "alaw")
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_g711_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched G.711 decode over (doc_id, payload): stats come
    from the EXPANDED 16-bit linear samples, so a wrong bias (0x84),
    toggle (0x55), segment shift or sign convention shifts
    sum_linear/sum_abs/peak immediately. ``strict=False`` =
    poison-safe NULL-stats rows (see :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("encoding") not in ("alaw", "ulaw"):
                        raise ValueError("expected a G.711 WAV")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "encoding", "n_samples", "sum_linear",
                                    "sum_abs", "peak", "first_sample",
                                    "last_sample",
                                )
                            },
                        }
                    )
                    continue
                s = d["samples"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "encoding": d["encoding"],
                        "n_samples": len(s),
                        "sum_linear": sum(s),
                        "sum_abs": sum(abs(v) for v in s),
                        "peak": max(abs(v) for v in s),
                        "first_sample": s[0],
                        "last_sample": s[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=G711_STATS_SCHEMA)


ADPCM_STATS_SCHEMA = (
    "doc_id long, encoding string, n_samples long, sum_linear long, "
    "sum_abs long, peak long, first_sample long, last_sample long"
)


def synthesize_adpcm(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL IMA ADPCM WAVs (format tag 0x11 — the 4-bit
    nibble codec of classic voice recordings): ``1 + d%2`` blocks of
    ``d%90 + 30`` nibbles each, block ``b`` seeded with predictor
    ``(37d + 101b) mod 4001 − 2000`` and step index ``(d + 11b) mod
    89`` so every step-table region, both signs, and the multi-block
    re-seed path all appear across the corpus; nibbles are the
    closed-form ``(5i + 3d + 7b) mod 16`` the oracle can replay."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                n_nib = d % 90 + 30
                blocks = []
                for blk in range(1 + d % 2):
                    blocks.append((
                        (37 * d + 101 * blk) % 4001 - 2000,
                        (d + 11 * blk) % 89,
                        [(5 * i + 3 * d + 7 * blk) % 16 for i in range(n_nib)],
                    ))
                payloads.append(wav_adpcm_bytes(8000, blocks, n_nib + 1))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def synthesize_msadpcm(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL MS ADPCM WAVs (format tag 0x02 — the two-tap
    coefficient-predictor codec; round 14): ``1 + d%2`` blocks of
    ``2·(d%10 + 15)`` nibbles each (30..48, even — whole data bytes),
    block ``b`` seeded with coefficient pair ``(d + b) mod 7`` (all 7
    standard pairs appear across the corpus), delta ``16 + (13d +
    29b) mod 1500``, samp1 ``(37d + 101b) mod 4001 − 2000`` and samp2
    ``(53d + 7b) mod 4001 − 2000`` (both signs of the predictor sum —
    the truncating division's hard case); nibbles are the closed-form
    ``(5i + 3d + 7b) mod 16`` the oracle can replay. The full-alphabet
    nibble walk makes the adaptive delta grow past int64 mid-stream,
    which is why the oracle carries it as HUGEINT."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                n_nib = 2 * (d % 10 + 15)
                blocks = []
                for blk in range(1 + d % 2):
                    blocks.append((
                        (d + blk) % 7,
                        16 + (13 * d + 29 * blk) % 1500,
                        (37 * d + 101 * blk) % 4001 - 2000,
                        (53 * d + 7 * blk) % 4001 - 2000,
                        [(5 * i + 3 * d + 7 * blk) % 16 for i in range(n_nib)],
                    ))
                payloads.append(wav_msadpcm_bytes(8000, blocks, n_nib + 2))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


AHASH_SCHEMA = (
    "doc_id long, ahash string, dhash string, width long, height long"
)


def ahash_bits(raster, width: int, height: int) -> str:
    """64-bit average-hash of a grayscale raster as a '0'/'1' string
    (row-major 8×8 cell order): the image is box-reduced to an 8×8
    grid of cell sums and bit i is ``64·cell_sum_i > total_sum`` — the
    INTEGER-EXACT form of "cell mean above image mean" (no float
    division, so any engine reproduces it bit-for-bit). aHash is
    mean-relative: a global brightness shift that wraps nowhere leaves
    every bit unchanged, while moving content between cells flips
    bits — the cheap perceptual fingerprint image-dedup pipelines
    (LAION-style) bucket on before any expensive embedding pass.
    Dimensions must be multiples of 8 (exact cells, no interpolation
    policy to disagree over)."""
    if width % 8 or height % 8 or width < 8 or height < 8:
        raise ValueError(
            f"ahash needs dimensions divisible by 8, got {width}x{height}"
        )
    cells = _cell_sums(raster, width, height)
    total = sum(cells)
    return "".join("1" if 64 * c > total else "0" for c in cells)


def _cell_sums(raster, width: int, height: int) -> list:
    """8×8 grid of cell sums shared by the hash families (dimensions
    pre-validated by the callers)."""
    bw, bh = width // 8, height // 8
    cells = [0] * 64
    for y in range(height):
        row = y // bh * 8
        base = y * width
        for x in range(width):
            cells[row + x // bw] += raster[base + x]
    return cells


def dhash_bits(raster, width: int, height: int) -> str:
    """56-bit difference-hash (gradient) of a grayscale raster as a
    '0'/'1' string: over the same 8×8 cell-sum grid as
    :func:`ahash_bits`, bit (r, c) is ``cell_sum[r][c+1] >
    cell_sum[r][c]`` — 7 adjacent-column comparisons per row,
    row-major. This is the INTEGER-EXACT form of the classic 9×8
    dHash: equal-area cells make adjacent sums directly comparable,
    with no resample interpolation policy for engines to disagree
    over. dHash is differential where aHash is mean-relative — a
    LOCAL gradient flip (re-ordered content within a row) moves
    dHash even when the cell means straddle the global mean
    identically, which is why image-dedup pipelines bucket on both.
    Same divisibility contract as aHash."""
    if width % 8 or height % 8 or width < 8 or height < 8:
        raise ValueError(
            f"dhash needs dimensions divisible by 8, got {width}x{height}"
        )
    cells = _cell_sums(raster, width, height)
    return "".join(
        "1" if cells[r * 8 + c + 1] > cells[r * 8 + c] else "0"
        for r in range(8)
        for c in range(7)
    )


def image_ahash(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched perceptual hashing over (doc_id, payload): REAL
    decode (:func:`decode_real`) to the raster, then BOTH cheap
    fingerprint families over one shared cell-sum pass — the 64-bit
    average hash (:func:`ahash_bits`, mean-relative) and the 56-bit
    difference hash (:func:`dhash_bits`, gradient). Only the (doc_id,
    hash, hash) triple ever leaves the pass — the dedup groupBys
    downstream shuffle hashes, never pixels, the same 100 TB shape as
    the text-dedup tiers. ``strict=False`` = poison-safe NULL-hash
    rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if "raster" not in d:
                        raise ValueError(
                            f"not a hashable raster: {d.get('media_type')}"
                        )
                    if d.get("channels", 1) not in (None, 1):
                        raise ValueError("ahash expects a grayscale raster")
                    h = ahash_bits(d["raster"], d["width"], d["height"])
                    dh = dhash_bits(d["raster"], d["width"], d["height"])
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {"doc_id": doc_id, "ahash": None, "dhash": None,
                         "width": None, "height": None}
                    )
                    continue
                rows.append(
                    {"doc_id": doc_id, "ahash": h, "dhash": dh,
                     "width": d["width"], "height": d["height"]}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AHASH_SCHEMA)


def synthesize_ahash_pngs(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture a corpus with REAL duplicate images for the
    perceptual-dedup gate: selected docs come in quadruples sharing
    ``g = doc_id // 11`` (the gate selects residues 2/3/4/5 mod 11, so
    each g contributes doc_ids 11g+2..5); variants 0 and 1 are
    BYTE-IDENTICAL grayscale PNGs of the ``(3x + 5y + 7g + x²(g%11) +
    y²(g%13)) mod 256`` lattice at ``8(g%3+1) × 8(g%2+1)`` — the
    quadratic terms diversify the hash ACROSS groups (a pure
    ``3x+5y+7g`` lattice differs between groups only by a brightness
    shift, which aHash is invariant to by design, so most of the
    corpus collapsed into a handful of giant hash classes — realistic
    image corpora don't do that, and the degenerate buckets blew the
    banded join's per-bucket quadratic to sh/in 47; with the quadratic
    terms the largest hash class at g < 460 is 3 and band buckets cap
    at 24). Variant 2 adds 100 (mod 256) on the checkerboard of even
    8×8 cells — content moved between cells, so its hash lands FAR
    (aHash hamming ≥ 14 from its group across g < 460) — and variant 3
    (round 14c) perturbs only the top-left cell, a NEAR-duplicate: its
    aHash lands mostly at hamming 1–3 of variant 0 (423/460 within the
    ≤3 radius), the radius the banded multi-index pairing must find
    without ever going all-pairs. Every pixel is closed-form in
    (g, v, x, y), so the oracle recomputes the hash arithmetically
    while the engine must decode the real PNG."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                g, v = d // 11, d % 11 - 2
                w, h = 8 * (g % 3 + 1), 8 * (g % 2 + 1)
                bw, bh = w // 8, h // 8
                raster = bytes(
                    (
                        3 * x + 5 * y + 7 * g
                        + x * x * (g % 11) + y * y * (g % 13)
                        + (100 if v == 2 and (x // bw + y // bh) % 2 == 0 else 0)
                        + (100 if v == 3 and x < bw and y < bh else 0)
                    ) % 256
                    for y in range(h)
                    for x in range(w)
                )
                payloads.append(png_pixel_bytes(w, h, raster, 0))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


AVI_STATS_SCHEMA = (
    "doc_id long, frame_idx long, codec string, width long, height long, "
    "n_frames long, px_sum long, first_px long, last_px long, "
    "audio_n_samples long, audio_sum long, diff_prev long, "
    "is_scene_cut boolean"
)

# scene-cut threshold: mean absolute per-sample difference vs the
# previous frame strictly above this flags a cut (integer-exact:
# diff_prev > SCENE_CUT_MEAN_DIFF * n_samples on both engines)
SCENE_CUT_MEAN_DIFF = 64


def synthesize_avi_mjpeg(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL AVI/MJPEG videos (round 14 — video becomes the
    fourth real-decode modality): doc ``d`` carries ``d%4 + 2`` frames
    of ``8·(d%3+1) × 8·(d%2+1)`` grayscale, frame ``f`` encoded through
    the FULL baseline-JPEG pipeline as constant 8×8 tiles valued
    ``(11tx + 23ty + 7d + 41f) mod 256`` — the exact-at-quant-1
    fixture, now varying per frame so a decoder that re-serves frame 0
    (or misorders '00dc' chunks) lands on the per-frame stats. The
    container is the standard header tree + movi list + idx1 index
    (see :mod:`.avicodec`)."""
    from .avicodec import avi_mjpeg_bytes
    from .jpegcodec import jpeg_pixel_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 8 * (d % 3 + 1), 8 * (d % 2 + 1)
                frames = []
                for f in range(d % 4 + 2):
                    raster = bytes(
                        (11 * (x // 8) + 23 * (y // 8) + 7 * d + 41 * f) % 256
                        for y in range(h)
                        for x in range(w)
                    )
                    frames.append(jpeg_pixel_bytes(w, h, raster))
                payloads.append(
                    avi_mjpeg_bytes(w, h, frames, fps=5 + d % 10)
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def synthesize_avi_av(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture interleaved A/V AVIs (round 14b — the standard
    two-stream container shape, retiring the audio-stream and
    uncompressed-frame refusals): doc ``d`` carries ``d%3 + 2``
    UNCOMPRESSED 24-bit DIB frames of ``(d%5+3) × (d%4+2)`` — widths
    3..7 so the 4-byte row stride actually pads — stored bottom-up for
    even ``d`` and top-down (negative biHeight) for odd ``d``, pixel
    byte ``(x,y,c)`` of frame ``f`` valued ``(3x + 5y + 11c + 7d +
    41f) mod 256``; plus a mono PCM16 'auds' stream of ``40 + d%50``
    samples valued ``(37i + 13d) mod 4001 − 2000``, split into '01wb'
    chunks at byte 7 — MID-SAMPLE, which is legal AVI and forces the
    decoder to concatenate before sample-decoding."""
    from .avicodec import avi_av_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = d % 5 + 3, d % 4 + 2
                frames = [
                    bytes(
                        (3 * x + 5 * y + 11 * c + 7 * d + 41 * f) % 256
                        for y in range(h)
                        for x in range(w)
                        for c in range(3)
                    )
                    for f in range(d % 3 + 2)
                ]
                n = 40 + d % 50
                audio = struct.pack(
                    f"<{n}h", *((37 * i + 13 * d) % 4001 - 2000 for i in range(n))
                )
                payloads.append(
                    avi_av_bytes(
                        w, h, frames, codec="DIB",
                        audio=audio, audio_rate=8000 + 100 * (d % 5),
                        fps=5 + d % 10, bottom_up=(d % 2 == 0),
                        audio_splits=[7, len(audio) - 7],
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_avi_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched REAL AVI decode over (doc_id, payload) — ONE ROW
    PER FRAME, every stat from the frame's DECODED raster (container
    walk, structural validation, then the full baseline JPEG decoder
    per '00dc' chunk or the padded-stride DIB unpack per '00db' — see
    :func:`avicodec.avi_decode_frames`). When the container interleaves
    a PCM16 'auds' stream, ``audio_n_samples``/``audio_sum`` carry the
    decoded-sample stats (constant per doc, NULL for silent
    containers). A decoder that trusts the index, skips a frame,
    returns metadata instead of pixels, or sample-decodes '01wb'
    chunks independently (splits land mid-sample) cannot produce these
    sums. Temporal analysis rides the same pass (round 14c):
    ``diff_prev`` is the L1 frame difference Σ|sample − previous
    frame's sample| over the decoded rasters (NULL on frame 0) and
    ``is_scene_cut`` flags a mean absolute difference strictly above
    :data:`SCENE_CUT_MEAN_DIFF` — the shot-boundary heuristic
    frame-selection pipelines key on, computed WHERE THE PIXELS ALREADY
    ARE (consecutive frames of one video sit in one Arrow batch, so
    the 100 TB shape needs no self-join of rasters and no pixel ever
    crosses an Exchange). ``strict=False`` = poison-safe NULL-stats
    rows (see :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("media_type") != "video/avi":
                        raise ValueError("expected an AVI stream")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "frame_idx", "codec", "width",
                                    "height", "n_frames", "px_sum",
                                    "first_px", "last_px",
                                    "audio_n_samples", "audio_sum",
                                    "diff_prev", "is_scene_cut",
                                )
                            },
                        }
                    )
                    continue
                audio = d.get("audio")
                audio_n = audio["n_samples"] if audio else None
                audio_sum = sum(audio["samples"]) if audio else None
                prev = None
                for k, fr in enumerate(d["frames"]):
                    raster = fr["raster"]
                    diff_prev = (
                        None
                        if prev is None
                        else sum(abs(a - b) for a, b in zip(raster, prev))
                    )
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": k,
                            "codec": d["codec"],
                            "width": d["width"],
                            "height": d["height"],
                            "n_frames": d["n_frames"],
                            "px_sum": sum(raster),
                            "first_px": raster[0],
                            "last_px": raster[-1],
                            "audio_n_samples": audio_n,
                            "audio_sum": audio_sum,
                            "diff_prev": diff_prev,
                            "is_scene_cut": (
                                None
                                if diff_prev is None
                                else bool(
                                    diff_prev
                                    > SCENE_CUT_MEAN_DIFF * len(raster)
                                )
                            ),
                        }
                    )
                    prev = raster
            if rows:  # an all-poison batch must not yield a 0-column frame
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AVI_STATS_SCHEMA)


def decode_adpcm_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched ADPCM decode over (doc_id, payload) — IMA (fmt
    17) and, since round 14, MS (fmt 2) streams side by side (the
    ``encoding`` column says which): stats come from the
    RECONSTRUCTED 16-bit predictor trail, so a wrong step/adaptation
    table entry, clamp, coefficient pair, truncation direction,
    nibble order (IMA low-first, MS HIGH-first!) or a block header
    not re-seeding the state lands on sum_linear/peak immediately.
    ``strict=False`` = poison-safe NULL-stats rows (see
    :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("encoding") not in ("ima_adpcm", "ms_adpcm"):
                        raise ValueError("expected an IMA or MS ADPCM WAV")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "encoding", "n_samples", "sum_linear",
                                    "sum_abs", "peak", "first_sample",
                                    "last_sample",
                                )
                            },
                        }
                    )
                    continue
                s = d["samples"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "encoding": d["encoding"],
                        "n_samples": len(s),
                        "sum_linear": sum(s),
                        "sum_abs": sum(abs(v) for v in s),
                        "peak": max(abs(v) for v in s),
                        "first_sample": s[0],
                        "last_sample": s[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=ADPCM_STATS_SCHEMA)


FLAC_STATS_SCHEMA = (
    "doc_id long, n_frames long, n_samples long, subframes string, "
    "sum_linear long, sum_abs long, peak long, first_sample long, "
    "last_sample long"
)


def synthesize_flac(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL FLAC streams (round 11 — the archival lossless
    audio format): three frames per doc exercising every subframe
    family — CONSTANT (``(17d) mod 4001 − 2000``), FIXED order
    ``d mod 5`` with Rice partition order ``d mod 2`` over a quadratic
    sample curve (doubled when ``d mod 4 = 1`` to force an explicit
    wasted bit; even docs trip auto-detected wasted bits for free),
    and VERBATIM (``d mod 3 = 0``) or LPC order 2 (coefs 3,−1 shift 1)
    otherwise. Samples are closed-form so the oracle replays them in
    arithmetic SQL; residuals, Rice parameters, CRC-8/16 and the
    STREAMINFO MD5 are computed by the real encoder."""
    from .flaccodec import flac_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                m = 2 if d % 4 == 1 else 1
                f0 = [(17 * d) % 4001 - 2000] * (d % 40 + 24)
                f1 = [
                    m * ((13 * i * i + 7 * i + 31 * d) % 3900 - 1950)
                    for i in range(2 * (d % 25 + 15))
                ]
                nb2 = d % 30 + 20
                if d % 3 == 0:
                    f2 = [(17 * i + 29 * d) % 3001 - 1500 for i in range(nb2)]
                    spec2 = ("verbatim",)
                else:
                    f2 = [
                        (11 * i * i + 5 * i + 23 * d) % 3800 - 1900
                        for i in range(nb2)
                    ]
                    spec2 = ("lpc", [3, -1], 1, 4, 0)
                payloads.append(
                    flac_bytes(
                        44100, 16,
                        [
                            (f0, ("constant",)),
                            (f1, ("fixed", d % 5, d % 2)),
                            (f2, spec2),
                        ],
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_flac_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched FLAC decode over (doc_id, payload): stats come
    from the LOSSLESSLY reconstructed samples, so a wrong Rice
    parameter read, predictor coefficient, wasted-bit restore, or a
    CRC/MD5 check that should have fired lands on sum_linear/peak (or
    raises) immediately; ``subframes`` pins that the intended decode
    paths (constant/fixed-N/verbatim/lpc-N) actually ran.
    ``strict=False`` = poison-safe NULL-stats rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("encoding") != "flac":
                        raise ValueError("expected a FLAC stream")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "n_frames", "n_samples", "subframes",
                                    "sum_linear", "sum_abs", "peak",
                                    "first_sample", "last_sample",
                                )
                            },
                        }
                    )
                    continue
                s = d["samples"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_frames": d["n_frames"],
                        "n_samples": len(s),
                        "subframes": d["subframes"],
                        "sum_linear": sum(s),
                        "sum_abs": sum(abs(v) for v in s),
                        "peak": max(abs(v) for v in s),
                        "first_sample": s[0],
                        "last_sample": s[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FLAC_STATS_SCHEMA)


FLAC_STEREO_STATS_SCHEMA = (
    "doc_id long, channels long, n_frames long, n_samples long, "
    "assignments string, subframes string, sum_left long, sum_right long, "
    "peak long, first_left long, first_right long, last_left long, "
    "last_right long"
)


def synthesize_flac_stereo(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL stereo FLAC streams (round 12 — the gate the
    round-11 verdict queued): two frames of DIFFERENT blocksizes per
    doc, channel assignment rotating ``d%4`` over independent /
    left-side / right-side / mid-side (the decorrelated layouts every
    real encoder emits: the side channel carries one extra bit, the
    mid floor's lost low bit is recovered from the side's parity), and
    VARIABLE blocking on even docs (frame headers code the first-
    sample index, live-capture style) — so all four assignments AND
    both blocking strategies are driver-gated, not just
    property-tested. Left/right are closed-form curves over a global
    sample index; reconstruction is exact, so the oracle replays the
    arithmetic."""
    from .flaccodec import flac_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                n0, n1 = d % 30 + 20, d % 20 + 16
                left = [(13 * j + 29 * d) % 3001 - 1500 for j in range(n0 + n1)]
                right = [(7 * j + 17 * d) % 2801 - 1400 for j in range(n0 + n1)]
                frames = [
                    (
                        [left[:n0], right[:n0]],
                        [("fixed", d % 5, 0), ("fixed", (d + 2) % 5, 0)],
                    ),
                    (
                        [left[n0:], right[n0:]],
                        [("verbatim",), ("fixed", 1, 0)],
                    ),
                ]
                payloads.append(
                    flac_bytes(
                        44100, 16, frames, channels=2,
                        assignment=["independent", "left_side", "right_side",
                                    "mid_side"][d % 4],
                        variable_blocking=d % 2 == 0,
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_flac_stereo_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched stereo FLAC decode over (doc_id, payload):
    per-channel stats come from the de-interleaved LOSSLESS samples,
    so a wrong side-channel reconstruction (l−s / r+s / mid-parity), a
    missed extra side bit, or a variable-blocking sample-number slip
    lands on sum_left/sum_right exactly; ``assignments`` pins that the
    intended decorrelated paths actually ran. ``strict=False`` =
    poison-safe NULL-stats rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("encoding") != "flac" or d.get("channels") != 2:
                        raise ValueError("expected a stereo FLAC stream")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "channels", "n_frames", "n_samples",
                                    "assignments", "subframes", "sum_left",
                                    "sum_right", "peak", "first_left",
                                    "first_right", "last_left", "last_right",
                                )
                            },
                        }
                    )
                    continue
                s = d["samples"]
                left, right = s[0::2], s[1::2]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "channels": d["channels"],
                        "n_frames": d["n_frames"],
                        "n_samples": d["n_samples"],
                        "assignments": d["assignments"],
                        "subframes": d["subframes"],
                        "sum_left": sum(left),
                        "sum_right": sum(right),
                        "peak": max(abs(v) for v in s),
                        "first_left": left[0],
                        "first_right": right[0],
                        "last_left": left[-1],
                        "last_right": right[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FLAC_STEREO_STATS_SCHEMA)


AUDIO_LINEAR_STATS_SCHEMA = (
    "doc_id long, media_type string, encoding string, n_samples long, "
    "sum_linear long, sum_abs long, peak long"
)


def decode_audio_linear_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched format-agnostic audio decode over (doc_id,
    payload): every payload runs :func:`decode_real`'s sniff-and-
    dispatch, so PCM / G.711 / IMA-ADPCM WAV and FLAC all land on the
    same linear-sample stats row (round 12 — the execution-shape bench
    for the audio tier prices THIS pass against its per-row pickled
    twin). Strict: an undecodable payload raises — bench fixtures are
    clean by construction (poison safety is media_poison_battery's
    job)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_real(bytes(payload))
                if "samples" not in d:
                    raise ValueError(
                        f"not an audio payload ({d.get('media_type')})"
                    )
                s = d["samples"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": d["media_type"],
                        "encoding": d.get("encoding"),
                        "n_samples": len(s),
                        "sum_linear": sum(s),
                        "sum_abs": sum(abs(v) for v in s),
                        "peak": max(abs(v) for v in s),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AUDIO_LINEAR_STATS_SCHEMA)


GIF_STATS_SCHEMA = (
    "doc_id long, frame_index long, n_frames long, width long, height long, "
    "palette_size long, r_sum long, g_sum long, b_sum long, "
    "first_px long, last_px long"
)


def synthesize_gif(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL GIFs (the web-crawl staple): ``d%3+1`` frames
    of ``(d%11+4) × (d%7+4)`` over a ``2^(d%4+1)``-entry global color
    table ``(7j, 13j, 29j) mod 256``, frame ``f``'s index at (x, y)
    valued ``(x + 2y + 3f + d) mod n_colors``; every even doc
    interlaced (the 4-pass progressive-rendering layout). Closed-form
    in (doc_id, frame), so the oracle recomputes per-frame channel
    sums while the engine must run real LZW decompression, palette
    lookup and deinterlacing."""
    from .gifcodec import gif_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                nf, w, h = d % 3 + 1, d % 11 + 4, d % 7 + 4
                nc = 2 << (d % 4)
                pal = bytes(
                    v
                    for j in range(nc)
                    for v in ((7 * j) % 256, (13 * j) % 256, (29 * j) % 256)
                )
                idx = bytes(
                    (x + 2 * y + 3 * f + d) % nc
                    for f in range(nf)
                    for y in range(h)
                    for x in range(w)
                )
                payloads.append(
                    gif_bytes(w, h, idx, pal, interlace=d % 2 == 0, n_frames=nf)
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_gif_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched GIF decode over (doc_id, payload), one output row
    per FRAME (1→N explode inside the same pass): channel sums come
    from the post-palette RGB raster, so a wrong LZW dictionary step,
    code-width growth, sub-block reassembly, or deinterlace row order
    lands on r_sum/g_sum/b_sum. ``strict=False`` = poison-safe
    NULL-stats rows (see :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("media_type") != "image/gif":
                        raise ValueError("expected a GIF")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "frame_index", "n_frames", "width", "height",
                                    "palette_size", "r_sum", "g_sum", "b_sum",
                                    "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                for fi, (frame, (fw, fh)) in enumerate(
                    zip(d["frames"], d["frame_dims"])
                ):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_index": fi,
                            "n_frames": d["n_frames"],
                            "width": fw,
                            "height": fh,
                            "palette_size": d["palette_size"],
                            "r_sum": sum(frame[0::3]),
                            "g_sum": sum(frame[1::3]),
                            "b_sum": sum(frame[2::3]),
                            "first_px": frame[0],
                            "last_px": frame[-1],
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=GIF_STATS_SCHEMA)


JPEG_LL_STATS_SCHEMA = (
    "doc_id long, width long, height long, predictor long, n_samples long, "
    "sample_sum long, first_sample long, last_sample long, max_sample long"
)


def synthesize_jpeg_lossless(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL lossless (SOF3) JPEGs — the DICOM/medical
    frame type: 16-bit grayscale ``(d%13+4) × (d%9+4)`` rasters (NOT
    multiples of 8 — there is no block grid) with sample
    ``(513x + 1021y + 131d) mod 65536``, encoded with predictor
    ``d%7+1`` so all seven T.81 H.1 predictors are driver-gated.
    Lossless reconstruction is exact on arbitrary data, so the oracle
    recomputes raw sample arithmetic — no DCT-exactness argument."""
    from .jpegcodec import jpeg_lossless_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = d % 13 + 4, d % 9 + 4
                samples = [
                    (513 * x + 1021 * y + 131 * d) % 65536
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(
                    jpeg_lossless_bytes(
                        w, h, [samples], predictor=d % 7 + 1, precision=16
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg_lossless_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched lossless-JPEG decode over (doc_id, payload): stats
    come from the reconstructed u16 samples and ``predictor`` from the
    parsed scan header — a wrong predictor formula, boundary rule
    (first line → a, first column → b), or modulo-2^16 reconstruction
    bug lands on sample_sum exactly (lossless means EXACT; there is no
    tolerance to hide in). ``strict=False`` = poison-safe NULL-stats
    rows (see :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if not d.get("lossless") or "samples16" not in d:
                        raise ValueError("expected a 16-bit lossless JPEG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "predictor", "n_samples",
                                    "sample_sum", "first_sample", "last_sample",
                                    "max_sample",
                                )
                            },
                        }
                    )
                    continue
                s = d["samples16"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "predictor": d["predictor"],
                        "n_samples": len(s),
                        "sample_sum": sum(s),
                        "first_sample": s[0],
                        "last_sample": s[-1],
                        "max_sample": max(s),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_LL_STATS_SCHEMA)


JPEG_420_SCHEMA = (
    "doc_id long, width long, height long, cb_width long, cb_height long, "
    "n_mcus long, y_sum long, cb_sum long, cr_sum long, "
    "first_px long, last_px long"
)


def synthesize_jpeg_subsampled(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL 4:2:0 baseline JPEGs: a ``16·(d%3+1) ×
    16·(d%2+1)`` frame whose full-resolution Y plane and half-resolution
    Cb/Cr planes are each constant 8×8 tiles valued
    ``(11tx + 23ty + 7d + 31c) mod 256`` at that plane's OWN tile grid
    — the exact-at-quant-1 fixture per plane, so the oracle recomputes
    every plane sum arithmetically while the engine must walk the 2×2-
    luma interleaved MCUs (4 Y blocks + Cb + Cr per MCU, per-component
    DC predictors) to reproduce them."""
    from .jpegcodec import jpeg_planes_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 16 * (d % 3 + 1), 16 * (d % 2 + 1)

                def tiles(cw: int, ch: int, c: int) -> bytes:
                    return bytes(
                        (11 * (x // 8) + 23 * (y // 8) + 7 * d + 31 * c) % 256
                        for y in range(ch)
                        for x in range(cw)
                    )

                payloads.append(
                    jpeg_planes_bytes(
                        w, h,
                        [tiles(w, h, 0), tiles(w // 2, h // 2, 1),
                         tiles(w // 2, h // 2, 2)],
                        sampling=[(2, 2), (1, 1), (1, 1)],
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def synthesize_jpeg_411(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL 4:1:1 baseline JPEGs (the DV-video chroma
    layout; sampling factor 4 was an explicit ValueError through round
    9): a ``32·(d%2+1) × 8·(d%3+1)`` frame, Y at (4,1) and
    quarter-width full-height chroma, each plane constant 8×8 tiles
    valued ``(11tx + 23ty + 7d + 31c) mod 256`` on its OWN grid — the
    engine must walk 4-Y-blocks-per-MCU interleaving to reproduce the
    per-plane sums."""
    from .jpegcodec import jpeg_planes_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                w, h = 32 * (d % 2 + 1), 8 * (d % 3 + 1)

                def tiles(cw: int, ch: int, c: int) -> bytes:
                    return bytes(
                        (11 * (x // 8) + 23 * (y // 8) + 7 * d + 31 * c) % 256
                        for y in range(ch)
                        for x in range(cw)
                    )

                payloads.append(
                    jpeg_planes_bytes(
                        w, h,
                        [tiles(w, h, 0), tiles(w // 4, h, 1), tiles(w // 4, h, 2)],
                        sampling=[(4, 1), (1, 1), (1, 1)],
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg411_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched 4:1:1 JPEG decode over (doc_id, payload): the
    sibling of :func:`decode_jpeg_subsampled_stats` for horizontal
    factor 4 — the row asserts the parsed sampling really is
    [(4,1),(1,1),(1,1)] (a fallback that upsamples or mis-walks the
    4-block MCU mismatches cb_width/cb_height or the plane sums).
    ``strict=False`` = poison-safe NULL-stats rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("sampling") != [(4, 1), (1, 1), (1, 1)]:
                        raise ValueError("expected a 4:1:1 three-component JPEG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "cb_width", "cb_height",
                                    "n_mcus", "y_sum", "cb_sum", "cr_sum",
                                    "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                sums = [sum(p) for p in d["planes"]]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "cb_width": d["plane_dims"][1][0],
                        "cb_height": d["plane_dims"][1][1],
                        "n_mcus": (d["width"] // 32) * (d["height"] // 8),
                        "y_sum": sums[0],
                        "cb_sum": sums[1],
                        "cr_sum": sums[2],
                        "first_px": d["planes"][0][0],
                        "last_px": d["planes"][2][-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_420_SCHEMA)


JPEG_311_SCHEMA = (
    "doc_id long, width long, height long, samp string, cb_width long, "
    "cb_height long, y_sum long, cb_sum long, cr_sum long, "
    "first_px long, last_px long"
)


def synthesize_jpeg_311(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL factor-3 baseline JPEGs (round 11 — T.81 allows
    any sampling factor 1..4, but 3 was an explicit ValueError because
    nothing exercised the non-power-of-two MCU walk): even docs get the
    horizontal 3:1:1 layout (Y at (3,1), third-width chroma), odd docs
    the vertical 1:3 twin — each plane constant 8×8 tiles valued
    ``(11tx + 23ty + 7d + 31c) mod 256`` on its OWN grid."""
    from .jpegcodec import jpeg_planes_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)

                def tiles(cw: int, ch: int, c: int) -> bytes:
                    return bytes(
                        (11 * (x // 8) + 23 * (y // 8) + 7 * d + 31 * c) % 256
                        for y in range(ch)
                        for x in range(cw)
                    )

                if d % 2 == 0:
                    w, h = 24 * (d % 3 + 1), 8 * ((d // 2) % 2 + 1)
                    planes = [tiles(w, h, 0), tiles(w // 3, h, 1), tiles(w // 3, h, 2)]
                    samp = [(3, 1), (1, 1), (1, 1)]
                else:
                    w, h = 8 * ((d // 2) % 2 + 1), 24 * (d % 3 + 1)
                    planes = [tiles(w, h, 0), tiles(w, h // 3, 1), tiles(w, h // 3, 2)]
                    samp = [(1, 3), (1, 1), (1, 1)]
                payloads.append(jpeg_planes_bytes(w, h, planes, sampling=samp))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_jpeg311_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched factor-3 JPEG decode over (doc_id, payload): the
    ``samp`` column pins that the parsed factors really are 3x1 / 1x3
    (a decoder that rounds 3 to a power of two mis-walks the 5-block
    MCU and lands on the plane sums or chroma dims immediately).
    ``strict=False`` = poison-safe NULL-stats rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    samp = d.get("sampling")
                    if samp not in ([(3, 1), (1, 1), (1, 1)], [(1, 3), (1, 1), (1, 1)]):
                        raise ValueError("expected a factor-3 three-component JPEG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "samp", "cb_width",
                                    "cb_height", "y_sum", "cb_sum", "cr_sum",
                                    "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                sums = [sum(p) for p in d["planes"]]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "samp": f"{samp[0][0]}x{samp[0][1]}",
                        "cb_width": d["plane_dims"][1][0],
                        "cb_height": d["plane_dims"][1][1],
                        "y_sum": sums[0],
                        "cb_sum": sums[1],
                        "cr_sum": sums[2],
                        "first_px": d["planes"][0][0],
                        "last_px": d["planes"][2][-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_311_SCHEMA)


def decode_jpeg_subsampled_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched 4:2:0 JPEG decode over (doc_id, payload): per-plane
    sums come from the three entropy-decoded component planes at their
    STORED (subsampled) resolutions, and cb_width/cb_height pin the
    half-resolution chroma geometry — a sampling-factor, MCU-block-order
    or plane-size bug mismatches before any sum is compared.
    ``strict=False`` = poison-safe NULL-stats rows (see
    :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if d.get("sampling") != [(2, 2), (1, 1), (1, 1)]:
                        raise ValueError("expected a 4:2:0 three-component JPEG")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "width", "height", "cb_width", "cb_height",
                                    "n_mcus", "y_sum", "cb_sum", "cr_sum",
                                    "first_px", "last_px",
                                )
                            },
                        }
                    )
                    continue
                sums = [sum(p) for p in d["planes"]]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "cb_width": d["plane_dims"][1][0],
                        "cb_height": d["plane_dims"][1][1],
                        "n_mcus": (d["width"] // 16) * (d["height"] // 16),
                        "y_sum": sums[0],
                        "cb_sum": sums[1],
                        "cr_sum": sums[2],
                        "first_px": d["planes"][0][0],
                        "last_px": d["planes"][2][-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_420_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "doc_id long, n_samples long, sample_rate long, sum_abs long, "
    "energy long, zero_crossings long, peak long, first_sample long, last_sample long"
)


def synthesize_wav_pcm(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture REAL mono 16-bit PCM WAVs with deterministic signal:
    sample ``n`` of doc ``d`` is ``((7d + 13n) mod 2001) − 1000``
    (±1000 swing, sign-alternating enough to exercise zero-crossing
    counting), ``d % 400 + 100`` samples at 8 kHz — closed-form in
    doc_id so the oracle recomputes every feature by arithmetic while
    the engine must unpack the actual PCM bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                n = d % 400 + 100
                samples = [((7 * d + 13 * k) % 2001) - 1000 for k in range(n)]
                payloads.append(wav_pcm_bytes(1, 8000, samples))
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def decode_audio_stats(media: DataFrame, strict: bool = True) -> DataFrame:
    """Arrow-batched REAL audio feature extraction over (doc_id,
    payload): every feature — energy (Σs²), mean-abs numerator,
    zero-crossing count (strict sign products), peak — is computed from
    the PCM samples :func:`wav_decode_samples` unpacks from the actual
    ``data`` chunk. Exact integer outputs, so both engines agree
    bit-for-bit. ``strict=False`` = poison-safe NULL-stats rows (see
    :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_real(bytes(payload))
                    if "raster" not in d and "samples" not in d:
                        raise ValueError(f"undecodable payload: {d['media_type']}")
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "n_samples", "sample_rate", "sum_abs",
                                    "energy", "zero_crossings", "peak",
                                    "first_sample", "last_sample",
                                )
                            },
                        }
                    )
                    continue
                s = d["samples"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": d["n_samples"],
                        "sample_rate": d["sample_rate"],
                        "sum_abs": sum(abs(x) for x in s),
                        "energy": sum(x * x for x in s),
                        "zero_crossings": sum(
                            1 for a, b in zip(s, s[1:]) if a * b < 0
                        ),
                        "peak": max(abs(x) for x in s),
                        "first_sample": s[0],
                        "last_sample": s[-1],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


AUDIO_DS_SCHEMA = (
    "doc_id long, in_samples long, out_samples long, in_rate long, out_rate long, "
    "channels long, payload binary, sum_abs long, energy long, "
    "first_sample long, last_sample long, vad_windows long, "
    "vad_silent long, vad_segments long, vad_longest long"
)


def vad_segment_counts(
    samples, channels: int, window: int = 25, threshold: int = 500
) -> tuple:
    """Energy-based voice-activity segmentation over decoded PCM — the
    silence-trim / segment-count statistic speech-data curation keys
    on: frame the clip into non-overlapping windows of ``window``
    frames (trailing partial window cropped — deterministic), classify
    a window VOICED iff its sum of absolute samples (all channels)
    ``>= threshold * window * channels`` (the integer-exact form of
    "mean absolute amplitude at least threshold" — no float division,
    any engine reproduces it), then count. Returns ``(n_windows,
    n_silent, n_segments, longest_voiced)`` where segments are maximal
    voiced runs."""
    n_frames = len(samples) // channels
    n_windows = n_frames // window
    gate = threshold * window * channels
    n_silent = n_segments = longest = run = 0
    for wi in range(n_windows):
        seg = samples[wi * window * channels : (wi + 1) * window * channels]
        if sum(abs(x) for x in seg) >= gate:
            run += 1
            if run == 1:
                n_segments += 1
            if run > longest:
                longest = run
        else:
            n_silent += 1
            run = 0
    return n_windows, n_silent, n_segments, longest


def downsample_audio(
    media: DataFrame,
    factor: int = 4,
    strict: bool = True,
    vad_window: int = 25,
    vad_threshold: int = 500,
) -> DataFrame:
    """REAL audio downsample — the audio sibling of :func:`resize_image`:
    decode the WAV payload (:func:`wav_decode_samples`), decimate by
    averaging each run of ``factor`` frames per channel
    (``out = floor(block sum / factor)``, trailing remainder cropped,
    output rate = input rate // factor), re-encode
    (:func:`wav_pcm_bytes`), and report features from DECODING THE
    RE-ENCODED payload — one Arrow batch, full
    decode→resample→encode→decode cycle proven. The ``vad_*`` columns
    (round 14c) run :func:`vad_segment_counts` on the ORIGINAL
    full-resolution samples in the same pass — silence/segment
    statistics computed where the samples already are, no second
    decode and nothing but counts leaving the pass. ``strict=False`` =
    poison-safe NULL-stats rows (see :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = wav_decode_samples(bytes(payload))
                    ch, s = d["channels"], d["samples"]
                    n_frames = d["n_samples"]
                    out_frames = n_frames // factor
                    if out_frames == 0:
                        raise ValueError("clip shorter than one block")
                    out = [
                        sum(s[(j * factor + t) * ch + c] for t in range(factor))
                        // factor
                        for j in range(out_frames)
                        for c in range(ch)
                    ]
                    out_rate = d["sample_rate"] // factor
                    out_wav = wav_pcm_bytes(ch, out_rate, out)
                    check = wav_decode_samples(out_wav)  # round-trip proof
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "in_samples", "out_samples", "in_rate",
                                    "out_rate", "channels", "payload",
                                    "sum_abs", "energy", "first_sample",
                                    "last_sample", "vad_windows",
                                    "vad_silent", "vad_segments",
                                    "vad_longest",
                                )
                            },
                        }
                    )
                    continue
                cs = check["samples"]
                vw, vs, vseg, vlong = vad_segment_counts(
                    s, ch, vad_window, vad_threshold
                )
                rows.append(
                    {
                        "doc_id": doc_id,
                        "in_samples": n_frames,
                        "out_samples": check["n_samples"],
                        "in_rate": d["sample_rate"],
                        "out_rate": check["sample_rate"],
                        "channels": check["channels"],
                        "payload": out_wav,
                        "sum_abs": sum(abs(x) for x in cs),
                        "energy": sum(x * x for x in cs),
                        "first_sample": cs[0],
                        "last_sample": cs[-1],
                        "vad_windows": vw,
                        "vad_silent": vs,
                        "vad_segments": vseg,
                        "vad_longest": vlong,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AUDIO_DS_SCHEMA)


def _decode_stub_batch(payload: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: metadata derived from the bytes."""
    n_bytes = payload.map(len)
    sha = payload.map(lambda b: hashlib.sha256(b).hexdigest())
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int64"),
            "payload_sha256": sha,
            "fake_width": (n_bytes % 64 + 1).astype("int64"),
            "fake_height": (n_bytes // 64 % 64 + 1).astype("int64"),
            "fake_frames": (n_bytes % 7 + 1).astype("int64"),
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media_type).

    mapInPandas: each batch arrives as a pandas DataFrame with payload as
    bytes; the stub decode is vectorized over the batch. Swap
    ``_decode_stub_batch`` for a real decoder without touching the plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = _decode_stub_batch(pdf["payload"])
            feats.insert(0, "media_type", pdf["media_type"].to_numpy())
            feats.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield feats

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, in_width long, in_height long, out_width long, out_height long, "
    "channels long, orig_bytes long, resized_bytes long, payload binary, "
    "out_px_sum long, out_first_px long, out_last_px long, crop_size long, "
    "crop_px_sum long, crop_first_px long, crop_last_px long"
)

# channels -> PNG color type, for re-encoding a decoded raster
_COLOR_TYPE_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def box_downscale(
    raster: bytes, width: int, height: int, channels: int, factor: int
) -> tuple[bytes, int, int]:
    """``factor``× integer box-filter downscale: each output pixel is
    the floor mean of its ``factor × factor`` input block, per channel;
    trailing rows/columns that don't fill a whole block are cropped
    (``out_dim = in_dim // factor``). Pure integer arithmetic so an
    oracle can recompute every output pixel exactly."""
    out, out_w, out_h = _box_mean_samples(raster, width, height, channels, factor)
    return bytes(out), out_w, out_h


def box_downscale16(
    samples: list[int], width: int, height: int, channels: int, factor: int
) -> tuple[list[int], int, int]:
    """:func:`box_downscale` over 16-bit SAMPLES (u16 values, not
    bytes): averaging the raw big-endian raster bytes would be a silent
    mis-resize, so the 16-bit path floors block means at sample
    resolution and re-packs only at encode time."""
    return _box_mean_samples(samples, width, height, channels, factor)


def _box_mean_samples(
    px, width: int, height: int, channels: int, factor: int
) -> tuple[list[int], int, int]:
    """Shared integer box-filter core over any indexable sample
    sequence (bytes for 8-bit rasters, a u16 list for 16-bit)."""
    out_w, out_h = width // factor, height // factor
    if out_w == 0 or out_h == 0:
        raise ValueError(f"{width}x{height} image smaller than one {factor}x{factor} box")
    f2 = factor * factor
    stride = width * channels
    out = [0] * (out_w * out_h * channels)
    for oy in range(out_h):
        for ox in range(out_w):
            base = ox * factor * channels
            for c in range(channels):
                s = 0
                for dy in range(factor):
                    row = (oy * factor + dy) * stride + base + c
                    for dx in range(factor):
                        s += px[row + dx * channels]
                out[(oy * out_w + ox) * channels + c] = s // f2
    return out, out_w, out_h


def center_crop_stats(samples, width: int, height: int, channels: int) -> tuple:
    """CLIP-style centered square crop over an interleaved raster:
    side = ``min(w, h)``, offsets ``floor((dim − side) / 2)`` — the
    torchvision CenterCrop convention image-training preprocessing
    standardized on. Returns ``(side, px_sum, first, last)`` of the
    crop region WITHOUT materializing it — the audit stats a
    crop-aware ingest needs, computed where the pixels already are.
    Works on 8-bit rasters and 16/12-bit sample arrays alike (the
    caller passes whichever the decode produced)."""
    cs = min(width, height)
    x0 = (width - cs) // 2
    y0 = (height - cs) // 2
    tot = 0
    for j in range(cs):
        base = ((y0 + j) * width + x0) * channels
        tot += sum(samples[base : base + cs * channels])
    first = samples[(y0 * width + x0) * channels]
    last = samples[
        ((y0 + cs - 1) * width + (x0 + cs - 1)) * channels + channels - 1
    ]
    return cs, tot, first, last


def resize_image(media: DataFrame, factor: int = 2, strict: bool = True) -> DataFrame:
    """REAL image resize (replaces the round-4 byte-truncation stub,
    r8 VERDICT item 3): decode the image payload — PNG via
    :func:`png_decode_pixels` (inflate + unfilter, PLTE lookup for
    palette inputs), grayscale JPEG via the full entropy decoder —
    integer box-filter downscale (:func:`box_downscale`), then PNG
    re-encode (resizing is lossy anyway; re-encoding the result
    losslessly keeps the output stats exact), all inside one Arrow
    ``mapInPandas`` batch, payload bytes never leaving the executor.
    The emitted stats (``out_px_sum`` / ``out_first_px`` /
    ``out_last_px``) are computed by DECODING THE RE-ENCODED payload,
    so they prove the full decode→resize→encode→decode cycle, not just
    the scaling math. ``strict=False`` = poison-safe NULL-stats rows
    (see :func:`decode_png_stats`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    raw = bytes(payload)
                    d = (
                        png_decode_pixels(raw)
                        if raw[:8] == _PNG_SIG
                        else decode_real(raw)
                    )
                    if "raster" not in d or d.get("channels") not in (1, 2, 3, 4):
                        raise ValueError("payload is not a decodable image")
                    if d["media_type"] == "image/jpeg" and d["channels"] != 1:
                        # color JPEG planes may be subsampled (different
                        # dims per plane) — resize the luma plane alone
                        # would silently drop chroma; refuse instead
                        raise ValueError("only grayscale JPEG resize supported")
                    if d.get("bit_depth", 8) > 8:
                        # deep-sample path (round 10; 16-bit PNG and
                        # 12-bit JPEG): box means over u16/u12 SAMPLES —
                        # not raster bytes — then a 16-bit PNG re-encode;
                        # stats below read the re-decoded samples so
                        # dynamic range survives end to end
                        small16, out_w, out_h = box_downscale16(
                            d["samples16"], d["width"], d["height"],
                            d["channels"], factor,
                        )
                        out_png = png_pixel16_bytes(
                            out_w, out_h, small16,
                            _COLOR_TYPE_FOR_CHANNELS[d["channels"]],
                        )
                    else:
                        small, out_w, out_h = box_downscale(
                            d["raster"], d["width"], d["height"],
                            d["channels"], factor,
                        )
                        out_png = png_pixel_bytes(
                            out_w, out_h, small,
                            _COLOR_TYPE_FOR_CHANNELS[d["channels"]],
                        )
                    check = png_decode_pixels(out_png)  # round-trip proof
                    stats_px = check.get("samples16") or check["raster"]
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "in_width", "in_height", "out_width",
                                    "out_height", "channels", "orig_bytes",
                                    "resized_bytes", "payload", "out_px_sum",
                                    "out_first_px", "out_last_px",
                                    "crop_size", "crop_px_sum",
                                    "crop_first_px", "crop_last_px",
                                )
                            },
                        }
                    )
                    continue
                # crop stats over the ORIGINAL decoded samples (the
                # same Arrow pass — round 14c): deep inputs crop their
                # 16/12-bit samples, 8-bit inputs their raster
                ccs, cct, ccf, ccl = center_crop_stats(
                    d.get("samples16") or d["raster"],
                    d["width"], d["height"], d["channels"],
                )
                rows.append(
                    {
                        "doc_id": doc_id,
                        "in_width": d["width"],
                        "in_height": d["height"],
                        "out_width": check["width"],
                        "out_height": check["height"],
                        "channels": check["channels"],
                        "orig_bytes": len(payload),
                        "resized_bytes": len(out_png),
                        "payload": out_png,
                        "out_px_sum": sum(stats_px),
                        "out_first_px": stats_px[0],
                        "out_last_px": stats_px[-1],
                        "crop_size": ccs,
                        "crop_px_sum": cct,
                        "crop_first_px": ccf,
                        "crop_last_px": ccl,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_index long, n_frames long, width long, height long, "
    "frame_bytes long, px_sum long, first_px long, last_px long, payload binary"
)


def split_png_stream(b: bytes) -> list[bytes]:
    """Split a concatenated-PNG stream (the multi-frame container
    :func:`synthesize_png_stream` writes) into its frames by WALKING
    each frame's chunk structure to its IEND — not by scanning for
    signature bytes, which compressed IDAT payloads can contain."""
    frames = []
    i = 0
    while i < len(b):
        if b[i : i + 8] != _PNG_SIG:
            raise ValueError("frame boundary is not a PNG signature")
        j = i + 8
        while True:
            if j + 8 > len(b):
                raise ValueError("truncated frame chunk stream")
            length = struct.unpack(">I", b[j : j + 4])[0]
            tag = b[j + 4 : j + 8]
            j += 12 + length
            if tag == b"IEND":
                break
        frames.append(b[i:j])
        i = j
    return frames


def synthesize_png_stream(df: DataFrame, id_col: str) -> DataFrame:
    """Manufacture multi-frame media: doc ``d`` gets ``d%5+2``
    concatenated grayscale PNG frames of ``(d%11+4) × (d%9+4)`` pixels,
    frame ``f``'s pixel ``(x, y)`` valued ``(3x + 5y + 11f + d) mod
    256`` — closed-form in (doc_id, frame), so the oracle recomputes
    per-frame pixel stats arithmetically while the engine must walk the
    container AND decode each sampled frame's IDAT stream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].astype("int64")
            payloads = []
            for doc_id in ids:
                d = int(doc_id)
                n_frames, w, h = d % 5 + 2, d % 11 + 4, d % 9 + 4
                payloads.append(
                    b"".join(
                        png_pixel_bytes(
                            w,
                            h,
                            bytes(
                                (3 * x + 5 * y + 11 * f + d) % 256
                                for y in range(h)
                                for x in range(w)
                            ),
                            0,
                        )
                        for f in range(n_frames)
                    )
                )
            yield pd.DataFrame({"doc_id": ids.to_numpy(), "payload": payloads})

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 2, strict: bool = True) -> DataFrame:
    """REAL video-style frame sampling (replaces the round-4 byte-slice
    stub, r8 VERDICT item 4; round 14 — a REAL video container joins):
    1→N Arrow-batched explode that PARSES the multi-frame container and
    keeps every ``every_n``-th frame, DECODING ONLY THE KEPT FRAMES —
    the property that matters at 100 TB of video, where the walk is
    cheap and the entropy decode is the cost. Dispatch is by magic:
    AVI streams go through :func:`avicodec.avi_frame_blobs` (the RIFF
    tree walk yields raw MJPEG blobs; only sampled ones hit the JPEG
    entropy decoder), PNG streams through :func:`split_png_stream`
    (each frame's chunk structure walked to its IEND) +
    :func:`png_decode_pixels`. A production sampler swaps the
    container walk for keyframe seeks; the Spark plumbing — one input
    row yielding multiple decoded binary rows through ``mapInPandas``,
    payloads never shuffled or collected — is unchanged.
    ``strict=False`` yields ONE NULL-stats row per undecodable doc
    (frame_index NULL) so the doc is quarantinable without killing the
    stage."""
    from .avicodec import avi_frame_blobs, decode_avi_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    raw = bytes(payload)
                    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                        meta = avi_frame_blobs(raw)
                        frames = meta["frame_blobs"]
                        decoded = [
                            (i, frames[i], decode_avi_frame(meta, i))
                            for i in range(0, len(frames), every_n)
                        ]
                    else:
                        frames = split_png_stream(raw)
                        decoded = [
                            (i, frames[i], png_decode_pixels(frames[i]))
                            for i in range(0, len(frames), every_n)
                        ]
                except ValueError:
                    if strict:
                        raise
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **{
                                k: None
                                for k in (
                                    "frame_index", "n_frames", "width",
                                    "height", "frame_bytes", "px_sum",
                                    "first_px", "last_px", "payload",
                                )
                            },
                        }
                    )
                    continue
                for i, raw, d in decoded:
                    raster = d["raster"]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_index": i,
                            "n_frames": len(frames),
                            "width": d["width"],
                            "height": d["height"],
                            "frame_bytes": len(raw),
                            "px_sum": sum(raster),
                            "first_px": raster[0],
                            "last_px": raster[-1],
                            "payload": raw,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
