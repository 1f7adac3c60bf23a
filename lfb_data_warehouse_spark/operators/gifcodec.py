"""GIF codec, stdlib only — the web-crawl corpus staple made real.

A 100 TB crawl-derived multimodal corpus is full of GIFs; this module
gives the media tier a real GIF87a/89a path alongside PNG/JPEG/WAV:

* encoder: logical screen descriptor + global color table + image
  descriptor + REAL LZW compression (dictionary-building, variable
  code width 3..12 bits, clear/end codes, LSB-first bit packing,
  255-byte sub-block framing), optional Adam-style 4-pass GIF
  interlacing;
* decoder: header walk (87a/89a), screen/image descriptors, global and
  local color tables, extension-block skipping (GCE/comment/app), LZW
  decompression with dictionary reconstruction and code-width growth,
  deinterlacing, palette lookup to an RGB raster.

LZW reconstruction is exact (lossless), so the oracle gate recomputes
raw index/palette arithmetic — the same no-tolerance verifiability as
the lossless-JPEG tier. Animated (multi-image) GIFs decode every frame;
``raster`` is frame 0 and ``n_frames`` reports the count.

Scale shape: decoded inside the same Arrow ``mapInPandas`` batch pass
as every other media decode (operators/multimodal.py) — payload bytes
never leave the executor.

Not supported (explicit ValueError): images whose LZW stream overruns
the declared frame, palettes referenced past their size, truncated
sub-block chains.
"""

from __future__ import annotations

import struct

from .jpegcodec import MAX_DECODED_BYTES, decode_valueerror_contract

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: dictionary-building encoder with variable code
    width (min+1 .. 12 bits), clear/end codes, LSB-first packing."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:  # dictionary full: reset (simplest legal policy)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, max_out: int) -> bytes:
    """GIF-variant LZW decoder: dictionary reconstruction including the
    cScSc corner case (code == next_code), code-width growth, clear and
    end codes. Output is capped at ``max_out`` indices."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("GIF LZW minimum code size out of range")
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream exhausted before end code")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # cScSc: code defined by this very step
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code beyond dictionary")
        out += entry
        if len(out) > max_out:
            raise ValueError("GIF LZW output overruns the declared frame")
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1


def _sub_blocks(payload: bytes) -> bytes:
    """Frame ``payload`` into 255-byte length-prefixed sub-blocks with
    the zero terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(height: int) -> list[int]:
    rows = []
    for start, step in _GIF_INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


def gif_bytes(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    interlace: bool = False,
    n_frames: int = 1,
    version: bytes = b"89a",
) -> bytes:
    """REAL GIF encode: ``indices`` is ``n_frames`` concatenated
    ``width*height`` index rasters over a shared global color table
    (``palette`` = RGB triples, power-of-two entry count 2..256). Every
    frame gets its own image descriptor + LZW stream; ``interlace``
    four-passes the rows of each frame (the progressive-rendering
    layout early web GIFs used)."""
    n_colors = len(palette) // 3
    if len(palette) % 3 or n_colors not in (2, 4, 8, 16, 32, 64, 128, 256):
        raise ValueError("palette must be 2^N RGB triples (N = 1..8)")
    if len(indices) != width * height * n_frames:
        raise ValueError(f"need {width * height * n_frames} indices")
    if indices and max(indices) >= n_colors:
        raise ValueError("index past the palette")
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError("GIF dimensions must fit in u16")
    gct_bits = max(1, (n_colors - 1).bit_length())
    out = bytearray(b"GIF" + version)
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (gct_bits - 1), 0, 0])  # GCT flag + size; bg; aspect
    out += palette
    min_code = max(2, gct_bits)
    for f in range(n_frames):
        frame = indices[f * width * height : (f + 1) * width * height]
        if interlace:
            rows = _interlace_rows(height)
            frame = b"".join(frame[r * width : (r + 1) * width] for r in rows)
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x40 if interlace else 0])  # no LCT; interlace flag
        out += bytes([min_code]) + _sub_blocks(_lzw_encode(frame, min_code))
    out += b"\x3b"
    return bytes(out)


@decode_valueerror_contract
def gif_decode_pixels(b: bytes) -> dict:
    """REAL GIF decode, stdlib only: header + screen descriptor, global
    color table, extension skipping, per-frame image descriptors with
    optional local color tables and interlacing, LZW decompression,
    palette lookup to RGB. Returns frame 0 as ``raster`` (RGB bytes)
    plus all frames in ``frames``; ``n_frames`` counts image blocks."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", b[6:10])
    packed, _bg, _aspect = b[10], b[11], b[12]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = b[i : i + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        i += 3 * n
    frames: list[bytes] = []
    dims: list[tuple[int, int]] = []
    while True:
        if i >= len(b):
            raise ValueError("GIF missing trailer")
        block = b[i]
        i += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            i += 1
            while True:
                if i >= len(b):
                    raise ValueError("truncated extension sub-blocks")
                n = b[i]
                i += 1 + n
                if n == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", b[i : i + 8])
        fpacked = b[i + 8]
        i += 9
        if fw == 0 or fh == 0:
            raise ValueError("GIF with zero-area frame")
        if 3 * fw * fh * (len(frames) + 1) > MAX_DECODED_BYTES:
            raise ValueError("GIF declares implausible dimensions")
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = b[i : i + 3 * n]
            if len(pal) < 3 * n:
                raise ValueError("truncated local color table")
            i += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        min_code = b[i]
        i += 1
        lzw = bytearray()
        while True:
            if i >= len(b):
                raise ValueError("truncated image sub-blocks")
            n = b[i]
            i += 1
            if n == 0:
                break
            lzw += b[i : i + n]
            if len(b) - i < n:
                raise ValueError("truncated image sub-blocks")
            i += n
        idx = _lzw_decode(bytes(lzw), min_code, fw * fh)
        if len(idx) != fw * fh:
            raise ValueError("GIF LZW stream shorter than the frame")
        if fpacked & 0x40:  # deinterlace
            plain = bytearray(fw * fh)
            for src, r in enumerate(_interlace_rows(fh)):
                plain[r * fw : (r + 1) * fw] = idx[src * fw : (src + 1) * fw]
            idx = bytes(plain)
        n_pal = len(pal) // 3
        rgb = bytearray(3 * fw * fh)
        for j, v in enumerate(idx):
            if v >= n_pal:
                raise ValueError("palette index out of range")
            rgb[3 * j : 3 * j + 3] = pal[3 * v : 3 * v + 3]
        frames.append(bytes(rgb))
        dims.append((fw, fh))
    if not frames:
        raise ValueError("GIF with no image blocks")
    return {
        "media_type": "image/gif",
        "width": dims[0][0],
        "height": dims[0][1],
        "screen_width": sw,
        "screen_height": sh,
        "channels": 3,
        "bit_depth": 8,
        "palette_size": (len(gct) // 3) if gct else None,
        "n_frames": len(frames),
        "frames": frames,
        "frame_dims": dims,
        "raster": frames[0],
    }
