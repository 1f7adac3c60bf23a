"""AVI (RIFF) container codec carrying MJPEG frames — REAL video
decode, stdlib only (round 14).

Video becomes the fourth real-decode modality (after images, audio and
archives) by COMPOSING two already-verified pieces: the RIFF chunk
walk (the WAV container family, :mod:`.multimodal`) and the baseline
JPEG codec (:mod:`.jpegcodec`) once per frame — MJPEG is exactly
"a complete baseline JPEG per '00dc' chunk".

Container structure per the public Microsoft *AVI RIFF File Reference*:

    RIFF 'AVI '
      LIST 'hdrl'
        avih  — MainAVIHeader (frame period, total frames, dims)
        LIST 'strl'
          strh — AVIStreamHeader (fccType 'vids', handler 'MJPG')
          strf — BITMAPINFOHEADER (biCompression 'MJPG')
      LIST 'movi'
        '00dc' — one compressed (JPEG) frame per chunk, word-aligned
      idx1    — optional index: (ckid, flags, offset, size) per frame

Scale shape: the codec is plain ``bytes -> dict`` used inside
Arrow-batched ``mapInPandas`` passes — zero-exchange per-partition
decode, same as every other media family (see SCALE.md media curves).

Reference parity: the reference repo (a single-purpose PySpark ETL,
see SURVEY.md §2) has no video surface — this module is
beyond-reference training-data-pipeline scope, built only from the
public AVI/RIFF and T.81 specifications.

Not supported (explicit ValueError, never a silent mis-decode):
non-'vids' streams (audio tracks), non-MJPG video codecs (real DV/
H.264/... payloads need bitstream decoders out of scope here), and
uncompressed '00db' frames.
"""

from __future__ import annotations

import struct

from .jpegcodec import decode_valueerror_contract, jpeg_decode_pixels


def _chunk(cid: bytes, data: bytes) -> bytes:
    """One RIFF chunk: fourcc + little-endian size + word-aligned data."""
    return cid + struct.pack("<I", len(data)) + data + (
        b"\x00" if len(data) & 1 else b""
    )


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_mjpeg_bytes(
    width: int,
    height: int,
    frames: list,
    fps: int = 10,
    with_index: bool = True,
) -> bytes:
    """AVI container around MJPEG frames — each frame a COMPLETE
    baseline-JPEG blob (callers encode via :func:`jpegcodec.
    jpeg_pixel_bytes` / ``jpeg_planes_bytes``). Writes the standard
    header tree (avih + one 'vids'/'MJPG' strl), the 'movi' list with
    one word-aligned '00dc' chunk per frame, and (by default) the
    idx1 index real muxers append — offsets relative to the 'movi'
    fourcc, AVIIF_KEYFRAME on every frame (MJPEG is all-intra)."""
    if width < 1 or height < 1:
        raise ValueError("AVI dimensions must be positive")
    if fps < 1:
        raise ValueError("AVI fps must be >= 1")
    if not frames:
        raise ValueError("AVI needs at least one frame")
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,       # dwMicroSecPerFrame
        max_size * fps,         # dwMaxBytesPerSec
        0,                      # dwPaddingGranularity
        0x10 if with_index else 0,  # dwFlags: AVIF_HASINDEX iff idx1 written
        len(frames),            # dwTotalFrames
        0,                      # dwInitialFrames
        1,                      # dwStreams
        max_size,               # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,             # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,                  # dwFlags
            0, 0,               # wPriority, wLanguage
            0,                  # dwInitialFrames
            1, fps,             # dwScale / dwRate = frame period
            0,                  # dwStart
            len(frames),        # dwLength (in frames)
            max_size,           # dwSuggestedBufferSize
            0xFFFFFFFF,         # dwQuality (default)
            0,                  # dwSampleSize (0: one sample per chunk)
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b""
    index = b""
    for f in frames:
        # idx1 offsets point at the ckid, relative to the 'movi' fourcc
        index += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_payload), len(f))
        movi_payload += _chunk(b"00dc", bytes(f))
    movi = _list(b"movi", movi_payload)
    body = hdrl + movi + (_chunk(b"idx1", index) if with_index else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _walk_chunks(buf: bytes, i: int, end: int):
    """Yield (fourcc, data_start, data_size) over a RIFF chunk run,
    honoring word alignment; truncated headers/payloads raise."""
    while i + 8 <= end:
        cid = buf[i : i + 4]
        sz = struct.unpack("<I", buf[i + 4 : i + 8])[0]
        if i + 8 + sz > end:
            raise ValueError(f"RIFF chunk {cid!r} overruns its parent")
        yield cid, i + 8, sz
        i += 8 + sz + (sz & 1)


@decode_valueerror_contract
def avi_frame_blobs(b: bytes) -> dict:
    """The container walk WITHOUT frame decode: RIFF tree walk (hdrl →
    avih + strl, movi → '00dc' chunks), structural validation
    (declared frame count vs actual chunks, single MJPEG 'vids'
    stream), returning header metadata plus the RAW per-frame JPEG
    blobs. This is the seek path a frame SAMPLER needs — at 100 TB of
    video you walk every container but entropy-decode only the frames
    you keep (:func:`avi_decode_frames` decodes all of them). idx1,
    JUNK and other non-frame chunks are walked and skipped; audio
    streams and non-MJPG codecs raise."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    width = height = n_frames = usec_per_frame = None
    handler = compression = None
    n_streams_declared = None
    frame_blobs: list[bytes] = []
    for cid, off, sz in _walk_chunks(b, 12, min(len(b), 8 + struct.unpack("<I", b[4:8])[0])):
        if cid != b"LIST":
            continue  # idx1 / JUNK at top level
        ltype = b[off : off + 4]
        if ltype == b"hdrl":
            for scid, soff, ssz in _walk_chunks(b, off + 4, off + sz):
                if scid == b"avih":
                    if ssz < 40:
                        raise ValueError("AVI avih header truncated")
                    vals = struct.unpack("<10I", b[soff : soff + 40])
                    usec_per_frame, n_frames = vals[0], vals[4]
                    n_streams_declared = vals[6]
                    width, height = vals[8], vals[9]
                elif scid == b"LIST" and b[soff : soff + 4] == b"strl":
                    for tcid, toff, tsz in _walk_chunks(b, soff + 4, soff + ssz):
                        if tcid == b"strh":
                            if tsz < 8:
                                raise ValueError("AVI strh truncated")
                            fcc_type = b[toff : toff + 4]
                            if fcc_type != b"vids":
                                raise ValueError(
                                    "only 'vids' AVI streams supported, "
                                    f"got {fcc_type!r} (audio/text tracks "
                                    "are out of scope)"
                                )
                            handler = b[toff + 4 : toff + 8]
                        elif tcid == b"strf":
                            if tsz < 20:
                                raise ValueError("AVI strf (BITMAPINFOHEADER) truncated")
                            compression = b[toff + 16 : toff + 20]
        elif ltype == b"movi":
            for scid, soff, ssz in _walk_chunks(b, off + 4, off + sz):
                if scid[2:4] in (b"dc", b"db", b"wb") and scid[:2] != b"00":
                    # data for a stream the single declared 'vids' strl
                    # does not cover — decoding it as stream-0 frames
                    # would be a silent mis-decode
                    raise ValueError(
                        f"AVI chunk {scid!r} belongs to an undeclared "
                        "stream (single-stream container)"
                    )
                if scid[2:4] == b"dc":
                    frame_blobs.append(b[soff : soff + ssz])
                elif scid[2:4] == b"db":
                    raise ValueError(
                        "uncompressed AVI frames ('..db') not supported"
                    )
    if width is None or n_frames is None:
        raise ValueError("AVI missing avih main header")
    if width < 1 or height < 1:
        raise ValueError("AVI declares non-positive dimensions")
    if n_streams_declared != 1:
        raise ValueError(
            f"only single-stream AVIs supported, header declares "
            f"{n_streams_declared}"
        )
    if handler is None or compression is None:
        raise ValueError("AVI missing strh/strf stream headers")
    # real muxers write MJPG in both places; accept either spelling
    # carrying the other but refuse anything that is not MJPEG
    if handler not in (b"MJPG", b"mjpg") and compression not in (b"MJPG", b"mjpg"):
        raise ValueError(
            f"only MJPEG AVIs supported (strh {handler!r} / strf {compression!r})"
        )
    if len(frame_blobs) != n_frames:
        raise ValueError(
            f"AVI declares {n_frames} frames but carries {len(frame_blobs)}"
        )
    if not frame_blobs:
        # symmetric with the encoder's refusal: a frameless video has
        # no first/last frame for downstream stats (the zero-area
        # rationale of png_decode_pixels)
        raise ValueError("AVI with no frames")
    return {
        "media_type": "video/avi",
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "usec_per_frame": usec_per_frame,
        "frame_blobs": frame_blobs,
    }


def decode_avi_frame(meta: dict, k: int) -> dict:
    """Entropy-decode frame ``k`` of an :func:`avi_frame_blobs` result,
    validating its dimensions against the stream header."""
    d = jpeg_decode_pixels(meta["frame_blobs"][k])
    if d["width"] != meta["width"] or d["height"] != meta["height"]:
        raise ValueError(
            f"frame {k} is {d['width']}x{d['height']}, "
            f"stream header says {meta['width']}x{meta['height']}"
        )
    return d


@decode_valueerror_contract
def avi_decode_frames(b: bytes) -> dict:
    """REAL AVI/MJPEG decode: the :func:`avi_frame_blobs` container
    walk + a full baseline-JPEG entropy decode of EVERY frame. Returns
    header metadata plus the per-frame decoded dicts (each with the
    recovered raster) so feature stages read pixels, not metadata."""
    meta = avi_frame_blobs(b)
    frames = [decode_avi_frame(meta, k) for k in range(meta["n_frames"])]
    out = {k: v for k, v in meta.items() if k != "frame_blobs"}
    out["frames"] = frames
    return out
