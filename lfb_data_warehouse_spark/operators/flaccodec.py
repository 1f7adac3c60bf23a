"""FLAC codec from scratch (stdlib only) — lossless compressed audio.

Round 11: the audio tier's archival format. Real FLAC bitstream work,
both directions:

* **Encoder** (`flac_bytes`): STREAMINFO with a real MD5 of the
  unencoded samples, frame headers with UTF-8-coded frame numbers and
  CRC-8, subframes CONSTANT / VERBATIM / FIXED (orders 0-4, residuals
  as the order-th finite difference) / LPC (integer-quantized
  coefficients + arithmetic shift), automatic wasted-bits detection,
  Rice-coded residuals with per-partition parameter selection
  (partition orders 0-2), frame CRC-16.
* **Decoder** (`flac_decode_samples`): metadata-block walk, frame sync
  scan, header parse + CRC-8 verify, subframe reconstruction
  (prediction is exact integer arithmetic so the round-trip is
  bit-perfect), Rice/escape residual decode, wasted-bits restore,
  CRC-16 verify, final sample-count + MD5 verification against
  STREAMINFO.

Stereo: independent channels (1..8) AND the decorrelated assignments
every real encoder emits — left/side, right/side, mid/side, with the
side channel's extra bit and the mid floor's parity recovery, so
reconstruction is exact. Both blocking strategies: fixed (the coded
number is the frame index) and variable (the number is the frame's
first-sample index — live-capture encoders' layout). Driver gates:
`audio_decode_bench` (mono/fixed) and `flac_stereo_decode_stats`
(round 12 — all four stereo assignments plus variable blocking);
both shapes are also property-tested.

Sample sizes: the full RFC 9639 set — 8/12/16/20/24/32 bits (round
12; 24-bit is the archival standard). Not supported (explicit
ValueError, never a silent mis-decode): reserved sample-size code
0b011, reserved channel assignments (0b1011+), reserved
blocksize/sample-rate codes.

Scale shape: like the other codecs, FLAC rides the Arrow
``mapInPandas`` media pattern (`operators/multimodal.py`) — payloads
decode where they live and never shuffle.

Reference parity note: the LFB reference has no media tier at all
(41 files of CSV/Parquet ETL, ``/root/reference/etl``); this module is
beyond-reference surface for multimodal training-data pipelines.
"""

from __future__ import annotations

import hashlib
import struct

from .jpegcodec import MAX_DECODED_BYTES, decode_valueerror_contract

_SYNC = 0b11111111111110
_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005

# fixed-predictor coefficients by order: pred(i) = Σ c_j · s[i-1-j]
_FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC8_POLY) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC16_POLY) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bit offset within current byte (0 = MSB)

    def read(self, nbits: int) -> int:
        out = 0
        while nbits > 0:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(avail, nbits)
            byte = self.data[self.pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            nbits -= take
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code (corrupt Rice stream)")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style coding of frame/sample numbers (plain UTF-8
    extended to 36-bit values; frame numbers here stay ASCII-range but
    the general coder keeps the decoder honest)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    # an nbytes-long code carries (7 - nbytes) lead bits + 6 per continuation
    while n >= 1 << ((7 - nbytes) + 6 * (nbytes - 1)):
        nbytes += 1
        if nbytes > 7:
            raise ValueError("frame number too large for UTF-8 coding")
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead | (n >> (6 * (nbytes - 1))))
    for k in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * k)) & 0x3F))
    return bytes(out)


def _read_utf8_code(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid UTF-8-coded frame number")
    n = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 continuation in frame number")
        n = (n << 6) | (cont & 0x3F)
    return n


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _best_rice_param(residuals: list[int]) -> int:
    """Pick the Rice parameter minimizing the coded size — the real
    encoder decision (a bad k still decodes, it just bloats)."""
    if not residuals:
        return 0
    total = sum(_zigzag(r) for r in residuals)
    best_k, best_bits = 0, None
    for k in range(0, 15):
        bits = len(residuals) * (k + 1) + (total >> k)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k


def _write_residuals(w: _BitWriter, residuals: list[int], blocksize: int,
                     order: int, partition_order: int) -> None:
    if blocksize % (1 << partition_order):
        raise ValueError("blocksize not divisible by 2^partition_order")
    w.write(0, 2)  # method 0: 4-bit Rice parameters
    w.write(partition_order, 4)
    per = blocksize >> partition_order
    if per <= order and partition_order > 0:
        raise ValueError("first partition would be empty")
    pos = 0
    for p in range(1 << partition_order):
        n = per - order if p == 0 else per
        part = residuals[pos : pos + n]
        pos += n
        k = _best_rice_param(part)
        w.write(k, 4)
        for r in part:
            u = _zigzag(r)
            w.write_unary(u >> k)
            w.write(u & ((1 << k) - 1), k)


def _read_residuals(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    partition_order = r.read(4)
    if blocksize % (1 << partition_order):
        raise ValueError("blocksize not divisible by 2^partition_order")
    per = blocksize >> partition_order
    out: list[int] = []
    for p in range(1 << partition_order):
        n = per - order if p == 0 else per
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        k = r.read(kbits)
        if k == escape:
            nbits = r.read(5)
            out.extend(r.read_signed(nbits) if nbits else 0 for _ in range(n))
        else:
            for _ in range(n):
                u = (r.read_unary() << k) | r.read(k)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _wasted_bits(samples: list[int]) -> int:
    """Common trailing zero bits across the subframe — the encoder
    shifts them out and flags the count (spec: unary-coded minus 1)."""
    acc = 0
    for s in samples:
        acc |= s
        if acc & 1:
            return 0
    if acc == 0:
        return 0
    w = 0
    while not acc & 1:
        acc >>= 1
        w += 1
    return w


def _encode_subframe(w: _BitWriter, samples: list[int], bps: int, spec) -> None:
    kind = spec[0]
    wasted = _wasted_bits(samples)
    if kind == "constant" and any(s != samples[0] for s in samples):
        raise ValueError("constant subframe with non-constant samples")
    if kind == "constant":
        wasted = 0  # nothing to save
    if wasted:
        samples = [s >> wasted for s in samples]
    eff_bps = bps - wasted
    w.write(0, 1)  # zero pad bit
    if kind == "constant":
        w.write(0b000000, 6)
    elif kind == "verbatim":
        w.write(0b000001, 6)
    elif kind == "fixed":
        order = spec[1]
        if not 0 <= order <= 4:
            raise ValueError("fixed predictor order must be 0-4")
        w.write(0b001000 | order, 6)
    elif kind == "lpc":
        order = len(spec[1])
        if not 1 <= order <= 32:
            raise ValueError("LPC order must be 1-32")
        w.write(0b100000 | (order - 1), 6)
    else:
        raise ValueError(f"unknown subframe kind {kind!r}")
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)
    if kind == "constant":
        w.write_signed(samples[0], eff_bps)
        return
    if kind == "verbatim":
        for s in samples:
            w.write_signed(s, eff_bps)
        return
    partition_order = spec[-1]
    if kind == "fixed":
        order = spec[1]
        coefs, shift = _FIXED_COEFS[order], 0
    else:
        coefs, shift, precision = spec[1], spec[2], spec[3]
        order = len(coefs)
    if len(samples) <= order:
        raise ValueError("subframe shorter than predictor order")
    for s in samples[:order]:
        w.write_signed(s, eff_bps)
    if kind == "lpc":
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            if not -(1 << (precision - 1)) <= c < (1 << (precision - 1)):
                raise ValueError("LPC coefficient exceeds declared precision")
            w.write_signed(c, precision)
    residuals = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift
        residuals.append(samples[i] - pred)
    _write_residuals(w, residuals, len(samples), order, partition_order)


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> tuple[list[int], str]:
    if r.read(1):
        raise ValueError("subframe header pad bit must be zero")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff_bps = bps - wasted
    if eff_bps < 1:
        raise ValueError("wasted bits exceed sample size")
    if t == 0b000000:
        v = r.read_signed(eff_bps)
        samples, kind = [v] * blocksize, "constant"
    elif t == 0b000001:
        samples = [r.read_signed(eff_bps) for _ in range(blocksize)]
        kind = "verbatim"
    elif 0b001000 <= t <= 0b001100:
        order = t & 0x07
        coefs, shift = _FIXED_COEFS[order], 0
        samples = [r.read_signed(eff_bps) for _ in range(order)]
        for res in _read_residuals(r, blocksize, order):
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(pred + res)
        kind = f"fixed{order}"
    elif t & 0b100000:
        order = (t & 0x1F) + 1
        samples = [r.read_signed(eff_bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift is reserved")
        coefs = [r.read_signed(precision) for _ in range(order)]
        for res in _read_residuals(r, blocksize, order):
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(pred + res)
        kind = f"lpc{order}"
    else:
        raise ValueError(f"reserved subframe type {t:#08b}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples, kind


# RFC 9639 §9.1.4 sample-size codes (0b000 = from STREAMINFO;
# 0b011 reserved). Round 12 extends beyond 8/16 to the full set —
# 24-bit is the common archival depth.
_BPS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODE.items()}


def _md5_samples(frames: list[list[int]], bps: int) -> bytes:
    """MD5 of the unencoded audio: interleaved samples, little-endian,
    bps/8 bytes each (the spec's definition; ``frames`` hold samples
    already in interleaved order)."""
    h = hashlib.md5()
    nbytes = (bps + 7) // 8  # 12 -> 2, 20/24 -> 3, 32 -> 4 (RFC 9639)
    for samples in frames:
        for s in samples:
            h.update(s.to_bytes(nbytes, "little", signed=True))
    return h.digest()


_ASSIGNMENT_CODES = {
    "independent": None,  # code = channels - 1
    "left_side": 0b1000,
    "right_side": 0b1001,
    "mid_side": 0b1010,
}

_ASSIGNMENT_NAMES = {
    0b1000: "left_side",
    0b1001: "right_side",
    0b1010: "mid_side",
}


def flac_bytes(
    sample_rate: int,
    bps: int,
    frames: list[tuple[object, object]],
    channels: int = 1,
    assignment: str = "independent",
    variable_blocking: bool = False,
) -> bytes:
    """Encode frames as a REAL FLAC stream (mono or independent-channel
    stereo/multichannel).

    Mono (``channels=1``): ``frames`` is a list of ``(samples, spec)``
    where spec is ``("constant",)``, ``("verbatim",)``, ``("fixed",
    order, partition_order)`` or ``("lpc", coefs, shift, precision,
    partition_order)``. ``channels>1`` (independent channel
    assignment, code ``channels-1``): each frame is
    ``([ch0_samples, ch1_samples, ...], [spec0, spec1, ...])`` with
    equal per-channel lengths — one subframe per channel.
    ``assignment`` (stereo only): ``"left_side"`` / ``"right_side"`` /
    ``"mid_side"`` decorrelate each frame's ``[left, right]`` into the
    coded channel pair (the side channel carries one extra bit; mid is
    the ``(l+r)>>1`` floor with the lost low bit recovered from the
    side's parity, so reconstruction is exact) — the layout every real
    stereo FLAC encoder emits. Residuals are derived from the samples
    (the
    lossless direction), Rice parameters chosen per partition, wasted
    bits auto-detected, CRC-8/CRC-16 and the STREAMINFO MD5 (over the
    interleaved stream) computed for real so the decoder's integrity
    checks have teeth."""
    if bps not in _BPS_CODE:
        raise ValueError(f"FLAC bits-per-sample must be one of 8/12/16/20/24/32, got {bps}")
    if not 1 <= channels <= 8:
        raise ValueError("FLAC supports 1..8 channels")
    if assignment not in _ASSIGNMENT_CODES:
        raise ValueError(f"unknown channel assignment {assignment!r}")
    if assignment != "independent" and channels != 2:
        raise ValueError("decorrelated assignments are stereo-only")
    body = bytearray()
    interleaved: list[list[int]] = []
    blocksizes: list[int] = []
    chan_code = _ASSIGNMENT_CODES[assignment]
    if chan_code is None:
        chan_code = channels - 1
    for idx, (samples, spec) in enumerate(frames):
        if channels == 1:
            chans, specs = [list(samples)], [spec]
        else:
            chans, specs = [list(c) for c in samples], list(spec)
            if len(chans) != channels or len(specs) != channels:
                raise ValueError("one sample list and one spec per channel")
            if any(len(c) != len(chans[0]) for c in chans):
                raise ValueError("per-channel sample counts differ")
        blocksize = len(chans[0])
        if blocksize == 0:
            raise ValueError("empty FLAC frame")
        if blocksize > 65536:
            # the frame header codes blocksize-1 in 16 bits; anything
            # larger would crash struct.pack below instead of erroring
            raise ValueError("FLAC blocksize must be 1..65536")
        # MD5/interleave run over the ORIGINAL (reconstructed) stream
        interleaved.append(
            [chans[c][i] for i in range(blocksize) for c in range(channels)]
        )
        extras = [0] * channels
        if assignment != "independent":
            left, right = chans
            side = [l - rr for l, rr in zip(left, right)]
            if assignment == "left_side":
                coded = [left, side]
                extras = [0, 1]
            elif assignment == "right_side":
                coded = [side, right]
                extras = [1, 0]
            else:  # mid_side
                coded = [[(l + rr) >> 1 for l, rr in zip(left, right)], side]
                extras = [0, 1]
            chans = coded
        hdr = _BitWriter()
        hdr.write(_SYNC, 14)
        hdr.write(0, 1)  # reserved
        # blocking strategy: fixed codes the frame index, variable the
        # frame's first-sample index (live-capture encoders' layout)
        hdr.write(1 if variable_blocking else 0, 1)
        hdr.write(0b0111, 4)  # blocksize: 16-bit value-1 at header end
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(chan_code, 4)
        hdr.write(_BPS_CODE[bps], 3)
        hdr.write(0, 1)  # reserved
        hdr.align()
        number = sum(blocksizes) if variable_blocking else idx
        header = hdr.bytes() + _utf8_code(number) + struct.pack(">H", blocksize - 1)
        header += bytes([_crc8(header)])
        w = _BitWriter()
        for c, s, extra in zip(chans, specs, extras):
            _encode_subframe(w, c, bps + extra, s)
        w.align()
        frame = header + w.bytes()
        frame += struct.pack(">H", _crc16(frame))
        body += frame
        blocksizes.append(blocksize)
    total = sum(blocksizes)
    # STREAMINFO: min/max blocksize, min/max framesize (0 = unknown),
    # 20-bit rate, 3-bit channels-1, 5-bit bps-1, 36-bit total, MD5
    si = _BitWriter()
    si.write(min(blocksizes), 16)
    si.write(max(blocksizes), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.align()
    streaminfo = si.bytes() + _md5_samples(interleaved, bps)
    meta = bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    return b"fLaC" + meta + bytes(body)


@decode_valueerror_contract
def flac_decode_samples(b: bytes) -> dict:
    """REAL FLAC decode: metadata walk → per-frame sync/header parse
    (CRC-8 verified) → subframe reconstruction → Rice residual decode →
    frame CRC-16 → stream-level sample-count and MD5 verification.
    Returns the exact original samples (FLAC is lossless)."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(b):
            raise ValueError("FLAC metadata truncated")
        last = b[pos] & 0x80
        btype = b[pos] & 0x7F
        blen = int.from_bytes(b[pos + 1 : pos + 4], "big")
        if btype == 0:
            streaminfo = b[pos + 4 : pos + 4 + blen]
            if len(streaminfo) != 34:
                raise ValueError("STREAMINFO must be 34 bytes")
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    r0 = _BitReader(streaminfo)
    min_bs, max_bs = r0.read(16), r0.read(16)
    r0.read(24), r0.read(24)
    sample_rate = r0.read(20)
    channels = r0.read(3) + 1
    bps = r0.read(5) + 1
    total = r0.read(36)
    md5 = streaminfo[18:34]
    if bps not in _BPS_CODE:
        raise ValueError(f"FLAC bits-per-sample must be one of 8/12/16/20/24/32, got {bps}")
    # samples decode into Python int lists (~8 bytes each, like the
    # 12-bit JPEG planes — jpegcodec.py's cap precedent), NOT bps/8
    # raw bytes; capping at the raw-byte rate would admit ~8-16x the
    # intended memory from a ~50 KB crafted stream of constant frames
    if total * channels * 8 > MAX_DECODED_BYTES:
        raise ValueError("decoded FLAC exceeds allocation cap")
    frames: list[list[int]] = []
    kinds: list[str] = []
    assignments: list[str] = []
    decoded = 0
    while decoded < total:
        if pos + 2 > len(b):
            raise ValueError("FLAC stream ends before declared total samples")
        r = _BitReader(b, pos)
        if r.read(14) != _SYNC:
            raise ValueError("lost FLAC frame sync")
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        # blocking strategy: 0 = fixed (coded number is the frame
        # index), 1 = variable (coded number is the frame's FIRST
        # SAMPLE index — round 11; what live-capture encoders emit)
        variable = bool(r.read(1))
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        if chan > 0b1010:
            raise ValueError(f"reserved channel assignment {chan:#06b}")
        decor = chan >= 0b1000  # left/side, right/side, mid/side
        if decor:
            if channels != 2:
                raise ValueError("decorrelated frame in a non-stereo stream")
        elif chan + 1 != channels:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        frame_no = _read_utf8_code(r)
        if variable:
            if frame_no != decoded:
                raise ValueError(
                    f"sample number {frame_no} disagrees with {decoded} decoded"
                )
        elif frame_no != len(frames):
            raise ValueError(f"frame number {frame_no} out of order")
        if bs_code == 0b0110:
            blocksize = r.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = r.read(16) + 1
        elif bs_code == 0b0001:
            blocksize = 192
        elif 0b0010 <= bs_code <= 0b0101:
            blocksize = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            blocksize = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved blocksize code 0000")
        if sr_code == 0b0000:
            pass  # from STREAMINFO
        elif sr_code in (0b1100, 0b1101, 0b1110):
            r.read(8 if sr_code == 0b1100 else 16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample-rate code 1111")
        if size_code == 0b000:
            frame_bps = bps
        elif size_code in _BPS_FROM_CODE:
            frame_bps = _BPS_FROM_CODE[size_code]
        else:
            raise ValueError(f"unsupported sample-size code {size_code:#05b}")
        if frame_bps != bps:
            raise ValueError("frame sample size disagrees with STREAMINFO")
        header_end = r.pos  # CRC-8 covers [pos, header_end)
        if r.bit:
            raise ValueError("frame header not byte-aligned before CRC-8")
        if _crc8(b[pos:header_end]) != r.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        chans = []
        frame_kinds = []
        for ci in range(channels):
            # the side (difference) channel codes one extra bit: it is
            # ch1 for left/side and mid/side, ch0 for right/side
            extra = 1 if decor and (
                (chan in (0b1000, 0b1010) and ci == 1)
                or (chan == 0b1001 and ci == 0)
            ) else 0
            samples, kind = _decode_subframe(r, blocksize, bps + extra)
            chans.append(samples)
            frame_kinds.append(kind)
        if decor:
            if chan == 0b1000:  # left/side: r = l - side
                left, side = chans
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif chan == 0b1001:  # right/side: l = r + side
                side, right = chans
                chans = [[rr + s for rr, s in zip(right, side)], right]
            else:  # mid/side: m2 = (mid<<1)|(side&1) == l+r exactly
                mid, side = chans
                left = [((m << 1 | (s & 1)) + s) >> 1 for m, s in zip(mid, side)]
                right = [((m << 1 | (s & 1)) - s) >> 1 for m, s in zip(mid, side)]
                chans = [left, right]
        r.align()
        crc_end = r.pos
        if _crc16(b[pos:crc_end]) != r.read(16):
            raise ValueError("frame CRC-16 mismatch")
        lo = -(1 << (bps - 1))
        hi = (1 << (bps - 1)) - 1
        for c in chans:
            for s in c:
                if not lo <= s <= hi:
                    raise ValueError("decoded sample exceeds declared bits-per-sample")
        frames.append(
            chans[0]
            if channels == 1
            else [chans[c][i] for i in range(blocksize) for c in range(channels)]
        )
        kinds.append("+".join(frame_kinds) if channels > 1 else frame_kinds[0])
        assignments.append(_ASSIGNMENT_NAMES.get(chan, "independent"))
        decoded += blocksize
        pos = r.pos
    if decoded != total:
        raise ValueError("decoded sample count disagrees with STREAMINFO")
    if md5 != b"\x00" * 16 and _md5_samples(frames, bps) != md5:
        raise ValueError("STREAMINFO MD5 mismatch (decode is not bit-perfect)")
    flat = [s for fr in frames for s in fr]
    return {
        "media_type": "audio/flac",
        "channels": channels,
        "sample_rate": sample_rate,
        "bits": bps,
        "encoding": "flac",
        "n_frames": len(frames),
        # per-channel count, matching wav_decode_samples' convention;
        # ``samples`` is the interleaved stream
        "n_samples": decoded,
        "subframes": ",".join(kinds),
        "assignments": ",".join(assignments),
        "samples": flat,
    }
