"""Minimal FLAC *encoder* for testing the decoders.

Written independently from nspeech_tpu's decoders (native/_loader.cpp and
dsp/flacio.py), straight from the format spec (RFC 9639), so a round-trip
test exercises two separately-authored implementations of the bit layout.
Supports what the tests need: 8/16-bit PCM, mono/stereo, CONSTANT /
VERBATIM / FIXED(0-4) / LPC subframes, rice + rice2 partitioned residuals
with escape codes, wasted bits, all four channel assignments, the coded
and end-of-header block-size/sample-rate forms.

Not a production encoder: no MD5 (all-zero = "unknown" per spec), no
search for optimal predictors or rice parameters.
"""

from __future__ import annotations

import numpy as np

_CODED_RATES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}
_CODED_SIZES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


class _Bits:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, bits: int) -> None:
        assert bits >= 0 and 0 <= value < (1 << bits) or (bits == 0 and value == 0)
        self._acc = (self._acc << bits) | value
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def put_signed(self, value: int, bits: int) -> None:
        self.put(value & ((1 << bits) - 1), bits)

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then the terminating one

    def align(self) -> None:
        if self._n:
            self.put(0, 8 - self._n)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for extra, lead, lead_bits in ((1, 0xC0, 5), (2, 0xE0, 4), (3, 0xF0, 3),
                                   (4, 0xF8, 2), (5, 0xFC, 1), (6, 0xFE, 0)):
        if n < (1 << (lead_bits + 6 * extra)):
            parts = [lead | (n >> (6 * extra))]
            for i in range(extra - 1, -1, -1):
                parts.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(parts)
    raise ValueError("number too large for coded form")


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _write_residual(bits: _Bits, res, order: int, blocksize: int,
                    partition_order: int, method: int,
                    escape_partitions=()) -> None:
    bits.put(method, 2)
    bits.put(partition_order, 4)
    param_bits, escape = (4, 15) if method == 0 else (5, 31)
    parts = 1 << partition_order
    assert blocksize % parts == 0
    per_part = blocksize // parts
    idx = 0
    for p in range(parts):
        n = per_part - (order if p == 0 else 0)
        chunk = res[idx: idx + n]
        idx += n
        if p in escape_partitions:
            width = max((int(v).bit_length() + 1 for v in chunk), default=1)
            width = min(width, 31)
            bits.put(escape, param_bits)
            bits.put(width, 5)
            for v in chunk:
                bits.put_signed(int(v), width)
        else:
            u = [_zigzag(int(v)) for v in chunk]
            mean = (sum(u) / len(u)) if u else 0.0
            param = 0
            while (1 << (param + 1)) < mean + 1 and param < escape - 2:
                param += 1
            bits.put(param, param_bits)
            for uv in u:
                bits.put_unary(uv >> param)
                bits.put(uv & ((1 << param) - 1), param)


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(bits: _Bits, samples, bps: int, kind: str,
                    fixed_order: int = 2, lpc=None, partition_order: int = 0,
                    method: int = 0, wasted: int = 0,
                    escape_partitions=()) -> None:
    samples = [int(v) for v in samples]
    bits.put(0, 1)  # padding
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in samples)
        samples = [v >> wasted for v in samples]
        eff_bps = bps - wasted
    else:
        eff_bps = bps
    n = len(samples)

    def type_and_wasted(type_code: int) -> None:
        bits.put(type_code, 6)
        if wasted:
            bits.put(1, 1)
            bits.put_unary(wasted - 1)
        else:
            bits.put(0, 1)

    if kind == "constant":
        assert all(v == samples[0] for v in samples)
        type_and_wasted(0)
        bits.put_signed(samples[0], eff_bps)
    elif kind == "verbatim":
        type_and_wasted(1)
        for v in samples:
            bits.put_signed(v, eff_bps)
    elif kind == "fixed":
        order = fixed_order
        type_and_wasted(8 | order)
        for v in samples[:order]:
            bits.put_signed(v, eff_bps)
        coef = _FIXED_COEF[order]
        res = [samples[i] - sum(c * samples[i - 1 - j]
                                for j, c in enumerate(coef))
               for i in range(order, n)]
        _write_residual(bits, res, order, n, partition_order, method,
                        escape_partitions)
    elif kind == "lpc":
        coef, shift, precision = lpc
        order = len(coef)
        type_and_wasted(32 | (order - 1))
        for v in samples[:order]:
            bits.put_signed(v, eff_bps)
        bits.put(precision - 1, 4)
        bits.put_signed(shift, 5)
        for c in coef:
            bits.put_signed(int(c), precision)
        res = [samples[i] - (sum(int(c) * samples[i - 1 - j]
                                 for j, c in enumerate(coef)) >> shift)
               for i in range(order, n)]
        _write_residual(bits, res, order, n, partition_order, method,
                        escape_partitions)
    else:
        raise ValueError(kind)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 256,
    kind: str = "fixed",
    fixed_order: int = 2,
    lpc=None,
    stereo_mode: str = "independent",
    partition_order: int = 0,
    method: int = 0,
    wasted: int = 0,
    escape_partitions=(),
    header_rate: str = "auto",
    header_size: str = "auto",
    header_blocksize: str = "auto",
) -> bytes:
    """samples: int array [N] or [N, C]. Returns the FLAC byte stream."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n_total, channels = samples.shape
    assert channels in (1, 2)
    if stereo_mode != "independent":
        assert channels == 2

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _Bits()
    last_block = n_total % block_size or block_size
    si.put(min(block_size, last_block), 16)
    si.put(block_size, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(channels - 1, 3)
    si.put(bps - 1, 5)
    si.put(n_total, 36)
    for _ in range(16):
        si.put(0, 8)  # md5 unknown
    out += bytes([0x80]) + len(si.out).to_bytes(3, "big") + si.out

    for frame_no, start in enumerate(range(0, n_total, block_size)):
        block = samples[start: start + block_size]
        bs = block.shape[0]
        fb = _Bits()
        fb.put(0b11111111111110, 14)
        fb.put(0, 1)
        fb.put(0, 1)  # fixed blocking strategy
        tail = _Bits()
        if header_blocksize == "end8":
            bs_code = 6
            tail.put(bs - 1, 8)
        elif header_blocksize == "end16":
            bs_code = 7
            tail.put(bs - 1, 16)
        elif bs == 192:
            bs_code = 1
        elif bs in (576, 1152, 2304, 4608):
            bs_code = 2 + (576, 1152, 2304, 4608).index(bs)
        elif bs in tuple(256 << i for i in range(8)):
            bs_code = 8 + tuple(256 << i for i in range(8)).index(bs)
        else:
            bs_code = 7
            tail.put(bs - 1, 16)
        fb.put(bs_code, 4)
        if header_rate == "streaminfo":
            fb.put(0, 4)
        elif sample_rate in _CODED_RATES:
            fb.put(_CODED_RATES[sample_rate], 4)
        elif sample_rate % 1000 == 0 and sample_rate // 1000 < 256:
            fb.put(12, 4)
            tail.put(sample_rate // 1000, 8)
        elif sample_rate < 65536:
            fb.put(13, 4)
            tail.put(sample_rate, 16)
        else:
            fb.put(14, 4)
            tail.put(sample_rate // 10, 16)
        ch_code = {"independent": channels - 1, "left_side": 8,
                   "right_side": 9, "mid_side": 10}[stereo_mode]
        fb.put(ch_code, 4)
        fb.put(0 if header_size == "streaminfo" else _CODED_SIZES[bps], 3)
        fb.put(0, 1)
        fb.align()
        fb.out += _utf8_number(frame_no)
        fb.out += tail.out
        fb.out.append(_crc8(bytes(fb.out)))

        # channel transforms
        if stereo_mode == "independent":
            subs = [(block[:, c], bps) for c in range(channels)]
        else:
            left = block[:, 0]
            right = block[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                subs = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                subs = [(side, bps + 1), (right, bps)]
            else:  # mid_side
                mid = (left + right) >> 1
                subs = [(mid, bps), (side, bps + 1)]
        body = _Bits()
        body.out = fb.out  # continue bit-packing after the aligned header
        for ch_samples, ch_bps in subs:
            kw = dict(fixed_order=fixed_order, lpc=lpc,
                      partition_order=partition_order, method=method,
                      wasted=wasted, escape_partitions=escape_partitions)
            k = kind
            if k == "constant" and len(set(int(v) for v in ch_samples)) > 1:
                k = "verbatim"  # side channel of a constant pair may vary
            if k == "fixed" and partition_order:
                assert bs % (1 << partition_order) == 0
            _write_subframe(body, ch_samples, ch_bps, k, **kw)
        body.align()
        crc = _crc16(bytes(body.out))
        body.out += crc.to_bytes(2, "big")
        out += body.out
    return bytes(out)


def write_flac(path: str, samples, sample_rate: int, **kw) -> str:
    with open(path, "wb") as f:
        f.write(encode_flac(samples, sample_rate, **kw))
    return path
