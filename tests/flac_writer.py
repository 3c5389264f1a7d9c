"""Minimal FLAC encoder used only to generate decoder test vectors.

Supports what the tests need: 16-bit streams, mono/stereo, frames encoded
as VERBATIM, CONSTANT, or FIXED(order 1) with rice residuals (partition
order 0), and mid/side stereo decorrelation. CRC-8/16 are computed
properly so files are also readable by reference decoders.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    assert n < 128
    return bytes([n])


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, mode: str):
    if mode == "constant":
        bw.write(0b000000 << 1, 8)
        bw.write(int(x[0]), bps)
    elif mode == "verbatim":
        bw.write(0b000001 << 1, 8)
        for v in x:
            bw.write(int(v), bps)
    elif mode == "fixed1":
        bw.write((0b001000 | 1) << 1, 8)
        bw.write(int(x[0]), bps)            # warmup
        resid = np.diff(x.astype(np.int64))
        # rice param: smallest p with max quotient < 30
        zz = (np.abs(2 * resid) - (resid < 0)).astype(np.int64)
        p = 0
        while p < 14 and zz.size and (zz >> p).max() > 20:
            p += 1
        bw.write(0, 2)                       # rice method 0
        bw.write(0, 4)                       # partition order 0
        bw.write(p, 4)
        for v in zz:
            q = int(v) >> p
            for _ in range(q):
                bw.write(0, 1)
            bw.write(1, 1)
            bw.write(int(v), p)
    else:
        raise ValueError(mode)


def write_flac(
    path,
    samples: np.ndarray,     # (N,) or (N, 2) int16
    sample_rate: int = 16000,
    block_size: int = 4096,
    subframe_mode: str = "verbatim",
    stereo_mode: str = "independent",  # 'independent' | 'mid_side'
) -> None:
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    info = si.getvalue() + b"\x00" * 16  # md5 zeros
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    frame_idx = 0
    for start in range(0, n, block_size):
        blk = x[start:start + block_size]
        bs = blk.shape[0]
        hdr = BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)   # reserved
        hdr.write(0, 1)   # fixed blocking
        hdr.write(0b0111, 4)  # 16-bit block size follows
        hdr.write(0b0000, 4)  # sample rate from STREAMINFO
        if channels == 1:
            ch_code, modes, bits = 0b0000, [subframe_mode], [bps]
        elif stereo_mode == "independent":
            ch_code = 0b0001
            modes, bits = [subframe_mode] * 2, [bps, bps]
        else:  # mid/side
            ch_code = 0b1010
            modes, bits = [subframe_mode] * 2, [bps, bps + 1]
        hdr.write(ch_code, 4)
        hdr.write(0b100, 3)  # 16 bps
        hdr.write(0, 1)      # reserved
        header = hdr.getvalue() + _utf8_number(frame_idx) + bytes(
            [(bs - 1) >> 8, (bs - 1) & 0xFF]
        )
        header += bytes([crc8(header)])

        body = BitWriter()
        if channels == 1:
            chans = [blk[:, 0]]
        elif stereo_mode == "independent":
            chans = [blk[:, 0], blk[:, 1]]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            chans = [mid, side]
        for cx, mode, b in zip(chans, modes, bits):
            _write_subframe(body, cx, b, mode)
        body.align()
        frame = header + body.getvalue()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        frame_idx += 1

    with open(str(path), "wb") as f:
        f.write(out)
