"""FLAC decoder tests against hand-crafted bitstreams (no FLAC encoder
exists in this image, so the tests build spec-conformant streams directly —
constant, verbatim, and Rice-coded fixed-order subframes)."""

import struct

import numpy as np
import pytest

from ame_tpu.io import codecs


class BitWriter:
    def __init__(self):
        self.bits = []

    def w(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def sw(self, value, n):
        self.w(value & ((1 << n) - 1), n)

    def unary(self, q):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _streaminfo(rate, channels, bps, total):
    bw = BitWriter()
    bw.w(4096, 16)  # min block
    bw.w(4096, 16)  # max block
    bw.w(0, 24)
    bw.w(0, 24)
    bw.w(rate, 20)
    bw.w(channels - 1, 3)
    bw.w(bps - 1, 5)
    bw.w(total, 36)
    for _ in range(16):
        bw.w(0, 8)
    return bw.bytes()


def _frame_header(bw, blocksize_code, ch_asgn, frame_no):
    bw.w(0x3FFE, 14)
    bw.w(0, 1)  # reserved
    bw.w(0, 1)  # fixed blocksize strategy
    bw.w(blocksize_code, 4)
    bw.w(0, 4)   # rate: from STREAMINFO
    bw.w(ch_asgn, 4)
    bw.w(4, 3)   # 16-bit
    bw.w(0, 1)
    assert frame_no < 0x80
    bw.w(frame_no, 8)  # UTF-8 single byte
    bw.w(0, 8)  # CRC-8 (decoder skips validation)


def _flac_file(frames_bits, rate=44100, channels=2, bps=16, total=0):
    si = _streaminfo(rate, channels, bps, total)
    out = b"fLaC"
    out += bytes([0x80]) + struct.pack(">I", len(si))[1:] + si  # last block
    for fb in frames_bits:
        out += fb
    return out


def _rice_encode(bw, residuals, param):
    for r in residuals:
        u = (r << 1) if r >= 0 else ((-r << 1) - 1)
        bw.unary(u >> param)
        bw.w(u & ((1 << param) - 1), param)


@pytest.mark.parametrize("kind", ["constant", "verbatim", "fixed"])
def test_flac_subframe_kinds(tmp_path, kind):
    n = 192  # blocksize code 1
    rng = np.random.default_rng(0)
    if kind == "constant":
        want = np.full((n, 2), 1234, np.int64)
        want[:, 1] = -77
    elif kind == "verbatim":
        want = rng.integers(-30000, 30000, (n, 2)).astype(np.int64)
    else:  # fixed order 0: residual IS the signal (rice param 10)
        want = rng.integers(-400, 400, (n, 2)).astype(np.int64)

    bw = BitWriter()
    _frame_header(bw, 1, 1, 0)  # blocksize 192, 2ch independent
    for c in range(2):
        bw.w(0, 1)
        if kind == "constant":
            bw.w(0, 6)
            bw.w(0, 1)
            bw.sw(int(want[0, c]), 16)
        elif kind == "verbatim":
            bw.w(1, 6)
            bw.w(0, 1)
            for v in want[:, c]:
                bw.sw(int(v), 16)
        else:
            bw.w(8, 6)  # FIXED order 0
            bw.w(0, 1)
            bw.w(0, 2)  # rice method 0
            bw.w(0, 4)  # partition order 0
            bw.w(10, 4)  # rice param
            _rice_encode(bw, [int(v) for v in want[:, c]], 10)
    bw.align()
    bw.w(0, 16)  # frame CRC-16 (skipped)

    blob = _flac_file([bw.bytes()], total=n)
    p = tmp_path / "t.flac"
    p.write_bytes(blob)

    from ame_tpu.io.flac import read_flac
    y, sr = read_flac(str(p))
    assert sr == 44100
    assert y.shape == (n, 2)
    np.testing.assert_allclose(y, want.astype(np.float32) / 32768.0,
                               atol=1e-7)


def test_flac_stereo_decorrelation_rejected_for_mono(tmp_path):
    """A mono STREAMINFO with a left/side stereo frame used to write through
    the nonexistent ch[1] (out-of-bounds, SIGSEGV). The frame must now be
    rejected as corrupt — an error return, never a crash."""
    bw = BitWriter()
    _frame_header(bw, 1, 8, 0)  # ch_asgn 8 = left/side
    for bits in (16, 17):
        bw.w(0, 1)
        bw.w(0, 6)  # CONSTANT
        bw.w(0, 1)
        bw.sw(1000, bits)
    bw.align()
    bw.w(0, 16)
    blob = _flac_file([bw.bytes()], channels=1, total=192)
    p = tmp_path / "mono_stereo.flac"
    p.write_bytes(blob)
    from ame_tpu.io.flac import read_flac
    with pytest.raises(RuntimeError):
        read_flac(str(p))


def test_flac_lpc_order_exceeds_blocksize(tmp_path):
    """LPC order 32 against blocksize 1 (8-bit blocksize code): the warm-up
    used to write `order` samples into a `blocksize`-sized buffer. Must be
    rejected, not crash."""
    bw = BitWriter()
    bw.w(0x3FFE, 14)
    bw.w(0, 1)
    bw.w(0, 1)
    bw.w(6, 4)   # blocksize: 8-bit field follows the frame number
    bw.w(0, 4)   # rate from STREAMINFO
    bw.w(1, 4)   # 2ch independent
    bw.w(4, 3)   # 16-bit
    bw.w(0, 1)
    bw.w(0, 8)   # frame number (UTF-8 single byte)
    bw.w(0, 8)   # blocksize-1 = 0 -> blocksize 1
    bw.w(0, 8)   # CRC-8 (skipped)
    bw.w(0, 1)
    bw.w(63, 6)  # LPC order 32
    bw.w(0, 1)
    for _ in range(40):
        bw.sw(0, 16)  # bytes the decoder must never interpret as warm-up
    bw.align()
    blob = _flac_file([bw.bytes()], total=1)
    p = tmp_path / "lpc_order.flac"
    p.write_bytes(blob)
    from ame_tpu.io.flac import read_flac
    with pytest.raises(RuntimeError):
        read_flac(str(p))


def test_flac_wasted_bits_exhaust_sample_size(tmp_path):
    """A wasted-bits run longer than the sample size drives bps <= 0; the
    subframe must be rejected before any bits() call with n < 1."""
    bw = BitWriter()
    _frame_header(bw, 1, 1, 0)
    bw.w(0, 1)
    bw.w(0, 6)   # CONSTANT
    bw.w(1, 1)   # wasted-bits flag
    bw.w(0, 20)  # 20 zeros -> wasted = 21 > bps 16
    bw.w(1, 1)
    bw.sw(0, 16)
    bw.align()
    blob = _flac_file([bw.bytes()], total=192)
    p = tmp_path / "wasted.flac"
    p.write_bytes(blob)
    from ame_tpu.io.flac import read_flac
    with pytest.raises(RuntimeError):
        read_flac(str(p))


def test_flac_fuzz_no_crash(tmp_path):
    """Deterministic garbage after a valid STREAMINFO: every input must
    either decode or raise — the decoder is reachable in-process from the
    serve tier's upload path, so a crash here is a server crash."""
    rng = np.random.default_rng(0xF1AC)
    from ame_tpu.io.flac import read_flac
    for i in range(200):
        channels = int(rng.integers(1, 9))
        si = _streaminfo(44100, channels, 16, int(rng.integers(0, 10000)))
        blob = (b"fLaC" + bytes([0x80]) + struct.pack(">I", len(si))[1:] + si
                + rng.integers(0, 256, size=int(rng.integers(16, 4096)),
                               dtype=np.uint8).tobytes())
        p = tmp_path / f"fuzz{i}.flac"
        p.write_bytes(blob)
        try:
            read_flac(str(p))
        except RuntimeError:
            pass


def test_flac_mid_side_and_fixed2(tmp_path):
    """Mid/side stereo decorrelation + FIXED order-2 predictor."""
    n = 192
    t = np.arange(n)
    left = np.round(8000 * np.sin(2 * np.pi * 5 * t / n)).astype(np.int64)
    right = np.round(6000 * np.sin(2 * np.pi * 3 * t / n + 0.5)).astype(np.int64)
    mid = (left + right) >> 1
    side = left - right
    bw = BitWriter()
    _frame_header(bw, 1, 10, 0)  # mid/side
    for vals, bits in ((mid, 16), (side, 17)):
        bw.w(0, 1)
        bw.w(10, 6)  # FIXED order 2
        bw.w(0, 1)
        bw.sw(int(vals[0]), bits)
        bw.sw(int(vals[1]), bits)
        resid = [int(vals[i] - (2 * vals[i - 1] - vals[i - 2]))
                 for i in range(2, n)]
        bw.w(0, 2)
        bw.w(0, 4)
        bw.w(8, 4)
        _rice_encode(bw, resid, 8)
    bw.align()
    bw.w(0, 16)
    blob = _flac_file([bw.bytes()], total=n)
    p = tmp_path / "ms.flac"
    p.write_bytes(blob)
    from ame_tpu.io.flac import read_flac
    y, sr = read_flac(str(p))
    np.testing.assert_allclose(y[:, 0], left / 32768.0, atol=1e-7)
    np.testing.assert_allclose(y[:, 1], right / 32768.0, atol=1e-7)


def test_flac_decoder_fuzz_mutations(tmp_path):
    """Structured fuzz (ADVICE r1): random byte flips, truncations, and
    splices of a valid stream must never crash the process — the decoder
    either returns data or raises a clean Python error. (The serve tier
    decodes untrusted uploads in-process, so a segfault here is a
    denial-of-service.)"""
    rng = np.random.default_rng(0xF1AC)
    n = 192
    vals = rng.integers(-400, 400, (n, 2)).astype(np.int64)
    bw = BitWriter()
    _frame_header(bw, 1, 1, 0)
    for c in range(2):
        bw.w(0, 1)
        bw.w(8, 6)   # FIXED order 0
        bw.w(0, 1)
        bw.w(0, 2)
        bw.w(0, 4)
        bw.w(10, 4)
        _rice_encode(bw, [int(v) for v in vals[:, c]], 10)
    bw.align()
    bw.w(0, 16)
    blob = bytearray(_flac_file([bw.bytes()], total=n))

    from ame_tpu.io.flac import read_flac
    p = tmp_path / "fuzz.flac"
    ok = crashedless = 0
    for trial in range(300):
        mut = bytearray(blob)
        kind = trial % 3
        if kind == 0:      # byte flips (1-8 positions)
            for _ in range(int(rng.integers(1, 9))):
                i = int(rng.integers(0, len(mut)))
                mut[i] ^= int(rng.integers(1, 256))
        elif kind == 1:    # truncate
            mut = mut[:int(rng.integers(1, len(mut)))]
        else:              # splice random garbage into the middle
            i = int(rng.integers(0, len(mut)))
            mut[i:i] = bytes(rng.integers(0, 256, int(rng.integers(1, 64)),
                                          dtype=np.uint8))
        p.write_bytes(bytes(mut))
        try:
            y, sr = read_flac(str(p))
            assert np.isfinite(np.asarray(y, np.float64)).all()
            ok += 1
        except Exception:
            pass          # clean rejection is fine
        crashedless += 1
    assert crashedless == 300
