"""Bounded-memory streaming decode.

The reference's decode session holds O(rsi) state forever
(/root/reference/src/decode.h:68-133: one rsi_buffer, one bit cursor) and
can therefore decode an arbitrarily long stream in constant memory through
small buffers.  These tests prove the repo's streaming layers (Python
stream.py and the C-ABI drop-in) match that: a >100 MiB stream drip-fed
through 64 KiB buffers decodes byte-identically with buffered state -- and
process RSS -- bounded by O(chunk + RSI), not by the stream length.
"""
import ctypes
import hashlib
import os

import numpy as np
import pytest

import gen
from libaec_tpu import native
from libaec_tpu.config import Config
from libaec_tpu.constants import (
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_FLUSH,
    AEC_NO_FLUSH,
    AEC_OK,
)
from libaec_tpu.stream import AecStream, aec_decode, aec_decode_init

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="needs the native toolchain")

FLAGS = AEC_DATA_MSB | AEC_DATA_PREPROCESS
CFG = Config(16, 64, 256, FLAGS)          # bench config; rsi_bytes = 32 KiB
TOTAL_MIB = 112                           # > 100 MiB decoded
CHUNK = 64 * 1024


def _rss_kib():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    raise RuntimeError("no VmRSS")


def _make_stream():
    """Encode TOTAL_MIB of low-entropy samples; return (sha256(raw), enc)."""
    rng = np.random.default_rng(7)
    n_samples = TOTAL_MIB * (1 << 20) // CFG.bytes_per_sample
    vals = gen.gen_values(rng, n_samples, 16, False, "lowentropy")
    raw = gen.pack_samples(vals, 16, FLAGS)
    digest = hashlib.sha256(raw).hexdigest()
    st, enc = native.encode(bytes(raw), CFG)
    assert st == AEC_OK
    return digest, enc


@pytest.fixture(scope="module")
def big_stream():
    return _make_stream()


def test_python_stream_decode_bounded(big_stream):
    digest, enc = big_stream
    s = AecStream(16, 64, 256, FLAGS)
    aec_decode_init(s)
    h = hashlib.sha256()
    out_total = 0
    rss0 = _rss_kib()
    rss_peak = rss0
    for i in range(0, len(enc), CHUNK):
        s.next_in = enc[i : i + CHUNK]
        s.avail_in = len(s.next_in)
        out = bytearray()
        s.next_out = out
        s.avail_out = 1 << 30
        aec_decode(s, AEC_NO_FLUSH)
        h.update(bytes(out))
        out_total += len(out)
        st = s._state
        # buffered state is O(chunk + RSI): un-decoded input below two
        # RSIs, no undrained output
        assert len(st.inbuf) < CHUNK + 2 * CFG.rsi_len_bytes
        assert len(st.done_out) == 0
        if (i // CHUNK) % 64 == 0:
            r = _rss_kib()
            rss_peak = max(rss_peak, r)
    s.next_in = b""
    s.avail_in = 0
    out = bytearray()
    s.next_out = out
    s.avail_out = 1 << 30
    aec_decode(s, AEC_FLUSH)
    h.update(bytes(out))
    out_total += len(out)

    assert out_total == TOTAL_MIB * (1 << 20)
    assert h.hexdigest() == digest
    # RSS growth across the loop stays far below the 112 MiB output (and
    # the ~230 MiB an unbounded session would hold); 48 MiB covers
    # allocator noise
    assert rss_peak - rss0 < 48 * 1024, (rss0, rss_peak)


class _AbiStream(ctypes.Structure):
    _fields_ = [
        ("next_in", ctypes.c_void_p),
        ("avail_in", ctypes.c_size_t),
        ("total_in", ctypes.c_size_t),
        ("next_out", ctypes.c_void_p),
        ("avail_out", ctypes.c_size_t),
        ("total_out", ctypes.c_size_t),
        ("bits_per_sample", ctypes.c_uint),
        ("block_size", ctypes.c_uint),
        ("rsi", ctypes.c_uint),
        ("flags", ctypes.c_uint),
        ("state", ctypes.c_void_p),
    ]


def test_c_abi_stream_decode_bounded(big_stream):
    digest, enc = big_stream
    lib = ctypes.CDLL(str(native._SO))
    s = _AbiStream(bits_per_sample=16, block_size=64, rsi=256, flags=FLAGS)
    assert lib.aec_decode_init(ctypes.byref(s)) == 0

    outb = ctypes.create_string_buffer(CHUNK)
    h = hashlib.sha256()
    out_total = 0
    rss0 = _rss_kib()
    rss_peak = rss0

    def drain(flush):
        nonlocal out_total
        while True:
            s.next_out = ctypes.cast(outb, ctypes.c_void_p)
            s.avail_out = CHUNK
            assert lib.aec_decode(ctypes.byref(s), flush) == 0
            n = CHUNK - s.avail_out
            if n:
                h.update(outb.raw[:n])
                out_total += n
            if s.avail_out:
                return

    for i in range(0, len(enc), CHUNK):
        piece = enc[i : i + CHUNK]
        s.next_in = ctypes.cast(ctypes.c_char_p(piece), ctypes.c_void_p)
        s.avail_in = len(piece)
        drain(0)  # AEC_NO_FLUSH
        if (i // CHUNK) % 64 == 0:
            rss_peak = max(rss_peak, _rss_kib())
    s.next_in = None
    s.avail_in = 0
    drain(1)  # AEC_FLUSH
    assert lib.aec_decode_end(ctypes.byref(s)) == 0

    assert out_total == TOTAL_MIB * (1 << 20)
    assert h.hexdigest() == digest
    assert rss_peak - rss0 < 48 * 1024, (rss0, rss_peak)
