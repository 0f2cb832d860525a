"""C-ABI compatibility layer (native/libaec_abi.cpp): the libaec.h /
szlib.h-compatible entry points exported by libaectpu.so, driven through
ctypes exactly as a C consumer would call them, verified against the
reference-oracle python paths."""
import ctypes

import numpy as np
import pytest

import gen
from libaec_tpu import Config, native
from libaec_tpu import szip as pyszip
from libaec_tpu.backend import NUMPY
from libaec_tpu.constants import (
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_FLUSH,
    AEC_NO_FLUSH,
    AEC_OK,
    AEC_STREAM_ERROR,
)
from libaec_tpu.encode import encode_buffer

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


class AecStream(ctypes.Structure):
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


class SZCom(ctypes.Structure):
    _fields_ = [
        ("options_mask", ctypes.c_int),
        ("bits_per_pixel", ctypes.c_int),
        ("pixels_per_block", ctypes.c_int),
        ("pixels_per_scanline", ctypes.c_int),
    ]


def _lib():
    return ctypes.CDLL(str(native._SO))


def _data(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = gen.gen_values(rng, n, cfg.bits_per_sample, cfg.signed,
                          "midentropy")
    return gen.pack_samples(vals, cfg.bits_per_sample, cfg.flags)


def test_buffer_encode_decode_roundtrip():
    lib = _lib()
    cfg = Config(16, 64, 64, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    raw = _data(cfg, 5 * cfg.samples_per_rsi + 123, seed=1)
    want = encode_buffer(raw, cfg, backend=NUMPY)

    inb = ctypes.create_string_buffer(raw, len(raw))
    outb = ctypes.create_string_buffer(len(want) + 64)
    s = AecStream(ctypes.cast(inb, ctypes.c_void_p), len(raw), 0,
                  ctypes.cast(outb, ctypes.c_void_p), len(want) + 64, 0,
                  cfg.bits_per_sample, cfg.block_size, cfg.rsi, cfg.flags,
                  None)
    assert lib.aec_buffer_encode(ctypes.byref(s)) == AEC_OK
    assert s.total_out == len(want)
    assert outb.raw[: len(want)] == want

    # capacity: too-small output reports AEC_STREAM_ERROR, buffer filled
    small = ctypes.create_string_buffer(len(want) // 2)
    s2 = AecStream(ctypes.cast(inb, ctypes.c_void_p), len(raw), 0,
                   ctypes.cast(small, ctypes.c_void_p), len(want) // 2, 0,
                   cfg.bits_per_sample, cfg.block_size, cfg.rsi, cfg.flags,
                   None)
    assert lib.aec_buffer_encode(ctypes.byref(s2)) == AEC_STREAM_ERROR
    assert small.raw == want[: len(want) // 2]

    # decode back
    comp = ctypes.create_string_buffer(want, len(want))
    dec = ctypes.create_string_buffer(len(raw))
    s3 = AecStream(ctypes.cast(comp, ctypes.c_void_p), len(want), 0,
                   ctypes.cast(dec, ctypes.c_void_p), len(raw), 0,
                   cfg.bits_per_sample, cfg.block_size, cfg.rsi, cfg.flags,
                   None)
    assert lib.aec_buffer_decode(ctypes.byref(s3)) == AEC_OK
    assert dec.raw == raw


def test_streaming_encode_chunked_equals_oneshot():
    lib = _lib()
    cfg = Config(16, 32, 16, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    raw = _data(cfg, 9 * cfg.samples_per_rsi + 77, seed=2)
    want = encode_buffer(raw, cfg, backend=NUMPY)

    s = AecStream()
    s.bits_per_sample, s.block_size, s.rsi, s.flags = (
        cfg.bits_per_sample, cfg.block_size, cfg.rsi, cfg.flags)
    assert lib.aec_encode_init(ctypes.byref(s)) == AEC_OK

    out = bytearray()
    outb = ctypes.create_string_buffer(777)  # deliberately odd drain size
    rng = np.random.default_rng(3)
    pos = 0
    while pos < len(raw):
        n = min(int(rng.integers(1, 5000)), len(raw) - pos)
        chunk = ctypes.create_string_buffer(raw[pos:pos + n], n)
        s.next_in = ctypes.cast(chunk, ctypes.c_void_p)
        s.avail_in = n
        s.next_out = ctypes.cast(outb, ctypes.c_void_p)
        s.avail_out = len(outb)
        assert lib.aec_encode(ctypes.byref(s), AEC_NO_FLUSH) == AEC_OK
        out += outb.raw[: len(outb) - s.avail_out]
        pos += n
    # flush + drain until end reports completion
    while True:
        s.next_in = None
        s.avail_in = 0
        s.next_out = ctypes.cast(outb, ctypes.c_void_p)
        s.avail_out = len(outb)
        assert lib.aec_encode(ctypes.byref(s), AEC_FLUSH) == AEC_OK
        got = outb.raw[: len(outb) - s.avail_out]
        out += got
        if not got:
            break
    assert lib.aec_encode_end(ctypes.byref(s)) == AEC_OK
    assert bytes(out) == want


def test_streaming_decode_chunked_equals_oneshot():
    lib = _lib()
    cfg = Config(8, 16, 8, AEC_DATA_PREPROCESS)
    raw = _data(cfg, 20 * cfg.samples_per_rsi + 13, seed=4)
    comp = encode_buffer(raw, cfg, backend=NUMPY)
    st, want = native.decode(comp, len(raw) + 64, cfg)
    assert st == AEC_OK

    s = AecStream()
    s.bits_per_sample, s.block_size, s.rsi, s.flags = (
        cfg.bits_per_sample, cfg.block_size, cfg.rsi, cfg.flags)
    assert lib.aec_decode_init(ctypes.byref(s)) == AEC_OK
    out = bytearray()
    outb = ctypes.create_string_buffer(501)
    rng = np.random.default_rng(5)
    pos = 0
    while pos < len(comp):
        n = min(int(rng.integers(1, 900)), len(comp) - pos)
        chunk = ctypes.create_string_buffer(comp[pos:pos + n], n)
        s.next_in = ctypes.cast(chunk, ctypes.c_void_p)
        s.avail_in = n
        s.next_out = ctypes.cast(outb, ctypes.c_void_p)
        s.avail_out = len(outb)
        assert lib.aec_decode(ctypes.byref(s), AEC_NO_FLUSH) == AEC_OK
        out += outb.raw[: len(outb) - s.avail_out]
        pos += n
    while True:
        s.next_in = None
        s.avail_in = 0
        s.next_out = ctypes.cast(outb, ctypes.c_void_p)
        s.avail_out = len(outb)
        lib.aec_decode(ctypes.byref(s), AEC_FLUSH)
        got = outb.raw[: len(outb) - s.avail_out]
        out += got
        if not got:
            break
    assert lib.aec_decode_end(ctypes.byref(s)) == AEC_OK
    assert bytes(out) == want


def test_streaming_one_byte_torture():
    """1-byte-in / 1-byte-out through the C ABI (the reference's
    encode_decode_small regime, tests/check_aec.c:59-200): every call
    moves at most one byte each way; output must equal the one-shot."""
    lib = _lib()
    cfg = Config(8, 8, 4, AEC_DATA_PREPROCESS)
    raw = _data(cfg, 3 * cfg.samples_per_rsi + 5, seed=9)
    want = encode_buffer(raw, cfg, backend=NUMPY)

    s = AecStream()
    s.bits_per_sample, s.block_size, s.rsi, s.flags = (
        cfg.bits_per_sample, cfg.block_size, cfg.rsi, cfg.flags)
    assert lib.aec_encode_init(ctypes.byref(s)) == AEC_OK
    out = bytearray()
    outb = ctypes.create_string_buffer(1)
    for i in range(len(raw)):
        chunk = ctypes.create_string_buffer(raw[i:i + 1], 1)
        s.next_in = ctypes.cast(chunk, ctypes.c_void_p)
        s.avail_in = 1
        s.next_out = ctypes.cast(outb, ctypes.c_void_p)
        s.avail_out = 1
        assert lib.aec_encode(ctypes.byref(s), AEC_NO_FLUSH) == AEC_OK
        if s.avail_out == 0:
            out += outb.raw[:1]
    while True:
        s.next_in = None
        s.avail_in = 0
        s.next_out = ctypes.cast(outb, ctypes.c_void_p)
        s.avail_out = 1
        assert lib.aec_encode(ctypes.byref(s), AEC_FLUSH) == AEC_OK
        if s.avail_out:
            break
        out += outb.raw[:1]
    assert lib.aec_encode_end(ctypes.byref(s)) == AEC_OK
    assert bytes(out) == want

    # decode side, same regime
    st_ref, want_out = native.decode(want, len(raw) + 8, cfg)
    assert st_ref == AEC_OK
    d = AecStream()
    d.bits_per_sample, d.block_size, d.rsi, d.flags = (
        cfg.bits_per_sample, cfg.block_size, cfg.rsi, cfg.flags)
    assert lib.aec_decode_init(ctypes.byref(d)) == AEC_OK
    dec = bytearray()
    for i in range(len(want)):
        chunk = ctypes.create_string_buffer(want[i:i + 1], 1)
        d.next_in = ctypes.cast(chunk, ctypes.c_void_p)
        d.avail_in = 1
        d.next_out = ctypes.cast(outb, ctypes.c_void_p)
        d.avail_out = 1
        assert lib.aec_decode(ctypes.byref(d), AEC_NO_FLUSH) == AEC_OK
        if d.avail_out == 0:
            dec += outb.raw[:1]
    while True:
        d.next_in = None
        d.avail_in = 0
        d.next_out = ctypes.cast(outb, ctypes.c_void_p)
        d.avail_out = 1
        lib.aec_decode(ctypes.byref(d), AEC_FLUSH)
        if d.avail_out:
            break
        dec += outb.raw[:1]
    assert lib.aec_decode_end(ctypes.byref(d)) == AEC_OK
    assert bytes(dec) == want_out


def test_c_consumer_compiles_and_runs(tmp_path):
    """A real C program linking libaectpu.so through libaec_compat.h."""
    import shutil
    import subprocess
    from pathlib import Path

    if shutil.which("gcc") is None:
        pytest.skip("no C compiler")
    repo = Path(__file__).resolve().parent.parent
    exe = tmp_path / "c_consumer"
    subprocess.run(
        ["gcc", "-I", str(repo / "libaec_tpu" / "native"),
         str(repo / "examples" / "c_consumer.c"),
         "-L", str(repo / "libaec_tpu" / "native"), "-l:libaectpu.so",
         "-o", str(exe)], check=True)
    out = subprocess.run(
        [str(exe)], check=True, capture_output=True, text=True,
        env={"LD_LIBRARY_PATH": str(repo / "libaec_tpu" / "native")})
    assert "roundtrips OK" in out.stdout


@pytest.mark.parametrize("bpp,ppb,pps", [(16, 16, 256), (8, 8, 100),
                                         (64, 8, 64), (32, 16, 250),
                                         (16, 10, 130)])
def test_sz_compress_decompress_matches_python(bpp, ppb, pps):
    lib = _lib()
    rng = np.random.default_rng(bpp + ppb)
    n_pixels = pps * 7 + (0 if pps % ppb == 0 else 3)
    pixel_bytes = {8: 1, 16: 2, 32: 4, 64: 8}[bpp]
    src = rng.integers(0, 200, n_pixels * pixel_bytes,
                       dtype=np.uint32).astype(np.uint8).tobytes()
    mask = 16 | 32  # MSB | NN
    param = pyszip.SZCom(mask, bpp, ppb, pps)
    want = pyszip.sz_buffto_buff_compress(src, param)

    cparam = SZCom(mask, bpp, ppb, pps)
    dest = ctypes.create_string_buffer(len(src) * 2 + 1024)
    dlen = ctypes.c_size_t(len(dest))
    srcb = ctypes.create_string_buffer(src, len(src))
    st = lib.SZ_BufftoBuffCompress(dest, ctypes.byref(dlen), srcb, len(src),
                                   ctypes.byref(cparam))
    assert st == 0
    got = dest.raw[: dlen.value]
    assert got == want

    # decompress our own stream back through the C ABI
    back = ctypes.create_string_buffer(len(src))
    blen = ctypes.c_size_t(len(src))
    st = lib.SZ_BufftoBuffDecompress(back, ctypes.byref(blen), dest,
                                     dlen.value, ctypes.byref(cparam))
    assert st == 0
    pyback = pyszip.sz_buffto_buff_decompress(want, param, len(src))
    assert back.raw[: blen.value] == pyback

    assert lib.SZ_encoder_enabled() == 1


def test_streaming_flush_tail_matches_reference_on_garbage():
    """A structurally-invalid tail (here: an oversized-FS block the scan
    rejects) can still decode to MANY RSIs of output under the
    reference's garbage-in stance.  The streaming session's flush path
    must reproduce the reference's one-shot decode of the same bytes --
    it re-decodes the tail with a geometrically grown cap instead of
    truncating at one RSI (or allocating the unbounded worst case)."""
    import oracle

    if not oracle.available():
        pytest.skip("reference build unavailable")
    lib = _lib()
    flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS
    bps, bs, rsi = 16, 64, 16
    cfg = Config(bps, bs, rsi, flags)
    data = _data(cfg, 6 * cfg.samples_per_rsi, seed=12)
    enc = bytearray(encode_buffer(data, cfg))

    # find the byte region of RSI 3 via the offsets-only scan and stomp
    # an oversized-FS split block over it: id=0001 (split, k=0) then a
    # >max_fs_bits run of zeros -- the structural scan rejects this, the
    # serial core decodes straight through it
    import ctypes as ct

    n1, end_bit = native.scan_rsis(bytes(enc), 0, 3, cfg)
    assert n1 == 3
    cut = end_bit // 8 + 1
    stomp = bytes([0x10]) + b"\x00" * 200  # 4-bit id 0001 + ~1600 zero bits
    enc[cut : cut + len(stomp)] = stomp
    enc = bytes(enc)

    out_size = len(data)
    # NB: the REFERENCE's parse of structurally-invalid streams hits its
    # own documented OOB quirks (see the differential fuzzer's notes), so
    # garbage-in equality is defined against OUR serial core: the
    # streaming session must reproduce the one-shot decode of the same
    # bytes, and our one-shot core is the oracle-validated semantics for
    # every CONFORMING stream.
    st_ref, ref_out = native.decode(enc, 4 * len(data), cfg, threads=1)

    s = AecStream(bits_per_sample=bps, block_size=bs, rsi=rsi, flags=flags)
    assert lib.aec_decode_init(ct.byref(s)) == 0
    got = bytearray()
    outb = ct.create_string_buffer(1 << 16)
    s.next_in = ct.cast(ct.c_char_p(enc), ct.c_void_p)
    s.avail_in = len(enc)
    for _ in range(10000):
        s.next_out = ct.cast(outb, ct.c_void_p)
        s.avail_out = len(outb.raw)
        lib.aec_decode(ct.byref(s), AEC_FLUSH)
        n = len(outb.raw) - s.avail_out
        got += outb.raw[:n]
        if n == 0:
            break
    assert lib.aec_decode_end(ct.byref(s)) == 0

    # the one-shot stops at its out_cap; the session is unbounded --
    # the common prefix must be identical and the session must have
    # decoded well past the stomp point (several RSIs of tail output,
    # i.e. NOT truncated at one RSI by the old flush cap)
    m = min(len(got), len(ref_out))
    assert m >= out_size // 2
    assert bytes(got[:m]) == ref_out[:m]
    # 3 scanned RSIs + a >1-RSI decoded tail: the old one-RSI flush cap
    # could emit at most 4 RSIs + slack
    assert len(got) > 4 * cfg.rsi_len_bytes + 32


def test_buffer_encode_large_routes_parallel():
    """aec_buffer_encode on a multi-MiB buffer (the parallel-encoder
    route) must be byte-identical to the small-buffer serial path."""
    import ctypes as ct

    lib = _lib()
    flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS
    cfg = Config(16, 64, 256, flags)
    rng = np.random.default_rng(77)
    n = (9 << 20) // 2  # 9 MiB of samples: over the 8 MiB routing bound
    data = _data(cfg, n, seed=77)
    expect = encode_buffer(bytes(data), cfg)

    outb = ct.create_string_buffer(len(data) + (1 << 20))
    s = AecStream(
        next_in=ct.cast(ct.c_char_p(bytes(data)), ct.c_void_p),
        avail_in=len(data),
        next_out=ct.cast(outb, ct.c_void_p), avail_out=len(outb.raw),
        bits_per_sample=16, block_size=64, rsi=256, flags=flags)
    assert lib.aec_buffer_encode(ct.byref(s)) == 0
    assert outb.raw[: s.total_out] == expect
