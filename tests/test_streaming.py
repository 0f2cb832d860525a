"""Streaming equivalence: any input/output chunking must produce exactly the
one-shot bytes (reference: encode_decode_small's 1-byte torture,
tests/check_aec.c:59-200)."""
import numpy as np
import pytest

import gen
from libaec_tpu import Config, encode_buffer
from libaec_tpu.decode import decode_buffer_status
from libaec_tpu.stream import (
    AecStream,
    aec_decode,
    aec_decode_init,
    aec_encode,
    aec_encode_end,
    aec_encode_init,
)
from libaec_tpu.constants import (
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_FLUSH,
    AEC_NO_FLUSH,
    AEC_OK,
)


CASES = [
    (8, 8, 2, AEC_DATA_PREPROCESS, "lowentropy"),
    (16, 16, 4, AEC_DATA_MSB | AEC_DATA_PREPROCESS, "zero_runs"),
    (8, 8, 2, 0, "random"),
]


@pytest.mark.parametrize("bps,bs,rsi,flags,kind", CASES)
def test_encode_byte_dribble(bps, bs, rsi, flags, kind):
    rng = np.random.default_rng(bps)
    n = 3 * rsi * bs + 5
    vals = gen.gen_values(rng, n, bps, False, kind)
    data = gen.pack_samples(vals, bps, flags)
    cfg = Config(bps, bs, rsi, flags)
    oneshot = encode_buffer(data, cfg)

    s = AecStream(bps, bs, rsi, flags)
    assert aec_encode_init(s) == AEC_OK
    out = bytearray()
    for i in range(len(data)):
        s.next_in = data[i : i + 1]
        s.avail_in = 1
        s.next_out = out
        s.avail_out = 1  # 1-byte output dribble
        assert aec_encode(s, AEC_NO_FLUSH) == AEC_OK
    s.next_in = b""
    s.avail_in = 0
    while True:
        s.next_out = out
        s.avail_out = 1
        before = len(out)
        aec_encode(s, AEC_FLUSH)
        if len(out) == before:
            break
    assert aec_encode_end(s) == AEC_OK
    assert bytes(out) == oneshot


@pytest.mark.parametrize("bps,bs,rsi,flags,kind", CASES)
def test_decode_byte_dribble(bps, bs, rsi, flags, kind):
    rng = np.random.default_rng(bps + 1)
    n = 3 * rsi * bs + 5
    vals = gen.gen_values(rng, n, bps, False, kind)
    data = gen.pack_samples(vals, bps, flags)
    cfg = Config(bps, bs, rsi, flags)
    enc = encode_buffer(data, cfg)
    st, oneshot = decode_buffer_status(enc, cfg, len(data))
    assert st == AEC_OK

    s = AecStream(bps, bs, rsi, flags)
    aec_decode_init(s)
    out = bytearray()
    for i in range(len(enc)):
        s.next_in = enc[i : i + 1]
        s.avail_in = 1
        s.next_out = out
        s.avail_out = max(0, len(data) - len(out))
        aec_decode(s, AEC_NO_FLUSH)
    assert bytes(out) == oneshot


def test_encode_chunk_sizes_equivalent():
    rng = np.random.default_rng(3)
    flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS
    cfg = Config(16, 64, 32, flags)
    vals = gen.gen_values(rng, 11 * cfg.samples_per_rsi + 19, 16, False,
                          "midentropy")
    data = gen.pack_samples(vals, 16, flags)
    oneshot = encode_buffer(data, cfg)
    for chunk in [1 << 8, 1 << 12, 10 << 20]:
        s = AecStream(16, 64, 32, flags)
        aec_encode_init(s)
        out = bytearray()
        for i in range(0, len(data), chunk):
            s.next_in = data[i : i + chunk]
            s.avail_in = len(s.next_in)
            s.next_out = out
            s.avail_out = 1 << 30
            aec_encode(s, AEC_NO_FLUSH)
        s.next_in = b""
        s.avail_in = 0
        s.next_out = out
        s.avail_out = 1 << 30
        aec_encode(s, AEC_FLUSH)
        assert aec_encode_end(s) == AEC_OK
        assert bytes(out) == oneshot


def test_decode_incremental_large_stream():
    """Incremental streaming decode: complete RSIs decode exactly once as
    input accumulates (linear total work); output equals one-shot."""
    rng = np.random.default_rng(5)
    flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS
    cfg = Config(16, 64, 64, flags)
    vals = gen.gen_values(rng, 64 * cfg.samples_per_rsi, 16, False,
                          "lowentropy")
    data = gen.pack_samples(vals, 16, flags)
    enc = encode_buffer(data, cfg)
    st, oneshot = decode_buffer_status(enc, cfg, len(data))
    assert st == AEC_OK

    s = AecStream(16, 64, 64, flags)
    aec_decode_init(s)
    out = bytearray()
    chunk = 8192
    for i in range(0, len(enc), chunk):
        s.next_in = enc[i : i + chunk]
        s.avail_in = len(s.next_in)
        s.next_out = out
        s.avail_out = 1 << 30
        aec_decode(s, AEC_NO_FLUSH)
        # the scan position advances past every completed RSI and consumed
        # input is trimmed: buffered state is bounded by O(RSI), not by
        # the stream length (per-call re-decode work likewise)
        st_state = s._state
        assert (8 * len(st_state.inbuf) - st_state.pos_bit
                < 2 * 8 * cfg.rsi_len_bytes)
        assert len(st_state.inbuf) < chunk + 2 * cfg.rsi_len_bytes
        assert len(st_state.done_out) == 0  # fully drained each call
    assert bytes(out) == oneshot


def test_cli_decode_chunked(tmp_path):
    """_decode_to_file in multi-chunk mode matches the one-shot decode."""
    from libaec_tpu.cli import _decode_to_file

    rng = np.random.default_rng(6)
    flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS
    cfg = Config(16, 64, 16, flags)
    vals = gen.gen_values(rng, 24 * cfg.samples_per_rsi + 100, 16, False,
                          "midentropy")
    data = gen.pack_samples(vals, 16, flags)
    enc = encode_buffer(data, cfg)
    out_fn = tmp_path / "out.dat"
    rc = _decode_to_file(enc, cfg, str(out_fn), rsis_per_chunk=3)
    assert rc == 0
    st, oneshot = decode_buffer_status(enc, cfg, 2 * len(data))
    assert out_fn.read_bytes() == oneshot
