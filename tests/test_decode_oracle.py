"""Decoder parity: valid streams, truncated streams, and odd output sizes
must match the reference's bytes and status codes."""
import numpy as np
import pytest

import gen
from libaec_tpu import Config
from libaec_tpu.decode import decode_buffer_status
from libaec_tpu.constants import (
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED,
    AEC_DATA_3BYTE,
    AEC_PAD_RSI,
)

FLAG_SETS = [
    0,
    AEC_DATA_PREPROCESS,
    AEC_DATA_MSB | AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED | AEC_DATA_PREPROCESS,
]


def _compare(ref_status, ref_out, my_status, my_out):
    assert my_status == ref_status
    if ref_status == 0:
        assert my_out == ref_out
    else:
        # the reference skips the final flush on error paths and reports an
        # unadjusted total_out; compare the flushed prefix
        assert ref_out[: len(my_out)] == my_out
        assert all(b == 0 for b in ref_out[len(my_out):])


@pytest.mark.oracle
@pytest.mark.parametrize("bps", [1, 4, 8, 16, 24, 32])
@pytest.mark.parametrize("flags", FLAG_SETS)
def test_decode_roundtrip(oracle_mod, bps, flags):
    if bps == 24:
        flags |= AEC_DATA_3BYTE
    rng = np.random.default_rng(bps * 7 + flags)
    for kind in gen.KINDS:
        bs = int(rng.choice([8, 16, 64]))
        rsi = int(rng.choice([1, 4, 16]))
        n = int(rng.integers(1, 3 * rsi * bs + 5))
        vals = gen.gen_values(rng, n, bps, bool(flags & 1), kind)
        data = gen.pack_samples(vals, bps, flags)
        st, enc = oracle_mod.encode(data, bps, bs, rsi, flags)
        if st != 0:
            continue
        cfg = Config(bps, bs, rsi, flags)
        rs, rout = oracle_mod.decode(enc, bps, bs, rsi, flags, len(data))
        ms, mout = decode_buffer_status(enc, cfg, len(data))
        _compare(rs, rout, ms, mout)


@pytest.mark.oracle
def test_decode_truncated_and_sized(oracle_mod):
    rng = np.random.default_rng(123)
    checked = 0
    for trial in range(120):
        bps = int(rng.choice([1, 4, 8, 16, 32]))
        flags = int(rng.choice(FLAG_SETS))
        bs = int(rng.choice([8, 16, 64]))
        rsi = int(rng.choice([1, 4, 16]))
        kind = gen.KINDS[int(rng.integers(0, len(gen.KINDS)))]
        n = int(rng.integers(1, 3 * rsi * bs + 5))
        vals = gen.gen_values(rng, n, bps, bool(flags & 1), kind)
        data = gen.pack_samples(vals, bps, flags)
        st, enc = oracle_mod.encode(data, bps, bs, rsi, flags)
        if st != 0:
            continue
        if trial % 2:
            enc = enc[: int(rng.integers(0, len(enc) + 1))]
            out_size = len(data)
        else:
            out_size = max(0, len(data) + int(rng.integers(-2 * bs, 2 * bs)))
        cfg = Config(bps, bs, rsi, flags)
        rs, rout = oracle_mod.decode(enc, bps, bs, rsi, flags, out_size)
        ms, mout = decode_buffer_status(enc, cfg, out_size)
        _compare(rs, rout, ms, mout)
        checked += 1
    assert checked > 60


@pytest.mark.oracle
def test_decode_numpy_fallback_matches(oracle_mod):
    from libaec_tpu.decode import decode_buffer_numpy

    rng = np.random.default_rng(5)
    for flags in FLAG_SETS:
        vals = gen.gen_values(rng, 700, 8, bool(flags & 1), "lowentropy")
        data = gen.pack_samples(vals, 8, flags)
        st, enc = oracle_mod.encode(data, 8, 16, 4, flags)
        assert st == 0
        rs, rout = oracle_mod.decode(enc, 8, 16, 4, flags, len(data))
        ms, mout = decode_buffer_numpy(enc, len(data), Config(8, 16, 4, flags))
        assert (ms, mout) == (rs, rout)


def test_pad_rsi_roundtrip():
    """PAD_RSI decode realigns to byte boundaries at RSI starts; build a
    padded stream by byte-aligning independently encoded RSIs."""
    from libaec_tpu import encode_buffer

    rng = np.random.default_rng(9)
    flags = AEC_DATA_PREPROCESS
    cfg = Config(8, 8, 4, flags)
    rsi_bytes = cfg.rsi_len_bytes
    vals = gen.gen_values(rng, 4 * cfg.samples_per_rsi, 8, False, "lowentropy")
    data = gen.pack_samples(vals, 8, flags)
    # encode each RSI separately -> every RSI starts on a byte boundary,
    # which is exactly the AEC_PAD_RSI wire layout
    stream = b"".join(
        encode_buffer(data[i : i + rsi_bytes], cfg)
        for i in range(0, len(data), rsi_bytes)
    )
    cfg_pad = Config(8, 8, 4, flags | AEC_PAD_RSI)
    st, out = decode_buffer_status(stream, cfg_pad, len(data))
    assert st == 0
    assert out == data
