"""Golden tests: encoder output must be byte-identical to the reference
library on randomized inputs across the full parameter matrix."""
import numpy as np
import pytest

import gen
from libaec_tpu import Config, encode_buffer
from libaec_tpu.constants import (
    AEC_DATA_3BYTE,
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED,
    AEC_NOT_ENFORCE,
    AEC_RESTRICTED,
)

FLAG_SETS = [
    0,
    AEC_DATA_PREPROCESS,
    AEC_DATA_MSB | AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED | AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED | AEC_DATA_MSB | AEC_DATA_PREPROCESS,
]


@pytest.mark.oracle
@pytest.mark.parametrize("bps", [1, 2, 4, 8, 13, 16, 24, 32])
@pytest.mark.parametrize("flags", FLAG_SETS)
def test_encode_matrix(oracle_mod, bps, flags):
    if bps == 24:
        flags |= AEC_DATA_3BYTE
    rng = np.random.default_rng(bps * 131 + flags)
    for kind in gen.KINDS:
        bs = int(rng.choice([8, 16, 32, 64]))
        rsi = int(rng.choice([1, 2, 7, 64]))
        n = int(rng.integers(1, 3 * rsi * bs + 5))
        vals = gen.gen_values(rng, n, bps, bool(flags & 1), kind)
        data = gen.pack_samples(vals, bps, flags)
        st, ref = oracle_mod.encode(data, bps, bs, rsi, flags)
        if st != 0:
            continue
        mine = encode_buffer(data, Config(bps, bs, rsi, flags))
        assert mine == ref, (bps, flags, bs, rsi, kind, n)


@pytest.mark.oracle
@pytest.mark.parametrize("bps", [1, 2, 3, 4])
def test_encode_restricted(oracle_mod, bps):
    rng = np.random.default_rng(bps)
    flags = AEC_RESTRICTED | AEC_DATA_PREPROCESS
    for kind in gen.KINDS:
        bs, rsi = 8, int(rng.choice([1, 4, 16]))
        n = int(rng.integers(1, 3 * rsi * bs + 5))
        vals = gen.gen_values(rng, n, bps, False, kind)
        data = gen.pack_samples(vals, bps, flags)
        st, ref = oracle_mod.encode(data, bps, bs, rsi, flags)
        if st != 0:
            continue
        mine = encode_buffer(data, Config(bps, bs, rsi, flags))
        assert mine == ref, (bps, kind, n)


@pytest.mark.oracle
@pytest.mark.parametrize("bs", [2, 6, 10, 26, 50])
def test_encode_not_enforce_block_sizes(oracle_mod, bs):
    rng = np.random.default_rng(bs)
    flags = AEC_NOT_ENFORCE | AEC_DATA_PREPROCESS
    for kind in ["lowentropy", "zero_runs", "random"]:
        rsi = int(rng.choice([1, 3, 128]))
        n = int(rng.integers(1, 3 * rsi * bs + 5))
        vals = gen.gen_values(rng, n, 8, False, kind)
        data = gen.pack_samples(vals, 8, flags)
        st, ref = oracle_mod.encode(data, 8, bs, rsi, flags)
        if st != 0:
            continue
        mine = encode_buffer(data, Config(8, bs, rsi, flags))
        assert mine == ref, (bs, kind, n)


@pytest.mark.oracle
def test_encode_empty_and_tiny(oracle_mod):
    for data in [b"", b"\x00", b"\xff", b"\x01\x02"]:
        st, ref = oracle_mod.encode(data, 8, 8, 2, AEC_DATA_PREPROCESS)
        mine = encode_buffer(data, Config(8, 8, 2, AEC_DATA_PREPROCESS))
        assert mine == ref, data


@pytest.mark.oracle
def test_encode_rsi_4096(oracle_mod):
    rng = np.random.default_rng(0)
    flags = AEC_DATA_PREPROCESS | AEC_DATA_MSB
    vals = gen.gen_values(rng, 4096 * 64 + 77, 16, False, "lowentropy")
    data = gen.pack_samples(vals, 16, flags)
    st, ref = oracle_mod.encode(data, 16, 64, 4096, flags)
    assert st == 0
    mine = encode_buffer(data, Config(16, 64, 4096, flags))
    assert mine == ref
