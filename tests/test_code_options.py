"""Spec-level tests modelled on the reference's check_code_options
(/root/reference/tests/check_code_options.c): construct inputs that force
each code option and assert the first byte's option ID, plus full roundtrip
through our own decoder."""
import numpy as np
import pytest

import gen
from libaec_tpu import Config, encode_buffer
from libaec_tpu.decode import decode_buffer_status
from libaec_tpu.constants import AEC_DATA_PREPROCESS, AEC_DATA_MSB


def first_id(enc, id_len):
    return enc[0] >> (8 - id_len)


def roundtrip(data, cfg):
    enc = encode_buffer(data, cfg)
    st, dec = decode_buffer_status(enc, cfg, len(data))
    assert st == 0
    assert dec == data
    return enc


@pytest.mark.parametrize("bs", [8, 16, 32, 64])
def test_zero_block_id(bs):
    # all-zero input with preprocessing -> low-entropy id 0
    cfg = Config(8, bs, 2, AEC_DATA_PREPROCESS)
    data = bytes(2 * 2 * bs)
    enc = roundtrip(data, cfg)
    assert first_id(enc, cfg.id_len) == 0


@pytest.mark.parametrize("bps", [8, 16, 24, 32])
def test_uncomp_id(bps):
    # alternating min/max -> uncompressible -> id 2^id_len - 1
    rng = np.random.default_rng(0)
    cfg = Config(bps, 8, 2, AEC_DATA_PREPROCESS | (AEC_DATA_MSB if bps > 8 else 0))
    hi = (1 << bps) - 1
    vals = np.tile(np.array([0, hi], np.uint32), 2 * 8)[: 2 * 8 * 2]
    data = gen.pack_samples(vals, bps, cfg.flags)
    enc = roundtrip(data, cfg)
    assert first_id(enc, cfg.id_len) == (1 << cfg.id_len) - 1


@pytest.mark.parametrize("k", [1, 2, 4])
def test_split_k_id(k):
    # deltas uniformly ~2^k wide force splitting with that k
    rng = np.random.default_rng(1)
    cfg = Config(8, 8, 2, 0)
    vals = (rng.integers(0, 2, 32).astype(np.uint32) + (1 << (k + 1))
            - (1 << k))
    # construct samples whose values are about 3*2^k: fs small, k LSBs random
    vals = rng.integers(1 << (k + 1), 1 << (k + 2), 32).astype(np.uint32)
    data = gen.pack_samples(vals, 8, 0)
    enc = roundtrip(data, cfg)
    got = first_id(enc, cfg.id_len)
    assert 1 <= got <= (1 << cfg.id_len) - 2  # some split id


def test_se_id():
    # pairs (1,0): SE length 1+8 beats split k=0 length 4+8 per block
    cfg = Config(8, 8, 2, 0)
    vals = np.tile(np.array([1, 0], np.uint32), 16)
    data = gen.pack_samples(vals, 8, 0)
    enc = roundtrip(data, cfg)
    # SE id is id_len zeros then a 1: first byte starts 0001xxxx for id_len=3
    assert (enc[0] >> (8 - cfg.id_len - 1)) == 1


def test_fs_id():
    # low-entropy deltas with k == 0 -> id 1 (split with k=0, pure FS)
    cfg = Config(8, 8, 2, 0)
    vals = np.tile(np.array([4, 5, 5, 4], np.uint32), 8)
    data = gen.pack_samples(vals, 8, 0)
    enc = roundtrip(data, cfg)
    assert 1 <= first_id(enc, cfg.id_len) <= 6
