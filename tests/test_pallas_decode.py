"""Pallas decode kernel (kernels/decode_pallas.py) vs the XLA payload
parse: identical deltas on reference-encoded streams.  interpret=True runs
everywhere; a TPU-marked case exercises the real Mosaic lowering."""
import numpy as np
import pytest

import gen
from libaec_tpu import Config, native
from libaec_tpu.constants import (
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED,
)
from libaec_tpu.decode import stream_words_np
from libaec_tpu.encode import encode_buffer
from libaec_tpu.ops import bitunpack

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def _records(cfg, comp, n_rsis):
    recs, n_ok, _ = native.scan_blocks(comp, n_rsis,
                                       bitunpack.max_fs_bits(cfg), cfg)
    assert n_ok == n_rsis
    fs_off = recs["fs_off"]
    return (
        (fs_off >> np.uint64(5)).astype(np.uint32),
        (fs_off & np.uint64(31)).astype(np.uint32),
        (recs["lsb_off"] - fs_off).astype(np.uint32),
        recs["meta"],
        recs["ref_sample"],
    )


CASES = [
    (8, 16, 8, 0),
    (16, 64, 32, AEC_DATA_MSB),
    (16, 64, 8, AEC_DATA_MSB | AEC_DATA_SIGNED),
    (32, 64, 4, AEC_DATA_MSB),
    (13, 32, 16, AEC_DATA_SIGNED),
]


def _deltas(cfg, raw, use_pallas, interpret):
    import jax

    comp = encode_buffer(raw, cfg)
    n_rsis = len(raw) // cfg.rsi_len_bytes
    arrs = _records(cfg, comp, n_rsis)
    words = stream_words_np(comp, cfg)
    out = jax.jit(
        lambda w, *a: bitunpack.decode_blocks(
            cfg, w, *a, use_pallas=use_pallas, interpret=interpret)
    )(words, *arrs)
    return np.asarray(out)


@pytest.mark.parametrize("bps,bs,rsi,extra", CASES)
@pytest.mark.parametrize("pp", [0, AEC_DATA_PREPROCESS])
def test_pallas_decode_matches_xla_interpret(bps, bs, rsi, extra, pp):
    cfg = Config(bps, bs, rsi, extra | pp)
    rng = np.random.default_rng(bps * 77 + bs + rsi + pp)
    vals = gen.gen_values(rng, 6 * rsi * bs, bps, cfg.signed, "midentropy")
    raw = gen.pack_samples(vals, bps, cfg.flags)
    ref = _deltas(cfg, raw, use_pallas=False, interpret=False)
    got = _deltas(cfg, raw, use_pallas=True, interpret=True)
    assert (got == ref).all()


def test_pallas_decode_zero_runs_interpret():
    cfg = Config(16, 64, 64, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    samples = np.zeros(64 * 64 * 4, dtype=">u2")
    samples[::777] = 9
    raw = samples.tobytes()
    ref = _deltas(cfg, raw, use_pallas=False, interpret=False)
    got = _deltas(cfg, raw, use_pallas=True, interpret=True)
    assert (got == ref).all()


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="real Mosaic lowering needs a TPU")
def test_pallas_decode_matches_xla_tpu():
    cfg = Config(16, 64, 32, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(123)
    vals = gen.gen_values(rng, 16 * 32 * 64, 16, False, "lowentropy")
    raw = gen.pack_samples(vals, 16, cfg.flags)
    ref = _deltas(cfg, raw, use_pallas=False, interpret=False)
    got = _deltas(cfg, raw, use_pallas=True, interpret=False)
    assert (got == ref).all()
