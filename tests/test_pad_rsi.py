"""AEC_PAD_RSI, both directions (SURVEY.md §7.5).

Encode-side RSI byte padding is compiled out of the default reference build
(#ifdef ENABLE_RSI_PADDING, encode.c:499-505); the oracle here is a second
reference build with the flag on (.refbuild-pad).  Decode-side realignment
(decode.c:406-409) is in every build.
"""
import numpy as np
import pytest

import gen
import oracle
from libaec_tpu import Config
from libaec_tpu.constants import (
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED,
    AEC_OK,
    AEC_PAD_RSI,
)
from libaec_tpu.decode import decode_buffer_status, decode_buffer_tpu
from libaec_tpu.encode import encode_buffer

pytestmark = pytest.mark.skipif(not oracle.pad_available(),
                                reason="padding-enabled reference build "
                                       "(.refbuild-pad) not present")

CASES = [
    (8, 8, 4, 0),
    (16, 64, 32, AEC_DATA_MSB),
    (16, 16, 7, AEC_DATA_SIGNED),
    (24, 32, 11, AEC_DATA_MSB),
    # ExtendedParameters configuration (tests/sampledata.sh:77:
    # sar32bit with -n32 -j64 -r4096 -p)
    (32, 64, 4096, AEC_DATA_MSB),
]


def _roundtrip_case(bps, bs, rsi, extra, pp, n_samples, kind):
    flags = extra | pp | AEC_PAD_RSI
    cfg = Config(bps, bs, rsi, flags)
    rng = np.random.default_rng(bps * 131 + bs + rsi + pp)
    vals = gen.gen_values(rng, n_samples, bps, cfg.signed, kind)
    raw = gen.pack_samples(vals, bps, flags)
    return cfg, raw


@pytest.mark.parametrize("bps,bs,rsi,extra", CASES)
@pytest.mark.parametrize("pp", [0, AEC_DATA_PREPROCESS])
def test_pad_rsi_encode_matches_padded_reference(bps, bs, rsi, extra, pp):
    n = min(5 * rsi * bs + bs * 3, 3 * rsi * bs + bs)  # a few RSIs + ragged
    cfg, raw = _roundtrip_case(bps, bs, rsi, extra, pp, n, "lowentropy")
    st, ref = oracle.encode(raw, bps, bs, rsi, cfg.flags, padded_build=True)
    assert st == AEC_OK
    ours = encode_buffer(raw, cfg)
    assert ours == ref


@pytest.mark.parametrize("bps,bs,rsi,extra", CASES[:4])
@pytest.mark.parametrize("pp", [0, AEC_DATA_PREPROCESS])
def test_pad_rsi_decode_padded_reference_stream(bps, bs, rsi, extra, pp):
    """Our decoder (native scalar/threaded and device paths) on streams the
    padded reference encoder produced."""
    n = 4 * rsi * bs
    cfg, raw = _roundtrip_case(bps, bs, rsi, extra, pp, n, "midentropy")
    st, comp = oracle.encode(raw, bps, bs, rsi, cfg.flags, padded_build=True)
    assert st == AEC_OK
    st, out = decode_buffer_status(comp, cfg, len(raw))
    assert st == AEC_OK and out == raw
    st, out = decode_buffer_tpu(comp, cfg, len(raw))
    assert st == AEC_OK and out == raw


def test_pad_rsi_reference_decodes_our_stream():
    """Both directions: the (stock) reference decoder consumes our padded
    stream -- decode-side realignment is in every build."""
    cfg, raw = _roundtrip_case(16, 64, 32, AEC_DATA_MSB,
                               AEC_DATA_PREPROCESS, 9 * 64 * 32, "lowentropy")
    ours = encode_buffer(raw, cfg)
    st, dec = oracle.decode(ours, 16, 64, 32, cfg.flags, len(raw))
    assert st == AEC_OK and dec == raw


def test_pad_rsi_extended_parameters_roundtrip():
    """sar32bit-style config end-to-end: encode parity with the padded
    reference plus decode of the reference stream (both paths)."""
    cfg, raw = _roundtrip_case(32, 64, 4096, AEC_DATA_MSB,
                               AEC_DATA_PREPROCESS,
                               2 * 4096 * 64 + 777, "midentropy")
    st, ref = oracle.encode(raw, 32, 64, 4096, cfg.flags, padded_build=True)
    assert st == AEC_OK
    ours = encode_buffer(raw, cfg)
    assert ours == ref
    st, out = decode_buffer_status(ref, cfg, len(raw))
    assert st == AEC_OK and out == raw
