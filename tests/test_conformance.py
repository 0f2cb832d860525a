"""CCSDS 121.0-B-2 conformance-flow analogue of the reference's
tests/sampledata.sh:25-80.

The official 121B2TestData corpus is not bundled (the reference fetches it
from cwe.ccsds.org, Makefile.am:6-14), so the goldens are regenerated at
test time by the reference C library over synthetic data with the same
shape as the corpus: AllOptions (n=1..24 with the script's -j16 -r16/-r32
splits, basic+restricted for n<=4), LowEntropyOptions (3 sets x n=1..8,
-j16 -r64, basic+restricted for n<=4), and ExtendedParameters (32-bit
sar-like data, -j16 -r256 -p and -j64 -r4096 -p, PAD_RSI streams from the
padding-enabled reference build).

Assertions are strictly stronger than the script's: byte-exact encode
parity everywhere (the script settles for size equality on n>=5) and
byte-exact decode of the reference streams.
"""
import numpy as np
import pytest

import oracle
from libaec_tpu import Config
from libaec_tpu.constants import AEC_DATA_PREPROCESS, AEC_OK, AEC_PAD_RSI, \
    AEC_RESTRICTED
from libaec_tpu.decode import decode_buffer_status
from libaec_tpu.encode import encode_buffer

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference oracle build missing")


def _corpus_like(rng, bps, n_samples):
    """Mixed-character samples that force every code option: zero runs,
    low-entropy ramps, mid-entropy noise, and uncompressible stretches."""
    parts = []
    left = n_samples
    while left > 0:
        n = min(int(rng.integers(48, 160)), left)
        kind = rng.integers(0, 4)
        hi = (1 << bps) - 1
        if kind == 0:
            parts.append(np.zeros(n, np.uint32))
        elif kind == 1:
            parts.append(rng.integers(0, min(4, hi + 1), n).astype(np.uint32))
        elif kind == 2:
            base = int(rng.integers(0, hi + 1))
            jitter = rng.integers(0, max(hi // 16, 2), n).astype(np.int64)
            parts.append(((base + jitter) & hi).astype(np.uint32))
        else:
            parts.append(rng.integers(0, hi + 1, n).astype(np.uint32))
        left -= n
    return np.concatenate(parts)[:n_samples]


def _pack(vals, bps):
    """Corpus layout: LSB-first byte order (the script passes no -m)."""
    if bps <= 8:
        return vals.astype(np.uint8).tobytes()
    if bps <= 16:
        return vals.astype("<u2").tobytes()
    return vals.astype("<u4").tobytes()


def _roundtrip(bps, block, rsi, restricted=False, pad=False, seed=0):
    flags = AEC_DATA_PREPROCESS
    if restricted:
        flags |= AEC_RESTRICTED
    if pad:
        flags |= AEC_PAD_RSI
    cfg = Config(bps, block, rsi, flags)
    rng = np.random.default_rng(1000 * bps + block + rsi + seed
                                + 7 * restricted)
    n = 5 * rsi * block + block + 3  # a few RSIs plus a ragged tail
    raw = _pack(_corpus_like(rng, bps, n), bps)

    st, golden = oracle.encode(raw, bps, block, rsi, flags,
                               padded_build=pad)
    assert st == AEC_OK
    # encode: byte-exact against the reference stream ("code"/"cmp")
    ours = encode_buffer(raw, cfg)
    assert ours == golden
    # decode: byte-exact recovery of the input ("decode"/"cmp -n")
    st, dec = decode_buffer_status(golden, cfg, len(raw))
    assert st == AEC_OK
    assert dec[: len(raw)] == raw


# --- All Options: -n1..24, -j16, -r16 (n<=16) / -r32 (n>=17) --------------
@pytest.mark.parametrize("n", range(1, 5))
def test_alloptions_basic_and_restricted(n):
    _roundtrip(n, 16, 16)
    _roundtrip(n, 16, 16, restricted=True)


@pytest.mark.parametrize("n", range(5, 17))
def test_alloptions_mid(n):
    _roundtrip(n, 16, 16)


@pytest.mark.parametrize("n", range(17, 25))
def test_alloptions_wide(n):
    _roundtrip(n, 16, 32)


# --- Low Entropy Options: 3 sets x n=1..8, -j16 -r64 ----------------------
@pytest.mark.parametrize("lowset", [1, 2, 3])
@pytest.mark.parametrize("n", range(1, 9))
def test_lowentropy(lowset, n):
    flags = AEC_DATA_PREPROCESS
    cfg = Config(n, 16, 64, flags)
    rng = np.random.default_rng(31 * lowset + n)
    hi = (1 << n) - 1
    # mostly-zero data with occasional small excursions, per set character
    vals = np.zeros(3 * 64 * 16 + 21, np.uint32)
    step = (4, 9, 17)[lowset - 1]
    vals[::step] = rng.integers(0, hi + 1, len(vals[::step]))
    raw = _pack(vals, n)
    st, golden = oracle.encode(raw, n, 16, 64, flags)
    assert st == AEC_OK
    assert encode_buffer(raw, cfg) == golden
    st, dec = decode_buffer_status(golden, cfg, len(raw))
    assert st == AEC_OK and dec[: len(raw)] == raw
    if n <= 4:
        _roundtrip(n, 16, 64, restricted=True, seed=lowset)


# --- Extended Parameters: 32-bit sar-like, PAD_RSI streams ---------------
@pytest.mark.skipif(not oracle.pad_available(),
                    reason="padding-enabled reference build missing")
@pytest.mark.parametrize("block,rsi", [(16, 256), (64, 4096)])
def test_extended_parameters_sar32bit(block, rsi):
    _roundtrip(32, block, rsi, pad=True, seed=block)
