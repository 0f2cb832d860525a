"""Native scalar encoder (native/encoder.cpp) vs the oracle-validated
numpy pipeline: bit-exact across the flag/width matrix, capacity
semantics, and the default small-buffer routing."""
import numpy as np
import pytest

import gen
from libaec_tpu import Config, native
from libaec_tpu.backend import NUMPY
from libaec_tpu.constants import (
    AEC_DATA_3BYTE,
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED,
    AEC_NOT_ENFORCE,
    AEC_PAD_RSI,
    AEC_RESTRICTED,
    AEC_STREAM_ERROR,
)
from libaec_tpu.encode import encode_buffer

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")

CASES = [
    (16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS),
    (8, 16, 32, AEC_DATA_PREPROCESS),
    (8, 8, 2, 0),
    (13, 32, 16, AEC_DATA_SIGNED | AEC_DATA_PREPROCESS),
    (32, 64, 8, AEC_DATA_MSB | AEC_DATA_PREPROCESS),
    (24, 64, 16, AEC_DATA_MSB | AEC_DATA_PREPROCESS | AEC_DATA_3BYTE),
    (2, 8, 16, AEC_RESTRICTED | AEC_DATA_PREPROCESS),
    (4, 16, 8, AEC_RESTRICTED | AEC_DATA_PREPROCESS),
    (1, 8, 4, AEC_DATA_SIGNED | AEC_DATA_PREPROCESS),
    (16, 64, 32, AEC_DATA_MSB | AEC_DATA_PREPROCESS | AEC_PAD_RSI),
    (16, 10, 32, AEC_DATA_MSB | AEC_DATA_PREPROCESS | AEC_NOT_ENFORCE),
]


def _data(cfg, kind, n, rng):
    if kind == "zeros":
        vals = np.zeros(n, np.uint32)
        vals[::701] = 5
    elif kind == "jump":
        vals = np.zeros(n, np.uint32)
        vals[n // 2:] = (1 << cfg.bits_per_sample) - 1
    else:
        vals = gen.gen_values(rng, n, cfg.bits_per_sample, cfg.signed, kind)
    return gen.pack_samples(vals, cfg.bits_per_sample, cfg.flags)


@pytest.mark.parametrize("bps,bs,rsi,flags", CASES)
def test_native_matches_numpy_oracle(bps, bs, rsi, flags):
    cfg = Config(bps, bs, rsi, flags)
    rng = np.random.default_rng(bps * 37 + bs + flags)
    for kind in ("midentropy", "lowentropy", "zeros", "jump"):
        for n_rsi_f in (3.0, 1.37):  # whole and partial trailing RSI
            n = int(n_rsi_f * cfg.samples_per_rsi)
            raw = _data(cfg, kind, n, rng)
            want = encode_buffer(raw, cfg, backend=NUMPY)
            st, got = native.encode(raw, cfg)
            assert st == 0 and got == want, (kind, n_rsi_f)


def test_native_empty_and_capacity():
    cfg = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    st, got = native.encode(b"", cfg)
    assert st == 0 and got == encode_buffer(b"", cfg, backend=NUMPY)

    rng = np.random.default_rng(0)
    raw = _data(cfg, "midentropy", 2 * cfg.samples_per_rsi, rng)
    full = encode_buffer(raw, cfg, backend=NUMPY)
    st, got = native.encode(raw, cfg, out_cap=len(full) // 2)
    assert st == AEC_STREAM_ERROR and got == full[: len(full) // 2]
    st, got = native.encode(raw, cfg, out_cap=len(full))
    assert st == 0 and got == full


def test_default_route_uses_native_small(monkeypatch):
    """encode_buffer with backend=None routes small buffers through the
    native encoder; the result must equal the numpy oracle regardless."""
    cfg = Config(16, 64, 64, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(4)
    raw = _data(cfg, "midentropy", 3 * cfg.samples_per_rsi + 100, rng)
    want = encode_buffer(raw, cfg, backend=NUMPY)
    monkeypatch.setenv("LIBAEC_TPU_ENCODE", "native")
    assert encode_buffer(raw, cfg) == want
    monkeypatch.setenv("LIBAEC_TPU_ENCODE", "auto")
    assert encode_buffer(raw, cfg) == want


@pytest.mark.parametrize("bps,bs,rsi,flags", CASES)
def test_parallel_encode_bit_identical(bps, bs, rsi, flags):
    """aectpu_encode_parallel (serial decision pass + worker emit +
    parallel stitch) must be bit-identical to the serial encoder for any
    thread count, including partial trailing RSIs."""
    cfg = Config(bps, bs, rsi, flags)
    rng = np.random.default_rng(bps * 7 + rsi)
    for kind in ("lowentropy", "midentropy", "zeros"):
        n = 11 * cfg.samples_per_rsi + 37  # partial tail RSI
        data = _data(cfg, kind, n, rng)
        st1, serial = native.encode(bytes(data), cfg, threads=1)
        for threads in (2, 5):
            st2, par = native.encode(bytes(data), cfg, threads=threads)
            assert st2 == st1
            assert par == serial, (bps, bs, rsi, flags, kind, threads)


def test_parallel_encode_capacity():
    """Capacity semantics match the serial path: full size reported with
    AEC_STREAM_ERROR, first out_cap bytes delivered."""
    cfg = Config(16, 64, 64, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(3)
    data = _data(cfg, "midentropy", 9 * cfg.samples_per_rsi, rng)
    st, full = native.encode(bytes(data), cfg, threads=1)
    assert st == 0
    st2, cut = native.encode(bytes(data), cfg, out_cap=1000, threads=4)
    assert st2 == AEC_STREAM_ERROR
    assert cut == full[:1000]


@pytest.mark.parametrize("bps,flags", [
    (12, AEC_DATA_MSB | AEC_DATA_PREPROCESS),
    (5, AEC_DATA_PREPROCESS),
    (12, AEC_DATA_MSB | AEC_DATA_SIGNED | AEC_DATA_PREPROCESS),
    (20, AEC_DATA_MSB | AEC_DATA_PREPROCESS),
])
def test_out_of_range_samples_masked_at_ingest(bps, flags):
    """Storage bytes carrying bits above bits_per_sample are MASKED at
    ingest by every backend (Config.mask): the encode of dirty input is
    the encode of the masked input, which the reference encodes
    identically.  (The reference itself never masks and then byte-ADDS
    the excess bits into neighbouring output fields, encode.c:61-83 --
    corrupting its own bitstream; replicating that is neither possible
    deterministically at word granularity nor desirable.)"""
    import oracle

    if not oracle.available():
        pytest.skip("reference build unavailable")
    from libaec_tpu.encode import encode_buffer

    cfg = Config(bps, 32, 8, flags)
    rng = np.random.default_rng(bps)
    n = 5 * cfg.samples_per_rsi + 17
    storage_bits = 8 * cfg.bytes_per_sample
    vals = rng.integers(0, 1 << storage_bits, n, dtype=np.uint64) \
        .astype(np.uint32)
    dirty = gen.pack_samples(vals, storage_bits, flags)
    clean = gen.pack_samples(vals & np.uint32(cfg.mask), storage_bits,
                             flags)
    st_ref, ref = oracle.encode(clean, bps, 32, 8, flags)
    assert st_ref == 0
    for enc in (
        lambda d: native.encode(bytes(d), cfg, threads=1)[1],
        lambda d: native.encode(bytes(d), cfg, threads=3)[1],
        lambda d: encode_buffer(bytes(d), cfg),
    ):
        assert enc(dirty) == ref
        assert enc(clean) == ref
