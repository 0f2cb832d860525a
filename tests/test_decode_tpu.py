"""Two-phase decode with the device payload phase (decode_buffer_tpu):
native delta scan + jax inverse-predictor scan must reproduce the scalar
decoder bit-for-bit on reference-encoded streams."""
import numpy as np
import pytest

import gen
from libaec_tpu import Config
from libaec_tpu import native
from libaec_tpu.constants import (
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED,
    AEC_OK,
)
from libaec_tpu.decode import (
    decode_buffer_status,
    decode_buffer_tpu,
    decode_buffers_tpu,
)
from libaec_tpu.encode import encode_buffer

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def _make_raw(rng, cfg, n_samples, kind="lowentropy"):
    vals = gen.gen_values(rng, n_samples, cfg.bits_per_sample,
                          cfg.signed, kind)
    return gen.pack_samples(vals, cfg.bits_per_sample, cfg.flags)


CASES = [
    (8, 16, 8, 0),
    (16, 64, 32, AEC_DATA_MSB),
    (16, 64, 32, AEC_DATA_MSB | AEC_DATA_SIGNED),
    (32, 16, 7, AEC_DATA_MSB),
    (13, 32, 16, AEC_DATA_SIGNED),
]


@pytest.mark.parametrize("bps,bs,rsi,extra", CASES)
@pytest.mark.parametrize("pp", [0, AEC_DATA_PREPROCESS])
def test_tpu_payload_matches_scalar(bps, bs, rsi, extra, pp):
    cfg = Config(bps, bs, rsi, extra | pp)
    rng = np.random.default_rng(bps * 1000 + bs + rsi + pp)
    raw = _make_raw(rng, cfg, rsi * bs * 9 + bs * 3)
    comp = encode_buffer(raw, cfg)
    st_ref, out_ref = decode_buffer_status(comp, cfg, len(raw))
    st_tpu, out_tpu = decode_buffer_tpu(comp, cfg, len(raw))
    assert st_tpu == st_ref == AEC_OK
    assert out_tpu == out_ref


def test_tpu_payload_truncated_stream():
    cfg = Config(16, 64, 32, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(7)
    raw = _make_raw(rng, cfg, 64 * 32 * 4)
    comp = encode_buffer(raw, cfg)
    cut = comp[: len(comp) // 2]
    st_ref, out_ref = decode_buffer_status(cut, cfg, len(raw))
    st_tpu, out_tpu = decode_buffer_tpu(cut, cfg, len(raw))
    assert st_tpu == st_ref
    assert out_tpu == out_ref


def test_tpu_payload_mem_error_parity():
    """out_size not a multiple of bytes_per_sample: MEM_ERROR plus the same
    partial (whole-RSI) output as the scalar path (decode.c:821-825)."""
    cfg = Config(16, 64, 32, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(11)
    raw = _make_raw(rng, cfg, 64 * 32 * 4)
    comp = encode_buffer(raw, cfg)
    out_size = len(raw) - 3  # mid-sample capacity
    st_ref, out_ref = decode_buffer_status(comp, cfg, out_size)
    st_tpu, out_tpu = decode_buffer_tpu(comp, cfg, out_size)
    assert st_tpu == st_ref
    assert out_tpu == out_ref


def test_tpu_chunked_scan_resume():
    """decode_buffer_tpu scans in resumable slices (native scan start_bit)
    overlapped with device dispatch; tiny chunk_rsis forces many slices,
    power-of-two shape bucketing and a cross-slice truncated tail."""
    cfg = Config(16, 64, 16, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(23)
    raw = _make_raw(rng, cfg, cfg.samples_per_rsi * 13)
    comp = encode_buffer(raw, cfg)
    st_ref, out_ref = decode_buffer_status(comp, cfg, len(raw))
    for chunk_rsis in (1, 3, 4):
        st, out = decode_buffer_tpu(comp, cfg, len(raw),
                                    chunk_rsis=chunk_rsis)
        assert (st, out) == (st_ref, out_ref), chunk_rsis
    # truncation lands mid-slice: the serial tail resumes at the last
    # complete RSI boundary of the final scan slice
    cut = comp[: 2 * len(comp) // 3]
    st_ref, out_ref = decode_buffer_status(cut, cfg, len(raw))
    st, out = decode_buffer_tpu(cut, cfg, len(raw), chunk_rsis=3)
    assert (st, out) == (st_ref, out_ref)


def test_tpu_multi_stream_batch():
    """decode_buffers_tpu (threaded scans + shared device) must match the
    single-stream path per stream, including a truncated and a tiny one."""
    cfg = Config(16, 64, 16, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(31)
    raws, comps = [], []
    for k, n_rsi in enumerate([5, 1, 9, 3]):
        raw = _make_raw(rng, cfg, cfg.samples_per_rsi * n_rsi + k * 64)
        raws.append(raw)
        comps.append(encode_buffer(raw, cfg))
    comps.append(comps[2][: len(comps[2]) // 2])  # truncated stream
    raws.append(raws[2])
    out_sizes = [len(r) for r in raws]
    got = decode_buffers_tpu(comps, cfg, out_sizes, scan_threads=2,
                             chunk_rsis=2)
    for i, (comp, raw) in enumerate(zip(comps, raws)):
        expect = decode_buffer_tpu(comp, cfg, len(raw))
        assert got[i] == expect, f"stream {i}"


def test_tpu_payload_zero_runs():
    cfg = Config(16, 64, 64, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    n = 64 * 64 * 4
    samples = np.zeros(n, dtype=">u2")
    samples[::777] = 9
    raw = samples.tobytes()
    comp = encode_buffer(raw, cfg)
    st_ref, out_ref = decode_buffer_status(comp, cfg, len(raw))
    st_tpu, out_tpu = decode_buffer_tpu(comp, cfg, len(raw))
    assert st_tpu == st_ref == AEC_OK
    assert out_tpu == out_ref


def test_bucketed_windows_cover_all_entropies():
    """Per-chunk window bucketing (decode.scan_chunk_bucketed): for every
    entropy regime -- including near-incompressible data whose uncomp
    blocks force the worst-case window -- the bucketed windows must decode
    bit-identically to the scalar core via the XLA payload parse."""
    from libaec_tpu.decode import (_jax_decode_fn, scan_chunk_bucketed,
                                   scan_record_arrays)
    from libaec_tpu.ops import bitunpack

    flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS
    cfg = Config(16, 64, 32, flags)
    rng = np.random.default_rng(9)
    wf_max = bitunpack.window_words(cfg)
    seen = set()
    for kind in ("zeros", "lowentropy", "midentropy", "random"):
        vals = (rng.integers(0, 1 << 16, 8 * cfg.samples_per_rsi,
                             dtype=np.uint32)
                if kind == "random" else
                np.zeros(8 * cfg.samples_per_rsi, np.uint32)
                if kind == "zeros" else
                gen.gen_values(rng, 8 * cfg.samples_per_rsi, 16, False,
                               kind))
        raw = gen.pack_samples(vals, 16, flags)
        comp = encode_buffer(bytes(raw), cfg)
        res = scan_chunk_bucketed(comp, 8, cfg)
        assert res is not None
        recs, cnt, tail, wf_b = res
        assert cnt == 8
        assert wf_b <= wf_max
        seen.add(wf_b)
        fn = _jax_decode_fn(cfg, 8)
        out = np.asarray(fn(*scan_record_arrays(recs))).ravel() \
            .view(np.uint8).tobytes()
        assert out[: len(raw)] == bytes(raw), (kind, wf_b)
    # the regimes must actually exercise different buckets (narrow for
    # low entropy, the worst-case window for random/uncomp data)
    assert len(seen) >= 2, seen
    assert max(seen) == wf_max  # random data hits the uncomp window
