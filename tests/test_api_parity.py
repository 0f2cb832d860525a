"""API-surface parity items (VERDICT r3 #6/#8): the README quick start runs
verbatim, one-shot encode has the reference's output-capacity semantics
(libaec.h:154-166, encode.c:938-963), CLI -b is honoured, streaming encode
compiles a bounded number of programs, and the decode routing override
works."""
import os
import re
from pathlib import Path

import numpy as np
import pytest

import gen
from libaec_tpu import (
    Config,
    decode_buffer,
    decode_buffer_status,
    encode_buffer,
    encode_buffer_status,
)
from libaec_tpu.constants import (
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_FLUSH,
    AEC_NO_FLUSH,
    AEC_OK,
    AEC_STREAM_ERROR,
    AecStreamError,
)

REPO = Path(__file__).resolve().parent.parent


def _bench_cfg():
    return Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)


def test_readme_quick_start_runs_verbatim():
    """Execute the README's python quick-start block exactly as written
    (it previously imported a symbol the package did not export)."""
    text = (REPO / "README.md").read_text()
    m = re.search(r"```python\n(.*?)```", text, re.S)
    assert m, "README has no python quick-start block"
    code = m.group(1)
    rng = np.random.default_rng(0)
    vals = gen.gen_values(rng, 16384 * 2, 16, False, "lowentropy")
    ns = {"raw_bytes": gen.pack_samples(vals, 16, AEC_DATA_MSB)}
    exec(compile(code, "README.md", "exec"), ns)
    assert ns["raw_again"] == ns["raw_bytes"]


def test_encode_buffer_out_size_semantics():
    cfg = Config(8, 8, 2, 0)
    rng = np.random.default_rng(1)
    data = gen.pack_samples(
        gen.gen_values(rng, 64, 8, False, "random"), 8, 0)
    full = encode_buffer(data, cfg)
    # ample capacity: unchanged result
    assert encode_buffer(data, cfg, out_size=len(full)) == full
    # too small: AEC_STREAM_ERROR semantics
    with pytest.raises(AecStreamError):
        encode_buffer(data, cfg, out_size=len(full) - 1)
    st, out = encode_buffer_status(data, cfg, len(full) - 1)
    assert st == AEC_STREAM_ERROR
    # the caller's buffer holds the first out_size bytes, as the reference
    # fills next_out before reporting the incomplete flush
    assert out == full[: len(full) - 1]
    st, out = encode_buffer_status(data, cfg, len(full) + 10)
    assert st == AEC_OK and out == full


def test_streaming_encode_bounded_jit_programs():
    """20 random-sized feeds must compile O(log n) jax programs, not one
    per distinct RSI count (VERDICT r3 weak #7)."""
    import jax  # noqa: F401  (skip cleanly if jax is broken)

    from libaec_tpu.backend import jax_backend
    from libaec_tpu.encode import _JIT_CACHE
    from libaec_tpu.stream import (
        AecStream,
        aec_encode,
        aec_encode_end,
        aec_encode_init,
    )

    cfg = Config(8, 8, 4, AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(7)
    vals = gen.gen_values(rng, cfg.samples_per_rsi * 80, 8, False,
                          "lowentropy")
    data = gen.pack_samples(vals, 8, cfg.flags)
    expect = encode_buffer(data, cfg)

    before = set(_JIT_CACHE)
    s = AecStream(cfg.bits_per_sample, cfg.block_size, cfg.rsi, cfg.flags,
                  backend=jax_backend())
    assert aec_encode_init(s) == AEC_OK
    out = bytearray()
    pos = 0
    rsi_bytes = cfg.rsi_len_bytes
    while pos < len(data):
        take = int(rng.integers(1, 10)) * rsi_bytes  # 1..9 RSIs per feed
        s.next_in = data[pos : pos + take]
        s.avail_in = None
        s.next_out = out
        s.avail_out = None
        pos += take
        assert aec_encode(s, AEC_NO_FLUSH) == AEC_OK
    s.next_in = b""
    s.next_out = out
    aec_encode(s, AEC_FLUSH)
    assert aec_encode_end(s) == AEC_OK
    assert bytes(out) == expect

    new_keys = set(_JIT_CACHE) - before
    # full-RSI pieces are powers of two; only the flush tail may add one
    # extra odd shape
    full_rsi = [k for k in new_keys if k[-1] == cfg.rsi]
    for k in full_rsi:
        n_rsi = k[-2]
        assert n_rsi & (n_rsi - 1) == 0, f"non-power-of-two shape {k}"
    assert len(new_keys) <= 6, new_keys


def test_decode_routing_override(monkeypatch):
    """LIBAEC_TPU_DECODE=device routes decode_buffer_status through the
    device decoder; the result is identical to the CPU path."""
    from libaec_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    cfg = _bench_cfg()
    rng = np.random.default_rng(3)
    vals = gen.gen_values(rng, cfg.samples_per_rsi * 3 + 17, 16, False,
                          "lowentropy")
    data = gen.pack_samples(vals, 16, cfg.flags)
    comp = encode_buffer(data, cfg)

    monkeypatch.setenv("LIBAEC_TPU_DECODE", "cpu")
    st_cpu, out_cpu = decode_buffer_status(comp, cfg, len(data))
    monkeypatch.setenv("LIBAEC_TPU_DECODE", "device")
    st_dev, out_dev = decode_buffer_status(comp, cfg, len(data))
    assert (st_cpu, out_cpu) == (st_dev, out_dev)
    assert st_cpu == AEC_OK and out_cpu == data


def test_decode_buffer_tpu_part_sink():
    """part_sink receives the same bytes the accumulating path returns."""
    from libaec_tpu import native
    from libaec_tpu.decode import decode_buffer_tpu

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    cfg = Config(8, 8, 4, AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(5)
    vals = gen.gen_values(rng, cfg.samples_per_rsi * 11 + 3, 8, False,
                          "zero_runs")
    data = gen.pack_samples(vals, 8, cfg.flags)
    comp = encode_buffer(data, cfg)

    st, out = decode_buffer_tpu(comp, cfg, len(data), chunk_rsis=4)
    parts = []
    st2, empty = decode_buffer_tpu(comp, cfg, len(data), chunk_rsis=4,
                                   part_sink=parts.append)
    assert st == st2 and empty == b""
    assert b"".join(parts) == out == data
