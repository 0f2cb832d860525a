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
from libaec_tpu.decode import scan_record_arrays
from libaec_tpu.encode import encode_buffer
from libaec_tpu.ops import bitunpack

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def _records(cfg, comp, n_rsis):
    recs, n_ok, _ = native.scan_blocks(comp, n_rsis,
                                       bitunpack.max_fs_bits(cfg), cfg,
                                       wf=bitunpack.window_words(cfg))
    assert n_ok == n_rsis
    return scan_record_arrays(recs)


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
    out = jax.jit(
        lambda *a: bitunpack.decode_blocks(
            cfg, *a, use_pallas=use_pallas, interpret=interpret)
    )(*arrs)
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


def _unpred_cases():
    from libaec_tpu.constants import AEC_DATA_PREPROCESS

    return [
        (Config(16, 64, 32, AEC_DATA_MSB | AEC_DATA_PREPROCESS), 16),
        (Config(16, 64, 32,
                AEC_DATA_MSB | AEC_DATA_SIGNED | AEC_DATA_PREPROCESS), 16),
        (Config(8, 8, 16, AEC_DATA_PREPROCESS), 24),
        (Config(32, 64, 8, AEC_DATA_MSB | AEC_DATA_PREPROCESS), 8),
    ]


@pytest.mark.parametrize("case", range(4))
def test_unpredict_pallas_matches_xla_interpret(case):
    import jax

    from libaec_tpu.kernels import unpredict_pallas
    from libaec_tpu.ops.unpredict import unpredict_rsis

    cfg, n_rsi = _unpred_cases()[case]
    assert unpredict_pallas.kernel_supported(cfg, n_rsi)
    rng = np.random.default_rng(case)
    deltas = rng.integers(0, 1 << min(cfg.bits_per_sample, 31),
                          (n_rsi, cfg.samples_per_rsi), dtype=np.uint32)
    ref = np.asarray(jax.jit(lambda d: unpredict_rsis(cfg, d))(deltas))
    got = np.asarray(jax.jit(
        lambda d: unpredict_pallas.unpredict_rsis_pallas(
            cfg, d, interpret=True))(deltas))
    assert (got == ref).all()


@pytest.mark.parametrize("case", range(4))
def test_unpredict_swizzle_fused_interpret(case):
    """The fused unpredict+swizzle kernel must emit exactly the stream's
    byte layout (put_* semantics, decode.c:144-189) for the unpredicted
    samples, including the no-preprocess passthrough."""
    import jax

    from libaec_tpu.kernels import unpredict_pallas
    from libaec_tpu.ops.unpredict import (
        samples_to_bytes_device,
        unpredict_rsis,
    )

    cfg, n_rsi = _unpred_cases()[case]
    if not unpredict_pallas.fused_supported(cfg, n_rsi):
        pytest.skip("fused kernel does not cover this config")
    if case == 3:
        cfg = Config(cfg.bits_per_sample, cfg.block_size, cfg.rsi,
                     cfg.flags & ~AEC_DATA_PREPROCESS)  # passthrough path
    rng = np.random.default_rng(100 + case)
    deltas = rng.integers(0, 1 << min(cfg.bits_per_sample, 31),
                          (n_rsi, cfg.samples_per_rsi), dtype=np.uint32)
    samples = jax.jit(lambda d: unpredict_rsis(cfg, d))(deltas)
    ref = np.asarray(jax.jit(
        lambda s: samples_to_bytes_device(cfg, s.reshape(-1)))(samples))
    got = np.asarray(jax.jit(
        lambda d: unpredict_pallas.unpredict_swizzle_rsis_pallas(
            cfg, d, interpret=True))(deltas))
    assert np.array_equal(ref.view(np.uint8).reshape(-1),
                          got.view(np.uint8).reshape(-1))


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="real Mosaic lowering needs a TPU")
def test_unpredict_swizzle_fused_tpu():
    import jax

    from libaec_tpu.kernels import unpredict_pallas
    from libaec_tpu.ops.unpredict import (
        samples_to_bytes_device,
        unpredict_rsis,
    )

    cfg, n_rsi = _unpred_cases()[0]
    rng = np.random.default_rng(11)
    deltas = rng.integers(0, 1 << 16, (n_rsi, cfg.samples_per_rsi),
                          dtype=np.uint32)
    samples = jax.jit(lambda d: unpredict_rsis(cfg, d))(deltas)
    ref = np.asarray(jax.jit(
        lambda s: samples_to_bytes_device(cfg, s.reshape(-1)))(samples))
    got = np.asarray(jax.jit(
        lambda d: unpredict_pallas.unpredict_swizzle_rsis_pallas(
            cfg, d))(deltas))
    assert np.array_equal(ref.view(np.uint8).reshape(-1),
                          got.view(np.uint8).reshape(-1))


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="real Mosaic lowering needs a TPU")
def test_unpredict_pallas_matches_xla_tpu():
    import jax

    from libaec_tpu.kernels import unpredict_pallas
    from libaec_tpu.ops.unpredict import unpredict_rsis

    cfg, n_rsi = _unpred_cases()[0]
    rng = np.random.default_rng(9)
    deltas = rng.integers(0, 1 << 16, (n_rsi, cfg.samples_per_rsi),
                          dtype=np.uint32)
    ref = np.asarray(jax.jit(lambda d: unpredict_rsis(cfg, d))(deltas))
    got = np.asarray(jax.jit(
        lambda d: unpredict_pallas.unpredict_rsis_pallas(cfg, d))(deltas))
    assert (got == ref).all()


def test_one_kernel_decode_matches():
    """The one-kernel decode experiment (kernels/decode_fused_pallas.py,
    opt-in via LIBAEC_TPU_FUSED_DECODE) must stay bit-exact across
    widths/signs and bucketed window widths -- it documents the only
    Mosaic-legal fusion layout found, so its correctness is worth
    pinning even while the two-kernel pipeline outruns it."""
    from libaec_tpu.decode import scan_chunk_bucketed, scan_record_arrays
    from libaec_tpu.kernels import decode_fused_pallas as DF

    for bps, bs, rsi, flags, kind in [
        (16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS, "lowentropy"),
        (8, 16, 64, AEC_DATA_PREPROCESS, "midentropy"),
        (13, 32, 128, AEC_DATA_SIGNED | AEC_DATA_MSB | AEC_DATA_PREPROCESS,
         "lowentropy"),
        (32, 64, 16, AEC_DATA_MSB | AEC_DATA_PREPROCESS, "lowentropy"),
        (16, 64, 256, AEC_DATA_MSB, "midentropy"),
    ]:
        cfg = Config(bps, bs, rsi, flags)
        n_rsi = 128
        if not DF.fused_supported(cfg, n_rsi):
            continue
        rng = np.random.default_rng(bps + rsi)
        vals = gen.gen_values(rng, n_rsi * cfg.samples_per_rsi, bps,
                              cfg.signed, kind)
        raw = gen.pack_samples(vals, bps, flags)
        st, comp = native.encode(bytes(raw), cfg)
        assert st == 0
        recs, cnt, _tail, _wf = scan_chunk_bucketed(comp, n_rsi, cfg)
        assert cnt == n_rsi
        arrs = scan_record_arrays(recs)
        out = DF.decode_unpredict_swizzle_pallas(
            cfg, *map(np.asarray, arrs), n_rsi=n_rsi, interpret=True)
        got = np.asarray(out).ravel().view(np.uint8)[: len(raw)].tobytes()
        assert got == bytes(raw), (bps, bs, rsi, flags, kind)
