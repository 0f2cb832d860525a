"""The fused Pallas encode kernel must reproduce the XLA/numpy pipeline
bit-exactly (which is itself oracle-validated against the reference C
library).  Runs the kernel in interpret mode so it works on any backend."""
import numpy as np
import pytest

from libaec_tpu import Config
from libaec_tpu.backend import NUMPY
from libaec_tpu.constants import (
    AEC_DATA_MSB,
    AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED,
    AEC_RESTRICTED,
)
from libaec_tpu.encode import pipeline_fields, worst_case_bits_per_block
from libaec_tpu.kernels import encode_pallas
from libaec_tpu.ops import bitpack

FLAG_SETS = [
    0,
    AEC_DATA_PREPROCESS,
    AEC_DATA_SIGNED | AEC_DATA_PREPROCESS,
]


def gen_data(rng, cfg, n_rsi, kind):
    S = cfg.samples_per_rsi
    bps = cfg.bits_per_sample
    hi = (1 << bps) - 1
    if kind == "random":
        x = rng.integers(0, hi + 1, size=(n_rsi, S), dtype=np.uint64)
    elif kind == "low":
        base = rng.integers(0, max(1, hi // 4), size=(n_rsi, 1),
                            dtype=np.uint64)
        x = base + rng.integers(0, 4, size=(n_rsi, S), dtype=np.uint64)
        x = np.minimum(x, hi)
    elif kind == "zeros":
        x = np.zeros((n_rsi, S), np.uint64)
        x[:, -cfg.block_size:] = rng.integers(0, hi + 1, cfg.block_size)
    elif kind == "jump":
        x = np.zeros((n_rsi, S), np.uint64)
        x[:, S // 2:] = hi
    else:  # mixed runs
        x = np.zeros((n_rsi, S), np.uint64)
        nb = cfg.rsi
        zmask = rng.random((n_rsi, nb)) < 0.7
        full = rng.integers(0, hi + 1, size=(n_rsi, S), dtype=np.uint64)
        x = np.where(np.repeat(zmask, cfg.block_size, axis=1), 0, full)
    return x.astype(np.uint32)


def run_both(cfg, x, k_init=0):
    n_rsi = x.shape[0]
    NB = n_rsi * cfg.rsi
    worst = worst_case_bits_per_block(cfg)
    local_words = (worst + 31) // 32 + 1
    group = 64
    gw1 = group * (local_words + 1) + 1
    nwords = (NB * worst + 8) // 32 + gw1 + 2

    # numpy reference path
    w, v, kf_np = pipeline_fields(NUMPY, cfg, x, cfg.rsi, k_init)
    words_np, tb_np = bitpack.pack_fields_grouped(
        NUMPY, w.reshape(NB, -1), v.reshape(NB, -1), 0, local_words,
        nwords, group)

    # pallas kernel (interpret mode)
    import jax.numpy as jnp

    win, bbits, kf = encode_pallas.encode_chunk_fields_pallas(
        cfg, jnp.asarray(x), k_init, interpret=True)
    from libaec_tpu.backend import jax_backend

    words_k, tb_k = bitpack.merge_block_windows(
        jax_backend(), win, bbits, 0, local_words, nwords, group)

    # production TPU merge path (Pallas tree merge, group=256, as wired in
    # encode._jax_chunk_fn) must agree bit-for-bit as well
    from libaec_tpu.kernels.merge_pallas import group_window_words

    pgroup = 256
    pnwords = ((NB * worst + 8) // 32
               + group_window_words(local_words, pgroup) + 3)
    words_p, tb_p = bitpack.merge_block_windows_pallas(
        jax_backend(), win, bbits, 0, local_words, pnwords, pgroup,
        interpret=True)
    nbw = (int(tb_k) + 31) // 32 + 1
    assert int(tb_p) == int(tb_k)
    assert np.array_equal(np.asarray(words_p)[:nbw],
                          np.asarray(words_k)[:nbw])
    return (np.asarray(words_np), int(tb_np), int(kf_np),
            np.asarray(words_k), int(tb_k), int(kf))


@pytest.mark.parametrize("bps", [4, 8, 13, 16, 24, 32])
@pytest.mark.parametrize("flags", FLAG_SETS)
def test_kernel_matrix(bps, flags):
    rng = np.random.default_rng(bps * 977 + flags)
    for kind in ["random", "low", "zeros", "jump", "mixed"]:
        bs = int(rng.choice([8, 16, 32, 64]))
        rsi = int(rng.choice([16, 32, 64, 128]))
        cfg = Config(bps, bs, rsi, flags)
        if not encode_pallas.kernel_supported(cfg, 1):
            continue
        R = encode_pallas._pick_tile_rsis(cfg, 8)
        n_rsi = 8 if R else 8
        if not encode_pallas.kernel_supported(cfg, n_rsi):
            continue
        x = gen_data(rng, cfg, n_rsi, kind)
        wn, tn, kn, wk, tk, kk = run_both(cfg, x, k_init=int(rng.integers(
            0, max(1, cfg.kmax))))
        assert tn == tk, (kind, cfg)
        assert kn == kk, (kind, cfg)
        nb_words = (tn + 31) // 32 + 1
        assert np.array_equal(wn[:nb_words], wk[:nb_words]), (kind, cfg)


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="real Mosaic lowering needs a TPU")
def test_kernel_and_merge_real_mosaic():
    """Run the fused encode kernel AND the production Pallas tree merge
    (group=256, as wired in encode._jax_chunk_fn) with interpret=False,
    asserting bit-identity with the oracle-validated numpy pipeline."""
    import jax.numpy as jnp

    from libaec_tpu.backend import jax_backend
    from libaec_tpu.kernels.merge_pallas import group_window_words

    cfg = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    rng = np.random.default_rng(42)
    x = gen_data(rng, cfg, 8, "mixed")
    NB = x.shape[0] * cfg.rsi
    worst = worst_case_bits_per_block(cfg)
    local_words = (worst + 31) // 32 + 1

    w, v, kf_np = pipeline_fields(NUMPY, cfg, x, cfg.rsi, 0)
    group = 64
    gw1 = group * (local_words + 1) + 1
    nwords = (NB * worst + 8) // 32 + gw1 + 2
    words_np, tb_np = bitpack.pack_fields_grouped(
        NUMPY, w.reshape(NB, -1), v.reshape(NB, -1), 0, local_words,
        nwords, group)

    win, bbits, kf = encode_pallas.encode_chunk_fields_pallas(
        cfg, jnp.asarray(x), 0, interpret=False)
    pgroup = 256
    pnwords = ((NB * worst + 8) // 32
               + group_window_words(local_words, pgroup) + 3)
    words_p, tb_p = bitpack.merge_block_windows_pallas(
        jax_backend(), win, bbits, 0, local_words, pnwords, pgroup,
        interpret=False)
    assert int(kf) == int(kf_np)
    assert int(tb_p) == int(tb_np)
    nbw = (int(tb_np) + 31) // 32 + 1
    assert np.array_equal(np.asarray(words_p)[:nbw], words_np[:nbw])


def test_kernel_long_zero_and_ros():
    cfg = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    S = cfg.samples_per_rsi
    x = np.zeros((4, S), np.uint32)
    # RSI 0: all zero (ROS markers); RSI 1: 63-block run then data;
    # RSI 2: alternating zero/nonzero blocks; RSI 3: random
    x[1, 63 * 64:] = 7
    x[2] = np.where((np.arange(S) // 64) % 2 == 0, 0, 1000)
    rng = np.random.default_rng(0)
    x[3] = rng.integers(0, 1 << 16, S)
    wn, tn, kn, wk, tk, kk = run_both(cfg, x)
    assert tn == tk and kn == kk
    nb_words = (tn + 31) // 32 + 1
    assert np.array_equal(wn[:nb_words], wk[:nb_words])
