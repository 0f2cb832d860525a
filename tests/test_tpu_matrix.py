"""Hardware kernel-matrix tier: real Mosaic lowerings across the config
matrix, not just the bench shape.

Every case drives the FULL device paths end to end on a real TPU --
encode_buffer through the jax pipeline (fused Pallas encode kernel + VMEM
tree merge where kernel_supported, XLA field path otherwise) and
decode_buffer_tpu (Pallas payload parse + unpredict/swizzle kernels) --
with interpret=False, and asserts bit-identity against the
oracle-validated numpy encoder and native CPU decoder.  This is the tier
the round-3 review asked for: the kernels' own comments record
Mosaic-only failure modes (no maxui, no u32->f32 casts) that interpret
mode cannot catch, so each supported matrix point must have lowered on a
chip at least once.

Signed cases compare device decode against the native core, not the raw
input: the inverse predictor emits sign-extended samples (reference
decode.c:80-85 semantics), so a synthetic input without sign extension
round-trips to its canonical form -- on the reference binary too.

Compiles dominate (~1-2 min per new encode shape through the axon
tunnel); the persistent jax compilation cache amortises repeat runs.
"""
import numpy as np
import pytest

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
)

pytestmark = [
    pytest.mark.skipif(
        __import__("jax").default_backend() != "tpu",
        reason="real Mosaic lowering needs a TPU"),
    pytest.mark.skipif(native.get_lib() is None,
                       reason="native library unavailable"),
    pytest.mark.slow,
]

# (bps, block_size, rsi, flags, n_rsi) -- spanning sample widths 8..32,
# signed/unsigned, MSB/LSB, preprocess on/off, 3-byte layout, block sizes
# 8..64, and the restricted mode whose id_len<=2 must take the XLA
# fallback (encode_pallas.kernel_supported is False there).
MATRIX = [
    (16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS, 8),   # bench shape
    (8, 16, 32, AEC_DATA_PREPROCESS, 8),                    # 8-bit LSB
    (13, 32, 16, AEC_DATA_SIGNED | AEC_DATA_PREPROCESS, 8),  # odd width
    (32, 64, 8, AEC_DATA_MSB | AEC_DATA_PREPROCESS, 8),     # full width
    (16, 8, 64, 0, 8),                                      # no-PP, bs=8
    (24, 64, 16, AEC_DATA_MSB | AEC_DATA_PREPROCESS
     | AEC_DATA_3BYTE, 8),                                  # 3-byte layout
    (2, 8, 16, AEC_RESTRICTED | AEC_DATA_PREPROCESS, 8),    # XLA fallback
    (16, 10, 32, AEC_DATA_MSB | AEC_DATA_PREPROCESS
     | AEC_NOT_ENFORCE, 8),                                 # even bs=10
    (16, 64, 1, AEC_DATA_MSB | AEC_DATA_PREPROCESS, 64),    # rsi=1 edge
    (16, 64, 32, AEC_DATA_MSB | AEC_DATA_PREPROCESS
     | AEC_PAD_RSI, 8),                                     # PAD_RSI
]


def _gen_raw(cfg, n_rsi, seed):
    """Mixed-entropy samples in canonical stored form (signed data is
    sign-extended into its container, as the format stores it)."""
    from tests import gen as _gen  # noqa: F401  (path set by conftest)
    import gen

    rng = np.random.default_rng(seed)
    n = n_rsi * cfg.samples_per_rsi
    vals = gen.gen_values(rng, n, cfg.bits_per_sample, cfg.signed,
                          "midentropy")
    # sprinkle zero runs so the low-entropy options lower too
    nb = n // cfg.block_size
    zmask = rng.random(nb) < 0.3
    vals = np.where(np.repeat(zmask, cfg.block_size), 0, vals)
    return gen.pack_samples(vals, cfg.bits_per_sample, cfg.flags)


@pytest.mark.parametrize("bps,bs,rsi,flags,n_rsi", MATRIX)
def test_device_matrix_point(bps, bs, rsi, flags, n_rsi):
    import jax

    from libaec_tpu.backend import jax_backend
    from libaec_tpu.decode import decode_buffer_tpu
    from libaec_tpu.encode import _jax_chunk_fn, encode_buffer
    from libaec_tpu.kernels import encode_pallas

    cfg = Config(bps, bs, rsi, flags)
    raw = _gen_raw(cfg, n_rsi, seed=bps * 131 + bs + flags)

    # --- encode: device pipeline vs the oracle-validated numpy path ----
    comp_np = encode_buffer(raw, cfg, backend=NUMPY)
    comp_dev = encode_buffer(raw, cfg, backend=jax_backend(),
                             rsis_per_chunk=n_rsi)
    assert comp_dev == comp_np, "device encode differs from numpy oracle"
    if flags & AEC_RESTRICTED:
        # this point exists to prove the XLA fallback: the fused kernel
        # must NOT claim it (id_len <= 1 disables splitting)
        assert not encode_pallas.kernel_supported(cfg, n_rsi)

    # --- decode: device two-phase vs the native serial core -----------
    st_cpu, out_cpu = native.decode(comp_np, len(raw), cfg)
    st_dev, out_dev = decode_buffer_tpu(comp_np, cfg, len(raw))
    assert (st_dev, out_dev) == (st_cpu, out_cpu), \
        "device decode differs from the native core"
    if not cfg.signed:
        assert out_dev == raw  # unsigned canonical input round-trips
