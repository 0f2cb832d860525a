"""SZIP compatibility layer vs the reference szlib (check_szcomp analogue,
including the 64-bpp byte-plane interleave path)."""
import numpy as np
import pytest

from libaec_tpu import szip


@pytest.mark.oracle
@pytest.mark.parametrize("bpp", [8, 16, 32, 64])
def test_sz_compress_matches_reference(oracle_mod, bpp):
    rng = np.random.default_rng(bpp)
    mask = (szip.SZ_RAW_OPTION_MASK | szip.SZ_MSB_OPTION_MASK
            | szip.SZ_NN_OPTION_MASK)
    param = szip.SZCom(mask, bpp, 8, 1024)
    n = 4096 * (bpp // 8)
    data = (rng.integers(0, 50, n).astype(np.uint8)
            + np.arange(n, dtype=np.uint8) // 64).tobytes()
    st, ref = oracle_mod.sz_compress(data, mask, bpp, 8, 1024)
    assert st == 0
    mine = szip.sz_buffto_buff_compress(data, param)
    assert mine == ref


@pytest.mark.oracle
@pytest.mark.parametrize("bpp", [8, 16, 32, 64])
def test_sz_roundtrip(oracle_mod, bpp):
    rng = np.random.default_rng(bpp + 1)
    mask = szip.SZ_MSB_OPTION_MASK | szip.SZ_NN_OPTION_MASK
    param = szip.SZCom(mask, bpp, 8, 1000)  # scanline not multiple of block
    n = 4000 * (bpp // 8)
    data = rng.integers(0, 30, n).astype(np.uint8).tobytes()
    comp = szip.sz_buffto_buff_compress(data, param)
    st, ref = oracle_mod.sz_compress(data, mask, bpp, 8, 1000)
    assert st == 0 and comp == ref
    out = szip.sz_buffto_buff_decompress(comp, param, len(data))
    assert out == data
    st, refdec = oracle_mod.sz_decompress(comp, mask, bpp, 8, 1000, len(data))
    assert st == 0
    assert out == refdec


def test_sz_encoder_enabled():
    assert szip.sz_encoder_enabled() == 1
