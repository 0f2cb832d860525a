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


def test_sz_param_validation():
    """szlib.h:21-24 limits enforced as the HDF5 filter layer would."""
    bad = [
        szip.SZCom(szip.SZ_MSB_OPTION_MASK, 16, 64, 512),   # ppb > 32
        szip.SZCom(szip.SZ_MSB_OPTION_MASK, 16, 7, 512),    # odd ppb
        szip.SZCom(szip.SZ_MSB_OPTION_MASK, 16, 8, 8 * 200),  # >128 blocks
        szip.SZCom(szip.SZ_MSB_OPTION_MASK, 40, 8, 512),    # bad bpp
    ]
    for param in bad:
        assert szip.sz_check_params(param) == szip.SZ_PARAM_ERROR
        st, out = szip.SZ_BufftoBuffCompress(b"\0" * 64, param)
        assert st == szip.SZ_PARAM_ERROR and out == b""
    good = szip.SZCom(szip.SZ_MSB_OPTION_MASK, 16, 16, 512)
    assert szip.sz_check_params(good) == szip.SZ_OK


def test_sz_status_code_api_roundtrip():
    """C-style entry points return (status, bytes) instead of raising."""
    param = szip.SZCom(szip.SZ_MSB_OPTION_MASK | szip.SZ_NN_OPTION_MASK,
                       16, 16, 256)
    data = np.arange(2048, dtype=">u2").tobytes()
    st, comp = szip.SZ_BufftoBuffCompress(data, param)
    assert st == szip.SZ_OK
    st, out = szip.SZ_BufftoBuffDecompress(comp, param, len(data))
    assert st == szip.SZ_OK and out == data
    # output-buffer-full surfaces as SZ_OUTBUFF_FULL, not an exception
    st, _ = szip.SZ_BufftoBuffCompress(data, param, dest_len=4)
    assert st == szip.SZ_OUTBUFF_FULL


def test_sz_compress_stub():
    """netcdf configure probe (sz_compat.c:275-276)."""
    assert szip.SZ_Compress() == szip.SZ_OK
    assert szip.SZ_encoder_enabled() == 1


def test_sz_decompress_batch_matches_single():
    """Batch decompress (threaded scans + shared device) equals the
    per-buffer path for a mix of shapes, incl. padded scanlines and the
    64-bpp interleave."""
    rng = np.random.default_rng(3)
    cases = [
        (szip.SZCom(szip.SZ_MSB_OPTION_MASK | szip.SZ_NN_OPTION_MASK,
                    16, 16, 250), ">u2", 250 * 7),   # padded scanlines
        (szip.SZCom(szip.SZ_MSB_OPTION_MASK | szip.SZ_NN_OPTION_MASK,
                    16, 16, 250), ">u2", 250 * 3 + 17),
    ]
    for param, dt, n in cases:
        datas, comps = [], []
        for k in range(4):
            d = rng.integers(0, 3000, n + k).astype(dt).tobytes()
            datas.append(d)
            comps.append(szip.sz_buffto_buff_compress(d, param))
        singles = [szip.sz_buffto_buff_decompress(c, param, len(d))
                   for c, d in zip(comps, datas)]
        batch = szip.sz_decompress_batch(comps, param,
                                         [len(d) for d in datas])
        assert batch == singles
        assert all(s == d for s, d in zip(singles, datas))
