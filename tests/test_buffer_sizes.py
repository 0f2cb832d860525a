"""Port of check_buffer_sizes (/root/reference/tests/check_buffer_sizes.c):
short final RSIs are padded by repeating the last sample; decode with exact
avail_out reproduces the original byte count."""
import numpy as np
import pytest

from libaec_tpu import Config, encode_buffer
from libaec_tpu.decode import decode_buffer_status
from libaec_tpu.constants import AEC_DATA_PREPROCESS


@pytest.mark.parametrize("bs", [8, 16, 32, 64])
def test_short_rsi_padding(bs):
    rng = np.random.default_rng(bs)
    cfg = Config(32, bs, 2, AEC_DATA_PREPROCESS)
    full = 4 * cfg.samples_per_rsi * 4
    # input not a multiple of the RSI size (reference: buf_len - 2*bs + 4)
    ibuf_len = full - 2 * bs * 4 + 4 * 1
    vals = rng.integers(0, 2**20, ibuf_len // 4).astype("<u4")
    data = vals.tobytes()
    enc = encode_buffer(data, cfg)
    st, dec = decode_buffer_status(enc, cfg, len(data))
    assert st == 0
    assert len(dec) == len(data)
    assert dec == data


def test_long_fs():
    """check_long_fs analogue: half-block jump to 65000 -> very long FS."""
    cfg = Config(16, 64, 1, AEC_DATA_PREPROCESS)
    vals = np.zeros(64 * 4, np.uint32)
    vals[32:] = 65000
    vals[96:] = 0
    data = vals.astype("<u2").tobytes()
    enc = encode_buffer(data, cfg)
    st, dec = decode_buffer_status(enc, cfg, len(data))
    assert st == 0
    assert dec == data
