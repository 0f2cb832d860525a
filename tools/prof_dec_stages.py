"""Stage-level timing of the device decode path: bitunpack vs unpredict vs
byte swizzle, each jitted separately."""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from libaec_tpu import Config, native  # noqa: E402
from libaec_tpu.constants import AEC_DATA_MSB, AEC_DATA_PREPROCESS  # noqa: E402
from libaec_tpu.decode import stream_words_np  # noqa: E402
from libaec_tpu.encode import encode_buffer  # noqa: E402
from libaec_tpu.ops import bitunpack  # noqa: E402
from libaec_tpu.ops.unpredict import (  # noqa: E402
    samples_to_bytes_device,
    unpredict_rsis,
)

CFG = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
S = CFG.samples_per_rsi


def sync(x):
    return np.asarray(x.ravel()[:1])


def timeit(label, f, *args, n=4):
    sync(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        sync(f(*args))
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3:.1f} ms")
    return best


def main():
    import jax

    rz = REPO.parent / "reference" / "data" / "typical.rz"
    status, typical = native.decode(rz.read_bytes(), 1 << 20, CFG)
    assert status == 0
    raw = typical * 16  # 16 MiB
    comp = encode_buffer(raw, CFG)
    n_rsis = len(raw) // CFG.rsi_len_bytes
    recs, n_ok, tail_bit = native.scan_blocks(
        comp, n_rsis, bitunpack.max_fs_bits(CFG), CFG)
    assert n_ok == n_rsis

    words = jax.device_put(stream_words_np(comp, CFG))
    fs_off = recs["fs_off"]
    dev = [jax.device_put(a) for a in (
        (fs_off >> np.uint64(5)).astype(np.uint32),
        (fs_off & np.uint64(31)).astype(np.uint32),
        (recs["lsb_off"] - fs_off).astype(np.uint32),
        recs["meta"], recs["ref_sample"])]
    sync(dev[-1])

    unpack = jax.jit(lambda *a: bitunpack.decode_blocks(CFG, *a))
    deltas = unpack(words, *dev)
    sync(deltas)

    unpred = jax.jit(
        lambda d: unpredict_rsis(CFG, d.reshape(n_rsis, S)))
    samples = unpred(deltas)
    sync(samples)

    swiz = jax.jit(lambda s: samples_to_bytes_device(CFG, s.reshape(-1)))

    mib = len(raw) / (1 << 20)
    t1 = timeit("bitunpack ", unpack, words, *dev)
    t2 = timeit("unpredict ", unpred, deltas)
    t3 = timeit("swizzle   ", swiz, samples)
    print(f"total {1e3*(t1+t2+t3):.1f} ms -> {mib/(t1+t2+t3):.0f} MiB/s "
          f"({mib:.0f} MiB raw)")


if __name__ == "__main__":
    main()
