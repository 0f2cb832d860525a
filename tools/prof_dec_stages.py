"""Stage-level timing of the device decode path with a null-dispatch
baseline subtracted (the axon tunnel adds ~40-70 ms per synchronised
dispatch, so raw per-stage numbers are meaningless without it)."""
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
from libaec_tpu.kernels import decode_pallas  # noqa: E402
from libaec_tpu.ops import bitunpack  # noqa: E402
from libaec_tpu.ops.unpredict import (  # noqa: E402
    samples_to_bytes_device,
    unpredict_rsis,
)

CFG = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
S = CFG.samples_per_rsi


def sync(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return np.asarray(x.ravel()[:1])


def timeit(label, f, *args, base=0.0, n=4):
    sync(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        sync(f(*args))
        best = min(best, time.time() - t0)
    print(f"{label}: {1e3*(best - base):7.1f} ms  (raw {1e3*best:.1f})")
    return best - base


def main():
    import jax
    import jax.numpy as jnp

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
    fsw, fsb, lsbr, meta, refs = [jax.device_put(a) for a in (
        (fs_off >> np.uint64(5)).astype(np.uint32),
        (fs_off & np.uint64(31)).astype(np.uint32),
        (recs["lsb_off"] - fs_off).astype(np.uint32),
        recs["meta"], recs["ref_sample"])]
    sync(refs)

    Wf = bitunpack.window_words(CFG)

    null = jax.jit(lambda a: a[:8] + 1)
    base = timeit("null      ", null, meta)

    gather = jax.jit(lambda w, o: w[
        o[:, None] + jnp.arange(Wf, dtype=jnp.uint32)[None, :]])
    win = gather(words, fsw)
    sync(win)
    timeit("gather    ", gather, words, fsw, base=base)

    pal = jax.jit(lambda *a: decode_pallas.decode_payload_pallas(CFG, *a))
    val, fs = pal(win, fsb, lsbr, meta)
    sync(val)
    timeit("pallas    ", pal, win, fsb, lsbr, meta, base=base)

    xla = jax.jit(lambda *a: bitunpack._decode_payload_xla(CFG, *a))
    sync(xla(win, fsb, lsbr, meta))
    timeit("payloadXLA", xla, win, fsb, lsbr, meta, base=base)

    comp_fn = jax.jit(
        lambda v, f, m, r: bitunpack.compose_blocks(CFG, v, f, m, r))
    deltas = comp_fn(val, fs, meta, refs)
    sync(deltas)
    timeit("compose   ", comp_fn, val, fs, meta, refs, base=base)

    unpred = jax.jit(lambda d: unpredict_rsis(CFG, d.reshape(n_rsis, S)))
    samples = unpred(deltas)
    sync(samples)
    timeit("unpredict ", unpred, deltas, base=base)

    swiz = jax.jit(lambda s: samples_to_bytes_device(CFG, s.reshape(-1)))
    sync(swiz(samples))
    timeit("swizzle   ", swiz, samples, base=base)


if __name__ == "__main__":
    main()
