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
from libaec_tpu.decode import scan_record_arrays  # noqa: E402
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
        outs = [f(*args) for _ in range(8)]  # pipelined x8
        sync(outs[-1])
        best = min(best, (time.time() - t0) / 8)
    print(f"{label}: {1e3*(best - base):7.2f} ms  (raw {1e3*best:.2f})")
    return best - base


def main():
    import jax

    rz = REPO.parent / "reference" / "data" / "typical.rz"
    status, typical = native.decode(rz.read_bytes(), 1 << 20, CFG)
    assert status == 0
    raw = typical * 16  # 16 MiB
    comp = encode_buffer(raw, CFG)
    n_rsis = len(raw) // CFG.rsi_len_bytes

    t0 = time.time()
    recs, n_ok, _ = native.scan_blocks(
        comp, n_rsis, bitunpack.max_fs_bits(CFG), CFG,
        wf=bitunpack.window_words(CFG))
    print(f"scan+windows (host): {1e3*(time.time()-t0):.1f} ms")
    assert n_ok == n_rsis

    win, fsb, lsbr, meta, refs = [jax.device_put(a)
                                  for a in scan_record_arrays(recs)]
    sync(refs)

    null = jax.jit(lambda a: a[:8] + 1)
    base = timeit("null      ", null, meta)

    pal = jax.jit(lambda *a: decode_pallas.decode_payload_pallas(CFG, *a))
    deltas = pal(win, fsb, lsbr, meta, refs)
    sync(deltas)
    timeit("pallas    ", pal, win, fsb, lsbr, meta, refs, base=base)

    xla = jax.jit(lambda *a: bitunpack.decode_blocks(CFG, *a))
    sync(xla(win, fsb, lsbr, meta, refs))
    timeit("full XLA  ", xla, win, fsb, lsbr, meta, refs, base=base)

    unpred = jax.jit(lambda d: unpredict_rsis(CFG, d.reshape(n_rsis, S)))
    samples = unpred(deltas)
    sync(samples)
    timeit("unpred XLA", unpred, deltas, base=base)

    from libaec_tpu.kernels import unpredict_pallas

    upp = jax.jit(lambda d: unpredict_pallas.unpredict_rsis_pallas(
        CFG, d.reshape(n_rsis, S)))
    sync(upp(deltas))
    timeit("unpred PL ", upp, deltas, base=base)

    swiz = jax.jit(lambda s: samples_to_bytes_device(CFG, s.reshape(-1)))
    sync(swiz(samples))
    timeit("swizzle   ", swiz, samples, base=base)

    fused = jax.jit(lambda d: unpredict_pallas.unpredict_swizzle_rsis_pallas(
        CFG, d.reshape(n_rsis, S)))
    sync(fused(deltas))
    timeit("unpred+swz", fused, deltas, base=base)

    from libaec_tpu.decode import _jax_decode_fn

    full = _jax_decode_fn(CFG, n_rsis)
    sync(full(win, fsb, lsbr, meta, refs))
    timeit("full fn   ", full, win, fsb, lsbr, meta, refs, base=base)


if __name__ == "__main__":
    main()
