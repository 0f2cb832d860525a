"""Profile the device decode path (scan + bitunpack + unpredict) on the
bench workload: per-stage wall times and device-side throughput."""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from libaec_tpu import Config, native  # noqa: E402
from libaec_tpu.constants import AEC_DATA_MSB, AEC_DATA_PREPROCESS  # noqa: E402
from libaec_tpu.decode import _jax_decode_fn, scan_record_arrays  # noqa: E402
from libaec_tpu.encode import encode_buffer  # noqa: E402
from libaec_tpu.ops import bitunpack  # noqa: E402

CFG = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
S = CFG.samples_per_rsi


def main():
    import jax

    import os

    rz = REPO.parent / "reference" / "data" / "typical.rz"
    status, typical = native.decode(rz.read_bytes(), 1 << 20, CFG)
    assert status == 0
    reps = int(os.environ.get("LIBAEC_PROF_MB", "16"))
    raw = typical * reps
    t0 = time.time()
    comp = encode_buffer(raw, CFG)
    print(f"encode host: {time.time()-t0:.2f}s, comp {len(comp)>>20} MiB")

    n_rsis_total = len(raw) // CFG.rsi_len_bytes
    # scan (now also materialises the per-block payload windows)
    t0 = time.time()
    recs, n_rsis, tail_bit = native.scan_blocks(
        comp, n_rsis_total, bitunpack.max_fs_bits(CFG), CFG,
        wf=bitunpack.window_words(CFG))
    t_scan = time.time() - t0
    print(f"scan: {t_scan*1e3:.1f} ms -> {n_rsis} RSIs "
          f"({len(comp)/(1<<20)/t_scan:.0f} MiB/s comp, "
          f"{len(raw)/(1<<20)/t_scan:.0f} MiB/s raw)")

    dev_arrs = [jax.device_put(a) for a in scan_record_arrays(recs)]
    for a in dev_arrs:
        a.block_until_ready()

    fn = _jax_decode_fn(CFG, n_rsis)
    t0 = time.time()
    outb = fn(*dev_arrs)
    outb.block_until_ready()
    print(f"compile+run: {time.time()-t0:.2f}s")

    # timed: device-only, repeated.  NOTE: on the axon tunnel
    # block_until_ready does NOT synchronise; force a 1-element fetch.
    def sync(x):
        return np.asarray(x.ravel()[:1])

    mib = len(raw) / (1 << 20)
    best = float("inf")
    for _ in range(6):
        t0 = time.time()
        sync(fn(*dev_arrs))
        best = min(best, time.time() - t0)
    print(f"device decode (sync each): {best*1e3:.1f} ms/chunk -> "
          f"{mib/best:.0f} MiB/s")
    # pipelined: issue N, sync once (amortises tunnel dispatch latency)
    n_iter = 8
    t0 = time.time()
    outs = [fn(*dev_arrs) for _ in range(n_iter)]
    sync(outs[-1])
    dt = (time.time() - t0) / n_iter
    print(f"device decode (pipelined x{n_iter}): {dt*1e3:.1f} ms/chunk -> "
          f"{mib/dt:.0f} MiB/s")

    got = np.asarray(outb).tobytes()
    assert got == raw, "device decode mismatch"
    print("bit-exact OK")


if __name__ == "__main__":
    main()
