"""Exact device-sustained throughput: run N chunk iterations inside ONE
jitted lax.fori_loop so tunnel dispatch overhead is paid once, and time by
the slope between an N-iteration and a 3N-iteration loop so the (large,
noisy) tunnel sync constant cancels.

NOTE jax.block_until_ready returns immediately on axon arrays; the only
real sync is a fetch (np.asarray), which costs ~30 ms through the tunnel.

The loop threads the real inter-chunk carries (k, bit cursor mod 8) and
consumes each chunk's outputs into a checksum so nothing is dead-code
eliminated.  Usage: python tools/prof_loop.py [encode|decode|all] [N]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from libaec_tpu import Config, native  # noqa: E402
from libaec_tpu.constants import AEC_DATA_MSB, AEC_DATA_PREPROCESS  # noqa: E402

CFG = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
CHUNK_RSIS = 512
S = CFG.samples_per_rsi
MIB = CHUNK_RSIS * S * 2 / (1 << 20)

what = sys.argv[1] if len(sys.argv) > 1 else "all"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64

rz = REPO.parent / "reference" / "data" / "typical.rz"
status, out = native.decode(rz.read_bytes(), 1 << 20, CFG)
raw = out * ((CHUNK_RSIS * S * 2) // len(out))
x_np = np.frombuffer(raw, dtype=">u2").astype(np.uint32).reshape(
    CHUNK_RSIS, S)


def timed_loop(name, make_loop, *args):
    loop_n = make_loop(N)
    loop_3n = make_loop(3 * N)
    np.asarray(loop_n(*args))   # compile + warm
    np.asarray(loop_3n(*args))

    def run(f):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t1 = run(loop_n)
        t3 = run(loop_3n)
        best = min(best, (t3 - t1) / (2 * N))
    print(f"{name:24s} {best*1e3:8.3f} ms/chunk  {MIB/best:9.1f} MiB/s",
          flush=True)


if what in ("encode", "all"):
    from libaec_tpu.encode import _jax_chunk_fn

    fn = _jax_chunk_fn(CFG, CHUNK_RSIS, CFG.rsi)
    x = jax.device_put(jnp.asarray(x_np))

    def make_enc_loop(n):
        @jax.jit
        def enc_loop(x):
            def body(i, carry):
                k, b0, acc = carry
                words, total_bits, k = fn(x, k, b0)
                return (k, total_bits % jnp.uint32(8),
                        acc + total_bits + words[-1])

            k, b0, acc = jax.lax.fori_loop(
                0, n, body, (jnp.int32(0), jnp.uint32(0), jnp.uint32(0)))
            return acc

        return enc_loop

    timed_loop("encode chunk (looped)", make_enc_loop, x)

if what in ("decode", "all"):
    from libaec_tpu.decode import _jax_decode_fn, scan_record_arrays
    from libaec_tpu.encode import encode_buffer
    from libaec_tpu.ops import bitunpack

    comp = encode_buffer(raw, CFG)
    recs, n_ok, _ = native.scan_blocks(comp, CHUNK_RSIS,
                                       bitunpack.max_fs_bits(CFG), CFG,
                                       wf=bitunpack.window_words(CFG))
    assert n_ok == CHUNK_RSIS
    arrs = [jax.device_put(jnp.asarray(a)) for a in scan_record_arrays(recs)]
    dfn = _jax_decode_fn(CFG, CHUNK_RSIS)

    def make_dec_loop(n):
        @jax.jit
        def dec_loop(*arrs):
            def body(i, acc):
                out = dfn(*arrs)
                return acc + out.ravel()[-1] + out.ravel()[0]

            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

        return dec_loop

    timed_loop("decode chunk (looped)", make_dec_loop, *arrs)
