"""Stage-level device timing with the in-jit loop + slope method
(see tools/prof_loop.py; block_until_ready is not a sync on axon).

Each stage runs inside one jitted fori_loop; a scalar accumulator feeds
back into a cheap scalar input of the stage (k_init / bit0 / fs_bit) so
XLA cannot hoist the loop-invariant body, and consumes a couple of output
elements so nothing is dead code.

Usage: python tools/prof_stages.py [N]
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
from libaec_tpu.backend import jax_backend  # noqa: E402
from libaec_tpu.constants import AEC_DATA_MSB, AEC_DATA_PREPROCESS  # noqa: E402
from libaec_tpu.decode import scan_record_arrays  # noqa: E402
from libaec_tpu.encode import (  # noqa: E402
    _jax_chunk_fn,
    encode_buffer,
    worst_case_bits_per_block,
)
from libaec_tpu.kernels import decode_pallas as DP  # noqa: E402
from libaec_tpu.kernels import encode_pallas as EP  # noqa: E402
from libaec_tpu.kernels import merge_pallas as MP  # noqa: E402
from libaec_tpu.kernels import unpredict_pallas as UP  # noqa: E402
from libaec_tpu.ops import bitpack, bitunpack  # noqa: E402

CFG = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
CHUNK_RSIS = 512
S = CFG.samples_per_rsi
NB = CHUNK_RSIS * CFG.rsi
MIB = CHUNK_RSIS * S * 2 / (1 << 20)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 16

B = jax_backend()
rz = REPO.parent / "reference" / "data" / "typical.rz"
status, out = native.decode(rz.read_bytes(), 1 << 20, CFG)
raw = out * ((CHUNK_RSIS * S * 2) // len(out))
x = jax.device_put(jnp.asarray(
    np.frombuffer(raw, dtype=">u2").astype(np.uint32).reshape(CHUNK_RSIS, S)))

worst = worst_case_bits_per_block(CFG)
local_words = (worst + 31) // 32 + 1
pgroup = 512
pg_out = MP.group_window_words(local_words, pgroup) + 1
pnwords = (NB * worst + 8) // 32 + pg_out + 2


def timed(name, make_loop):
    fns = {n: jax.jit(make_loop(n)) for n in (N, 3 * N)}
    for f in fns.values():
        np.asarray(f())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fns[N]())
        t1 = time.perf_counter()
        np.asarray(fns[3 * N]())
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * N))
    print(f"{name:32s} {best*1e3:8.3f} ms   {MIB/best:9.1f} MiB/s",
          flush=True)


def loop(n, body0):
    """Wrap body0(dep_scalar) -> u32 scalar into an n-iteration fori_loop."""
    def run():
        def body(i, acc):
            return acc + body0(acc & jnp.uint32(0))

        return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

    return run


# ---- full chunk ---------------------------------------------------------
fullfn = _jax_chunk_fn(CFG, CHUNK_RSIS, CFG.rsi)
timed("full chunk fn", lambda n: loop(n, lambda z: fullfn(
    x, z.astype(jnp.int32), z)[1]))

# ---- encode kernel alone ------------------------------------------------
timed("encode kernel", lambda n: loop(n, lambda z: EP.
      encode_chunk_fields_pallas(CFG, x, z.astype(jnp.int32))[1][-1]))

# stage inputs for the merge
win, bbits, _ = jax.jit(
    lambda x: EP.encode_chunk_fields_pallas(CFG, x, 0))(x)
win, bbits = jax.device_put(win), jax.device_put(bbits)

# ---- merge tree alone ---------------------------------------------------
timed("merge tree (pallas)", lambda n: loop(n, lambda z: MP.
      merge_to_groups_pallas(win, bbits + z, local_words, pgroup)[0][-1, -1]))

gwin, glens = jax.jit(lambda w, b: MP.merge_to_groups_pallas(
    w, b, local_words, pgroup))(win, bbits)
gwin, glens = jax.device_put(gwin), jax.device_put(glens)

# ---- group scan alone ---------------------------------------------------
timed("group scan", lambda n: loop(n, lambda z: bitpack.
      merge_groups_scan(B, gwin, glens, z, pnwords)[0][-1]))

# ---- decode stages ------------------------------------------------------
comp = encode_buffer(raw, CFG)
recs, n_ok, _ = native.scan_blocks(comp, CHUNK_RSIS,
                                   bitunpack.max_fs_bits(CFG), CFG,
                                   wf=bitunpack.window_words(CFG))
assert n_ok == CHUNK_RSIS
dwin, fs_bit, lsb_rel, meta, ref_sample = [
    jax.device_put(jnp.asarray(a)) for a in scan_record_arrays(recs)]

timed("decode payload kernel", lambda n: loop(n, lambda z: DP.
      decode_payload_pallas(CFG, dwin, fs_bit + z, lsb_rel, meta,
                            ref_sample)[-1, -1]))

deltas = jax.device_put(jax.jit(lambda: DP.decode_payload_pallas(
    CFG, dwin, fs_bit, lsb_rel, meta, ref_sample).reshape(
    CHUNK_RSIS, S))())

timed("unpredict+swizzle kernel", lambda n: loop(n, lambda z: UP.
      unpredict_swizzle_rsis_pallas(CFG, deltas + z)[-1, -1]))
