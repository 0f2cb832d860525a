"""TPU timing of the pack stages only (packA local / packB tree / full)."""
import sys, time
from pathlib import Path
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from libaec_tpu import Config
from libaec_tpu.backend import jax_backend
from libaec_tpu.constants import AEC_DATA_MSB, AEC_DATA_PREPROCESS
from libaec_tpu.encode import worst_case_bits_per_block
from libaec_tpu.ops import bitpack

CFG = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
CHUNK_RSIS = 512
NB = CHUNK_RSIS * CFG.rsi
B = jax_backend()
mib = CHUNK_RSIS * CFG.samples_per_rsi * 2 / (1 << 20)

rng = np.random.default_rng(0)
F = 4  # fields per block in the real pipeline layout
worst = worst_case_bits_per_block(CFG)
local_words = (worst + 31) // 32 + 1
group = 64
gw1 = group * (local_words + 1) + 1

# realistic widths: ~1.4:1 ratio -> ~730 bits/block over 4 fields
w_np = rng.integers(0, 33, size=(NB, F)).astype(np.uint32)
v_np = rng.integers(0, 2 ** 32, size=(NB, F), dtype=np.uint64).astype(np.uint32)
v_np = np.where(w_np < 32,
                v_np & ((1 << w_np.astype(np.uint64)) - 1).astype(np.uint32),
                v_np)
nwords = int(w_np.sum()) // 32 + gw1 + 2
w2 = jax.device_put(jnp.asarray(w_np))
v2 = jax.device_put(jnp.asarray(v_np))


def sync(r):
    for leaf in jax.tree.leaves(r):
        np.asarray(jnp.ravel(leaf)[:1])
    return r


def timeit(name, fn, *args, n=3):
    t0 = time.perf_counter()
    r = sync(fn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        r = sync(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} compile+1 {tc:6.1f}s  run {dt*1e3:8.2f} ms  "
          f"{mib/dt:7.1f} MiB/s-equiv", flush=True)
    return r


f = jax.jit(lambda w, v: bitpack.pack_fields_grouped(
    B, w, v, 0, local_words, nwords, group))
timeit("pack_fields_grouped", f, w2, v2)
