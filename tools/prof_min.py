"""Minimal TPU timing: chain_k variants + pack stages, with compile timing."""
import sys, time
from pathlib import Path
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from libaec_tpu.backend import jax_backend
from libaec_tpu.config import KW
from libaec_tpu.ops import options, bitpack

B = jax_backend()
NB = 512 * 256  # blocks per chunk in bench config

rng = np.random.default_rng(0)
# realistic k-walk maps: monotone-ish small moves
maps_np = np.clip(np.arange(KW)[None, :] + rng.integers(-2, 3, size=(NB, KW)),
                  0, KW - 1).astype(np.int32)
maps = jax.device_put(jnp.asarray(maps_np))


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
    print(f"{name:28s} compile+1 {tc:7.2f} s   run {dt*1e3:8.2f} ms",
          flush=True)
    return r


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "matmul"):
    f = jax.jit(lambda m: options._chain_k_matmul(B, m, 0))
    timeit("chain_k matmul", f, maps)

if which in ("all", "tiled"):
    if hasattr(options, "_chain_k_tiled"):
        f = jax.jit(lambda m: options._chain_k_tiled(B, m, 0))
        timeit("chain_k tiled", f, maps)
