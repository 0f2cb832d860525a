"""Measure byte-swizzle variants for the decode output path (bsz=2 MSB).

The current samples_to_bytes_device reshapes [n] -> [n//2, 2] and combines
column slices, which XLA lowers to a stride-2 lane relayout: ~8.7 ms per
16 MiB chunk vs 0.7 ms for the entire entropy parse. Candidates:

  A  current reshape+column-combine
  B  u16 byteswap + lax.bitcast_convert_type pair fusion
  C  MXU compaction: even/odd lane selection as f32 matmuls
  D  B but staying 2D [NR, S] end-to-end
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax import lax

N_RSI, S = 512, 16384
N = N_RSI * S
u32 = jnp.uint32


def sync(x):
    jax.block_until_ready(x)


def timeit(f, x, label, n=10):
    y = f(x)
    sync(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            y = f(x)
        sync(y)
        best = min(best, (time.time() - t0) / n)
    print(f"{label:28s} {best*1e3:8.2f} ms")
    return y


@jax.jit
def var_a(samples):
    g = samples.reshape(-1).reshape(N // 2, 2)

    def byte(v, i):
        return (v >> u32(8 * (1 - i))) & u32(0xFF)

    word = jnp.zeros((N // 2,), u32)
    for s in range(2):
        for b in range(2):
            word = word | (byte(g[:, s], b) << u32(8 * (s * 2 + b)))
    return word


@jax.jit
def var_b(samples):
    x = samples.reshape(-1).astype(jnp.uint16)
    sw = (x >> jnp.uint16(8)) | (x << jnp.uint16(8))
    return lax.bitcast_convert_type(sw.reshape(N // 2, 2), jnp.uint32)


@jax.jit
def var_d(samples):
    x = samples.astype(jnp.uint16)
    sw = (x >> jnp.uint16(8)) | (x << jnp.uint16(8))
    return lax.bitcast_convert_type(
        sw.reshape(N_RSI, S // 2, 2), jnp.uint32)


def make_var_c():
    L = 1024
    E = np.zeros((L, L // 2), np.float32)
    E[np.arange(0, L, 2), np.arange(L // 2)] = 1.0
    Ed = jnp.asarray(E)

    @jax.jit
    def f(samples):
        x = samples.reshape(-1).reshape(N // L, L)
        a = ((x >> u32(8)) | (x << u32(8))) & u32(0xFFFF)
        b = jnp.roll(a, -1, axis=1)
        ac = jnp.dot(a.astype(jnp.float32), Ed,
                     preferred_element_type=jnp.float32).astype(u32)
        bc = jnp.dot(b.astype(jnp.float32), Ed,
                     preferred_element_type=jnp.float32).astype(u32)
        return (ac | (bc << u32(16))).reshape(-1)

    return f


def main():
    rng = np.random.default_rng(0)
    samples = jnp.asarray(
        rng.integers(0, 1 << 16, (N_RSI, S)).astype(np.uint32))
    sync(samples)

    ya = timeit(var_a, samples, "A reshape+column")
    yb = timeit(var_b, samples, "B u16 bitcast flat")
    yd = timeit(var_d, samples, "D u16 bitcast 2d")
    yc = timeit(make_var_c(), samples, "C mxu compaction")

    a = np.asarray(ya)
    assert np.array_equal(a, np.asarray(yb)), "B mismatch"
    assert np.array_equal(a, np.asarray(yd).reshape(-1)), "D mismatch"
    assert np.array_equal(a, np.asarray(yc)), "C mismatch"
    print("all variants bit-identical")


if __name__ == "__main__":
    main()
