"""Stage-level profiling of the jitted encode chunk on the real device."""
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
from libaec_tpu.encode import pipeline_fields, worst_case_bits_per_block
from libaec_tpu.ops import bitpack, fields, options, preprocess, zeroruns

CFG = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
CHUNK_RSIS = 512
S = CFG.samples_per_rsi
B = jax_backend()
NB = CHUNK_RSIS * CFG.rsi

rng = np.random.default_rng(0)
from libaec_tpu import native
rz = (REPO.parent / "reference" / "data" / "typical.rz")
data = rz.read_bytes()
status, out = native.decode(data, 1 << 20, CFG)
chunk_bytes = CHUNK_RSIS * S * 2
reps = chunk_bytes // len(out)
raw = out * reps
x_np = np.frombuffer(raw, dtype=">u2").astype(np.uint32).reshape(CHUNK_RSIS, S)
x = jax.device_put(jnp.asarray(x_np))
x.block_until_ready()
mib = chunk_bytes / (1 << 20)


def sync(r):
    """block_until_ready does not synchronise through the axon tunnel;
    force a tiny device->host transfer per output leaf instead."""
    for leaf in jax.tree.leaves(r):
        np.asarray(jax.numpy.ravel(leaf)[:1])
    return r


def timeit(name, fn, *args, n=5):
    r = sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = sync(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms   {mib/dt:8.1f} MiB/s")
    return r


# full pipeline_fields
pf = jax.jit(lambda x: pipeline_fields(B, CFG, x, CFG.rsi, 0))
w, v, kf = timeit("pipeline_fields", pf, x)

# substages
xp = B.xp


def stage_pre(x):
    d, refs = preprocess.delta_map(xp, x, CFG)
    return d, refs


d, refs = timeit("  preprocess", jax.jit(stage_pre), x)
d_blk = d.reshape(NB, CFG.block_size)


def stage_fs(d_blk):
    Fhi, Flo = options.fs_tables(xp, d_blk)
    return Fhi, Flo


Fhi, Flo = timeit("  fs_tables", jax.jit(stage_fs), d_blk)

this_bs = jnp.full(NB, CFG.block_size, jnp.uint32)


def stage_len(Fhi, Flo):
    return options.split_len_pairs(xp, Fhi, Flo, this_bs)


Lhi, Llo = timeit("  split_len_pairs", jax.jit(stage_len), Fhi, Flo)

searched = jnp.ones(NB, bool)


def stage_maps(Fhi, Flo, Lhi, Llo):
    return options.k_walk_maps(B, Fhi, Flo, Lhi, Llo, this_bs, CFG.kmax,
                               searched)


maps = timeit("  k_walk_maps", jax.jit(stage_maps), Fhi, Flo, Lhi, Llo)


def stage_chain(maps):
    return options.chain_k(B, maps, 0)


k_in, k_fin = timeit("  chain_k", jax.jit(stage_chain), maps)


def stage_se(d_blk):
    return options.se_lengths(xp, d_blk, this_bs * jnp.uint32(16))


timeit("  se_lengths", jax.jit(stage_se), d_blk)

# gen_fields
opt = jnp.zeros(NB, jnp.int32)
chosen_k = jnp.ones(NB, jnp.int32)
ref = (jnp.arange(NB) % CFG.rsi) == 0
refs_blk = jnp.zeros(NB, jnp.uint32)
is_zero = jnp.zeros(NB, bool)
zero_emit = jnp.zeros(NB, bool)
zero_fs = jnp.zeros(NB, jnp.uint32)
zero_ref = jnp.zeros(NB, bool)


def stage_fields(d_blk):
    return fields.gen_fields(xp, CFG, d_blk, opt, chosen_k, ref, refs_blk,
                             is_zero, zero_emit, zero_fs, zero_ref)


wv = timeit("  gen_fields", jax.jit(stage_fields), d_blk)

# pack
worst = worst_case_bits_per_block(CFG)
local_words = (worst + 31) // 32 + 1
group = 64
gw1 = group * (local_words + 1) + 1
nwords = (NB * worst + 8) // 32 + gw1 + 2
w2 = w.reshape(NB, -1)
v2 = v.reshape(NB, -1)
print("fields per block:", w2.shape, "local_words", local_words,
      "nwords", nwords)


def stage_pack(w2, v2):
    return bitpack.pack_fields_grouped(B, w2, v2, 0, local_words, nwords,
                                       group)


timeit("pack_fields_grouped", jax.jit(stage_pack), w2, v2)

# ---- pack internals ---------------------------------------------------
u32 = jnp.uint32
W0 = local_words + 1


def packA(widths, values):
    e = jnp.cumsum(widths, axis=1, dtype=jnp.uint32) + u32(32)
    t = e & u32(31)
    i1 = (e >> u32(5)) - u32(1)
    i2 = e >> u32(5)
    c1 = values >> t
    c2 = jnp.where(t == 0, u32(0), values << ((u32(32) - t) & u32(31)))
    block_bits = e[:, -1] - u32(32)
    cols = []
    for wdx in range(W0):
        wv = u32(wdx)
        acc = jnp.where(i1 == wv, c1, u32(0)).sum(axis=1, dtype=jnp.uint32)
        acc = acc + jnp.where(i2 == wv, c2, u32(0)).sum(axis=1,
                                                        dtype=jnp.uint32)
        cols.append(acc)
    return jnp.stack(cols, axis=1), block_bits


win, block_bits = timeit("  packA local", jax.jit(packA), w2, v2)


def packB(win, lens):
    levels = group.bit_length() - 1
    for _ in range(levels):
        l_win, r_win = win[0::2], win[1::2]
        l_len, r_len = lens[0::2], lens[1::2]
        Wl = l_win.shape[1]
        o = (l_len >> u32(5))[:, None]
        sh = (l_len & u32(31))[:, None]
        W_new = 2 * Wl
        jj = jnp.arange(W_new, dtype=jnp.uint32)[None, :]
        idx = jj - o
        idx_m1 = idx - u32(1)
        valid = (jj >= o)
        valid_m1 = (jj >= o + u32(1))
        r_pad = jnp.pad(r_win, ((0, 0), (0, W_new - Wl)))
        g1 = jnp.take_along_axis(
            r_pad, jnp.where(valid, idx, u32(0)).astype(jnp.int32), axis=1)
        g2 = jnp.take_along_axis(
            r_pad, jnp.where(valid_m1, idx_m1, u32(0)).astype(jnp.int32),
            axis=1)
        contrib = jnp.where(valid, g1 >> sh, u32(0))
        contrib = contrib + jnp.where(
            (sh > 0) & valid_m1, g2 << ((u32(32) - sh) & u32(31)), u32(0))
        win = jnp.pad(l_win, ((0, 0), (0, W_new - Wl))) + contrib
        lens = l_len + r_len
    return win, lens


gwin, glens = timeit("  packB tree", jax.jit(packB), win, block_bits)


def packC(win, lens):
    gbits = jnp.cumsum(lens, dtype=jnp.uint32) - lens
    gofs = (gbits >> u32(5)).astype(jnp.int32)
    gsh = (gbits & u32(31))[:, None]
    ws = bitpack._shift_window_right(jnp, win, gsh)
    GW1 = ws.shape[1]

    def body(buf, args):
        wv, o = args
        cur = jax.lax.dynamic_slice(buf, (o,), (GW1,))
        return jax.lax.dynamic_update_slice(buf, cur + wv, (o,)), None

    buf = jnp.zeros(nwords, dtype=jnp.uint32)
    buf, _ = jax.lax.scan(body, buf, (ws, gofs))
    return buf


timeit("  packC scan", jax.jit(packC), gwin, glens)
