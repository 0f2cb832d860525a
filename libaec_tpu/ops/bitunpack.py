"""Device entropy decode: data-parallel CDS payload parsing on TPU.

Phase 2 of the two-phase decode (decode.py): the native structural scan
(native.scan_blocks) walks the stream once and emits one tiny record per
output block — (FS-region offset, LSB-region offset, kind|k|ref, reference
sample).  This module then decodes every block payload in parallel on the
VPU, replacing the reference decoder's sequential hot loop
(/root/reference/src/decode.c:222-340 bit readers, :423-502 m_split,
:560-616 m_se, :518-558 m_zero_block):

  * FS (unary) parsing: instead of a clz per code, the j-th FS value of a
    block is recovered by *rank selection* — per-word popcounts over the
    block's FS window, an exclusive prefix, a compare-count to find the word
    holding the (j+1)-th set bit, and a 5-step binary in-word select.  All
    samples of all blocks resolve simultaneously.
  * k-bit LSB planes / raw uncompressed fields: fixed-stride unaligned
    field gathers (two u32 loads + funnel shift per sample).
  * Second-extension unpairing in closed form (sqrt + integer correction),
    replacing the reference's 182-entry table (decode.c:679-692).
  * Zero-run blocks cost nothing: their deltas are the where() default.

Output is the mapped-delta tensor consumed by ops/unpredict.py.

Conforming streams keep every CDS under uncomp_len = block_size *
bits_per_sample bits (selection rule, encode.c:585-612), which bounds the
FS window statically; the scan rejects (extremely rare, non-conforming)
oversized-FS RSIs so they fall back to the exact serial core instead of
mis-decoding.
"""
import jax.numpy as jnp
from jax import lax

KIND_ZERO = 0
KIND_SE = 1
KIND_SPLIT = 2
KIND_UNCOMP = 3


def window_words(cfg):
    """Static per-block FS-window size in u32 words: worst-case conforming
    FS region (< block_size*bits_per_sample bits) plus alignment slack."""
    return (cfg.block_size * cfg.bits_per_sample) // 32 + 2


def max_fs_bits(cfg):
    """FS-region bit budget the scan enforces for device decodability."""
    return 32 * window_words(cfg) - 31


def pad_words(cfg):
    """Zero words the host must append after the stream so every in-kernel
    gather (window + field loads) stays in bounds."""
    return window_words(cfg) + 2


def decode_blocks(cfg, words, fs_word, fs_bit, lsb_word, lsb_bit, meta,
                  ref_sample):
    """Decode all block payloads.  words: u32 [W] big-endian-packed stream
    (bit 31 of words[0] is stream bit 0), zero-padded by pad_words(cfg);
    record arrays are u32 [NB] with offsets split into (word, bit-in-word).
    Returns mapped deltas u32 [NB, block_size]."""
    u32 = jnp.uint32
    i32 = jnp.int32
    bs = cfg.block_size
    bps = cfg.bits_per_sample
    Wf = window_words(cfg)
    NB = meta.shape[0]

    kind = meta & u32(3)
    k = (meta >> u32(2)) & u32(31)
    ref = (meta >> u32(7)) & u32(1)
    is_se = kind == KIND_SE
    is_split = kind == KIND_SPLIT
    is_uncomp = kind == KIND_UNCOMP

    # ---- FS parse (split + SE blocks) ------------------------------------
    n_fs = jnp.where(is_split, u32(bs) - ref,
                     jnp.where(is_se, u32(bs // 2), u32(0)))
    widx = fs_word[:, None] + jnp.arange(Wf, dtype=u32)[None, :]
    win = words[widx]  # [NB, Wf]
    win = win.at[:, 0].set(win[:, 0] & (u32(0xFFFFFFFF) >> fs_bit))
    pc = lax.population_count(win)
    cum = jnp.cumsum(pc, axis=1)  # inclusive, [NB, Wf]
    j = jnp.arange(bs, dtype=u32)
    # word holding the (j+1)-th set bit: count of words with cum <= j
    t = (cum[:, None, :] <= j[None, :, None]).sum(axis=2,
                                                  dtype=i32)  # [NB, bs]
    t = jnp.minimum(t, Wf - 1)
    cum_excl = jnp.concatenate(
        [jnp.zeros((NB, 1), u32), cum[:, :-1]], axis=1)
    ce = jnp.take_along_axis(cum_excl, t, axis=1)
    wsel = jnp.take_along_axis(win, t, axis=1)
    r = j[None, :] - ce  # rank of the wanted bit within its word
    # 5-step binary select of the (r+1)-th set bit from the MSB
    L = jnp.zeros((NB, bs), u32)
    for s in (16, 8, 4, 2, 1):
        cnt = lax.population_count(wsel >> (u32(32) - (L + u32(s))))
        L = L + jnp.where(cnt <= r, u32(s), u32(0))
    sel = (t.astype(u32) << u32(5)) + L - fs_bit[:, None]  # region-relative
    prev = jnp.concatenate(
        [jnp.full((NB, 1), -1, i32), sel[:, :-1].astype(i32)], axis=1)
    fs = (sel.astype(i32) - prev - 1).astype(u32)
    fs = jnp.where(j[None, :] < n_fs[:, None], fs, u32(0))

    # ---- LSB / raw field extraction ---------------------------------------
    pos = jnp.arange(bs, dtype=u32)[None, :]
    # payload sample index feeding output position `pos` (ref shifts by one)
    pj = jnp.maximum(pos, ref[:, None]) - ref[:, None]
    keff = jnp.where(is_uncomp, u32(bps), jnp.where(is_split, k, u32(0)))
    base_word = jnp.where(is_uncomp, fs_word, lsb_word)
    base_bit = jnp.where(is_uncomp, fs_bit, lsb_bit)
    q = base_bit[:, None] + pj * keff[:, None]
    qw = base_word[:, None] + (q >> u32(5))
    qb = q & u32(31)
    w0 = words[qw]
    w1 = words[qw + 1]
    hi = w0 << qb
    lo = jnp.where(qb == 0, u32(0), w1 >> (u32(32) - jnp.maximum(qb, u32(1))))
    sh = u32(32) - jnp.maximum(keff, u32(1))[:, None]
    field = jnp.where(keff[:, None] == 0, u32(0), (hi | lo) >> sh)

    fsp = jnp.take_along_axis(fs, pj.astype(i32), axis=1)
    split_val = (fsp << k[:, None]) | field  # uncomp: fs==0; zero: both 0

    # ---- second extension --------------------------------------------------
    # pair index i from m = i(i+1)/2 + b: closed form + integer correction
    m = fs
    i0 = ((jnp.sqrt(8.0 * m.astype(jnp.float32) + 1.0) - 1.0) *
          0.5).astype(u32)

    def _corr(i):
        i = i + ((i + u32(1)) * (i + u32(2)) // u32(2) <= m).astype(u32)
        return i - (i * (i + u32(1)) // u32(2) > m).astype(u32)

    ii = _corr(_corr(i0))
    bb = m - ii * (ii + u32(1)) // u32(2)
    aa = ii - bb
    pair = jnp.broadcast_to((pos >> u32(1)).astype(i32), (NB, bs))
    va = jnp.take_along_axis(aa, pair, axis=1)
    vb = jnp.take_along_axis(bb, pair, axis=1)
    se_val = jnp.where((pos & u32(1)) == 0, va, vb)

    # ---- compose ------------------------------------------------------------
    out = jnp.where(is_se[:, None], se_val, split_val)
    out = jnp.where((ref[:, None] == u32(1)) & (pos == 0),
                    ref_sample[:, None], out)
    return out
