"""Fused Pallas decode kernel: per-block payload windows -> mapped deltas.

The XLA formulation of ops/bitunpack.py is correct but spreads the
[blocks x samples x window] rank-selection reductions over several HBM
round trips.  This kernel keeps one tile of blocks entirely in VMEM and
fuses the whole payload parse:

  win u32 [T, Wf] per-block payload windows (pre-gathered, word-0 masked)
    -> SWAR popcounts + sublane-prefix  (FS rank table)
    -> one unrolled pass over the Wf window words accumulating, per
       sample: the containing word, its exclusive rank prefix, its value,
       and the two words holding the sample's LSB/raw field
    -> 5-step binary in-word select (popcount bisection)
    -> FS values (sublane first-difference) + funnel-shifted LSB fields
  -> outputs: val u32 [T, bs] composed split/uncomp/zero deltas,
              fs  u32 [T, bs] raw FS values (the SE codes)

Layout follows kernels/encode_pallas.py: blocks on lanes (T lanes per
tile, 128-multiples), samples/window-words on sublanes; per-block scalars
ride [1, T] rows.  Second-extension unpairing and the reference-sample
stitch are two cheap elementwise XLA passes on the outputs (decode.py),
keeping the kernel free of cross-sample shuffles.

Reference behaviour being replaced: the sequential bit readers and FSM
states of /root/reference/src/decode.c:222-340,423-502.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32_MAX = 0xFFFFFFFF


def _popc(x):
    """SWAR popcount on u32 (no multiply, no unsigned reduction)."""
    u32 = jnp.uint32
    x = x - ((x >> u32(1)) & u32(0x55555555))
    x = (x & u32(0x33333333)) + ((x >> u32(2)) & u32(0x33333333))
    x = (x + (x >> u32(4))) & u32(0x0F0F0F0F)
    x = x + (x >> u32(8))
    x = x + (x >> u32(16))
    return x & u32(0x3F)


def _shift_down_subl(v, s, fill=0):
    top = jnp.full((s,) + v.shape[1:], fill, v.dtype)
    return jnp.concatenate([top, v[:-s]], axis=0)


def decode_tile_kernel(win_ref, fsbit_ref, lsbrel_ref, meta_ref, refs_ref,
                       out_ref, *, cfg, T, Wf):
    u32, i32 = jnp.uint32, jnp.int32
    bs = cfg.block_size
    bps = cfg.bits_per_sample

    # windows arrive [T, Wf] as RAW scan memcpys; byteswap to big-endian
    # word values in VMEM (ops/bitunpack.swap32 rationale), then transpose
    # to words-on-sublanes, the compute layout
    from ..ops.bitunpack import swap32

    win = swap32(win_ref[:]).T  # u32 [Wf, T]
    fs_bit = fsbit_ref[:]    # u32 [1, T]
    lsb_rel = lsbrel_ref[:]  # u32 [1, T]
    meta = meta_ref[:]       # u32 [1, T]
    ref_sample = refs_ref[:]  # u32 [1, T]

    kind = meta & u32(3)
    k = (meta >> u32(2)) & u32(31)
    ref = (meta >> u32(7)) & u32(1)
    is_se = kind == u32(1)
    is_split = kind == u32(2)
    is_uncomp = kind == u32(3)

    # mask bits before the payload start in word 0
    wsub = jax.lax.broadcasted_iota(i32, (Wf, T), 0)
    win = jnp.where(wsub == 0, win & (u32(U32_MAX) >> fs_bit), win)

    # FS rank table: inclusive popcount prefix down the window words
    pc = _popc(win)
    cum = pc
    s = 1
    while s < Wf:
        cum = cum + _shift_down_subl(cum, s)
        s *= 2

    j = jax.lax.broadcasted_iota(u32, (bs, T), 0)   # sample index
    n_fs = jnp.where(is_split, u32(bs) - ref,
                     jnp.where(is_se, u32(bs // 2), u32(0)))

    # LSB/raw field bit positions (window-relative), known before the scan
    # (no jnp.maximum here: Mosaic lacks unsigned max, arith.maxui)
    pos = j
    pj = jnp.where(pos >= ref, pos - ref, u32(0))
    keff = jnp.where(is_uncomp, u32(bps), jnp.where(is_split, k, u32(0)))
    q = fs_bit + lsb_rel + pj * keff
    qw = (q >> u32(5)).astype(i32)
    qb = q & u32(31)

    # one unrolled pass over the window words
    t = jnp.zeros((bs, T), u32)      # word containing the (j+1)-th set bit
    ce = jnp.zeros((bs, T), u32)     # rank prefix before that word
    wsel = jnp.zeros((bs, T), u32)   # that word's value
    w0 = jnp.zeros((bs, T), u32)     # field word
    w1 = jnp.zeros((bs, T), u32)     # field spill word
    prev_le = jnp.ones((bs, T), bool)
    prev_cum = jnp.zeros((1, T), u32)
    for w in range(Wf):
        winw = win[w:w + 1, :]   # [1, T] broadcasts over samples
        cumw = cum[w:w + 1, :]
        le = cumw <= j
        hit = prev_le & ~le
        t = t + le.astype(u32)
        ce = ce + jnp.where(hit, prev_cum, u32(0))
        wsel = wsel + jnp.where(hit, winw, u32(0))
        w0 = w0 + jnp.where(qw == w, winw, u32(0))
        if w > 0:
            w1 = w1 + jnp.where(qw == w - 1, winw, u32(0))
        prev_le = le
        prev_cum = cumw

    # 5-step binary select of the (r+1)-th set bit from the MSB
    r = j - ce
    L = jnp.zeros((bs, T), u32)
    for sbit in (16, 8, 4, 2, 1):
        cnt = _popc(wsel >> (u32(32) - (L + u32(sbit))))
        L = L + jnp.where(cnt <= r, u32(sbit), u32(0))
    sel = ((t << u32(5)) + L - fs_bit).astype(i32)
    prev_sel = _shift_down_subl(sel, 1, fill=-1)
    fs = (sel - prev_sel - 1).astype(u32)
    fs = jnp.where(j < n_fs, fs, u32(0))

    # funnel-shifted field extraction (shift amounts clamped to [0, 31]
    # with where, not jnp.maximum: Mosaic lacks unsigned max)
    hi = w0 << qb
    qb1 = jnp.where(qb == u32(0), u32(1), qb)
    lo = jnp.where(qb == u32(0), u32(0), w1 >> (u32(32) - qb1))
    keff1 = jnp.where(keff == u32(0), u32(1), keff)
    field = jnp.where(keff == u32(0), u32(0),
                      (hi | lo) >> (u32(32) - keff1))

    # fs value feeding each output position (ref shifts payload by one)
    fs_dn = _shift_down_subl(fs, 1)
    fsp = jnp.where(ref == u32(1), fs_dn, fs)
    val = (fsp << k) | field  # uncomp: fs==0; zero: both 0

    # second extension: codes live in fs rows 0..bs/2-1; unpair in closed
    # form (decode.c:560-616 semantics, no 182-entry table)
    m2 = jnp.broadcast_to(fs[: bs // 2][:, None, :],
                          (bs // 2, 2, T)).reshape(bs, T)
    # u32->f32 casts don't lower in Mosaic; SE codes are < 2^13, so round-
    # trip through i32
    m2f = m2.astype(i32).astype(jnp.float32)
    i0 = ((jnp.sqrt(8.0 * m2f + 1.0) - 1.0) * 0.5).astype(i32).astype(u32)

    def _corr(i):
        i = i + ((i + u32(1)) * (i + u32(2)) // u32(2) <= m2).astype(u32)
        return i - (i * (i + u32(1)) // u32(2) > m2).astype(u32)

    ii = _corr(_corr(i0))
    vb = m2 - ii * (ii + u32(1)) // u32(2)
    va = ii - vb
    se_val = jnp.where((j & u32(1)) == u32(0), va, vb)

    out = jnp.where(is_se, se_val, val)
    out = jnp.where((ref == u32(1)) & (j == u32(0)), ref_sample, out)
    out_ref[:] = out.T


@functools.lru_cache(maxsize=None)
def _build_call(cfg, NB, T, interpret,
                Wf=None):
    if Wf is None:  # worst-case conforming payload (ops/bitunpack)
        Wf = (cfg.block_size * cfg.bits_per_sample) // 32 + 2
    bs = cfg.block_size
    n_tiles = NB // T
    kern = functools.partial(decode_tile_kernel, cfg=cfg, T=T, Wf=Wf)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, Wf), lambda i: (i, 0)),
            pl.BlockSpec((1, T), lambda i: (0, i)),
            pl.BlockSpec((1, T), lambda i: (0, i)),
            pl.BlockSpec((1, T), lambda i: (0, i)),
            pl.BlockSpec((1, T), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((T, bs), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, bs), jnp.uint32),
        interpret=interpret,
    )


def kernel_supported(cfg):
    return 8 <= cfg.block_size <= 64


def decode_payload_pallas(cfg, win, fs_bit, lsb_rel, meta, ref_sample,
                          tile=512, interpret=False):
    """win: u32 [NB, Wf] scan-materialised (unmasked) payload windows;
    record vectors u32 [NB].  Wf may be SMALLER than the worst-case
    window (bucketed per chunk from the actual max payload span -- see
    decode.py) as long as every payload in the chunk fits it.  Returns
    mapped deltas u32 [NB, bs].  NB is padded to a tile multiple
    internally (zero records decode to zero)."""
    NB = win.shape[0]
    pad = (-NB) % tile
    if pad:
        zcol = lambda a: jnp.pad(a, ((0, pad),))  # noqa: E731
        win = jnp.pad(win, ((0, pad), (0, 0)))
        fs_bit, lsb_rel, meta, ref_sample = map(
            zcol, (fs_bit, lsb_rel, meta, ref_sample))
    call = _build_call(cfg, NB + pad, tile, interpret, Wf=win.shape[1])
    out = call(win, fs_bit[None, :], lsb_rel[None, :], meta[None, :],
               ref_sample[None, :])
    return out[:NB]
