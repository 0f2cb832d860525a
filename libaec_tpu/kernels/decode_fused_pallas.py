"""One-kernel decode: payload parse + inverse predictor + byte swizzle.

MEASURED EXPERIMENT, NOT ROUTED BY DEFAULT (`LIBAEC_TPU_FUSED_DECODE=1`
opts in).  The idea: one HBM read of windows/records and one HBM write
of the final stream words, eliminating the [NB, bs] delta intermediate
(~67 MB round trip per 16 MiB chunk) between decode_pallas and
unpredict_pallas.  It is bit-exact on chip, but LOSES to the two-kernel
pipeline at every window width on v5e (16 MiB bench chunk, slope-timed):

    wf=34 (mid-entropy):  fused 2.09 ms  vs  two-kernel ~1.8 ms
    wf=10 (low-entropy):  fused 1.58 ms  vs  two-kernel 1.33 ms

i.e. the per-block-slice unrolled parse (Tr=128-lane rows; Mosaic's
shape-cast rules forbid the [bs, Tr*BSL] -> [BSL*bs, Tr] relayout that a
single wide parse would need) costs more compute than the saved HBM
traffic is worth -- these kernels run at 9-12 GiB/s where the
intermediate's round trip is only ~0.5 ms of bandwidth.  Kept (with its
interpret-mode correctness tests) because the balance flips on parts
with less VPU headroom per byte of HBM, and the tile geometry documents
the only Mosaic-legal fusion layout found.

Tiles are (Tr=128 RSIs) x (BSL blocks); windows/records arrive b-major
([rsi, n_rsi, ...]) so each block-slice row is the exact 128-lane
geometry of the proven decode_pallas kernel, the parsed deltas land
directly in the scan layout, and the inverse-predictor carry chains
across the innermost grid dimension as in unpredict_pallas.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_pallas import U32_MAX, _popc, _shift_down_subl
from .unpredict_pallas import J

TR = 128  # RSIs per tile (scan lanes)


def _pick_bsl(rsi):
    for b in (16, 8, 32, 4, 64, 2):
        if rsi % b == 0 and b <= rsi:
            return b
    return None


def fused_tile_kernel(win_ref, fsbit_ref, lsbrel_ref, meta_ref, refs_ref,
                      out_ref, carry, dT, wbuf, *, cfg, Tr, BSL, Wf):
    u32, i32 = jnp.uint32, jnp.int32
    bs = cfg.block_size
    bps = cfg.bits_per_sample
    bsz = cfg.bytes_per_sample

    from ..ops.bitunpack import swap32

    # ---- payload parse: one unrolled pass PER BLOCK SLICE ROW ----------
    # Inputs arrive b-major ([rsi, n_rsi, ...] outer layout), so each
    # b-row slice is the exact [T=Tr lanes] geometry the proven
    # decode_pallas kernel uses: static sublane slices, one VMEM
    # transpose per row, no cross-dimension shape casts (which Mosaic
    # rejects).  Parsed deltas land directly in the scan layout
    # dT[b*bs:(b+1)*bs, :].
    def parse_row(b):
        win = swap32(win_ref[b]).T          # [Wf, Tr]
        fs_bit = fsbit_ref[b:b + 1, :]      # [1, Tr]
        lsb_rel = lsbrel_ref[b:b + 1, :]
        meta = meta_ref[b:b + 1, :]
        ref_sample = refs_ref[b:b + 1, :]

        kind = meta & u32(3)
        k = (meta >> u32(2)) & u32(31)
        ref = (meta >> u32(7)) & u32(1)
        is_se = kind == u32(1)
        is_split = kind == u32(2)
        is_uncomp = kind == u32(3)

        wsub = jax.lax.broadcasted_iota(i32, (Wf, Tr), 0)
        winm = jnp.where(wsub == 0, win & (u32(U32_MAX) >> fs_bit), win)

        pc = _popc(winm)
        cum = pc
        s = 1
        while s < Wf:
            cum = cum + _shift_down_subl(cum, s)
            s *= 2

        j = jax.lax.broadcasted_iota(u32, (bs, Tr), 0)
        n_fs = jnp.where(is_split, u32(bs) - ref,
                         jnp.where(is_se, u32(bs // 2), u32(0)))

        pj = jnp.where(j >= ref, j - ref, u32(0))
        keff = jnp.where(is_uncomp, u32(bps),
                         jnp.where(is_split, k, u32(0)))
        q = fs_bit + lsb_rel + pj * keff
        qw = (q >> u32(5)).astype(i32)
        qb = q & u32(31)

        t = jnp.zeros((bs, Tr), u32)
        ce = jnp.zeros((bs, Tr), u32)
        wsel = jnp.zeros((bs, Tr), u32)
        w0 = jnp.zeros((bs, Tr), u32)
        w1 = jnp.zeros((bs, Tr), u32)
        prev_le = jnp.ones((bs, Tr), bool)
        prev_cum = jnp.zeros((1, Tr), u32)
        for w in range(Wf):
            winw = winm[w:w + 1, :]
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

        r = j - ce
        L = jnp.zeros((bs, Tr), u32)
        for sbit in (16, 8, 4, 2, 1):
            cnt = _popc(wsel >> (u32(32) - (L + u32(sbit))))
            L = L + jnp.where(cnt <= r, u32(sbit), u32(0))
        sel = ((t << u32(5)) + L - fs_bit).astype(i32)
        prev_sel = _shift_down_subl(sel, 1, fill=-1)
        fs = (sel - prev_sel - 1).astype(u32)
        fs = jnp.where(j < n_fs, fs, u32(0))

        hi = w0 << qb
        qb1 = jnp.where(qb == u32(0), u32(1), qb)
        lo = jnp.where(qb == u32(0), u32(0), w1 >> (u32(32) - qb1))
        keff1 = jnp.where(keff == u32(0), u32(1), keff)
        field = jnp.where(keff == u32(0), u32(0),
                          (hi | lo) >> (u32(32) - keff1))

        fs_dn = _shift_down_subl(fs, 1)
        fsp = jnp.where(ref == u32(1), fs_dn, fs)
        val = (fsp << k) | field

        m2 = jnp.broadcast_to(fs[: bs // 2][:, None, :],
                              (bs // 2, 2, Tr)).reshape(bs, Tr)
        m2f = m2.astype(i32).astype(jnp.float32)
        i0 = ((jnp.sqrt(8.0 * m2f + 1.0) - 1.0) * 0.5) \
            .astype(i32).astype(u32)

        def _corr(i):
            i = i + ((i + u32(1)) * (i + u32(2)) // u32(2) <= m2) \
                .astype(u32)
            return i - (i * (i + u32(1)) // u32(2) > m2).astype(u32)

        ii = _corr(_corr(i0))
        vb = m2 - ii * (ii + u32(1)) // u32(2)
        va = ii - vb
        se_val = jnp.where((j & u32(1)) == u32(0), va, vb)

        o = jnp.where(is_se, se_val, val)
        return jnp.where((ref == u32(1)) & (j == u32(0)), ref_sample, o)

    for b in range(BSL):
        dT[b * bs:(b + 1) * bs, :] = parse_row(b)

    # ---- inverse predictor + swizzle (unpredict_pallas fused kernel) ---
    SBLK = BSL * bs
    xmax = u32(cfg.xmax)
    signed_path = cfg.preprocess and cfg.xmin != 0
    med = u32(cfg.xmax // 2 + 1)
    sxmax = i32(cfg.xmax - (1 << 32) if cfg.xmax >= (1 << 31) else cfg.xmax)
    spw = 4 // bsz
    WJ = (J * bsz) // 4

    def refval(raw):
        if cfg.signed:
            m = u32((1 << (bps - 1)) & 0xFFFFFFFF)
            return (raw ^ m) - m
        return raw

    def step_unsigned(last, d):
        half = (d >> u32(1)) + (d & u32(1))
        zig = (d >> u32(1)) ^ (~((d & u32(1)) - u32(1)))
        mask = jnp.where((last & med) != u32(0), xmax, u32(0))
        return jnp.where(half <= (mask ^ last), last + zig, mask ^ d)

    def step_signed(last, d):
        half = (d >> u32(1)) + (d & u32(1))
        zig = ((d >> u32(1)) ^ (~((d & u32(1)) - u32(1)))).astype(i32)
        neg = last < 0
        lim = jnp.where(neg, (sxmax + last + 1).astype(u32),
                        (sxmax - last).astype(u32))
        esc = jnp.where(neg, d.astype(i32) - sxmax - 1,
                        sxmax - d.astype(i32))
        return jnp.where(half <= lim, last + zig.astype(i32), esc)

    step = step_signed if signed_path else step_unsigned
    sdt = i32 if signed_path else u32

    sblk = pl.program_id(1)

    @pl.when(sblk == 0)
    def _():
        carry[:] = jnp.zeros((1, Tr), u32)

    def byte(v, b):
        sh = 8 * ((bsz - 1 - b) if cfg.msb else b)
        return (v >> u32(sh)) & u32(0xFF)

    def slab(i, last):
        d = dT[pl.ds(i * J, J), :]  # [J, Tr]
        rows = []
        for rr in range(J):
            dr = d[rr:rr + 1, :]
            if cfg.preprocess:
                nxt = step(last, dr)
                first = (sblk == 0) & (i * J + rr == 0)
                nxt = jnp.where(first, refval(dr).astype(sdt), nxt)
            else:
                nxt = dr.astype(sdt)
            rows.append(nxt.astype(u32))
            last = nxt
        wrows = []
        for wr in range(WJ):
            word = jnp.zeros((1, Tr), u32)
            for ss in range(spw):
                v = rows[wr * spw + ss]
                for b in range(bsz):
                    word = word | (byte(v, b) << u32(8 * (ss * bsz + b)))
            wrows.append(word)
        wbuf[pl.ds(i * WJ, WJ), :] = jnp.concatenate(wrows, axis=0)
        return last

    last0 = carry[:].astype(sdt)
    lastN = jax.lax.fori_loop(0, SBLK // J, slab, last0)
    carry[:] = lastN.astype(u32)
    out_ref[:] = wbuf[:].T  # [SW, Tr] -> [Tr, SW]


@functools.lru_cache(maxsize=None)
def _build_call(cfg, n_rsi, Wf, interpret):
    rsi = cfg.rsi
    bs = cfg.block_size
    BSL = _pick_bsl(rsi)
    SW = (BSL * bs * cfg.bytes_per_sample) // 4
    kern = functools.partial(fused_tile_kernel, cfg=cfg, Tr=TR, BSL=BSL,
                             Wf=Wf)
    return pl.pallas_call(
        kern,
        # block slices innermost so the predictor carry chains per RSI
        grid=(n_rsi // TR, rsi // BSL),
        in_specs=[
            pl.BlockSpec((BSL, TR, Wf), lambda i, j: (j, i, 0)),
            pl.BlockSpec((BSL, TR), lambda i, j: (j, i)),
            pl.BlockSpec((BSL, TR), lambda i, j: (j, i)),
            pl.BlockSpec((BSL, TR), lambda i, j: (j, i)),
            pl.BlockSpec((BSL, TR), lambda i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((TR, SW), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(
            (n_rsi, (cfg.samples_per_rsi * cfg.bytes_per_sample) // 4),
            jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((1, TR), jnp.uint32),
            pltpu.VMEM((BSL * bs, TR), jnp.uint32),
            pltpu.VMEM((SW, TR), jnp.uint32),
        ],
        interpret=interpret,
    )


def fused_supported(cfg, n_rsi):
    """One-kernel decode covers the same configs as the two-kernel path
    (decode_pallas + unpredict_pallas fused swizzle) when the tile
    geometry divides: 128 RSIs per tile, a block-slice width dividing
    rsi, whole-word samples."""
    bs = cfg.block_size
    BSL = _pick_bsl(cfg.rsi)
    return (8 <= bs <= 64
            and cfg.bytes_per_sample in (1, 2, 4)
            and (J * cfg.bytes_per_sample) % 4 == 0
            and n_rsi % TR == 0
            and BSL is not None
            and (BSL * bs) % J == 0)


def decode_unpredict_swizzle_pallas(cfg, win, fs_bit, lsb_rel, meta,
                                    ref_sample, n_rsi, interpret=False):
    """win u32 [NB, Wf] + record vectors u32 [NB] (NB = n_rsi*rsi) ->
    packed little-endian u32 stream words [n_rsi, S*bsz/4] -- the final
    output bytes, no intermediate.  Wf may be the per-chunk bucketed
    width (decode.py); the kernel compiles per distinct Wf."""
    rsi = cfg.rsi
    Wf = win.shape[1]
    call = _build_call(cfg, n_rsi, Wf, interpret)
    # b-major pre-transposes (an XLA pass over the windows, ~Wf words per
    # block; the records are tiny) so every kernel tile slices cleanly
    rec = lambda a: a.reshape(n_rsi, rsi).T  # noqa: E731
    return call(
        jnp.transpose(win.reshape(n_rsi, rsi, Wf), (1, 0, 2)),
        rec(fs_bit), rec(lsb_rel), rec(meta), rec(ref_sample),
    )
