"""Pallas inverse-predictor scan: RSIs on lanes, samples on sublanes.

The inverse of the unit-delay predictor (decode.c:67-141) is a true
sequential recurrence over each RSI's samples.  The XLA `lax.scan`
formulation pays while-loop overhead per step -- ~10 ms for a 16 MiB chunk
(16384 steps) no matter how many RSIs ride the lanes.  Here the whole
recurrence runs inside one kernel: deltas arrive transposed [S, n_rsi], a
fori_loop walks sample slabs of J rows (one dynamic-sliced [J, Tr] load and
store per slab, J statically-unrolled row updates between), and the carry
lives in registers.  Step cost drops to plain VPU latency.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

J = 8  # sample rows per slab (one native sublane tile)


def unpredict_tile_kernel(d_ref, out_ref, carry, *, cfg, Sblk, Tr):
    u32, i32 = jnp.uint32, jnp.int32
    bps = cfg.bits_per_sample
    xmax = u32(cfg.xmax)
    signed_path = cfg.xmin != 0  # decode.c:91,111 branch on xmin == 0
    med = u32(cfg.xmax // 2 + 1)
    # signed-path only; as a two's-complement i32 (xmax < 2^31 there)
    sxmax = i32(cfg.xmax - (1 << 32) if cfg.xmax >= (1 << 31) else cfg.xmax)

    def refval(raw):
        if cfg.signed:
            m = u32((1 << (bps - 1)) & 0xFFFFFFFF)
            return (raw ^ m) - m  # sign-extend (decode.c:80-85)
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

    sblk = pl.program_id(1)  # sample-block index: innermost grid dim

    @pl.when(sblk == 0)
    def _():
        carry[:] = jnp.zeros((1, Tr), u32)

    def slab(i, last):
        d = d_ref[pl.ds(i * J, J), :]  # [J, Tr]
        rows = []
        for r in range(J):
            dr = d[r:r + 1, :]
            nxt = step(last, dr)
            # row 0 of the RSI is the raw reference sample; the select
            # fully overrides the (stale) carry there
            first = (sblk == 0) & (i * J + r == 0)
            nxt = jnp.where(first, refval(dr).astype(sdt), nxt)
            rows.append(nxt)
            last = nxt
        out_ref[pl.ds(i * J, J), :] = \
            jnp.concatenate(rows, axis=0).astype(u32)
        return last

    last0 = carry[:].astype(sdt)
    lastN = jax.lax.fori_loop(0, Sblk // J, slab, last0)
    carry[:] = lastN.astype(u32)


def unpredict_swizzle_tile_kernel(d_ref, out_ref, carry, dT, wbuf,
                                  *, cfg, Sblk, Tr):
    """Fused inverse-predictor + byte-layout kernel in natural layout.

    The plain kernel needs its input pre-transposed to [S, n_rsi] and its
    output transposed back, and the byte swizzle is a separate XLA pass --
    three HBM relayouts that together cost ~9 ms per 16 MiB chunk vs
    ~1.3 ms for the entire entropy parse.  Here the input tile arrives in
    the natural [Tr, Sblk] layout, is transposed once in VMEM, the scan
    runs over sample slabs, each slab's rows are byte-swizzled in registers
    (put_* semantics, decode.c:144-189) into packed output stream words,
    and the word buffer is transposed back in VMEM: the kernel's output IS
    the final byte stream (viewed as u32 words), with no XLA relayouts.
    """
    u32, i32 = jnp.uint32, jnp.int32
    bps = cfg.bits_per_sample
    bsz = cfg.bytes_per_sample
    spw = 4 // bsz  # samples per output word
    WJ = (J * bsz) // 4  # word rows per slab
    xmax = u32(cfg.xmax)
    signed_path = cfg.preprocess and cfg.xmin != 0
    med = u32(cfg.xmax // 2 + 1)
    sxmax = i32(cfg.xmax - (1 << 32) if cfg.xmax >= (1 << 31) else cfg.xmax)

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

    dT[:] = d_ref[:].T  # one in-VMEM transpose: [Tr, Sblk] -> [Sblk, Tr]

    def byte(v, b):  # b-th stream byte of a sample, as u32 in [0, 255]
        sh = 8 * ((bsz - 1 - b) if cfg.msb else b)
        return (v >> u32(sh)) & u32(0xFF)

    def slab(i, last):
        d = dT[pl.ds(i * J, J), :]  # [J, Tr]
        rows = []
        for r in range(J):
            dr = d[r:r + 1, :]
            if cfg.preprocess:
                nxt = step(last, dr)
                first = (sblk == 0) & (i * J + r == 0)
                nxt = jnp.where(first, refval(dr).astype(sdt), nxt)
            else:
                nxt = dr.astype(sdt)
            rows.append(nxt.astype(u32))
            last = nxt
        wrows = []
        for wr in range(WJ):
            word = jnp.zeros((1, Tr), u32)
            for s in range(spw):
                v = rows[wr * spw + s]
                for b in range(bsz):
                    word = word | (byte(v, b) << u32(8 * (s * bsz + b)))
            wrows.append(word)
        wbuf[pl.ds(i * WJ, WJ), :] = jnp.concatenate(wrows, axis=0)
        return last

    last0 = carry[:].astype(sdt)
    lastN = jax.lax.fori_loop(0, Sblk // J, slab, last0)
    carry[:] = lastN.astype(u32)
    out_ref[:] = wbuf[:].T  # [Sblk*bsz/4, Tr] -> [Tr, Sblk*bsz/4]


@functools.lru_cache(maxsize=None)
def _build_fused_call(cfg, S, n_rsi, Tr, interpret):
    Sblk = _tile_rows(S)
    SW = (Sblk * cfg.bytes_per_sample) // 4
    kern = functools.partial(unpredict_swizzle_tile_kernel, cfg=cfg,
                             Sblk=Sblk, Tr=Tr)
    return pl.pallas_call(
        kern,
        # sample blocks innermost so the carry chains within each RSI tile
        grid=(n_rsi // Tr, S // Sblk),
        in_specs=[pl.BlockSpec((Tr, Sblk), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((Tr, SW), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(
            (n_rsi, (S * cfg.bytes_per_sample) // 4), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((1, Tr), jnp.uint32),
            pltpu.VMEM((Sblk, Tr), jnp.uint32),
            pltpu.VMEM((SW, Tr), jnp.uint32),
        ],
        interpret=interpret,
    )


def fused_supported(cfg, n_rsi):
    """The fused unpredict+swizzle kernel covers whole-word sample widths;
    3-byte samples (4 samples -> 3 words) keep the split path."""
    return (cfg.bytes_per_sample in (1, 2, 4)
            and (J * cfg.bytes_per_sample) % 4 == 0
            and kernel_supported(cfg, n_rsi))


def unpredict_swizzle_rsis_pallas(cfg, deltas, interpret=False):
    """deltas u32 [n_rsi, S] (natural layout) -> packed little-endian u32
    stream words [n_rsi, S*bsz/4]: row r is RSI r's output bytes."""
    n_rsi, S = deltas.shape
    Tr = _tile_lanes(n_rsi)
    call = _build_fused_call(cfg, S, n_rsi, Tr, interpret)
    return call(deltas)


def _tile_lanes(n_rsi):
    for t in (128, 64, 32, 16, 8):
        if n_rsi % t == 0:
            return t
    return None


def _tile_rows(S):
    d = S
    while d > 2048 and d % 2 == 0:
        d //= 2
    return d


@functools.lru_cache(maxsize=None)
def _build_call(cfg, S, n_rsi, Tr, interpret):
    Sblk = _tile_rows(S)
    kern = functools.partial(unpredict_tile_kernel, cfg=cfg, Sblk=Sblk,
                             Tr=Tr)
    return pl.pallas_call(
        kern,
        # sample blocks innermost so the carry chains within each RSI tile
        grid=(n_rsi // Tr, S // Sblk),
        in_specs=[pl.BlockSpec((Sblk, Tr), lambda i, j: (j, i))],
        out_specs=pl.BlockSpec((Sblk, Tr), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((S, n_rsi), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((1, Tr), jnp.uint32)],
        interpret=interpret,
    )


def kernel_supported(cfg, n_rsi):
    S = cfg.samples_per_rsi
    Sblk = _tile_rows(S)
    return (S % J == 0 and Sblk % J == 0 and _tile_lanes(n_rsi) is not None
            and Sblk * 128 * 4 <= (4 << 20))


def unpredict_rsis_pallas(cfg, deltas, interpret=False):
    """deltas u32 [n_rsi, S] -> samples u32 [n_rsi, S]."""
    if not cfg.preprocess:
        return deltas
    n_rsi, S = deltas.shape
    Tr = _tile_lanes(n_rsi)
    call = _build_call(cfg, S, n_rsi, Tr, interpret)
    return call(deltas.T).T
