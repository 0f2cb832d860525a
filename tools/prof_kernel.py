"""Attribute time inside the fused Pallas encode kernel by building
variants with stages knocked out (bench config, real chip).

Usage: python tools/prof_kernel.py [n_reps]
"""
import functools
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
from libaec_tpu.encode import _jax_chunk_fn, worst_case_bits_per_block  # noqa: E402
from libaec_tpu.kernels import encode_pallas as EP  # noqa: E402
from libaec_tpu.ops import bitpack  # noqa: E402

CFG = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
CHUNK_RSIS = 512
S = CFG.samples_per_rsi
NB = CHUNK_RSIS * CFG.rsi
MIB = CHUNK_RSIS * S * 2 / (1 << 20)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 10

rz = REPO.parent / "reference" / "data" / "typical.rz"
status, out = native.decode(rz.read_bytes(), 1 << 20, CFG)
raw = out * ((CHUNK_RSIS * S * 2) // len(out))
x_np = np.frombuffer(raw, dtype=">u2").astype(np.uint32).reshape(
    CHUNK_RSIS, S)
x = jax.device_put(jnp.asarray(x_np))
np.asarray(x.ravel()[:1])


def sync(r):
    for leaf in jax.tree.leaves(r):
        np.asarray(jnp.ravel(leaf)[:1])
    return r


def timeit(name, fn, *args):
    """In-jit loop + slope timing (see tools/prof_loop.py): fn runs N / 3N
    times inside one fori_loop, with a scalar accumulator fed back into
    fn's k/bit scalar argument (when it accepts one) so XLA cannot hoist
    the body; the slope cancels the axon dispatch+sync constant."""
    import jax.numpy as _jnp

    def make(n):
        @jax.jit
        def run():
            def body(i, acc):
                r = fn(*args, dep=acc & _jnp.uint32(0))
                leaves = [_jnp.ravel(x) for x in jax.tree.leaves(r)]
                return acc + sum(leaf[-1].astype(_jnp.uint32)
                                 for leaf in leaves)

            return jax.lax.fori_loop(0, n, body, _jnp.uint32(0))

        return run

    fns = {n: make(n) for n in (N, 3 * N)}
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
    print(f"{name:34s} {best*1e3:8.2f} ms   {MIB/best:8.1f} MiB/s",
          flush=True)
    return fn(*args, dep=jnp.uint32(0))


# ---- full chunk (kernel + merge + scan) --------------------------------
fn = _jax_chunk_fn(CFG, CHUNK_RSIS, CFG.rsi)
timeit("full chunk fn", lambda dep: fn(x, dep.astype(jnp.int32), dep))

# ---- encode kernel alone ----------------------------------------------
win, bbits, kfin = timeit(
    "encode kernel",
    lambda dep: EP.encode_chunk_fields_pallas(CFG, x, dep.astype(jnp.int32)))

# ---- merge + scan alone ------------------------------------------------
worst = worst_case_bits_per_block(CFG)
local_words = (worst + 31) // 32 + 1
pgroup = 256
from libaec_tpu.backend import jax_backend  # noqa: E402
from libaec_tpu.kernels import merge_pallas as MP  # noqa: E402

B = jax_backend()
pg_out = MP.group_window_words(local_words, pgroup) + 1
pnwords = (NB * worst + 8) // 32 + pg_out + 2
win = jax.device_put(win)
bbits = jax.device_put(bbits)
timeit("merge+scan", lambda dep: bitpack.merge_block_windows_pallas(
    B, win, bbits + dep, 0, local_words, pnwords, pgroup))

gwin, glens = timeit("  merge tree only", lambda dep: MP.merge_to_groups_pallas(
    win, bbits + dep, local_words, pgroup))

# ---- kernel variants ----------------------------------------------------


def variant(name, **knock):
    kern_src = build_variant(**knock)
    timeit(name, lambda dep: kern_src(CFG, x, dep.astype(jnp.int32)))


def build_variant(no_pack=False, no_chain=False, no_fs=False, no_se=False,
                  no_zero=False):
    """Clone of encode_chunk_fields_pallas with stages replaced by cheap
    stand-ins (outputs stay live so nothing is DCE'd)."""

    def kernel(k0_ref, xt_ref, win_ref, bbits_ref, kfin_ref, kcarry,
               *, cfg, nbT, K_dom, W0):
        import jax as _jax
        u32, i32 = jnp.uint32, jnp.int32
        bs = cfg.block_size
        bps = cfg.bits_per_sample
        rsi = cfg.rsi
        id_len = cfg.id_len
        kmax = cfg.kmax
        from libaec_tpu.kernels.encode_pallas import (
            _cumsum_subl, _pair_less, _roll_lanes, _shift_down_subl,
            _shift_up_subl, _sum_u32, U32_MAX, KW)
        from jax.experimental import pallas as pl  # noqa: F401
        import jax.experimental.pallas as _pl

        @_pl.when(_pl.program_id(0) == 0)
        def _():
            kcarry[0] = k0_ref[0, 0]

        bps_mask = u32((1 << bps) - 1 if bps < 32 else U32_MAX)
        x = xt_ref[:].T
        lane = _jax.lax.broadcasted_iota(i32, (1, nbT), 1)
        sub = _jax.lax.broadcasted_iota(i32, (bs, nbT), 0)
        b_in_rsi = lane % rsi
        seg_off = b_in_rsi % 64

        prev_last = _roll_lanes(x[bs - 1:bs, :], 1)
        xprev = jnp.concatenate([prev_last, x[:bs - 1, :]], axis=0)
        xmax = u32(cfg.xmax)
        ge = x >= xprev
        D = jnp.where(ge, x - xprev, xprev - x)
        d_ge = jnp.where(D <= xprev, u32(2) * D, x)
        d_lt = jnp.where(D <= xmax - xprev, u32(2) * D - u32(1), xmax - x)
        d = jnp.where(ge, d_ge, d_lt)
        d = jnp.where((sub == 0) & (b_in_rsi == 0), u32(0), d)
        ref_lane = b_in_rsi == 0

        refu = ref_lane.astype(u32)
        this_bs = u32(bs) - refu
        ub = this_bs * u32(bps)

        refprop = x[0:1, :]
        s = 1
        while s < rsi:
            refprop = jnp.where((b_in_rsi & s) != 0,
                                _roll_lanes(refprop, s), refprop)
            s *= 2

        nz = jnp.sum((d != u32(0)).astype(i32), axis=0, keepdims=True)
        z = nz == 0
        if no_zero:
            zero_emit = jnp.zeros((1, nbT), bool)
            zero_fsval = jnp.zeros((1, nbT), u32)
            zero_ref = jnp.zeros((1, nbT), bool)
        else:
            seg_first = seg_off == 0
            seg_last = (seg_off == 63) | (b_in_rsi == rsi - 1)
            zi = z.astype(i32)
            zprev = jnp.where(b_in_rsi == 0, 0, _roll_lanes(zi, 1)) != 0
            znext = jnp.where(b_in_rsi == rsi - 1, 0,
                              _roll_lanes(zi, -1)) != 0
            run_start = z & (seg_first | ~zprev)
            run_end = z & (seg_last | ~znext)
            sval = jnp.where(run_start, b_in_rsi, i32(-1))
            s = 1
            while s < 64:
                sval = jnp.maximum(sval, jnp.where(
                    seg_off >= s, _roll_lanes(sval, s), i32(-1)))
                s *= 2
            n_run = b_in_rsi - sval + 1
            ros = run_end & seg_last & (n_run > 4)
            zero_fsval = jnp.where(
                ros, i32(4),
                jnp.where(n_run >= 5, n_run, n_run - 1)).astype(u32)
            zero_ref = run_end & (sval == 0)
            zero_emit = run_end

        if no_fs:
            Flo = jnp.broadcast_to(
                (jnp.arange(K_dom, dtype=u32) * 7 % 100)[:, None],
                (K_dom, nbT))
            Fhi = jnp.zeros((K_dom, nbT), u32)
        else:
            flo_rows = [_sum_u32(d >> u32(k)) for k in range(K_dom)]
            Flo = jnp.concatenate(flo_rows, axis=0)
            Fhi = jnp.zeros((K_dom, nbT), u32)
        kk = _jax.lax.broadcasted_iota(i32, (K_dom, nbT), 0)
        kku = kk.astype(u32)
        Llo = Flo + this_bs * (kku + u32(1))
        Lhi = Fhi + (Llo >> u32(16))
        Llo = Llo & u32(0xFFFF)

        Lhi1 = jnp.concatenate([Lhi[1:], Lhi[-1:]], axis=0)
        Llo1 = jnp.concatenate([Llo[1:], Llo[-1:]], axis=0)
        ge_next = ~_pair_less(Lhi1, Llo1, Lhi, Llo)
        A = (kk >= kmax) | ge_next
        up = jnp.where(A, kk, i32(KW))
        s = 1
        while s < K_dom:
            up = jnp.minimum(up, _shift_up_subl(up, s, fill=KW))
            s *= 2
        fs_small = (Fhi == u32(0)) & (Flo < this_bs)
        Lhim1 = jnp.concatenate([Lhi[:1], Lhi[:-1]], axis=0)
        Llom1 = jnp.concatenate([Llo[:1], Llo[:-1]], axis=0)
        prev_lt = _pair_less(Lhim1, Llom1, Lhi, Llo)
        C = (kk > 0) & fs_small & prev_lt
        cm = jnp.where(~C, kk, i32(-1))
        s = 1
        while s < K_dom:
            cm = jnp.maximum(cm, _shift_down_subl(cm, s, fill=-1))
            s *= 2
        cm_m1 = _shift_down_subl(cm, 1, fill=0)
        res_down = jnp.where(prev_lt, cm_m1, kk)
        cond_up = (kk == 0) | ~A
        f = jnp.clip(jnp.where(cond_up, up, res_down), 0, KW - 1)
        maps = jnp.where(z, kk, f)

        if no_chain:
            chosen = maps[2:3, :]
            k_final = chosen[0, nbT - 1]
        else:
            P = maps
            s = 1
            while s < nbT:
                Q = jnp.where(lane >= s, _roll_lanes(P, s), kk)
                acc = jnp.where(Q == 0, P[0:1, :], i32(0))
                for j in range(1, K_dom):
                    acc = jnp.where(Q == j, P[j:j + 1, :], acc)
                P = acc
                s *= 2
            k0v = kcarry[0]
            chosen = jnp.where(k0v == 0, P[0:1, :], i32(0))
            for j in range(1, K_dom):
                chosen = jnp.where(k0v == j, P[j:j + 1, :], chosen)
            k_final = chosen[0, nbT - 1]
            kcarry[0] = k_final
        kfin_ref[0, 0] = k_final

        sel = kk == chosen
        sLhi = _sum_u32(jnp.where(sel, Lhi, u32(0)))
        sLlo = _sum_u32(jnp.where(sel, Llo, u32(0)))
        split32 = (sLhi << u32(16)) + sLlo

        if no_se:
            se_len = jnp.full((1, nbT), u32(U32_MAX))
            fs_exact = d
            even = (sub & 1) == 0
        else:
            d_next = _shift_up_subl(d, 1)
            dsum = d + d_next
            even = (sub & 1) == 0
            small = (dsum >= d) & (dsum < u32(128))
            fs_exact = (dsum * (dsum + u32(1))) // u32(2) + d_next
            SAT = u32(1 << 20)
            fs = jnp.where(small, fs_exact, SAT)
            total = u32(1) + _sum_u32(jnp.where(even, fs + u32(1), u32(0)))
            se_len = jnp.where(total > ub, u32(U32_MAX), total)

        pick_split = (split32 < ub) & (split32 < se_len)
        pick_uncomp = ~(split32 < ub) & (ub <= se_len)
        active = ~z
        is_split = active & pick_split
        is_unc = active & ~pick_split & pick_uncomp
        is_se = active & ~pick_split & ~pick_uncomp

        ku = jnp.where(chosen > 0, chosen, 0).astype(u32)
        id_w = jnp.where(
            is_split | is_unc, u32(id_len),
            jnp.where(is_se | zero_emit, u32(id_len + 1), u32(0)))
        id_v = jnp.where(
            is_split, ku + u32(1),
            jnp.where(is_unc, u32((1 << id_len) - 1),
                      jnp.where(is_se, u32(1), u32(0))))
        ref_here = ((is_split | is_se) & ref_lane) | (zero_emit & zero_ref)
        ref_w = jnp.where(ref_here, u32(bps), u32(0))
        ref_v = jnp.where(ref_here, refprop & bps_mask, u32(0))

        sample_active = sub >= refu.astype(i32)
        split_fs_w = (d >> ku) + u32(1)
        unc_v = jnp.where((sub == 0) & ref_lane, refprop, d) & bps_mask
        se_w_full = jnp.where(even, fs_exact + u32(1), u32(0))

        mid_w = jnp.where(
            is_split & sample_active, split_fs_w,
            jnp.where(is_unc, u32(bps),
                      jnp.where(is_se, se_w_full, u32(0))))
        mid_v = jnp.where(
            is_split & sample_active, u32(1),
            jnp.where(is_unc, unc_v,
                      jnp.where(is_se & (se_w_full > 0), u32(1), u32(0))))
        zslot = (sub == 0) & zero_emit
        mid_w = jnp.where(zslot, zero_fsval + u32(1), mid_w)
        mid_v = jnp.where(zslot, u32(1), mid_v)

        kmask = jnp.where(ku > 0, (u32(1) << ku) - u32(1), u32(0))
        lsb_on = is_split & sample_active & (ku > 0)
        lsb_w = jnp.where(lsb_on, ku, u32(0))
        lsb_v = jnp.where(lsb_on, d & kmask, u32(0))

        e_h0 = id_w + u32(32)
        e_h1 = e_h0 + ref_w
        cum_mid = _cumsum_subl(mid_w, bs)
        e_mid = cum_mid + e_h1
        mid_total = e_mid[bs - 1:bs, :]
        cum_lsb = _cumsum_subl(lsb_w, bs)
        e_lsb = cum_lsb + mid_total
        block_bits = e_lsb[bs - 1:bs, :] - u32(32)
        bbits_ref[0:1, :] = block_bits

        if no_pack:
            win_ref[:] = jnp.broadcast_to(
                (e_lsb[0:1, :] + mid_v[0:1, :] + lsb_v[0:1, :]
                 + id_v + ref_v).T, (nbT, W0))
            return

        def contribs(e, v):
            t = e & u32(31)
            i1 = (e >> u32(5)) - u32(1)
            i2 = e >> u32(5)
            c1 = v >> t
            c2 = jnp.where(t == 0, u32(0), v << ((u32(32) - t) & u32(31)))
            return i1, c1, i2, c2

        h0 = contribs(e_h0, id_v)
        h1 = contribs(e_h1, ref_v)
        mi = contribs(e_mid, mid_v)
        ls = contribs(e_lsb, lsb_v)

        rows = []
        for w in range(W0):
            wv = u32(w)
            acc = jnp.zeros((1, nbT), u32)
            for i1, c1, i2, c2 in (h0, h1):
                acc += jnp.where(i1 == wv, c1, u32(0))
                acc += jnp.where(i2 == wv, c2, u32(0))
            for i1, c1, i2, c2 in (mi, ls):
                acc += _sum_u32(jnp.where(i1 == wv, c1, u32(0)))
                acc += _sum_u32(jnp.where(i2 == wv, c2, u32(0)))
            rows.append(acc)
        win_ref[:] = jnp.concatenate(rows, axis=0).T

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def call_fn(cfg, xin, k_init):
        n_rsi = xin.shape[0]
        NBl = n_rsi * cfg.rsi
        R = EP._pick_tile_rsis(cfg, n_rsi)
        nbT = R * cfg.rsi
        n_tiles = NBl // nbT
        K_dom = cfg.kmax + 1
        worstl = worst_case_bits_per_block(cfg)
        lw = (worstl + 31) // 32 + 1
        W0 = lw + 1
        kern = functools.partial(kernel, cfg=cfg, nbT=nbT, K_dom=K_dom,
                                 W0=W0)
        call = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((nbT, cfg.block_size), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nbT, W0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nbT), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NBl, W0), jnp.uint32),
                jax.ShapeDtypeStruct((1, NBl), jnp.uint32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )
        xt = xin.reshape(NBl, cfg.block_size)
        k0 = jnp.asarray(k_init, jnp.int32).reshape(1, 1)
        return call(k0, xt)

    return call_fn


variant("variant: baseline clone")
variant("variant: no_pack", no_pack=True)
variant("variant: no_chain", no_chain=True)
variant("variant: no_fs", no_fs=True)
variant("variant: no_se", no_se=True)
variant("variant: no_zero", no_zero=True)
variant("variant: pack+chain out", no_pack=True, no_chain=True)
