"""Fused Pallas encode kernel: samples -> per-block packed bit windows.

One kernel pass fuses the entire per-block encode pipeline that the XLA path
spreads over ~10 HBM round-trips (ops/preprocess.py, ops/options.py,
ops/zeroruns.py, ops/fields.py and stage A of ops/bitpack.py):

  raw u32 samples (transposed [block_size, NB])
    -> unit-delay predictor / sign mapper     (encode.c:235-311 semantics)
    -> fs-length tables for all k             (block_fs, encode.c:313-327)
    -> warm-start k maps                      (assess_splitting_option,
                                               encode.c:329-410)
    -> the k warm-start chain as a parallel prefix of map compositions
       (the TPU grid is sequential, so the scalar carry crosses tiles
       in SMEM scratch)
    -> second-extension / zero-run / option select (encode.c:412-434,
                                               565-659, 585-612)
    -> bit-field expansion + per-block local pack (emit* equivalents,
                                               encode.c:61-233)
  -> outputs: win u32 [W0, NB] per-block windows, block_bits u32 [1, NB],
     k_final i32 -- ops/bitpack.merge_block_windows assembles the stream.

Layout: samples on sublanes (block_size rows), blocks on lanes.  Each grid
step processes R whole RSIs (nbT = R*rsi lanes); RSI and 64-block-segment
structure is static per lane, so all zero-run / reference-sample
propagation uses static masks with log-step lane rolls.

Everything is uint32/int32 VPU arithmetic, including the k warm-start
chain (state->k, encode.c:369): per-lane walk maps compose associatively,
so the chain is an inclusive parallel prefix over lanes (log2(nbT)
doubling steps of K_dom vector selects) with only a per-tile scalar carry
in SMEM.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import KW

U32_MAX = 0xFFFFFFFF


def _pair_less(h1, l1, h2, l2):
    return (h1 < h2) | ((h1 == h2) & (l1 < l2))


def _roll_lanes(v, shift):
    """Circular roll along the lane (last) axis by a static shift."""
    n = v.shape[-1]
    return pltpu.roll(v, shift % n, axis=v.ndim - 1)


def _shift_down_subl(v, s, fill=0):
    """Shift rows down by s (row i <- row i-s), filling the top with
    `fill`."""
    top = jnp.full((s,) + v.shape[1:], fill, v.dtype)
    return jnp.concatenate([top, v[:-s]], axis=0)


def _shift_up_subl(v, s, fill=0):
    bot = jnp.full((s,) + v.shape[1:], fill, v.dtype)
    return jnp.concatenate([v[s:], bot], axis=0)


def _sum_u32(v, axis=0):
    """Sum a u32 array in i32 (Mosaic lacks unsigned reductions; two's
    complement addition is bit-identical) and bitcast the result back."""
    return jnp.sum(v.astype(jnp.int32), axis=axis,
                   keepdims=True).astype(jnp.uint32)


def _cumsum_subl(v, n):
    """Inclusive cumsum along the sublane axis via log-doubling."""
    s = 1
    while s < n:
        v = v + _shift_down_subl(v, s)
        s *= 2
    return v


def encode_tile_kernel(
    # prefetch-style scalar input
    k0_ref,
    # tensor input
    xt_ref,
    # outputs
    win_ref, bbits_ref, kfin_ref,
    # scratch
    kcarry,
    *, cfg, nbT, K_dom, W0, Wout,
):
    u32, i32 = jnp.uint32, jnp.int32
    bs = cfg.block_size
    bps = cfg.bits_per_sample
    rsi = cfg.rsi
    id_len = cfg.id_len
    kmax = cfg.kmax
    pp = cfg.preprocess
    bps_mask = u32((1 << bps) - 1 if bps < 32 else U32_MAX)

    @pl.when(pl.program_id(0) == 0)
    def _():
        kcarry[0] = k0_ref[0, 0]

    # input arrives in natural [blocks, samples] row layout; the
    # samples-on-sublanes transpose happens here in VMEM, saving the HBM
    # round trip of a separate XLA transpose.  Masking to bits_per_sample
    # mirrors the ingest masking of every other backend (Config.mask) for
    # callers that hand raw u32 arrays straight to the kernel.
    x = xt_ref[:].T & bps_mask  # u32 [bs, nbT]

    lane = jax.lax.broadcasted_iota(i32, (1, nbT), 1)
    sub = jax.lax.broadcasted_iota(i32, (bs, nbT), 0)
    b_in_rsi = lane % rsi          # static per lane (tiles are whole RSIs)
    seg_off = b_in_rsi % 64

    # ---- preprocessor (encode.c:235-311) ---------------------------------
    if pp:
        prev_last = _roll_lanes(x[bs - 1:bs, :], 1)
        xprev = jnp.concatenate([prev_last, x[:bs - 1, :]], axis=0)
        if cfg.signed:
            m = u32((1 << (bps - 1)) & U32_MAX)
            sx = ((x ^ m) - m).astype(i32)
            sxp = ((xprev ^ m) - m).astype(i32)
            sxmax = jnp.asarray(cfg.xmax, u32).astype(i32)
            sxmin = jnp.asarray(cfg.xmin, u32).astype(i32)
            lt = sx < sxp
            D = jnp.where(lt, sxp - sx, sx - sxp).astype(u32)
            d_lt = jnp.where(D <= (sxmax - sxp).astype(u32),
                             u32(2) * D - u32(1), (sxmax - sx).astype(u32))
            d_ge = jnp.where(D <= (sxp - sxmin).astype(u32),
                             u32(2) * D, (sx - sxmin).astype(u32))
            d = jnp.where(lt, d_lt, d_ge)
        else:
            xmax = u32(cfg.xmax)
            ge = x >= xprev
            D = jnp.where(ge, x - xprev, xprev - x)
            d_ge = jnp.where(D <= xprev, u32(2) * D, x)
            d_lt = jnp.where(D <= xmax - xprev, u32(2) * D - u32(1),
                             xmax - x)
            d = jnp.where(ge, d_ge, d_lt)
        # first sample of each RSI is the reference; d := 0 there
        d = jnp.where((sub == 0) & (b_in_rsi == 0), u32(0), d)
        ref_lane = b_in_rsi == 0                       # static
    else:
        d = x
        ref_lane = jnp.zeros((1, nbT), bool)

    refu = ref_lane.astype(u32)
    this_bs = u32(bs) - refu                           # [1, nbT]
    ub = this_bs * u32(bps)

    # reference-sample propagation: lane b receives x[0] of its RSI start.
    # b_in_rsi is static, so each doubling step uses a static select mask.
    refprop = x[0:1, :]
    if pp:
        s = 1
        while s < rsi:
            refprop = jnp.where((b_in_rsi & s) != 0,
                                _roll_lanes(refprop, s), refprop)
            s *= 2

    # ---- zero-block runs (m_check_zero_block, encode.c:614-659) ----------
    nz = jnp.sum((d != u32(0)).astype(i32), axis=0, keepdims=True)
    z = nz == 0                                        # [1, nbT]
    seg_first = seg_off == 0
    seg_last = (seg_off == 63) | (b_in_rsi == rsi - 1)
    # roll i32, not i1: Mosaic has no dynamic_rotate for bool vectors
    zi = z.astype(i32)
    zprev = jnp.where(b_in_rsi == 0, 0, _roll_lanes(zi, 1)) != 0
    znext = jnp.where(b_in_rsi == rsi - 1, 0, _roll_lanes(zi, -1)) != 0
    run_start = z & (seg_first | ~zprev)
    run_end = z & (seg_last | ~znext)
    sval = jnp.where(run_start, b_in_rsi, i32(-1))
    s = 1
    while s < 64:
        sval = jnp.maximum(
            sval, jnp.where(seg_off >= s, _roll_lanes(sval, s), i32(-1)))
        s *= 2
    n_run = b_in_rsi - sval + 1
    ros = run_end & seg_last & (n_run > 4)
    zero_fsval = jnp.where(
        ros, i32(4), jnp.where(n_run >= 5, n_run, n_run - 1)).astype(u32)
    zero_ref = run_end & (sval == 0) if pp else jnp.zeros((1, nbT), bool)
    zero_emit = run_end

    # ---- fs tables + candidate lengths (encode.c:313-410) ----------------
    if bps <= 16:
        # mapped deltas fit 16 bits: every high-half sum is zero, so the
        # 32-bit (hi, lo) split degenerates to the plain sums (which fit:
        # 64 samples x 16 bits < 2^22)
        flo_rows = [_sum_u32(d >> u32(k)) for k in range(K_dom)]
        Flo = jnp.concatenate(flo_rows, axis=0)        # [K_dom, nbT]
        Fhi = jnp.zeros((K_dom, nbT), u32)
    else:
        d_hi = d >> u32(16)
        fhi_rows, flo_rows = [], []
        for k in range(K_dom):
            ku = u32(k)
            fhi_rows.append(_sum_u32(d_hi >> ku))
            flo_rows.append(_sum_u32((d >> ku) & u32(0xFFFF)))
        Fhi = jnp.concatenate(fhi_rows, axis=0)        # [K_dom, nbT]
        Flo = jnp.concatenate(flo_rows, axis=0)
    kk = jax.lax.broadcasted_iota(i32, (K_dom, nbT), 0)
    kku = kk.astype(u32)
    Llo = Flo + this_bs * (kku + u32(1))
    Lhi = Fhi + (Llo >> u32(16))
    Llo = Llo & u32(0xFFFF)

    # ---- warm-start walk as a map over incoming k (encode.c:356-409) -----
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
    maps = jnp.where(z, kk, f)  # zero blocks skip the search: identity

    # ---- the sequential k chain (state->k, encode.c:369) -----------------
    # Map composition is associative, so the per-lane walk maps fold into an
    # inclusive parallel prefix (Hillis-Steele over lanes): after the scan,
    # P[:, l] = m_l ∘ ... ∘ m_0 and chosen_k[l] = P[k_in, l].  Each
    # composition P_l[Q_l[k]] is K_dom selects -- all VPU work, no serial
    # scalar loop.
    P = maps
    s = 1
    while s < nbT:
        Q = jnp.where(lane >= s, _roll_lanes(P, s), kk)  # P_{l-s}; id below s
        acc = jnp.where(Q == 0, P[0:1, :], i32(0))
        for j in range(1, K_dom):
            acc = jnp.where(Q == j, P[j:j + 1, :], acc)
        P = acc
        s *= 2

    k0v = kcarry[0]
    chosen = jnp.where(k0v == 0, P[0:1, :], i32(0))     # [1, nbT]
    for j in range(1, K_dom):
        chosen = jnp.where(k0v == j, P[j:j + 1, :], chosen)
    k_final = chosen[0, nbT - 1]
    kcarry[0] = k_final
    kfin_ref[0, 0] = k_final

    # split length at the chosen k, truncated to u32 (encode.c:409)
    sel = kk == chosen
    sLhi = _sum_u32(jnp.where(sel, Lhi, u32(0)))
    sLlo = _sum_u32(jnp.where(sel, Llo, u32(0)))
    split32 = (sLhi << u32(16)) + sLlo

    # ---- second extension (assess_se_option, encode.c:412-434) -----------
    d_next = _shift_up_subl(d, 1)
    dsum = d + d_next
    even = (sub & 1) == 0
    small = (dsum >= d) & (dsum < u32(128))
    fs_exact = (dsum * (dsum + u32(1))) // u32(2) + d_next
    SAT = u32(1 << 20)
    fs = jnp.where(small, fs_exact, SAT)
    total = u32(1) + _sum_u32(jnp.where(even, fs + u32(1), u32(0)))
    se_len = jnp.where(total > ub, u32(U32_MAX), total)

    # ---- option select (m_select_code_option, encode.c:585-612) ----------
    pick_split = (split32 < ub) & (split32 < se_len)
    pick_uncomp = ~(split32 < ub) & (ub <= se_len)
    active = ~z
    is_split = active & pick_split
    is_unc = active & ~pick_split & pick_uncomp
    is_se = active & ~pick_split & ~pick_uncomp

    # ---- bit fields (ops/fields.py semantics; encode.c:520-583) ----------
    ku = jnp.where(chosen > 0, chosen, 0).astype(u32)  # [1, nbT]
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

    # ---- local pack into the per-block window (bitpack stage A) ----------
    e_h0 = id_w + u32(32)
    e_h1 = e_h0 + ref_w
    cum_mid = _cumsum_subl(mid_w, bs)
    e_mid = cum_mid + e_h1
    mid_total = e_mid[bs - 1:bs, :]
    cum_lsb = _cumsum_subl(lsb_w, bs)
    e_lsb = cum_lsb + mid_total
    block_bits = e_lsb[bs - 1:bs, :] - u32(32)
    bbits_ref[0:1, :] = block_bits

    def contribs(e, v):
        t = e & u32(31)
        i1 = (e >> u32(5)) - u32(1)
        i2 = e >> u32(5)
        c1 = v >> t
        c2 = jnp.where(t == 0, u32(0), v << ((u32(32) - t) & u32(31)))
        return i1, c1, i2, c2

    h0 = contribs(e_h0, id_v)
    h1 = contribs(e_h1, ref_v)

    if bs & (bs - 1) == 0:
        # == restructured pack (the measured hot spot of the kernel) =====
        # Three contribution classes with cheap structure instead of the
        # generic two-words-per-field compare-sum over every window word:
        #   1. header (id + reference sample): ends within word 2;
        #   2. FS region: split/SE/zero mid fields are unary codes -- a
        #      single set bit at the field end -- so each row contributes
        #      ONE word, halving the masked reduces; uncompressed payloads
        #      leave this class entirely;
        #   3. LSB planes and uncompressed payloads: per-block UNIFORM
        #      kb-bit fields (kb = k or bits_per_sample), packed by a
        #      log2(bs)-level tree over sublanes where every level's shift
        #      amounts are per-lane elementwise values -- no per-word
        #      compare-sums at all.
        hdr = []
        for w in range(3):
            wv = u32(w)
            acc = jnp.zeros((1, nbT), u32)
            for i1, c1, i2, c2 in (h0, h1):
                acc += jnp.where(i1 == wv, c1, u32(0))
                acc += jnp.where(i2 == wv, c2, u32(0))
            hdr.append(acc)

        p = e_mid - u32(1)
        pw = (p >> u32(5)).astype(i32)
        cbm = jnp.where((mid_w > u32(0)) & (mid_v == u32(1)) & ~is_unc,
                        u32(1) << (u32(31) - (p & u32(31))), u32(0))
        rows = []
        for w in range(W0):
            acc = hdr[w] if w < 3 else jnp.zeros((1, nbT), u32)
            rows.append(acc + _sum_u32(jnp.where(pw == w, cbm, u32(0))))
        window = jnp.concatenate(rows, axis=0)           # [W0, nbT]

        # uniform-width region: kb bits per field, 64 fields per block.
        # For a ref'd split block the real fields are rows 1..bs-1; the
        # tree packs bs fields, so values shift up one row and a phantom
        # zero field trails the region -- kb extra zero bits that stay
        # within the window slack and beyond block_bits, harmless to the
        # tree merge (they add zeros).
        kb = jnp.where(is_unc, u32(bps), jnp.where(is_split, ku, u32(0)))
        Vt = jnp.where(is_unc, unc_v,
                       jnp.where(ref_lane, _shift_up_subl(lsb_v, 1), lsb_v))
        A = jnp.where(kb == u32(0), u32(0),
                      Vt << ((u32(32) - kb) & u32(31)))  # MSB-aligned
        # tree invariant: nodes of 2^l fields anchored every 2^l rows,
        # content words at rows anchor..anchor+ceil(2^l*kb/32)-1, zeros
        # elsewhere.  Each merge gathers the right sibling (one sublane
        # shift), zeroes its garbage, funnel-shifts by the left length's
        # sub-word bits and places it with a log-decomposed row shift.
        for lv in range(bs.bit_length() - 1):
            sig = 1 << lv
            L = kb * u32(sig)                 # left-node bit length
            o = (L >> u32(5)).astype(i32)
            tq = L & u32(31)
            wr = ((L + u32(31)) >> u32(5)).astype(i32)
            t_rel = sub & (2 * sig - 1)
            R = _shift_up_subl(A, sig)
            R = jnp.where(t_rel < wr, R, u32(0))
            prevR = jnp.where(t_rel == 0, u32(0), _shift_down_subl(R, 1))
            rs = (R >> tq) | jnp.where(
                tq == u32(0), u32(0),
                prevR << ((u32(32) - tq) & u32(31)))
            for b in range(lv + 1):
                shifted = _shift_down_subl(rs, 1 << b)
                rs = jnp.where(((o >> b) & 1) != 0, shifted, rs)
            A = jnp.where(t_rel < sig, A, u32(0)) + rs

        # place the packed region at its window bit offset
        if W0 > bs:
            A = jnp.concatenate([A, jnp.zeros((W0 - bs, nbT), u32)], axis=0)
        else:
            A = A[:W0]
        base = jnp.where(is_unc, e_h0, mid_total)        # [1, nbT]
        tb = base & u32(31)
        q = (base >> u32(5)).astype(i32)
        wrow = jax.lax.broadcasted_iota(i32, (W0, nbT), 0)
        prevA = jnp.where(wrow == 0, u32(0), _shift_down_subl(A, 1))
        As = (A >> tb) | jnp.where(
            tb == u32(0), u32(0), prevA << ((u32(32) - tb) & u32(31)))
        b = 0
        while (1 << b) < W0:
            shifted = _shift_down_subl(As, 1 << b)
            As = jnp.where(((q >> b) & 1) != 0, shifted, As)
            b += 1
        window = window + As
        rows = [window]
    else:
        # generic path (NOT_ENFORCE non-power-of-two block sizes)
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
    if Wout > W0:
        # zero-pad to the merge kernel's pair-pre-pack width (64) here, so
        # the XLA pad pass between the kernels disappears: [NB, 64] reshapes
        # for free into the [NB/2, 128] paired rows merge_pallas consumes
        rows.append(jnp.zeros((Wout - W0, nbT), u32))
    # write block-major windows (what the merge kernel consumes) directly:
    # one VMEM transpose instead of an XLA one through HBM
    win_ref[:] = jnp.concatenate(rows, axis=0).T


def _pick_tile_rsis(cfg, n_rsi):
    """Largest R <= n_rsi with R*rsi lanes a multiple of 128 and ~1024
    lanes per tile; None if no whole-RSI tiling divides n_rsi."""
    rsi = cfg.rsi
    best = None
    R = 1
    while R <= n_rsi:
        nbT = R * rsi
        if n_rsi % R == 0 and nbT % 128 == 0:
            best = R
            if nbT >= 1024:
                break
        R += 1
        if R * rsi > (1 << 16):
            break
    return best


def kernel_supported(cfg, n_rsi):
    if cfg.id_len <= 1:
        return False  # splitting disabled; XLA path handles it
    if cfg.block_size < 8 or cfg.block_size > 64:
        return False
    if cfg.pad_rsi:
        return False  # per-RSI byte padding handled by the XLA field path
    return _pick_tile_rsis(cfg, n_rsi) is not None


@functools.lru_cache(maxsize=None)
def _build_call(cfg, n_rsi, interpret):
    from ..encode import worst_case_bits_per_block

    bs = cfg.block_size
    NB = n_rsi * cfg.rsi
    R = _pick_tile_rsis(cfg, n_rsi)
    nbT = R * cfg.rsi
    n_tiles = NB // nbT
    K_dom = cfg.kmax + 1
    worst = worst_case_bits_per_block(cfg)
    local_words = (worst + 31) // 32 + 1
    W0 = local_words + 1
    # pad the output windows to the merge kernel's pair-pre-pack width when
    # it applies (merge_pallas prepack: W0 <= 64), saving the XLA pad pass
    Wout = 64 if W0 <= 64 else W0

    kern = functools.partial(encode_tile_kernel, cfg=cfg, nbT=nbT,
                             K_dom=K_dom, W0=W0, Wout=Wout)
    call = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nbT, bs), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nbT, Wout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, Wout), jnp.uint32),
            jax.ShapeDtypeStruct((1, NB), jnp.uint32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )
    return call, W0, local_words


def encode_chunk_fields_pallas(cfg, x, k_init, interpret=False):
    """x: u32 [n_rsi, S] -> (win u32 [NB, Wout], block_bits u32 [NB],
    k_final i32 scalar); Wout is 64 (pair-pre-pack width, zero-padded
    beyond the W0 payload words) when W0 <= 64, else W0.  Jit-traceable."""
    n_rsi = x.shape[0]
    NB = n_rsi * cfg.rsi
    call, W0, local_words = _build_call(cfg, n_rsi, interpret)
    xt = x.reshape(NB, cfg.block_size)
    k0 = jnp.asarray(k_init, jnp.int32).reshape(1, 1)
    win, bbits, kfin = call(k0, xt)
    return win, bbits[0], kfin[0, 0]
