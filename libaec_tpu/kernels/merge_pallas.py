"""Pallas tree-merge kernel: per-block bit windows -> per-group windows.

Stage B of the grouped bit packer (ops/bitpack.py): at each level the right
sibling's window is shifted right by the left sibling's exact bit length and
summed in.  The XLA version materialises every select/pad pass through HBM
(~50 full-array round trips for a 64-block group); here the whole tree for a
tile of groups runs in VMEM.

Layout: blocks on sublanes, window words on lanes, all widths kept at
multiples of 128 lanes so that the level-merge reshape ([R, W] ->
[R/2, 2W]) is a free relayout and sibling extraction is an *aligned* lane
slice (Mosaic rejects concats of offset-layout vectors).  The per-pair
bit/word shift amounts (left-sibling cumulative lengths) are precomputed in
XLA from the block bit lengths -- they are tiny [NB/2^l] arrays.

Two width optimisations keep the tree from paying for lane padding:

  * **pair pre-pack** (when the block window fits 64 words): input windows
    are padded to 64 words and two sibling blocks share one 128-lane row;
    level 0 merges them in place with a half-row lane roll instead of the
    row-pair reshape, halving the rows of every subsequent level.  Without
    this, a 35-word window pads to 128 lanes and the whole tree carries
    3.7x dead width.
  * **level width caps**: after level l a node of 2^(l+1) blocks can hold
    at most 2^(l+1)*(local_words-1)+3 words, so the working width is
    clamped to that (rounded to a lane multiple) instead of doubling
    unconditionally.

Replaces the sequential carry of emit() (/root/reference/src/encode.c:61-83)
at group granularity; bit-exact with the XLA stage B by construction.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round128(n):
    return -(-n // 128) * 128


def group_window_words(local_words, group):
    """Words per merged group window (the kernel's output width): worst-case
    payload words per block x group + front pad word + slack, rounded to a
    lane multiple.  Exported so callers size their scan buffers from the
    same formula."""
    return _round128(group * (local_words - 1) + 3)


def _level_caps(local_words, group, prepack):
    """Static working width after each in-kernel level.  Entry i is the
    width of a node of `blocks_after_level_i` blocks, clamped so the final
    level equals group_window_words."""
    levels = group.bit_length() - 1
    caps = []
    start = 2 if prepack else 1
    nodes = start
    # standard (reshape) levels only; the prepack level is fixed at 128
    while nodes < group:
        nodes *= 2
        caps.append(group_window_words(local_words, nodes))
    return caps


# Rows-per-tile threshold for the per-row dynamic-roll word shifter (one
# wide pltpu.roll per row from an SMEM scalar, instead of the
# log-decomposition select chain's ~log2(max_o) wide passes per level).
# MEASURED SLOWER on v5e at 32 (tree 1.04 -> 1.23 ms for the bench
# chunk): Mosaic's dynamic lane rotate plus the [1, W] row concats cost
# more than the select chain saves.  Kept at 0 (disabled) for the
# record; the experiment is one constant away.
ROLL_MAX_ROWS = 0


def _merge_tile_kernel(*refs, levels, local_words, GWout, prepack, caps):
    win_ref = refs[0]
    o_refs = refs[1:1 + levels]
    sh_refs = refs[1 + levels:1 + 2 * levels]
    # SMEM copies of o ride along only when the roll experiment is on
    n_osm = levels if ROLL_MAX_ROWS else 0
    osm_refs = refs[1 + 2 * levels:1 + 2 * levels + n_osm]
    gwin_ref = refs[1 + 2 * levels + n_osm]

    u32 = jnp.uint32
    arr = win_ref[:]                       # [Rt(, /2), W0pad] u32

    lvl0 = 0
    if prepack and levels:
        # level 0 in place: each row holds the pair (left at lanes [0, 64),
        # right at [64, 128)); the right window rolls onto the left's lanes
        # and shifts by the left's exact bit length.  Rolled-in garbage
        # (the left window wrapping around) lands at lanes >= 64 + o and is
        # masked; real right-window content always stays below that.
        R, W = arr.shape                   # W == 128
        o = o_refs[0][0][:R]               # [R, 1] i32 word shift
        sh = sh_refs[0][0][:R].astype(u32)  # [R, 1] bit shift
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        rolled = pltpu.roll(arr, 64, axis=1)   # rolled[j] = arr[(j+64)%128]
        prev = jnp.pad(rolled, ((0, 0), (1, 0)))[:, :W]
        rb = (rolled >> sh) | jnp.where(
            sh == 0, u32(0), prev << ((u32(32) - sh) & u32(31)))
        b = 0
        while (1 << b) <= local_words - 1:
            s = 1 << b
            shifted = jnp.pad(rb, ((0, 0), (s, 0)))[:, :W]
            rb = jnp.where(((o >> b) & 1) != 0, shifted, rb)
            b += 1
        rb = jnp.where(lane < o + 64, rb, u32(0))
        arr = jnp.where(lane < 64, arr, u32(0)) + rb
        lvl0 = 1

    for i in range(levels - lvl0):
        R, W = arr.shape
        y = arr.reshape(R // 2, 2 * W)     # free relayout (W % 128 == 0)
        l_win = y[:, :W]
        r_win = y[:, W:]
        o = o_refs[lvl0 + i][0][:R // 2]        # [R/2, 1] i32 word shift
        sh = sh_refs[lvl0 + i][0][:R // 2].astype(u32)  # [R/2, 1] bit shift

        W_new = caps[i]                    # node-worst cap, >= W

        if R // 2 <= ROLL_MAX_ROWS:
            # few wide rows: funnel-shift vectorised, then ONE dynamic
            # lane roll per row (pltpu.roll with a scalar word shift from
            # SMEM) replaces the whole log-decomposition select chain --
            # the chain costs ~log2(max_o) wide passes regardless of row
            # count, the roll costs one wide pass per row
            rb = jnp.pad(r_win, ((0, 0), (0, W_new - W)))
            prev = jnp.pad(r_win, ((0, 0), (1, W_new - W)))[:, :W_new]
            rb = (rb >> sh) | jnp.where(
                sh == 0, u32(0), prev << ((u32(32) - sh) & u32(31)))
            osm = osm_refs[lvl0 + i]
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, W_new), 1)
            rows = []
            for r in range(R // 2):
                ow = osm[0, 0, r]          # scalar i32 word shift
                # pltpu.roll(x, q)[j] = x[(j - q) % n]: right-shift by q
                rolled = pltpu.roll(rb[r:r + 1, :], ow, axis=1)
                rows.append(jnp.where(lane1 < ow, u32(0), rolled))
            rb = jnp.concatenate(rows, axis=0) if len(rows) > 1 \
                else rows[0]
        else:
            # the right node's content is at most its own (smaller) cap
            # wide; funnel-shift at width min(W+1, W_new) and let the
            # width grow with the word shifts instead of paying W_new on
            # every pass -- the early (small) steps then run at roughly
            # half the final width.  Truncation to W_new is safe: right
            # content + funnel spill fits the right node's cap + 1 <=
            # W_new.
            rbW = min(W + 1, W_new)
            rb = jnp.pad(r_win, ((0, 0), (0, 1)))[:, :rbW]
            prev = jnp.pad(r_win, ((0, 0), (1, 0)))[:, :rbW]
            rb = (rb >> sh) | jnp.where(
                sh == 0, u32(0), prev << ((u32(32) - sh) & u32(31)))
            curW = rbW

            blocks_left = (1 << (i + 1)) if prepack else (1 << i)
            max_o = min(W_new, blocks_left * (local_words - 1))
            b = 0
            while (1 << b) <= max_o:
                s = 1 << b
                newW = min(W_new, curW + s)
                if newW > curW:
                    rb = jnp.pad(rb, ((0, 0), (0, newW - curW)))
                if s >= newW:
                    shifted = jnp.zeros_like(rb)
                else:
                    shifted = jnp.pad(rb, ((0, 0), (s, 0)))[:, :newW]
                bit = ((o >> b) & 1) != 0
                rb = jnp.where(bit, shifted, rb)
                curW = newW
                b += 1
            if curW < W_new:
                rb = jnp.pad(rb, ((0, 0), (0, W_new - curW)))

        arr = jnp.pad(l_win, ((0, 0), (0, W_new - W))) + rb

    gwin_ref[:] = arr[:, :GWout]


@functools.lru_cache(maxsize=None)
def _build_merge_call(NB, W0, local_words, group, interpret):
    levels = group.bit_length() - 1
    assert (1 << levels) == group
    prepack = W0 <= 64 and levels >= 1
    W0pad = 128 if prepack else _round128(W0)
    # exact worst-case group window: group * (local_words words of payload)
    # + front pad word + slack, rounded to a lane multiple
    GWout = group_window_words(local_words, group)
    caps = _level_caps(local_words, group, prepack)
    assert not caps or caps[-1] == GWout
    # >= 8 groups per tile keeps the output block sublane-divisible; the
    # wrapper pads NB up to a whole number of tiles with empty windows
    groups_per_tile = max(8, 512 // group)
    Rt = groups_per_tile * group
    assert NB % Rt == 0
    n_tiles = NB // Rt
    rows_t = Rt // 2 if prepack else Rt

    kern = functools.partial(_merge_tile_kernel, levels=levels,
                             local_words=local_words, GWout=GWout,
                             prepack=prepack, caps=caps)
    in_specs = [pl.BlockSpec((rows_t, W0pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    # per-level shift arrays ride as [n_tiles, rt_pad, 1] so the
    # constrained last-two block dims are (rt_pad >= 8, 1); o arrays for
    # all levels first, then sh arrays.  Level l always merges nodes of
    # 2^l blocks, so the per-tile length is Rt >> (l+1) in both layouts.
    for lvl in list(range(levels)) * 2:
        rt = max(Rt >> (lvl + 1), 8)
        in_specs.append(pl.BlockSpec((1, rt, 1), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    # SMEM copies of the per-level word shifts, for the per-row dynamic
    # rolls at the late (few-row) levels.  3-D so the block's last two
    # dims EQUAL the array's (Mosaic's block-shape divisibility rule).
    # Only plumbed when the (measured-slower, disabled) roll experiment
    # is re-enabled -- it must not tax the production kernel.
    if ROLL_MAX_ROWS:
        for lvl in range(levels):
            rt = max(Rt >> (lvl + 1), 8)
            in_specs.append(pl.BlockSpec((1, 1, rt), lambda i: (i, 0, 0),
                                         memory_space=pltpu.SMEM))

    call = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((groups_per_tile, GWout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB // group, GWout), jnp.uint32),
        interpret=interpret,
    )
    return call, W0pad, prepack, levels, n_tiles


def merge_to_groups_pallas(win, block_bits, local_words, group,
                           interpret=False):
    """win: u32 [NB, W0] per-block windows (front pad word included);
    block_bits: u32 [NB].  NB must be a multiple of `group` (callers pad
    with zero windows).  Returns (gwin u32 [NG, GWout], glens u32 [NG])."""
    NB, W0 = win.shape
    Rt = max(8, 512 // group) * group
    NBp = -(-NB // Rt) * Rt
    if NBp != NB:  # trailing empty windows merge into zero-length groups
        win = jnp.pad(win, ((0, NBp - NB), (0, 0)))
        block_bits = jnp.pad(block_bits, (0, NBp - NB))
        NB = NBp
    call, W0pad, prepack, levels, n_tiles = _build_merge_call(
        NB, W0, local_words, group, interpret)
    if prepack:
        win = jnp.pad(win, ((0, 0), (0, 64 - W0))).reshape(NB // 2, 128)
    else:
        win = jnp.pad(win, ((0, 0), (0, W0pad - W0)))

    # per-level left-sibling lengths: at level l, pair g merges nodes of
    # 2^l blocks; the left node's bit length is the sum of its block_bits
    lens = block_bits.astype(jnp.uint32)
    o_arrs, sh_arrs = [], []
    node = lens                            # [NB / 2^l] node lengths
    for lvl in range(levels):
        pair = node.reshape(-1, 2)
        l_len = pair[:, 0]
        o_arrs.append((l_len >> jnp.uint32(5)).astype(jnp.int32))
        sh_arrs.append(l_len & jnp.uint32(31))
        node = pair.sum(axis=1, dtype=jnp.uint32)

    def tile2(a):
        rt = a.shape[0] // n_tiles
        a = a.reshape(n_tiles, rt)
        if rt < 8:
            a = jnp.pad(a, ((0, 0), (0, 8 - rt)))
        return a

    def tile3(a):
        return tile2(a)[:, :, None]

    osm = [tile2(a)[:, None, :] for a in o_arrs] if ROLL_MAX_ROWS else []
    gwin = call(win, *[tile3(a) for a in o_arrs],
                *[tile3(a) for a in sh_arrs], *osm)
    return gwin, node
