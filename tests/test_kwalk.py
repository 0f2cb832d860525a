"""Property test: the closed-form vectorised k-walk must agree with a direct
transliteration of the reference's warm-started hill-descent
(assess_splitting_option, encode.c:329-410) for every possible incoming k."""
import numpy as np

from libaec_tpu.backend import NUMPY as B
from libaec_tpu.config import KW
from libaec_tpu.ops import options


def reference_walk(block, k0, kmax, this_bs):
    """Direct transliteration of the C search semantics (uint64 lengths)."""
    def block_fs(k):
        return int(np.sum(block >> np.uint32(k), dtype=np.uint64))

    len_min = 1 << 63
    k = k_min = k0
    no_turn = k == 0
    dir_up = True
    while True:
        fs_len = block_fs(k)
        ln = fs_len + this_bs * (k + 1)
        if ln < len_min:
            if len_min < (1 << 63):
                no_turn = True
            len_min = ln
            k_min = k
            if dir_up:
                if fs_len < this_bs or k >= kmax:
                    if no_turn:
                        break
                    k = k0 - 1
                    dir_up = False
                    no_turn = True
                else:
                    k += 1
            else:
                if fs_len >= this_bs or k == 0:
                    break
                k -= 1
        else:
            if no_turn:
                break
            k = k0 - 1
            dir_up = False
            no_turn = True
    return k_min


def test_kwalk_matches_reference_walk():
    rng = np.random.default_rng(42)
    xp = np
    for trial in range(300):
        bs = int(rng.choice([8, 16, 32, 64]))
        kmax = int(rng.choice([1, 5, 13, 29]))
        ref = int(rng.integers(0, 2))
        this_bs = bs - ref
        kind = trial % 4
        if kind == 0:
            block = rng.integers(0, 2 ** int(rng.integers(1, 32)), bs)
        elif kind == 1:
            block = np.zeros(bs)
            block[0] = rng.integers(0, 2**31)
        elif kind == 2:
            block = np.full(bs, rng.integers(0, 64))
        else:
            block = rng.integers(0, 8, bs)
        block = block.astype(np.uint32)
        d = block[None, :]
        Fhi, Flo = options.fs_tables(xp, d)
        Lhi, Llo = options.split_len_pairs(
            xp, Fhi, Flo, np.array([this_bs], np.uint32))
        maps = options.k_walk_maps(
            B, Fhi, Flo, Lhi, Llo, np.array([this_bs], np.uint32), kmax,
            np.array([True]))
        for k0 in range(0, kmax + 1):
            expect = reference_walk(block, k0, kmax, this_bs)
            got = int(maps[0, k0])
            assert got == expect, (
                f"trial={trial} bs={bs} kmax={kmax} ref={ref} k0={k0} "
                f"expect={expect} got={got} block={block[:8]}")


def test_chain_composition_matches_sequential():
    rng = np.random.default_rng(1)
    NB = 257
    maps = rng.integers(0, KW, (NB, KW)).astype(np.int32)
    k_in, k_final = options.chain_k(B, maps, 3)
    k = 3
    for b in range(NB):
        assert k_in[b] == k
        k = int(maps[b, k])
    assert int(k_final) == k
