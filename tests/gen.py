"""Test-data generators covering every coding path of the format."""
import numpy as np


def pack_samples(vals, bps, flags):
    """Pack uint32 sample values into the byte layout selected by flags."""
    from libaec_tpu.constants import AEC_DATA_3BYTE, AEC_DATA_MSB

    msb = bool(flags & AEC_DATA_MSB)
    vals = np.asarray(vals, dtype=np.uint32)
    if bps > 16:
        if bps <= 24 and (flags & AEC_DATA_3BYTE):
            b = np.zeros((len(vals), 3), np.uint8)
            sh = (16, 8, 0) if msb else (0, 8, 16)
            for i, s in enumerate(sh):
                b[:, i] = (vals >> s) & 0xFF
            return b.tobytes()
        dt = ">u4" if msb else "<u4"
        return vals.astype(dt).tobytes()
    if bps > 8:
        dt = ">u2" if msb else "<u2"
        return vals.astype(dt).tobytes()
    return vals.astype(np.uint8).tobytes()


def gen_values(rng, n, bps, signed, kind):
    """kind selects a data regime that exercises specific code options."""
    lo_s = -(1 << (bps - 1))
    hi_s = (1 << (bps - 1)) - 1
    hi_u = (1 << bps) - 1

    def clip_to_range(a):
        if signed:
            a = np.clip(a, lo_s, hi_s)
            return (a.astype(np.int64) & hi_u).astype(np.uint32)
        return np.clip(a, 0, hi_u).astype(np.uint32)

    if kind == "zeros":
        return np.zeros(n, np.uint32)
    if kind == "const":
        v = int(rng.integers(0, hi_u + 1))
        return np.full(n, v, np.uint32)
    if kind == "random":
        return rng.integers(0, hi_u + 1, n).astype(np.uint32)
    if kind == "lowentropy":
        base = int(rng.integers(0, max(1, hi_u // 2)))
        steps = rng.integers(-2, 3, n).cumsum() + base
        return clip_to_range(steps)
    if kind == "midentropy":
        base = int(rng.integers(0, max(1, hi_u // 2)))
        amp = max(1, hi_u // 16)
        steps = rng.integers(-amp, amp + 1, n).cumsum() // 4 + base
        return clip_to_range(steps)
    if kind == "zero_runs":
        v = np.zeros(n, np.uint32)
        i = 0
        while i < n:
            run = int(rng.integers(1, 200))
            if rng.random() < 0.5:
                i += run
            else:
                j = min(n, i + run)
                v[i:j] = rng.integers(0, hi_u + 1, j - i)
                i = j
        return v
    if kind == "edges":
        # values at the clamp boundaries of the Δ-map escape paths
        choices = np.array([0, 1, hi_u, hi_u - 1, hi_u // 2,
                            hi_u // 2 + 1], np.uint32)
        return choices[rng.integers(0, len(choices), n)]
    if kind == "long_fs":
        # half-block jumps to near-max: very long fundamental sequences
        # (tests/check_long_fs.c:8-28 analogue)
        v = np.zeros(n, np.uint32)
        v[n // 2:] = hi_u - hi_u // 4
        return v
    raise ValueError(kind)


KINDS = ["zeros", "const", "random", "lowentropy", "midentropy",
         "zero_runs", "edges", "long_fs"]
