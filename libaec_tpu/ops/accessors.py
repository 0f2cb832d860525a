"""Byte <-> uint32 sample marshaling for all 7 storage layouts.

Parity with the reference's accessor tables: encode side
/root/reference/src/encode_accessors.c:145-269 (aec_get_rsi_*), decode side
/root/reference/src/decode.c:144-189 (put_*).  Vectorised reshape+shift
instead of per-sample byte loads.
"""


def bytes_to_samples(xp, raw_u8, bytes_per_sample, msb, mask=None):
    """raw_u8: u8 [n * bytes_per_sample] -> u32 [n].

    `mask` (cfg.mask) drops storage bits above bits_per_sample at ingest
    -- see Config.mask for why this deliberately deviates from the
    reference's unmasked accessors."""
    u32 = xp.uint32
    n = raw_u8.shape[0] // bytes_per_sample
    b = raw_u8.reshape(n, bytes_per_sample).astype(u32)
    if bytes_per_sample == 1:
        out = b[:, 0]
    else:
        order = range(bytes_per_sample) if msb \
            else range(bytes_per_sample - 1, -1, -1)
        out = xp.zeros(n, dtype=u32)
        for pos, col in enumerate(order):
            out = (out << u32(8)) | b[:, col]
    if mask is not None and mask != 0xFFFFFFFF:
        out = out & u32(mask)
    return out


def samples_to_bytes(xp, samples_u32, bytes_per_sample, msb):
    """u32 [n] -> u8 [n * bytes_per_sample]."""
    u32 = xp.uint32
    n = samples_u32.shape[0]
    cols = []
    shifts = range(8 * (bytes_per_sample - 1), -1, -8) if msb else range(
        0, 8 * bytes_per_sample, 8)
    for sh in shifts:
        cols.append(((samples_u32 >> u32(sh)) & u32(0xFF)).astype(xp.uint8))
    return xp.stack(cols, axis=-1).reshape(n * bytes_per_sample)
