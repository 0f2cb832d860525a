"""Inverse of the unit-delay predictor + sign mapper, on device.

Reference semantics: the FLUSH macro (/root/reference/src/decode.c:67-141).
The recurrence last' = f(last, d) is sequential *within* an RSI, but every
RSI starts from an absolute reference sample when preprocessing is on
(decode.c:410-413), so RSIs are independent: put RSIs on lanes and scan over
the sample index -- one lax.scan of vector steps instead of a scalar loop.

This is phase 2 of the two-phase decode (SURVEY.md §2): phase 1 (the native
structural/entropy scan) produces mapped deltas; this kernel reconstructs
samples and the byte layout.
"""
import jax
import jax.numpy as jnp


def unpredict_rsis(cfg, deltas):
    """deltas: u32 [n_rsi, S] mapped prediction residuals (first sample of
    each row is the absolute reference).  Returns u32 [n_rsi, S] samples."""
    if not cfg.preprocess:
        return deltas
    u32, i32 = jnp.uint32, jnp.int32
    bps = cfg.bits_per_sample
    xmax = jnp.uint32(cfg.xmax)

    ref = deltas[:, 0]
    signed_path = cfg.xmin != 0  # decode.c:91,111 branches on xmin == 0

    if cfg.signed:
        m = u32((1 << (bps - 1)) & 0xFFFFFFFF)
        ref = (ref ^ m) - m  # sign-extend reference (decode.c:80-85)

    if signed_path:
        sxmax = xmax.astype(i32)
        state0 = ref.astype(i32)

        def step(last, d):
            du = d
            half = (du >> u32(1)) + (du & u32(1))
            zig = ((du >> u32(1)) ^ (~((du & u32(1)) - u32(1)))).astype(i32)
            neg = last < 0
            lim = jnp.where(neg, (sxmax + last + 1).astype(u32),
                            (sxmax - last).astype(u32))
            esc = jnp.where(neg, du.astype(i32) - sxmax - 1,
                            sxmax - du.astype(i32))
            nxt = jnp.where(half <= lim, last + zig, esc)
            return nxt, nxt

        _, rest = jax.lax.scan(step, state0, deltas[:, 1:].T, unroll=8)
        out = jnp.concatenate([state0[:, None], rest.T], axis=1)
        return out.astype(u32)

    med = xmax // u32(2) + u32(1)
    state0 = ref.astype(u32)

    def step(last, d):
        half = (d >> u32(1)) + (d & u32(1))
        zig = (d >> u32(1)) ^ (~((d & u32(1)) - u32(1)))
        mask = jnp.where((last & med) != 0, xmax, u32(0))
        nxt = jnp.where(half <= (mask ^ last), last + zig, mask ^ d)
        return nxt, nxt

    _, rest = jax.lax.scan(step, state0, deltas[:, 1:].T, unroll=8)
    return jnp.concatenate([state0[:, None], rest.T], axis=1)


def samples_to_bytes_device(cfg, samples):
    """u32 [n] samples -> u8 [n*bsz] in the stream's byte layout
    (decode.c:144-189 put_* equivalents), on device.

    1/2/4-byte layouts go through a (possibly byte-swapped) bitcast --
    widening reinterpretation is little-endian on every XLA backend, so an
    MSB stream just needs the swap first.  3-byte packing has no aligned
    reinterpretation; it keeps the generic stack."""
    u32 = jnp.uint32
    bsz = cfg.bytes_per_sample
    if bsz == 1:
        return samples.astype(jnp.uint8)
    if bsz == 2:
        h = samples.astype(jnp.uint16)
        if cfg.msb:
            h = (h << jnp.uint16(8)) | (h >> jnp.uint16(8))
        return jax.lax.bitcast_convert_type(h, jnp.uint8).reshape(-1)
    if bsz == 4:
        w = samples
        if cfg.msb:
            w = ((w >> u32(24)) | ((w >> u32(8)) & u32(0xFF00))
                 | ((w << u32(8)) & u32(0xFF0000)) | (w << u32(24)))
        return jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(-1)
    sh = range(8 * (bsz - 1), -8, -8) if cfg.msb else range(0, 8 * bsz, 8)
    parts = [((samples >> u32(s)) & u32(0xFF)).astype(jnp.uint8) for s in sh]
    return jnp.stack(parts, axis=-1).reshape(-1)
