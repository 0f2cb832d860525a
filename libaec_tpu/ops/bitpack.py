"""Data-parallel bitstream assembly.

The reference packs bits strictly sequentially with a carry byte
(emit, /root/reference/src/encode.c:61-83).  Here the whole stream is built
in parallel:

  1. exclusive prefix-sum of field widths -> exact end bit position e_i of
     every field (MSB-first global bit addressing);
  2. each field's value (always < 2^32, zero-extended) occupies the 32-bit
     window [e_i - 32, e_i); windows of *values* never overlap across fields,
     so OR == ADD;
  3. each window straddles at most two big-endian uint32 words -> two
     sorted scatter-adds build the word array;
  4. words are split into bytes.

A one-word front pad keeps indices non-negative for fields near bit 0; the
chunk's global starting bit offset (bit0, carried across host chunks) rides
into the prefix sum so chunk boundaries need only a single OR of the shared
boundary byte on the host.
"""


def pack_fields(B, widths_flat, values_flat, bit0):
    """widths/values: u32 [N] in stream order; bit0: int in [0, 8).

    Returns (bytes u8 [nbytes], total_bits int) where total_bits counts
    bit0 + sum(widths), i.e. the bit cursor at chunk end, and nbytes =
    ceil(total_bits / 8).  Byte 0 contains the partial leading bits (zeros
    below bit0) for the host to OR with the previous chunk's tail byte.
    """
    xp = B.xp
    u32 = xp.uint32
    e = B.cumsum_u32(widths_flat) + u32(bit0 + 32)
    t = e & u32(31)
    idx1 = (e >> u32(5)) - u32(1)
    idx2 = e >> u32(5)
    v = values_flat
    c1 = v >> t
    c2 = xp.where(t == 0, u32(0), v << ((u32(32) - t) & u32(31)))

    total_bits_end = int(e[-1]) if e.size else bit0 + 32
    # words needed to cover bits [0, total_bits_end) plus one slack word
    nwords = (total_bits_end + 31) // 32 + 1
    out = B.scatter_add_u32(nwords, idx1, c1, idx2, c2)
    by = words_to_bytes(xp, out)
    total_bits = total_bits_end - 32
    nbytes = (total_bits + 7) // 8
    return by[4 : 4 + nbytes], total_bits


def pack_fields_static(B, widths_flat, values_flat, bit0, nwords):
    """Shape-static variant for jit: nwords is a python int upper bound on
    the packed size ((8*nbytes_max + bit0)/32 + 2).  Returns (words u32
    [nwords], total_bits u32 scalar).  Callers slice bytes on the host."""
    xp = B.xp
    u32 = xp.uint32
    e = B.cumsum_u32(widths_flat) + (xp.asarray(bit0, u32) + u32(32))
    t = e & u32(31)
    idx1 = (e >> u32(5)) - u32(1)
    idx2 = e >> u32(5)
    v = values_flat
    c1 = v >> t
    c2 = xp.where(t == 0, u32(0), v << ((u32(32) - t) & u32(31)))
    out = B.scatter_add_u32(nwords, idx1, c1, idx2, c2)
    total_bits = e[-1] - u32(32)
    return out, total_bits


def words_to_bytes(xp, words):
    """Big-endian split of u32 words into bytes."""
    u32 = xp.uint32
    b0 = (words >> u32(24)).astype(xp.uint8)
    b1 = ((words >> u32(16)) & u32(0xFF)).astype(xp.uint8)
    b2 = ((words >> u32(8)) & u32(0xFF)).astype(xp.uint8)
    b3 = (words & u32(0xFF)).astype(xp.uint8)
    return xp.stack([b0, b1, b2, b3], axis=-1).reshape(-1)
