"""Streaming (zlib-style) API with aec_stream parity.

The reference implements byte-dribble streaming with a resumable FSM
(/root/reference/src/encode.c:467-707, decode.c:342-460).  The TPU design
keeps suspend/resume at the host framing layer instead: input is buffered to
whole RSIs (the format's safe cut points), coded in data-parallel batches,
and the produced bytes are dribbled out through avail_out.  Byte output is
identical to the reference for any chunking of input/output.

API mirrors libaec.h:154-166:

    s = AecStream(bits_per_sample=16, block_size=64, rsi=256,
                  flags=AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    aec_encode_init(s); s.next_in = ...; aec_encode(s, AEC_FLUSH); ...

next_in/next_out are bytes-like/bytearray buffers indexed by the stream's
internal cursors; avail_in/avail_out/total_in/total_out match the C fields.
"""
import numpy as np

from . import backend as _backend
from . import native
from .config import Config
from .constants import (
    AEC_FLUSH,
    AEC_OK,
    AEC_STREAM_ERROR,
    AecStreamError,
)
from .encode import encode_blocks_core, encode_blocks_jax


class AecStream:
    """Mutable stream object mirroring struct aec_stream (libaec.h:67-97)."""

    def __init__(self, bits_per_sample=8, block_size=8, rsi=2, flags=0,
                 backend=None):
        self.bits_per_sample = bits_per_sample
        self.block_size = block_size
        self.rsi = rsi
        self.flags = flags
        self.next_in = b""
        self.avail_in = None  # None -> len(next_in)
        self.next_out = None  # bytearray to write into; None -> internal
        self.avail_out = None
        self.total_in = 0
        self.total_out = 0
        self._backend = backend
        self._state = None

    # internal ------------------------------------------------------------
    def _cfg(self):
        return Config(self.bits_per_sample, self.block_size, self.rsi,
                      self.flags)


class _EncState:
    def __init__(self, cfg, backend):
        self.cfg = cfg
        self.backend = backend or _backend.NUMPY
        self.inbuf = bytearray()   # buffered input not yet coded
        self.outbuf = bytearray()  # coded bytes not yet handed out
        self.bits = 0              # total bits coded so far
        self.k = 0                 # warm-start k carry
        self.flushed = False
        self.seen_input = False

    def _run(self, samples_u32, nb):
        cfg = self.cfg
        bit0 = self.bits % 8
        x = samples_u32.reshape(-1, nb * cfg.block_size)
        if self.backend.name == "jax":
            packed, bits, self.k = encode_blocks_jax(cfg, x, nb, self.k, bit0)
        else:
            packed, bits, self.k = encode_blocks_core(
                self.backend, cfg, x, nb, self.k, bit0)
        chunk = np.asarray(packed)
        if bit0 and len(self.outbuf):
            self.outbuf[-1] |= int(chunk[0])
            self.outbuf += chunk[1:].tobytes()
        else:
            self.outbuf += chunk.tobytes()
        self.bits += bits - bit0

    def feed(self, data, flush):
        """Consume input bytes; code any complete RSIs (all, on flush)."""
        from .ops import accessors

        cfg = self.cfg
        self.inbuf += data
        if data:
            self.seen_input = True
        rsi_bytes = cfg.rsi_len_bytes
        n_ready = len(self.inbuf) // rsi_bytes
        # keep one partial RSI buffered unless flushing
        take = n_ready * rsi_bytes
        todo = []
        if take:
            todo.append((self.inbuf[:take], cfg.rsi))
        rest = self.inbuf[take:]
        if flush == AEC_FLUSH:
            bsz = cfg.bytes_per_sample
            n_samples = len(rest) // bsz
            if n_samples:
                raw = np.frombuffer(bytes(rest[: n_samples * bsz]), np.uint8)
                samples = accessors.bytes_to_samples(np, raw, bsz, cfg.msb)
                nb_tail = -(-n_samples // cfg.block_size)
                pad = nb_tail * cfg.block_size - n_samples
                if pad:
                    samples = np.concatenate(
                        [samples, np.full(pad, samples[-1], np.uint32)])
                todo.append((samples, nb_tail))
            rest = bytearray()
        self.inbuf = bytearray(rest)

        for item, nb in todo:
            if isinstance(item, (bytes, bytearray)):
                bsz = cfg.bytes_per_sample
                raw = np.frombuffer(bytes(item), np.uint8)
                samples = accessors.bytes_to_samples(np, raw, bsz, cfg.msb)
            else:
                samples = item
            self._run(samples, nb)

        if flush == AEC_FLUSH and not self.flushed:
            if self.bits == 0:
                # reference flushes one zero byte even with no input
                # (encode.c:686-695)
                self.outbuf += b"\x00"
                self.bits = 8
            self.flushed = True


def aec_encode_init(strm: AecStream):
    cfg = strm._cfg()  # raises AecConfError on bad params
    strm._state = _EncState(cfg, strm._backend)
    strm.total_in = 0
    strm.total_out = 0
    return AEC_OK


def aec_encode(strm: AecStream, flush):
    st = strm._state
    data = bytes(strm.next_in[: strm.avail_in]
                 if strm.avail_in is not None else strm.next_in)
    strm.total_in += len(data)
    strm.avail_in = 0
    strm.next_in = b""
    st.feed(data, flush)

    # serve output; the trailing byte is held back while it is still
    # partial (the reference carries it in cds_buf until finalised,
    # encode.c:929-931)
    servable = len(st.outbuf)
    if not st.flushed and st.bits % 8 != 0:
        servable -= 1
    cap = strm.avail_out if strm.avail_out is not None else servable
    cap = min(cap, servable)
    emit = st.outbuf[:cap]
    del st.outbuf[:cap]
    if strm.next_out is None:
        strm.next_out = bytearray()
    strm.next_out += emit
    if strm.avail_out is not None:
        strm.avail_out -= len(emit)
    strm.total_out += len(emit)
    return AEC_OK


def aec_encode_end(strm: AecStream):
    st = strm._state
    strm._state = None
    if st is not None and not (st.flushed and not st.outbuf):
        return AEC_STREAM_ERROR
    return AEC_OK


class _DecState:
    def __init__(self, cfg):
        self.cfg = cfg
        self.inbuf = bytearray()
        self.emitted = 0  # bytes already handed to the caller

    def available(self, cap_hint):
        """Decode accumulated input; return bytes not yet emitted.

        Re-decodes from scratch each call (host streaming is only used for
        small/dribbled streams; large buffers go through one-shot decode)."""
        cfg = self.cfg
        # hard bound on decodable output: the densest CDS (a restricted
        # zero-block run) yields <= 64 blocks per id_len+2 bits
        max_out = ((len(self.inbuf) * 8 // (cfg.id_len + 2) + 2)
                   * 64 * cfg.block_size * cfg.bytes_per_sample)
        out_cap = min(self.emitted + cap_hint, max_out)
        res = native.decode(bytes(self.inbuf), out_cap, self.cfg)
        if res is None:
            from .decode import decode_buffer_numpy

            status, out = decode_buffer_numpy(bytes(self.inbuf), out_cap,
                                              self.cfg)
        else:
            status, out = res
        return status, out[self.emitted:]


def aec_decode_init(strm: AecStream):
    cfg = strm._cfg()
    strm._state = _DecState(cfg)
    strm.total_in = 0
    strm.total_out = 0
    return AEC_OK


def aec_decode(strm: AecStream, flush):
    st = strm._state
    data = bytes(strm.next_in[: strm.avail_in]
                 if strm.avail_in is not None else strm.next_in)
    strm.total_in += len(data)
    strm.avail_in = 0
    strm.next_in = b""
    st.inbuf += data

    cap = strm.avail_out if strm.avail_out is not None else (1 << 62)
    status, fresh = st.available(cap)
    emit = fresh[:cap]
    st.emitted += len(emit)
    if strm.next_out is None:
        strm.next_out = bytearray()
    strm.next_out += emit
    if strm.avail_out is not None:
        strm.avail_out -= len(emit)
    strm.total_out += len(emit)
    return AEC_OK


def aec_decode_end(strm: AecStream):
    strm._state = None
    return AEC_OK
