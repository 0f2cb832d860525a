"""Decode an szip-compressed HDF5 dataset with libaec_tpu.

The dominant real deployment of the SZ layer is HDF5: every chunk of an
szip-compressed dataset is an independent SZ stream, which is exactly the
shape `sz_decompress_batch` accelerates (many streams scanned on host
threads, all payloads decoded in one device pass).

This example writes an szip dataset with h5py (whose libhdf5 carries its
own szip codec), then bypasses the HDF5 filter pipeline entirely: it
reads the RAW stored chunks with `read_direct_chunk`, reconstructs the
SZ parameters from the dataset creation property list, decompresses every
chunk through libaec_tpu, and verifies bit-identity with what libhdf5
itself decodes.

HDF5 filter wire format (H5Zszip.c): cd_values = [options_mask,
bits_per_pixel, pixels_per_block, pixels_per_scanline]; each stored chunk
is a little-endian uint32 byte count followed by the headerless SZ
stream (HDF5 passes SZ_RAW_OPTION_MASK -- libaec streams never carry an
szip header anyway, sz_compat.c).

Run: PYTHONPATH=. python examples/hdf5_szip.py
"""
import struct
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import h5py  # noqa: E402

from libaec_tpu.szip import SZCom, sz_decompress_batch  # noqa: E402

H5Z_FILTER_SZIP = 4


def write_szip_file(path, shape=(512, 512), chunks=(64, 512)):
    rng = np.random.default_rng(7)
    # climate-field-like: smooth ramp + low-amplitude noise (low entropy)
    y = np.linspace(0, 3000, shape[0])[:, None]
    x = np.linspace(0, 500, shape[1])[None, :]
    data = (y + x + rng.integers(0, 17, shape)).astype("<u2")
    with h5py.File(path, "w") as h:
        d = h.create_dataset("temperature", shape, dtype="<u2",
                             chunks=chunks, compression="szip",
                             compression_opts=("nn", 16))
        d[:] = data
    return data


def szip_params(dset):
    """SZCom from the dataset creation property list's szip filter."""
    dcpl = dset.id.get_create_plist()
    for i in range(dcpl.get_nfilters()):
        fid, _flags, cd, _name = dcpl.get_filter(i)
        if fid == H5Z_FILTER_SZIP:
            return SZCom(options_mask=cd[0], bits_per_pixel=cd[1],
                         pixels_per_block=cd[2], pixels_per_scanline=cd[3])
    raise LookupError("dataset has no szip filter")


def read_raw_chunks(dset):
    """[(chunk_offset, out_size, sz_stream), ...] for every stored chunk."""
    out = []
    for i in range(dset.id.get_num_chunks()):
        info = dset.id.get_chunk_info(i)
        _mask, raw = dset.id.read_direct_chunk(info.chunk_offset)
        (out_size,) = struct.unpack("<I", raw[:4])
        out.append((info.chunk_offset, out_size, raw[4:]))
    return out


def main():
    path = tempfile.mktemp(suffix=".h5")
    data = write_szip_file(path)
    with h5py.File(path, "r") as h:
        d = h["temperature"]
        param = szip_params(d)
        chunks = read_raw_chunks(d)
        print(f"{len(chunks)} szip chunks, params {param}")

        # one device pass over every chunk stream
        decoded = sz_decompress_batch([c[2] for c in chunks], param,
                                      [c[1] for c in chunks])

        ch = d.chunks
        ok = 0
        for (off, out_size, _), buf in zip(chunks, decoded):
            want = data[off[0]:off[0] + ch[0], off[1]:off[1] + ch[1]]
            got = np.frombuffer(buf, "<u2").reshape(ch)
            assert np.array_equal(got, want), f"chunk {off}: mismatch"
            ok += 1
        # and libhdf5's own filter agrees with the source data
        assert np.array_equal(d[:], data)
    print(f"all {ok} chunks bit-identical to libhdf5's szip decode")


if __name__ == "__main__":
    main()
