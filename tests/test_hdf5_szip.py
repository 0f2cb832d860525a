"""HDF5 szip interop: the flagship SZ deployment, end to end.

Both directions against libhdf5's own szip codec:
  * foreign file -> us: raw chunks of an szip dataset written by libhdf5
    decode bit-identically through sz_decompress_batch;
  * us -> foreign reader: chunks compressed by sz_buffto_buff_compress and
    injected with write_direct_chunk read back correctly through
    libhdf5's filter pipeline.

Wire format (H5Zszip.c): cd_values = [options_mask, bits_per_pixel,
pixels_per_block, pixels_per_scanline]; stored chunk = LE uint32
uncompressed byte count + headerless SZ stream.
"""
import struct

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from libaec_tpu.szip import (  # noqa: E402
    SZCom,
    sz_buffto_buff_compress,
    sz_decompress_batch,
)

H5Z_FILTER_SZIP = 4

pytestmark = pytest.mark.skipif(
    not h5py.h5z.filter_avail(H5Z_FILTER_SZIP),
    reason="libhdf5 lacks the szip filter")


def _szip_params(dset):
    dcpl = dset.id.get_create_plist()
    for i in range(dcpl.get_nfilters()):
        fid, _flags, cd, _name = dcpl.get_filter(i)
        if fid == H5Z_FILTER_SZIP:
            return SZCom(options_mask=cd[0], bits_per_pixel=cd[1],
                         pixels_per_block=cd[2], pixels_per_scanline=cd[3])
    raise LookupError("no szip filter")


def _make_data(shape, dtype):
    rng = np.random.default_rng(3)
    y = np.linspace(0, 2000, shape[0])[:, None]
    x = np.linspace(0, 300, shape[1])[None, :]
    return (y + x + rng.integers(0, 9, shape)).astype(dtype)


@pytest.mark.parametrize("dtype,ppb", [("<u2", 16), ("<u4", 32), ("u1", 8)])
def test_decode_libhdf5_chunks(tmp_path, dtype, ppb):
    shape, chunks = (256, 256), (64, 256)
    data = _make_data(shape, dtype)
    path = str(tmp_path / "f.h5")
    with h5py.File(path, "w") as h:
        d = h.create_dataset("x", shape, dtype=dtype, chunks=chunks,
                             compression="szip", compression_opts=("nn", ppb))
        d[:] = data
    with h5py.File(path, "r") as h:
        d = h["x"]
        param = _szip_params(d)
        offs, sizes, streams = [], [], []
        for i in range(d.id.get_num_chunks()):
            info = d.id.get_chunk_info(i)
            _mask, raw = d.id.read_direct_chunk(info.chunk_offset)
            offs.append(info.chunk_offset)
            sizes.append(struct.unpack("<I", raw[:4])[0])
            streams.append(raw[4:])
        decoded = sz_decompress_batch(streams, param, sizes)
        for off, buf in zip(offs, decoded):
            want = data[off[0]:off[0] + chunks[0], off[1]:off[1] + chunks[1]]
            got = np.frombuffer(buf, dtype).reshape(chunks)
            assert np.array_equal(got, want), off


def test_ld_preload_drop_in(tmp_path):
    """The reference's headline claim, reproduced: libaectpu.so is a
    drop-in binary replacement for szlib.  LD_PRELOADing it makes
    libhdf5's szip filter bind SZ_BufftoBuffCompress/Decompress to OUR
    implementation (proven via LD_DEBUG=bindings), and an szip dataset
    written+read under that binding round-trips bit-exactly."""
    import os
    import subprocess
    import sys
    import textwrap
    from pathlib import Path

    from libaec_tpu import native as _native

    so = Path(_native._SO)
    if not so.exists():
        pytest.skip("native library not built")
    script = textwrap.dedent("""
        import h5py, numpy as np, tempfile, os
        f = tempfile.mktemp(suffix='.h5')
        data = (np.arange(128*256) % 3000).reshape(128, 256).astype('<u2')
        with h5py.File(f, 'w') as h:
            d = h.create_dataset('x', data.shape, dtype='<u2',
                                 chunks=(64, 256), compression='szip',
                                 compression_opts=('nn', 16))
            d[:] = data
        with h5py.File(f, 'r') as h:
            assert np.array_equal(h['x'][:], data)
        print('ROUNDTRIP_OK')
        os.remove(f)
    """)
    env = dict(os.environ)
    env["LD_PRELOAD"] = str(so)
    env["LD_DEBUG"] = "bindings"
    dbg = tmp_path / "ld"
    env["LD_DEBUG_OUTPUT"] = str(dbg)  # per-PID files beat a stderr pipe
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "ROUNDTRIP_OK" in r.stdout, \
        (r.stdout, r.stderr[-500:])
    bound = []
    for f in tmp_path.glob("ld.*"):
        for line in f.read_text(errors="replace").splitlines():
            if "SZ_BufftoBuff" in line and "libaectpu" in line:
                bound.append(line)
    assert bound, "libhdf5 did not bind SZ_* to libaectpu.so"


def test_libhdf5_reads_our_chunks(tmp_path):
    shape, chunks = (128, 512), (32, 512)
    data = _make_data(shape, "<u2")
    path = str(tmp_path / "g.h5")
    with h5py.File(path, "w") as h:
        d = h.create_dataset("x", shape, dtype="<u2", chunks=chunks,
                             compression="szip", compression_opts=("nn", 16))
        param = _szip_params(d)
        for r in range(0, shape[0], chunks[0]):
            block = data[r:r + chunks[0]].tobytes()
            comp = sz_buffto_buff_compress(block, param)
            d.id.write_direct_chunk((r, 0),
                                    struct.pack("<I", len(block)) + comp)
    with h5py.File(path, "r") as h:
        assert np.array_equal(h["x"][:], data)
