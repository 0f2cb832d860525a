"""Multi-controller worker: one process of an N-process jax.distributed
mesh (SURVEY.md §2 cross-chip/host backend: "sharded across chips (ICI)
and hosts (DCN)").  Each process owns a process-local slice of the global
RSI batch, runs the sharded encode/decode programs (whose all_gathers now
cross process boundaries), and performs per-process IO of its addressable
output shards -- the mechanics that differ from a single-process mesh.

Launched by tests/test_multiprocess.py as:
    python mp_worker.py PID NPROC PORT OUTDIR
"""
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    import jax

    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    from jax.experimental import multihost_utils as mh
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(REPO))
    from libaec_tpu import Config, native
    from libaec_tpu.constants import AEC_DATA_MSB, AEC_DATA_PREPROCESS
    from libaec_tpu.decode import scan_record_arrays
    from libaec_tpu.encode import encode_buffer
    from libaec_tpu.ops import accessors, bitunpack
    from libaec_tpu.parallel.dist import (
        assemble_host,
        make_mesh_decoder,
        make_mesh_encoder,
    )

    devs = np.array(jax.devices())
    n_devices = len(devs)
    assert n_devices == nproc * jax.local_device_count(), (
        n_devices, jax.local_device_count())
    assert jax.process_count() == nproc
    mesh = Mesh(devs, ("data",))
    row_sharding = NamedSharding(mesh, P("data", None))

    flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS
    cases = [
        (Config(16, 8, 4, flags), 2, 500, 0),
        (Config(16, 64, 256, flags), 4, 3000, 1),  # bench-shaped
    ]
    for cfg, per_shard, hi, seed in cases:
        n_rsi = n_devices * per_shard
        rng = np.random.default_rng(seed)
        x_np = rng.integers(0, hi, (n_rsi, cfg.samples_per_rsi)) \
            .astype(np.uint32)
        # global array from process-local rows: each process materialises
        # only the slices its local devices own
        x = jax.make_array_from_callback(x_np.shape, row_sharding,
                                         lambda idx: x_np[idx])

        run = make_mesh_encoder(cfg, per_shard, mesh)
        with mesh:
            shifted, bits, offs, _k = run(x, 0)
        # outputs are row-sharded across processes; gather them to every
        # controller (a cross-process collective) for host assembly
        sh_g = mh.process_allgather(shifted, tiled=True)
        bits_g = mh.process_allgather(bits, tiled=True)
        offs_g = mh.process_allgather(offs, tiled=True)
        out = assemble_host(sh_g, bits_g, offs_g)

        raw = accessors.samples_to_bytes(
            np, x_np.reshape(-1), cfg.bytes_per_sample, cfg.msb).tobytes()
        expect = encode_buffer(raw, cfg)
        assert out == expect, (
            f"case {seed}: {nproc}-process stream differs from 1-process")

        if native.get_lib() is not None:
            recs, n_ok, _ = native.scan_blocks(
                out, n_rsi, bitunpack.max_fs_bits(cfg), cfg,
                wf=bitunpack.window_words(cfg))
            assert n_ok == n_rsi
            arrs = scan_record_arrays(recs)

            def globalize(a):
                a = np.asarray(a)
                spec = P("data", *([None] * (a.ndim - 1)))
                sh = NamedSharding(mesh, spec)
                return jax.make_array_from_callback(a.shape, sh,
                                                    lambda idx: a[idx])

            drun = make_mesh_decoder(cfg, per_shard, mesh)
            with mesh:
                dout = drun(*map(globalize, arrs))
            # per-process IO: each controller writes ONLY its addressable
            # shards, in global row order; the parent stitches the files
            shards = sorted(dout.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            with open(os.path.join(outdir, f"dec_{seed}_{pid}.bin"),
                      "wb") as f:
                for s in shards:
                    f.write(np.asarray(s.data).tobytes())
            got = mh.process_allgather(dout, tiled=True).tobytes()
            assert got == raw, f"case {seed}: sharded decode differs"

        if pid == 0:
            with open(os.path.join(outdir, f"raw_{seed}.bin"), "wb") as f:
                f.write(raw)

    print(f"MP-OK {pid}", flush=True)


if __name__ == "__main__":
    main()
