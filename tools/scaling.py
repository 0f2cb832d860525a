"""Multi-chip scaling harness: per-N throughput for the sharded encode and
decode paths (BASELINE.md target: >=85% linear scaling to N hosts).

Runs the bench configuration over an N-device mesh for each N and reports
MiB/s plus efficiency vs N=1.  On real multi-chip hardware the numbers are
meaningful; on this development box only a virtual CPU mesh is available
(all shards share the same cores), so the harness primarily validates
bit-identity at scale and records the dispatch overhead trend.  Usage:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling.py [--ns 1,2,4,8] [--rsis-per-shard 64]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="1,2,4,8")
    ap.add_argument("--rsis-per-shard", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from libaec_tpu import Config, native
    from libaec_tpu.constants import AEC_DATA_MSB, AEC_DATA_PREPROCESS
    from libaec_tpu.decode import scan_record_arrays
    from libaec_tpu.encode import encode_buffer
    from libaec_tpu.ops import accessors, bitunpack
    from libaec_tpu.parallel.dist import (
        assemble_host,
        make_mesh_assembler,
        make_mesh_decoder,
        make_mesh_encoder,
    )

    cfg = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    ns = [int(n) for n in args.ns.split(",")]
    ndev = len(jax.devices())
    results = []
    base = None
    for n in ns:
        if n > ndev:
            print(f"# skip N={n}: only {ndev} devices", file=sys.stderr)
            continue
        mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
        n_rsi = n * args.rsis_per_shard
        rng = np.random.default_rng(0)
        x = rng.integers(0, 3000,
                         (n_rsi, cfg.samples_per_rsi)).astype(np.uint32)
        raw = accessors.samples_to_bytes(
            np, x.reshape(-1), cfg.bytes_per_sample, cfg.msb).tobytes()
        mib = len(raw) / (1 << 20)

        enc = make_mesh_encoder(cfg, args.rsis_per_shard, mesh)
        xd = jnp.asarray(x)
        with mesh:
            shifted, bits, offs, _ = enc(xd, 0)  # compile
            jax.block_until_ready(shifted)
            t_enc = min(
                _timed(lambda: jax.block_until_ready(enc(xd, 0)[0]))
                for _ in range(args.iters))
        comp = assemble_host(shifted, bits, offs)
        assert comp == encode_buffer(raw, cfg), f"N={n} stream differs"

        # on-device ordered ragged assembly (all_gather over the mesh)
        W = shifted.shape[1]
        asm = make_mesh_assembler(mesh, W, n * W + 2, n)
        with mesh:
            words_dev = asm(shifted, bits, offs)  # compile + run
            end_bits = int(np.asarray(offs)[-1]) + int(np.asarray(bits)[-1])
            by = np.asarray(words_dev).astype(">u4").view(np.uint8)
            assert by[4:4 + (end_bits + 7) // 8].tobytes() == comp, \
                f"N={n} device assembly differs"
            t_asm = min(
                _timed(lambda: jax.block_until_ready(
                    asm(shifted, bits, offs)))
                for _ in range(args.iters))

        t_dec = None
        if native.get_lib() is not None:
            recs, n_ok, _ = native.scan_blocks(
                comp, n_rsi, bitunpack.max_fs_bits(cfg), cfg,
                wf=bitunpack.window_words(cfg))
            assert n_ok == n_rsi
            arrs = [jnp.asarray(a) for a in scan_record_arrays(recs)]
            dec = make_mesh_decoder(cfg, args.rsis_per_shard, mesh)
            with mesh:
                out = dec(*arrs)  # compile
                assert np.asarray(out).tobytes() == raw, f"N={n} decode"
                t_dec = min(
                    _timed(lambda: jax.block_until_ready(dec(*arrs)))
                    for _ in range(args.iters))

        row = {"n": n, "mib": round(mib, 1),
               "encode_mib_s": round(mib / t_enc, 1),
               "assemble_mib_s": round(mib / t_asm, 1),
               "decode_mib_s": round(mib / t_dec, 1) if t_dec else None}
        if base is None:
            base = row
        row["encode_scaling"] = round(
            row["encode_mib_s"] / (base["encode_mib_s"] * n / base["n"]), 3)
        results.append(row)
        print(json.dumps(row))
    return 0


def _timed(f):
    t0 = time.time()
    f()
    return time.time() - t0


if __name__ == "__main__":
    sys.exit(main())
