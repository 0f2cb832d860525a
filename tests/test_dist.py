"""Shard-count invariance: the mesh encoder's assembled stream must be
bit-identical to the single-chip stream.  Runs in a subprocess with a
virtual 8-device CPU platform (the axon TPU plugin registers itself at
interpreter start, so env must be scrubbed before python launches)."""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import sys
sys.path.insert(0, %r)
import importlib.util
spec = importlib.util.spec_from_file_location("ge", %r)
ge = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ge)
ge.dryrun_multichip(8)
ge.dryrun_multichip(2)
print("SHARD-INVARIANT-OK")
"""


def test_dryrun_multichip_cpu8():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    script = SCRIPT % (str(REPO), str(REPO / "__graft_entry__.py"))
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=600)
    assert "SHARD-INVARIANT-OK" in res.stdout, res.stdout + res.stderr


def test_mesh_encoder_pallas_tpu():
    """The mesh encoder's Pallas branch (fused encode kernel + VMEM tree
    merge inside shard_map) must compile on a real chip and produce the
    single-chip bytes.  1-device mesh: the collectives (all_gather k-map
    chain, offset prefix sum) still execute."""
    import pytest

    jax = pytest.importorskip("jax")
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU")
    import numpy as np

    from jax.sharding import Mesh

    from libaec_tpu import Config
    from libaec_tpu.constants import AEC_DATA_MSB, AEC_DATA_PREPROCESS
    from libaec_tpu.encode import encode_buffer
    from libaec_tpu.kernels import encode_pallas
    from libaec_tpu.ops import accessors
    from libaec_tpu.parallel.dist import assemble_host, make_mesh_encoder

    cfg = Config(16, 64, 256, AEC_DATA_MSB | AEC_DATA_PREPROCESS)
    per_shard = 8
    assert encode_pallas.kernel_supported(cfg, per_shard)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    rng = np.random.default_rng(11)
    x = rng.integers(0, 3000, (per_shard, cfg.samples_per_rsi)) \
        .astype(np.uint32)

    run = make_mesh_encoder(cfg, per_shard, mesh, use_pallas=True)
    with mesh:
        shifted, bits, offs, k_out = run(jax.numpy.asarray(x), 0)
    out = assemble_host(np.asarray(shifted), np.asarray(bits),
                        np.asarray(offs))

    raw = accessors.samples_to_bytes(
        np, x.reshape(-1), cfg.bytes_per_sample, cfg.msb).tobytes()
    assert out == encode_buffer(raw, cfg, rsis_per_chunk=per_shard)
