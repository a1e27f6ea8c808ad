"""Two-process `jax.distributed` bring-up for ``initialize_multihost``
(SURVEY.md §2.6 multi-host entry; parity: the reference scales hosts via
torch DDP launch scripts — here the same mesh/sharding code spans hosts once
`jax.distributed.initialize` has run).

The test spawns two real OS processes joined through a localhost coordinator.
Each worker:
  * calls ``initialize_multihost(addr, 2, pid)`` — the function under test
  * asserts the global runtime sees 2 processes / 2 CPU devices
  * drives a sharded ``DataLoader`` (``shard_rank=jax.process_index()``) and
    checks the two shards partition the dataset exactly
  * builds a global 2-device ``Mesh`` and runs a cross-process ``psum``,
    checking the collective result equals the full-dataset sum on BOTH hosts
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(pid: int, port: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu

    # Initialize the distributed runtime before anything (even a transitive
    # package import) can touch the XLA backend.
    from rec_pangu_tpu.parallel.mesh import DATA_AXIS, initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", 2, pid)
    from rec_pangu_tpu.data.loader import DataLoader
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == 1
    assert jax.device_count() == 2

    class _Rows:
        arrays = {"x": np.arange(10, dtype=np.float32)}

        def __len__(self):
            return 10

    loader = DataLoader(_Rows(), batch_size=4, shuffle=False,
                        shard_rank=jax.process_index(),
                        num_shards=jax.process_count())
    local_rows = np.concatenate([b["x"] for b in loader])
    np.testing.assert_array_equal(local_rows, np.arange(pid, 10, 2))

    # Cross-process collective: psum of per-host shard sums == global sum.
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), (DATA_AXIS,))
    local = np.array([local_rows.sum()], dtype=np.float32)
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P(DATA_AXIS))
    total = jax.jit(
        shard_map(lambda x: jax.lax.psum(jnp.sum(x), DATA_AXIS),
                  mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P()),
        out_shardings=jax.sharding.NamedSharding(mesh, P()),
    )(garr)
    got = float(np.asarray(total.addressable_data(0)))
    expect = float(np.arange(10, dtype=np.float32).sum())
    assert got == expect, (got, expect)
    print(f"MULTIHOST_OK pid={pid}", flush=True)


@pytest.mark.slow
def test_initialize_multihost_two_process():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    # The axon sitecustomize eagerly registers its PJRT backend at interpreter
    # start, which counts as "backend initialized" and breaks
    # jax.distributed.initialize; the workers are CPU-only, so disable it.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out.decode(errors="replace")
        assert b"MULTIHOST_OK" in out


if __name__ == "__main__" and len(sys.argv) == 4 and sys.argv[1] == "--worker":
    _worker(int(sys.argv[2]), sys.argv[3])
