"""True multi-PROCESS distributed tests (2 hosts simulated as 2 processes).

The rest of the suite simulates multi-device on one process (8 virtual CPU
devices); this file actually spawns two jax processes connected through
``jax.distributed.initialize`` over localhost TCP — exercising
parallel.distributed.initialize, the cross-process barrier, per-host batch
slicing, the global data mesh with a cross-host psum, and the
multihost_utils-based metric gather that metrics.sync() uses (reference
equivalent: Lightning DDP process group + torchmetrics dist_sync,
train.py:69-81 / utils/metrics.py:12-15).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    pid = int(sys.argv[1]); port = sys.argv[2]
    from openglue_tpu.parallel import distributed as dist
    ok = dist.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert ok, "distributed.initialize returned False in multi-process mode"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from openglue_tpu.parallel.mesh import make_mesh, local_batch_slice

    # per-host slice of a global batch of 8: host0 -> [0,4), host1 -> [4,8)
    start, stop = local_batch_slice(8)
    assert (start, stop) == (4 * pid, 4 * pid + 4), (start, stop)
    size = stop - start

    # global mesh over all 4 devices; cross-host psum via a jitted global sum
    mesh = make_mesh()
    x_local = np.arange(start, start + size, dtype=np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), x_local, (8,)
    )
    total = jax.jit(
        lambda a: jnp.sum(a),
        out_shardings=NamedSharding(mesh, P()),
    )(garr)
    np.testing.assert_allclose(np.asarray(total), 28.0)  # 0+1+...+7

    # the metric gather each host's CameraPoseAUC.sync() relies on —
    # different lengths per host exercises the padded allgather
    from openglue_tpu.metrics import _allgather_list
    mine = [float(pid)] * (2 + pid)
    merged = _allgather_list(mine)
    assert sorted(merged) == [0.0, 0.0, 1.0, 1.0, 1.0], merged

    dist.barrier("test-done")
    print(f"WORKER{pid}_OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed_init_psum_and_metric_sync(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    for pid, out in enumerate(outs):
        assert f"WORKER{pid}_OK" in out, out
