"""Multi-host bring-up smoke test (SURVEY.md §4.4): two real OS processes
with jax.distributed.initialize on CPU, verifying the cross-process
collective path the multi-host pod code uses.  Skips gracefully when the
runtime lacks cross-process CPU collectives.
"""
import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    assert jax.process_count() == nproc
    devs = jax.devices()
    mesh = Mesh(devs, ("host",))

    def body(x):
        return jax.lax.psum(x, "host")

    import numpy as np
    local = jnp.asarray([float(pid + 1)])
    out = jax.jit(
        shard_map(body, mesh=mesh, in_specs=P("host"), out_specs=P("host"))
    )(jnp.arange(nproc, dtype=jnp.float32) + 1.0)
    total = float(np.asarray(out.addressable_shards[0].data)[0])
    expected = nproc * (nproc + 1) / 2
    assert total == expected, (total, expected)
    print(f"proc{pid} OK psum={total}")
    """
)


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(nproc), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env={**os.environ, "XLA_FLAGS": ""},
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    codes = [p.returncode for p in procs]
    joined = "\n".join(outs)
    if any(c != 0 for c in codes):
        if "UNIMPLEMENTED" in joined or "not supported" in joined.lower():
            pytest.skip("cross-process CPU collectives unavailable in this build")
        raise AssertionError(f"multiprocess run failed: {joined[-2000:]}")
    assert all("OK psum=3.0" in o for o in outs), joined[-2000:]
