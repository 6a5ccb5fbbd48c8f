"""True multi-process distributed execution (SURVEY §4): two
coordinator-connected CPU processes (jax.distributed via the
CCPHYLO_TPU_COORDINATOR env path, parallel/multihost.py:28-53) run the
sharded DNJ over a global 4-device mesh; the join records must equal a
single-process run bit for bit."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from .conftest import REPO

WORKER = r"""
import os, sys
import numpy as np
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, os.environ["CCPHYLO_REPO"])
from ccphylo_tpu.parallel.multihost import maybe_init_distributed, row_mesh
from ccphylo_tpu.parallel.sharded_dnj import sharded_dnj_records

multi = maybe_init_distributed()
assert multi == (os.environ.get("CCPHYLO_TPU_NUM_PROCS", "1") != "1"), \
    (multi, jax.process_count())
mesh = row_mesh()
assert len(jax.devices()) == 4, jax.devices()

n = 96
rng = np.random.RandomState(11)
D = rng.randint(1, 300, (n, n)).astype(np.float64)
D = np.tril(D, -1)
D = D + D.T
I, J, LI, LJ, dl = sharded_dnj_records(D, n, mesh, dtype=jnp.float64)
out = os.environ["CCPHYLO_TEST_OUT"]
np.savez(out, I=I, J=J, LI=LI, LJ=LJ, dl=dl)
print("DONE", jax.process_index(), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(extra):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env.update({"PYTHONPATH": str(REPO), "CCPHYLO_REPO": str(REPO),
                "JAX_PLATFORMS": "cpu"})
    env.update(extra)
    return env


def test_two_process_sharded_dnj(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    # single-process reference run (4 virtual devices in one process)
    ref_out = tmp_path / "ref.npz"
    res = subprocess.run(
        [sys.executable, str(script)], capture_output=True, timeout=560,
        env=_env({"CCPHYLO_TEST_OUT": str(ref_out),
                  "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}))
    assert res.returncode == 0, res.stderr.decode(errors="replace")

    # two coordinator-connected processes, 2 local devices each
    port = _free_port()
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"p{pid}.npz"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=_env({
                "CCPHYLO_TEST_OUT": str(out),
                "CCPHYLO_TPU_COORDINATOR": f"127.0.0.1:{port}",
                "CCPHYLO_TPU_NUM_PROCS": "2",
                "CCPHYLO_TPU_PROC_ID": str(pid),
            })))
    for p in procs:
        try:
            so, se = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, se.decode(errors="replace")

    ref = np.load(ref_out)
    for out in outs:
        got = np.load(out)
        for key in ("I", "J", "LI", "LJ", "dl"):
            np.testing.assert_array_equal(got[key], ref[key], err_msg=key)
