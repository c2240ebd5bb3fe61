"""Multi-host distributed layer (SURVEY.md §2.4): two real processes, 4
virtual CPU devices each, one global 8-device mesh — distributed init,
process-sharded input loading (each host materializes only its slice),
and cross-process collectives. On a TPU pod the same code path rides
ICI/DCN; here the collective backend is the CPU transport."""

import os
import socket
import subprocess
import sys

import pytest

from pix2pose_tpu.parallel import process_slice


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_process_slice_single_host():
    # single-process: the whole batch is this host's slice
    assert process_slice(8) == slice(0, 8)


def test_two_process_mesh_and_host_sharded_inputs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), repo],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}/2" in out, out
