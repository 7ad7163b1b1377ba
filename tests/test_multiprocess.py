"""Multi-process ``jax.distributed`` coverage (SURVEY §4(e)): two CPU
processes x 4 virtual devices form one 8-device global mesh; the sharded
solve must match a single-process solve bitwise-tolerantly.

The reference has no distributed capability at all; this pins the one this
framework claims (`initialize_distributed` + GSPMD batch sharding).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_solve():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multiprocess_worker.py"),
             str(i), "2", str(port)],
            env=env, cwd=REPO, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise AssertionError(f"multi-process workers hung; partial: {outs}")
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert all("MULTIPROC_OK" in o for o in outs), "\n---\n".join(outs)
