"""Multi-host simulation: 2 real processes, gloo coordinator, full Trainer.

The only executed coverage of the multi-host subsystem (SURVEY.md §2.2 /
§5 distributed comm backend): jax.distributed initialization, a global mesh
spanning both processes' devices, per-process loader sharding with the
global batch assembled via make_array_from_process_local_data, XLA
cross-process gradient all-reduces, rank-0-only stdout/wandb logging with
the rank-consistent run-info broadcast, and multiprocess-coordinated Orbax
checkpointing at end of fit.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon TPU plugin out
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"

    worker = pathlib.Path(__file__).with_name("multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), str(tmp_path)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    results = []
    for i in range(2):
        f = tmp_path / f"rank{i}.json"
        assert f.exists(), outs[i][-2000:]
        results.append(json.loads(f.read_text()))

    for r in results:
        assert r["world"] == 2
        assert r["devices"] == 2  # global device view spans both processes
        assert r["step"] == 2
        assert np.isfinite(r["cross-entropy"])
    # Metrics are computed on replicated device state — identical across ranks.
    assert results[0]["cross-entropy"] == pytest.approx(
        results[1]["cross-entropy"], rel=1e-6
    )

    # Rank 0 writes the end-of-fit checkpoint (multiprocess Orbax).
    ckpts = tmp_path / "runs" / "mh-sim" / "checkpoints"
    assert any(ckpts.glob("*")), list(tmp_path.rglob("*"))[:20]
