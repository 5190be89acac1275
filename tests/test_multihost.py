"""True multi-process data parallelism via ``jax.distributed`` (VERDICT r1
item 5; SURVEY.md §2.3 multi-host row).

Two OS processes × 2 virtual CPU devices each form one 4-device ``data``
mesh; each runs the SAME shard_map train step used single-host, with the
gradient psums riding cross-process Gloo collectives (ICI on a real pod).
After one optimizer step both processes must hold bit-identical params —
the property pjit/shard_map guarantees by construction and the reference's
single-host NCCL + shadow-copy machinery had to maintain by hand
(/root/reference/dnnlib/tflib/optimizer.py:193-201,
/root/reference/training/training_loop.py:258-297).

Subprocess-based because each jax process needs its own runtime: the
workers are scripts/multihost_worker.py. Compile cost dominates (~2-4 min
per process on this 1-CPU box, serialized), so this is one deliberate
end-to-end case, not a parametrized sweep.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training_step_params_identical(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"worker{i}.json" for i in range(2)]
    env = dict(os.environ)
    # the worker pins platform/device-count via jax.config itself; drop any
    # pytest-level XLA_FLAGS so both processes see the same configuration
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--process-id", str(i),
             "--num-processes", "2", "--coordinator", f"127.0.0.1:{port}",
             "--local-devices", "2", "--out", str(outs[i])],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=1500)[0] for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{log[-4000:]}"

    results = [json.loads(out.read_text()) for out in outs]
    for i, r in enumerate(results):
        assert r["process_id"] == i
        assert r["process_count"] == 2
        assert r["global_devices"] == 4

    # the whole point: one step of the production train step leaves every
    # process with bit-identical replicated state (params, moments, EMA)
    assert results[0]["params_sha256"] == results[1]["params_sha256"]

    # and the psum'd loss scalars agree across processes
    for k, v in results[0]["scalars"].items():
        assert results[1]["scalars"][k] == pytest.approx(v, rel=1e-6), k
