"""Multi-host bring-up test (VERDICT round-1 item 3).

Spawns two real OS processes, each a jax "host" with 2 virtual CPU devices,
joined via parallel.initialize_distributed (jax.distributed + Gloo CPU
collectives on localhost). Runs registration_cpd_sharded over the 4 GLOBAL
devices and asserts:

- both processes complete and agree bitwise (SPMD determinism), and
- the recovered transform matches the ground truth at the single-process
  CPD tolerances (reference tests/test_cpd.py: rot 1e-2, trans 1e-4).

This exercises the multi-host code path (parallel/__init__.py) that single-
process virtual-mesh tests cannot reach: cross-process device_put, Gloo
psum/all-gather, and multi-controller result fetch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from probreg_tpu.utils import se3_op


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_cpd(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    port = _free_port()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # The workers are CPU-Gloo hosts regardless of the suite's backend:
    # inherited axon/TPU platform env vars make the plugin's get_backend
    # hook resolve 'tpu' inside the worker (observed on the real-chip
    # suite run) and two workers would fight over the one chip anyway.
    env["PROBREG_TPU_TEST_BACKEND"] = "cpu"
    env["JAX_PLATFORMS"] = env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"

    r0 = np.load(tmp_path / "proc0.npz")
    r1 = np.load(tmp_path / "proc1.npz")
    assert int(r0["nproc"]) == 2 and int(r0["ndev"]) == 4

    # SPMD: both controllers computed the same replicated result.
    np.testing.assert_array_equal(r0["rot"], r1["rot"])
    np.testing.assert_array_equal(r0["t"], r1["t"])

    rot_true = np.asarray(se3_op.euler2mat(*r0["ang"]))
    rec = np.asarray(se3_op.mat2euler(r0["rot"]))
    np.testing.assert_allclose(rec, r0["ang"], atol=1e-2)
    np.testing.assert_allclose(r0["t"], r0["t_true"], atol=1e-3)
    # Rotation-angle distance as a stricter aggregate check.
    err = float(np.asarray(se3_op.rotation_angle(r0["rot"], rot_true)))
    assert err < 5e-3, err

    # 2-D (2, 2) mesh across the two processes: the den psum over the
    # m-axis crosses the process boundary; same agreement + recovery bars.
    np.testing.assert_array_equal(r0["rot2d"], r1["rot2d"])
    np.testing.assert_array_equal(r0["t2d"], r1["t2d"])
    err2d = float(np.asarray(se3_op.rotation_angle(r0["rot2d"], rot_true)))
    assert err2d < 5e-3, err2d
    np.testing.assert_allclose(r0["t2d"], r0["t_true"], atol=1e-3)

    # FilterReg + low-rank BCPD on the same cross-process 2-D mesh:
    # bitwise SPMD agreement + transform recovery.
    np.testing.assert_array_equal(r0["rot2df"], r1["rot2df"])
    errf = float(np.asarray(se3_op.rotation_angle(r0["rot2df"], rot_true)))
    assert errf < 5e-2, errf
    np.testing.assert_array_equal(r0["rot2db"], r1["rot2db"])
    np.testing.assert_array_equal(r0["moved2db"], r1["moved2db"])
    # BCPD splits motion between the rigid part and v; score the moved
    # cloud by the NN criterion the algorithm optimizes.
    src_b, tgt_b = r0["src_b"], r0["tgt_b"]
    d2_id = ((src_b[:, None] - tgt_b[None]) ** 2).sum(-1)
    d2_mv = ((r0["moved2db"][:, None] - tgt_b[None]) ** 2).sum(-1)
    assert np.sqrt(d2_mv.min(1).mean()) < 0.5 * np.sqrt(d2_id.min(1).mean())
