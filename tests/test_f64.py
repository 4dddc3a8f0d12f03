"""f64 validation tier (round-4 verdict item 7).

The reference gets float64 implicitly from numpy (reference
cc/types.h:5-7 pins double on the C++ side too); here f32 is the TPU
production dtype and f64 is the validation mode: ``config.dtype =
jnp.float64`` with jax x64 enabled on CPU.

x64 is a process-global jax flag, so the f64 runs happen in a
SUBPROCESS (same pattern as the cross-process cache test in
test_aux.py); the parent runs the identical f32 registrations and
asserts the results agree within documented envelopes — which both
validates that every family RUNS in f64 (dtype plumbing: no hardcoded
f32 constants poisoning the state) and that the f32 production results
sit near the f64 ground truth.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, os.environ["PROBREG_REPO"])
from probreg_tpu import config
config.config.dtype = jnp.float64
out = {}
exec(open(os.environ["PROBREG_F64_SNIPPET"]).read())
print("F64RESULT " + json.dumps(out))
"""

_SNIPPET = r"""
from probreg_tpu import bcpd, cpd, filterreg, gmmtree, icp, l2dist_regs
from probreg_tpu import se3_op as so

from probreg_tpu.utils.datagen import blobby_surface

src = blobby_surface(400, seed=7).astype(np.float64)
rot = np.asarray(so.euler2mat(*np.deg2rad([8.0, -4.0, 6.0])), np.float64)
tgt = src @ rot.T

res = cpd.registration_cpd(src, tgt, "rigid", maxiter=50, tol=1e-6)
out["cpd_rot"] = np.asarray(res.transformation.rot).tolist()
res = filterreg.registration_filterreg(src, tgt, maxiter=50, tol=1e-6)
out["filterreg_rot"] = np.asarray(res.transformation.rot).tolist()
tf_b = bcpd.registration_bcpd(src, tgt, maxiter=150, tol=1e-8)
_moved = np.asarray(tf_b.transform(src))
_d2 = ((_moved[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
out["bcpd_rmse"] = float(np.sqrt(_d2.min(1)).mean())
res = gmmtree.registration_gmmtree(src, tgt, maxiter=20, tol=1e-6)
out["gmmtree_rot"] = np.asarray(res.transformation.rot).tolist()
res = icp.registration_icp(src, tgt, maxiter=40)
out["icp_rot"] = np.asarray(res.transformation.rot).tolist()
res = l2dist_regs.registration_svr(src, tgt)
out["svr_rot"] = np.asarray(res.rot).tolist()
res = cpd.registration_cpd(src, src + 0.02 * np.sin(3 * src),
                           "nonrigid", maxiter=30, tol=1e-6)
out["nonrigid_moved"] = np.asarray(
    res.transformation.transform(src))[:5].tolist()
out["dtype"] = str(np.asarray(res.transformation.transform(src)).dtype)
"""

# f32-vs-f64 agreement envelopes (max abs elementwise). Rotations are
# well-conditioned group elements: tight. Nonrigid compares moved points
# (includes the M x M / Woodbury solves): looser. BCPD compares the
# registration QUALITY (NN-RMSE), not the state: the f32 and f64 VI
# trajectories diverge after convergence and land on different states.
# The measured f32 quality deficit on this fixture is ~1.6e-2 NN-RMSE
# (0.028 vs 0.013): the dense-Sigma solve's conditioning
# (~s2s2 * lam_max(G) / lmd at converged sigma2) costs f32 several
# digits in the v field — one step of iterative refinement recovers
# ~0.006 of it but doubles the per-iteration M^3 cost, so the envelope
# documents the gap instead. The production-scale low-rank (rank=) path
# replaces this solve with a better-conditioned K x K system.
_ENVELOPES = {
    "cpd_rot": 1e-4,
    "filterreg_rot": 1e-3,
    "bcpd_rmse": 2e-2,
    "gmmtree_rot": 5e-3,
    "icp_rot": 1e-4,
    "svr_rot": 5e-3,
    "nonrigid_moved": 5e-3,
}


@pytest.fixture(scope="module")
def f64_results(tmp_path_factory):
    snip = tmp_path_factory.mktemp("f64") / "snippet.py"
    snip.write_text(_SNIPPET)
    env = dict(os.environ)
    env["PROBREG_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env["PROBREG_F64_SNIPPET"] = str(snip)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER], env=env, capture_output=True,
        text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("F64RESULT ")][-1]
    return json.loads(line[len("F64RESULT "):])


@pytest.fixture(scope="module")
def f32_results():
    ns = {"out": {}, "np": np}
    exec(_SNIPPET, ns)       # f32 run in-process (config.dtype default)
    return ns["out"]


def test_f64_runs_and_is_f64(f64_results):
    assert f64_results["dtype"] == "float64"


@pytest.mark.parametrize("key", sorted(_ENVELOPES))
def test_f32_matches_f64_within_envelope(f64_results, f32_results, key):
    got32 = np.asarray(f32_results[key], np.float64)
    got64 = np.asarray(f64_results[key], np.float64)
    err = float(np.max(np.abs(got32 - got64)))
    assert err <= _ENVELOPES[key], (key, err)
