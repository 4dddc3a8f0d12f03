"""Test harness config: run on CPU with 8 virtual devices.

Mirrors the test strategy in SURVEY.md §4: kernel tests against dense
oracles, e2e recovery of known transforms, and a distributed tier on a
simulated 8-device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8).
Must run before jax is imported anywhere.
"""

import os

_BACKEND = os.environ.get("PROBREG_TPU_TEST_BACKEND", "cpu")

os.environ.setdefault("JAX_PLATFORMS", _BACKEND)
os.environ.setdefault("JAX_PLATFORM_NAME", _BACKEND)
_flags = os.environ.get("XLA_FLAGS", "")
if _BACKEND == "cpu" and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
if _BACKEND == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU-gated runs are compile-dominated (test_em_pallas alone was ~27
    # min of compiles, round-4 CLAUDE.md) and the persistent compilation
    # cache is measured to work through the axon tunnel (23.9 -> 12.9 s
    # cold-process 20k CPD, BENCHMARKS.md). Route every gated run through
    # it so re-runs skip every previously-seen whole-EM/kernel compile.
    _cache_dir = os.environ.get(
        "PROBREG_TPU_TEST_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", ".tpu_test_compile_cache"))
    from probreg_tpu import config as _pconfig  # noqa: E402

    _pconfig.enable_compilation_cache(os.path.abspath(_cache_dir))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _ensure_native_io():
    """Build the optional native IO extension once so its tests run.

    Skipped silently when no compiler is available (the extension is
    optional); test_aux.py then skips the native-vs-python comparison.
    """
    import glob
    import shutil
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "probreg_tpu", "cc", "io_native.cpp")
    if not os.path.exists(src):
        return  # testing an installed wheel; the wheel decides
    if glob.glob(os.path.join(root, "probreg_tpu", "_io_native*.so")):
        return
    if shutil.which("g++") is None and shutil.which("cc") is None:
        return
    subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=root, check=False, capture_output=True, timeout=300,
    )


def pytest_configure(config):
    if not hasattr(config, "workerinput"):  # xdist: build in the controller
        _ensure_native_io()


# NOTE: pytest.ini sets `addopts = -n 4` (xdist). XLA:CPU's LLVM JIT
# reliably crashes (SIGSEGV/SIGABRT inside backend_compile) after ~180
# program compilations in one process — whichever test compiles next dies,
# independent of WHICH programs ran (reproduced with the axon plugin off
# the path and with arbitrary test subsets; any half of the suite passes,
# the whole thing never does). Worker processes keep each LLVM JIT well
# under the cliff and halve wall time. TPU runs (one chip) should pass
# `-n0` and run in chunks.


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _load_fixture_cloud():
    """Downsampled horse fixture (reference tests use data/horse.ply @ 0.01)."""
    from probreg_tpu.utils import io as pio

    repo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "horse.ply")
    ref = os.path.join(
        os.environ.get("PROBREG_REF_ROOT", "/root/reference"),
        "data", "horse.ply")
    for p in (repo, ref):
        if os.path.exists(p):
            pts = pio.read_ply(p)
            return pio.voxel_down_sample(pts, 0.01)
    # Fallback: synthetic blobby surface with similar extent/point count.
    g = np.random.default_rng(0)
    n = 900
    theta = g.uniform(0, np.pi, n)
    phi = g.uniform(0, 2 * np.pi, n)
    r = 0.1 * (1.0 + 0.3 * np.sin(3 * theta) * np.cos(2 * phi))
    return np.stack(
        [r * np.sin(theta) * np.cos(phi), r * np.sin(theta) * np.sin(phi), r * np.cos(theta)],
        axis=1,
    )


@pytest.fixture(scope="session")
def horse_cloud():
    return _load_fixture_cloud()
