"""Aux subsystems: checkpoint/resume, iteration timing, interop, io."""

import os

import _fixtures
import numpy as np
import pytest

from probreg_tpu import cpd
from probreg_tpu.utils import checkpoint, profiling, se3_op


def test_checkpoint_roundtrip_and_resume(tmp_path, horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([6.0, 0.0, 4.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T

    res = cpd.registration_cpd(src, tgt, maxiter=10, tol=0.0)
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, res)
    back = checkpoint.load_state(path, res)
    np.testing.assert_allclose(
        np.asarray(back.transformation.rot), np.asarray(res.transformation.rot))

    # Resume from the saved transform: should converge at least as well as
    # running the remaining iterations from scratch.
    params = checkpoint.rigid_tf_init_params(res.transformation)
    res2 = cpd.registration_cpd(src, tgt, maxiter=40, tol=1e-6,
                                tf_init_params=params)
    rec = np.asarray(se3_op.mat2euler(res2.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-2)


def test_iteration_timer(horse_cloud):
    src = np.asarray(horse_cloud, dtype=np.float32)[::4]
    tgt = src.copy()
    timer = profiling.IterationTimer()
    cpd.registration_cpd(src, tgt, maxiter=5, tol=0.0, callbacks=[timer])
    assert len(timer.laps) == 5
    assert timer.total > 0.0


def test_time_fn():
    import jax.numpy as jnp

    t = profiling.time_fn(lambda x: jnp.sum(x * x), jnp.ones(1000),
                          n_warmup=1, n_iter=3)
    assert t >= 0.0


def test_native_io_matches_python():
    """Native C++ loader (when built) agrees with the python fallback."""
    import importlib

    from probreg_tpu.utils import io as pio

    try:
        from probreg_tpu import _io_native as nat
    except ImportError:
        import pytest

        pytest.skip("native IO extension not built (run `make native`)")
    ply = _fixtures.ref_path("data/horse.ply", skip=False)
    pcd = _fixtures.ref_path("examples/bunny.pcd", skip=False)
    if os.path.exists(ply):
        a = nat.read_ply(ply)
        # Force the python path for comparison.
        pio_nat = pio._nat
        try:
            pio._nat = None
            b = pio.read_ply(ply)
        finally:
            pio._nat = pio_nat
        np.testing.assert_allclose(a, b, atol=1e-12)
    rng = np.random.default_rng(1)
    pts = rng.random((2000, 3))
    va = nat.voxel_down_sample(pts, 0.07)
    pio_nat = pio._nat
    try:
        pio._nat = None
        vb = pio.voxel_down_sample(pts, 0.07)
    finally:
        pio._nat = pio_nat
    assert va.shape == vb.shape
    assert set(map(tuple, np.round(va, 9))) == set(map(tuple, np.round(vb, 9)))


def test_maximization_step_default_sigma2p(rng, horse_cloud):
    """Public maximization_step works without sigma2_p (review fix)."""
    from probreg_tpu import cpd as cpd_mod

    src = np.asarray(horse_cloud, dtype=np.float32)[::4]
    c = cpd_mod.RigidCPD(src)
    est = c.expectation_step(src, src + 0.01, 0.5)
    res = c.maximization_step(src + 0.01, est)
    assert np.isfinite(np.asarray(res.transformation.rot)).all()


def test_read_batch_matches_single_and_fallback():
    """Threaded native batch loader == per-file loads == python fallback."""
    import os

    import numpy as np
    import pytest

    from probreg_tpu.utils import io as pio

    paths = []
    for p in (_fixtures.ref_path("data/horse.ply", skip=False),
              _fixtures.ref_path("examples/bunny.pcd", skip=False)):
        if os.path.exists(p):
            paths.append(p)
    if not paths:
        pytest.skip("horse/bunny fixtures unavailable")
    paths = paths * 3
    batch = pio.read_batch(paths, voxel_size=0.005, threads=4)
    assert len(batch) == len(paths)
    for p, got in zip(paths, batch):
        want = pio.voxel_down_sample(pio.read_point_cloud(p), 0.005)
        np.testing.assert_allclose(got, want, atol=1e-12)
    # Python fallback produces the same results.
    nat = pio._nat
    pio._nat = None
    try:
        fb = pio.read_batch(paths, voxel_size=0.005)
    finally:
        pio._nat = nat
    for a, b in zip(batch, fb):
        np.testing.assert_allclose(a, b, atol=1e-9)
    # Error path names the failing file.
    if nat is not None:
        with pytest.raises(ValueError, match="no_such_file"):
            pio.read_batch(["/tmp/no_such_file.ply"])


def test_compilation_cache_helper(tmp_path):
    # The helper persists compiled programs across PROCESSES; run a tiny
    # registration twice in subprocesses sharing one cache dir and assert
    # the cache was written and read (dir non-empty after run 1, run 2
    # still correct).
    import subprocess
    import sys

    prog = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from probreg_tpu import config as cfg, cpd
cfg.enable_compilation_cache(%r, min_compile_secs=0.0)
rng = np.random.default_rng(0)
src = rng.random((200, 3)).astype(np.float32)
res = cpd.registration_cpd(src, src + 0.01, maxiter=5, tol=0.0)
print(float(np.asarray(res.sigma2)))
"""
    cache = str(tmp_path / "xla_cache")
    outs = []
    # Force the subprocess onto CPU at the ENV level too: under the
    # real-TPU suite (PROBREG_TPU_TEST_BACKEND=axon) the inherited
    # JAX_PLATFORMS=axon makes the child fight the parent for the one
    # chip and fail backend init.
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "JAX_PLATFORM_NAME": "cpu"}
    env.pop("PROBREG_TPU_TEST_BACKEND", None)
    for _ in range(2):
        p = subprocess.run([sys.executable, "-c", prog % cache],
                           capture_output=True, text=True, timeout=300,
                           env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        assert p.returncode == 0, p.stderr[-2000:]
        outs.append(p.stdout.strip().splitlines()[-1])
    import glob as _glob
    assert _glob.glob(os.path.join(cache, "*")), "cache dir stayed empty"
    assert outs[0] == outs[1]


def _morton_numpy_reference(pts):
    """Inline copy of ops/spatial.morton_order_np's NUMPY math (the public
    function routes f32 input to the native extension, so the equivalence
    test must build the reference permutation itself)."""
    dim = pts.shape[1]
    lo = pts.min(axis=0)
    span = np.maximum(pts.max(axis=0) - lo, np.finfo(np.float32).tiny)
    bits = 10 if dim >= 3 else 15
    scale = float(2 ** bits - 1)
    q = np.clip((pts - lo) / span * scale, 0.0, scale).astype(np.int64)

    def spread(x, step):
        out = np.zeros_like(x)
        for b in range(bits):
            out |= ((x >> b) & 1) << (b * step)
        return out

    if dim == 2:
        code = spread(q[:, 0], 2) | (spread(q[:, 1], 2) << 1)
    else:
        code = spread(q[:, 0], 3) | (spread(q[:, 1], 3) << 1) \
            | (spread(q[:, 2], 3) << 2)
    return np.argsort(code, kind="stable")


def test_native_morton_matches_numpy():
    nat = pytest.importorskip("probreg_tpu._io_native")
    if not hasattr(nat, "morton_order"):
        pytest.skip("extension built before morton_order")
    from probreg_tpu.ops import spatial

    rng = np.random.default_rng(7)
    for n, d in ((20000, 3), (12000, 2)):
        pts = rng.random((n, d)).astype(np.float32)
        native = np.asarray(nat.morton_order(pts))
        np.testing.assert_array_equal(native, _morton_numpy_reference(pts))
        # The public helper must route f32 input to the native path.
        np.testing.assert_array_equal(native, spatial.morton_order_np(pts))
        # Z-order means consecutive points are near each other: mean NN
        # distance along the order must beat the unsorted order clearly.
        step_sorted = np.linalg.norm(np.diff(pts[native], axis=0), axis=1).mean()
        step_raw = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
        assert step_sorted < 0.35 * step_raw


def test_write_read_roundtrip(tmp_path, rng):
    """write_ply/write_pcd round-trip through both readers (the writers
    exist so the repo can ship its own re-encoded fixtures; reference IO
    is Open3D-only)."""
    from probreg_tpu.utils import io as pio

    pts = rng.random((57, 3)).astype(np.float32)
    for name, binary in (("a.ply", True), ("b.ply", False)):
        p = str(tmp_path / name)
        pio.write_ply(p, pts, binary=binary)
        np.testing.assert_allclose(pio.read_point_cloud(p), pts, atol=1e-6)
    for name, binary in (("a.pcd", False), ("b.pcd", True)):
        p = str(tmp_path / name)
        pio.write_pcd(p, pts, binary=binary)
        np.testing.assert_allclose(pio.read_point_cloud(p), pts, atol=1e-6)
    p = str(tmp_path / "c.txt")
    pio.write_point_cloud(p, pts)
    np.testing.assert_allclose(pio.read_point_cloud(p), pts, atol=1e-6)


def test_repo_fixtures_standalone():
    """The shipped data/ fixtures load without the reference mount."""
    from probreg_tpu.utils import io as pio

    data = _fixtures.REPO_DATA
    bunny = pio.read_pcd(os.path.join(data, "bunny.pcd"))
    horse = pio.read_ply(os.path.join(data, "horse.ply"))
    fish = np.loadtxt(os.path.join(data, "fish_source.txt"))
    assert bunny.shape[1] == 3 and bunny.shape[0] > 300
    assert horse.shape[1] == 3 and horse.shape[0] > 2000
    assert fish.shape == (91, 2)

def test_config_clear_caches_makes_dispatch_knobs_live():
    """Kernel-dispatch knobs are read at trace time; config.clear_caches()
    is the documented way to make a mutated knob apply to already-compiled
    shapes (config.py module docstring)."""
    import jax
    import jax.numpy as jnp

    from probreg_tpu import config as cfgmod

    calls = []

    @jax.jit
    def f(x):
        calls.append(cfgmod.config.estep_chunk)   # trace-time read
        return x + 1

    old = cfgmod.config.estep_chunk
    try:
        f(jnp.zeros(3))
        cfgmod.config.estep_chunk = old + 1
        f(jnp.zeros(3))                 # cached: no retrace, stale knob
        assert calls == [old]
        cfgmod.clear_caches()
        f(jnp.zeros(3))                 # retraced: new knob observed
        assert calls == [old, old + 1]
    finally:
        cfgmod.config.estep_chunk = old
