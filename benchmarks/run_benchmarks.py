"""Benchmark suite for probreg_tpu (north-star metrics from BASELINE.md).

Usage:
  python benchmarks/run_benchmarks.py bunny      # per-algorithm, current device
  python benchmarks/run_benchmarks.py estep      # large-N E-step pair throughput
  python benchmarks/run_benchmarks.py scaling    # sharded scaling (virtual mesh OK)
  python benchmarks/run_benchmarks.py all

Remote-TPU note: one dispatch+sync through the harness tunnel costs ~33 ms
RTT; jit-able paths are measured amortized over an on-device batch (see
bench.py), host-loop paths (SVR BFGS) single-shot.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # The axon TPU plugin ignores the env var; force via config.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def _sync_mode():
    import jax
    import jax.numpy as jnp

    float(jnp.sum(jnp.ones(8)))  # force the transport out of pipelined mode


def bench_bunny():
    import jax
    import jax.numpy as jnp

    import bench as B
    from probreg_tpu import cpd, filterreg, gmmtree, l2dist_regs

    src, tgt = B.prepare_clouds()
    src_d, tgt_d = jax.device_put(src), jax.device_put(tgt)
    jax.block_until_ready((src_d, tgt_d))
    _sync_mode()
    K = 30

    def timed_batch(tag, run_one, ref_ms):
        @jax.jit
        def batch(s, t):
            def body(carry, _):
                out = run_one(s, t)
                return carry + out[0] * 1e-30, out[1]
            acc, last = jax.lax.scan(body, jnp.asarray(0.0, s.dtype), None,
                                     length=K)
            return acc, last
        jax.block_until_ready(batch(src_d, tgt_d))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(batch(src_d, tgt_d))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3 / K
        print(f"{tag}: {ms:.2f} ms/registration (reference {ref_ms} ms CPU -> "
              f"{ref_ms/ms:.1f}x)")

    on_tpu = jax.default_backend() == "tpu"

    def cpd_one(s, t):
        if on_tpu:
            from probreg_tpu.ops import em_pallas

            lin, tt, sc, s2, q = em_pallas.run_em_rigid_fused(
                s, t, w=0.0, maxiter=100, tol=0.001)
            return q, lin
        lin, tt, sc, s2, q = cpd._run_em_t(s, t, kind="rigid", w=0.0,
                                           maxiter=100, tol=0.001)
        return q, lin

    def frg_one(s, t):
        if on_tpu:
            from probreg_tpu.ops import em_pallas

            r, tt, s2, q = em_pallas.run_em_filterreg_fused(
                s, t, maxiter=50, tol=0.001)
            return q, r
        res = filterreg._run_em_rigid(
            s, t, None, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            np.float32(0.0), objective_type="pt2pt", update_sigma2=False,
            w=0.0, maxiter=50, tol=0.001, min_sigma2=1e-4, auto_sigma2=True)
        return res.sigma2, res.transformation.rot

    def cpd_affine_one(s, t):
        if on_tpu:
            from probreg_tpu.ops import em_pallas

            b, tt, s2, q = em_pallas.run_em_affine_fused(
                s, t, w=0.0, maxiter=100, tol=0.001)
            return q, b
        lin, tt, sc, s2, q = cpd._run_em_t(s, t, kind="affine", w=0.0,
                                           maxiter=100, tol=0.001)
        return q, lin

    from probreg_tpu.ops import fpfh as _fpfh

    nrm_d = jax.device_put(np.asarray(_fpfh.estimate_normals(tgt, radius=0.02),
                                      np.float32))
    jax.block_until_ready(nrm_d)

    def frg_pt2pl_one(s, t):
        if on_tpu:
            from probreg_tpu.ops import em_pallas

            r, tt, s2, q = em_pallas.run_em_filterreg_fused(
                s, t, nrm_d, maxiter=50, tol=0.001, objective="pt2pl")
            return q, r
        res = filterreg._run_em_rigid(
            s, t, nrm_d, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            np.float32(0.0), objective_type="pt2pl", update_sigma2=False,
            w=0.0, maxiter=50, tol=0.001, min_sigma2=1e-4, auto_sigma2=True)
        return res.sigma2, res.transformation.rot

    timed_batch("CPD rigid  ", cpd_one, 38.1)
    timed_batch("CPD affine ", cpd_affine_one, 38.1)
    timed_batch("FilterReg  ", frg_one, 5.1)
    timed_batch("FRg pt2pl  ", frg_pt2pl_one, 5.1)

    # GMMTree: tree build is one-time; time the jitted registration loop.
    gt = gmmtree.GMMTree(src)
    pi, mu, cov = gt._nodes
    jax.block_until_ready(pi)

    def gmm_one(s, t):
        rot, tt, q = gmmtree._run_registration(
            t, pi, mu, cov, jnp.eye(3, dtype=t.dtype),
            jnp.zeros(3, dtype=t.dtype), max_level=2, lambda_c=0.01,
            maxiter=20, tol=1e-4)
        return q, rot

    timed_batch("GMMTree    ", gmm_one, 105.4)

    # SVR drives scipy BFGS from the host: single-shot (includes RTTs).
    l2dist_regs.registration_svr(src, tgt)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        l2dist_regs.registration_svr(src, tgt)
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    print(f"SVR rigid  : {ms:.1f} ms/registration single-shot incl. host BFGS "
          f"round-trips (reference 36.5 ms CPU)")


def bench_estep():
    import jax
    import jax.numpy as jnp

    from probreg_tpu.ops import estep as eo

    _sync_mode()
    rng = np.random.default_rng(0)
    K = 10
    for mn in (16384, 65536, 131072):
        src = jax.device_put(rng.normal(size=(mn, 3)).astype(np.float32))
        tgt = jax.device_put(rng.normal(size=(mn, 3)).astype(np.float32))

        @jax.jit
        def loop(s, t, s2):
            def body(i, s2):
                mom = eo.estep_xla(s, t, s2, w=0.0)
                return s2 + mom.n_p * 1e-30
            return jax.lax.fori_loop(0, K, body, s2)

        s2 = jnp.asarray(0.7, jnp.float32)
        jax.block_until_ready(loop(src, tgt, s2))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(src, tgt, s2))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / K
        print(f"E-step M=N={mn}: {dt*1e3:.1f} ms "
              f"({mn*mn/dt/1e9:.1f} Gpair/s)")


def bench_scaling():
    import jax

    if jax.default_backend() != "cpu" and len(jax.devices()) < 2:
        print("scaling: single accelerator attached; run with "
              "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
              "device_count=8 for the virtual-mesh measurement")
        return
    import jax.numpy as jnp

    from probreg_tpu.parallel import sharded

    rng = np.random.default_rng(0)
    # Sized for the virtual-CPU-mesh CI measurement; on real pod slices
    # raise to >= 100k.
    m = n = 8192 if jax.default_backend() == "cpu" else 65536
    src = rng.normal(size=(m, 3)).astype(np.float32)
    tgt = rng.normal(size=(n, 3)).astype(np.float32)

    base = None
    for ndev in (1, 2, 4, 8):
        if ndev > len(jax.devices()):
            break
        mesh = sharded.make_mesh(jax.devices()[:ndev])
        tgt_sh, mask_sh, _ = sharded.shard_points(tgt, mesh)
        s2 = jnp.asarray(0.7, jnp.float32)

        def run():
            mom = sharded.estep_sharded(
                jnp.asarray(src), tgt_sh, mask_sh, s2, 0.0, n, mesh)
            jax.block_until_ready(mom.p1)

        run()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        if base is None:
            base = dt
        eff = base / (dt * ndev) * 100
        print(f"sharded E-step {ndev} devices: {dt*1e3:.1f} ms "
              f"(scaling efficiency {eff:.0f}%)")
    if jax.default_backend() == "cpu":
        print("NOTE: virtual CPU devices share the host's cores and XLA "
              "already multithreads the 1-device case, so this measures "
              "partition+collective overhead, not speedup; real scaling "
              "needs a multi-chip TPU slice (each shard gets its own MXU).")


def bench_lowrank():
    """Dense vs low-rank (rank=60) nonrigid CPD / BCPD across cloud sizes.

    The dense paths carry the reference's O(M^2) Gram matrix and O(M^3)
    solve (cpd.py:284-303, bcpd.py:114,130); the low-rank paths
    (ops/lowrank.py) should hold per-iteration cost ~linear in M.
    """
    import jax

    from probreg_tpu import bcpd, cpd

    _sync_mode()
    rng = np.random.default_rng(0)
    maxiter = 20

    def cloud(m):
        g = int(np.sqrt(m))
        lin = np.linspace(0.0, 1.0, g)
        xx, yy = np.meshgrid(lin, lin)
        s = np.stack(
            [xx, yy, 0.3 * np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy)],
            axis=-1).reshape(-1, 3).astype(np.float32)
        d = 0.05 * np.stack(
            [np.sin(np.pi * yy), np.cos(np.pi * xx), np.sin(np.pi * (xx + yy))],
            axis=-1).reshape(-1, 3).astype(np.float32)
        return s, (s + d + rng.normal(0, 1e-3, s.shape).astype(np.float32))

    def timed(run):
        jax.block_until_ready(run())  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3

    for m in (1024, 4096, 16384, 65536):
        src, tgt = cloud(m)
        row = [f"M=N={src.shape[0]:>6}"]
        dense_ok = src.shape[0] <= 4096  # M x M Gram beyond this
        if dense_ok:
            reg = cpd.NonRigidCPD(src)
            ms = timed(
                lambda: reg.registration(tgt, maxiter=maxiter, tol=0.0).sigma2)
            row.append(f"cpd-dense {ms:8.1f} ms")
        else:
            row.append("cpd-dense      (skipped: O(M^2) Gram)")
        reg = cpd.NonRigidCPD(src, rank=60)
        ms = timed(
            lambda: reg.registration(tgt, maxiter=maxiter, tol=0.0).sigma2)
        row.append(f"cpd-lr60 {ms:8.1f} ms")
        if dense_ok:
            b = bcpd.CombinedBCPD(src)
            ms = timed(lambda: b.registration(tgt, maxiter=maxiter, tol=0.0))
            row.append(f"bcpd-dense {ms:8.1f} ms")
        b = bcpd.CombinedBCPD(src, rank=60)
        ms = timed(lambda: b.registration(tgt, maxiter=maxiter, tol=0.0))
        row.append(f"bcpd-lr60 {ms:8.1f} ms")
        print("  ".join(row) + f"   ({maxiter} iters)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("bunny", "all"):
        bench_bunny()
    if which in ("estep", "all"):
        bench_estep()
    if which in ("lowrank", "all"):
        bench_lowrank()
    if which in ("scaling", "all"):
        bench_scaling()
