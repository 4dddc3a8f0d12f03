"""Tile-culled E-step benchmark (real TPU).

Sweeps sigma2 from the EM starting temperature down the annealing range and
measures the culled kernel against the dense XLA scan and the dense fused
kernel, plus a whole large-N rigid CPD registration with the culled path on
vs off.

Run detached: nohup python benchmarks/bench_culled.py > /tmp/bench_culled.log
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jnp.asarray(x)))


def timeit(fn, *args, reps=3):
    fn(*args)  # compile
    sync(fn(*args).p1)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r.p1)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from probreg_tpu.ops import estep as eo
    from probreg_tpu.ops import estep_pallas as ep

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    for n in (65_536, 131_072):
        src = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        tgt = (src + rng.normal(0, 0.002, (n, 3))).astype(np.float32)
        pairs = n * n
        # EM temperature schedule: sigma2_0 = mean pairwise d^2 / dim ~ 0.67
        # for U[-1,1]^3; anneal 4 decades (typical clean-cloud trajectory).
        s2_0 = 0.67
        print(f"\n== M=N={n} ==", flush=True)
        for dec in range(0, 9):
            s2 = s2_0 * (10.0 ** (-dec * 0.5))
            from probreg_tpu.ops.spatial import morton_order
            py = np.asarray(morton_order(src))
            px = np.asarray(morton_order(tgt))
            frac = float(ep.active_tile_fraction(src[py], tgt[px], s2))
            t_xla = timeit(lambda a, b: eo.estep_xla(a, b, jnp.float32(s2)),
                           src, tgt)
            t_cul = timeit(
                lambda a, b: ep.estep_culled(a, b, jnp.float32(s2)),
                src, tgt)
            t_auto = timeit(
                lambda a, b: ep.estep_auto(a, b, jnp.float32(s2)),
                src, tgt)
            t_c512 = timeit(
                lambda a, b: ep.estep_culled(a, b, jnp.float32(s2),
                                             tile_m=512, tile_n=512),
                src, tgt)
            print(f"s2={s2:9.2e} frac={frac:5.3f} "
                  f"xla={t_xla*1e3:7.1f}ms ({pairs/t_xla/1e9:5.1f}G/s) "
                  f"culled={t_cul*1e3:7.1f}ms ({pairs/t_cul/1e9:5.1f}G/s) "
                  f"c512={t_c512*1e3:7.1f}ms "
                  f"auto={t_auto*1e3:7.1f}ms "
                  f"speedup={t_xla/min(t_cul, t_c512, t_auto):5.2f}x",
                  flush=True)
        # Dense fused (cull=False) for the two-pass baseline at one sigma2.
        t_dense = timeit(
            lambda a, b: ep.estep_fused(a, b, jnp.float32(s2_0), cull=False),
            src, tgt)
        print(f"dense fused two-pass @s2_0: {t_dense*1e3:.1f}ms "
              f"({pairs/t_dense/1e9:.1f}G/s)", flush=True)

    # Whole-registration comparison: streaming path (m*n > 2^28).
    from probreg_tpu import cpd
    from probreg_tpu.config import config
    from probreg_tpu.utils import se3_op as so

    n = 200_000
    src = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rot = np.asarray(so.euler2mat(*np.deg2rad([3.0, -2.0, 5.0])), np.float32)
    tgt = src @ rot.T

    for culled in (True, False):
        config.use_culled_estep = culled
        t0 = time.perf_counter()
        res = cpd.registration_cpd(src, tgt, maxiter=60, tol=1e-10)
        err = float(np.abs(np.asarray(res.transformation.rot) - rot).max())
        dt = time.perf_counter() - t0
        print(f"\nrigid CPD {n}x{n} maxiter=60 culled(auto)={culled}: "
              f"{dt:.1f}s  rot_err={err:.2e}", flush=True)
    config.use_culled_estep = True


if __name__ == "__main__":
    main()
