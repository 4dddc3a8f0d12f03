"""Pass-level roofline decomposition of the single-exp g-stash E-step.

Round-4 verdict weak #1: `fused_stash_core` delivers ~64 Gpair/s dense
against a ~98 G/s exp ceiling and a ~102 G/s stash-traffic ceiling —
where does every nanosecond go? This bench times each pass and each
sub-stage of pass A in isolation on the real chip, plus variants
(bf16 stash, inv-den folded into the channel matmul), so kernel work
targets the measured bottleneck instead of a guess.

Usage: python benchmarks/bench_stash_passes.py [m] [tile_m] [tile_n]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _timeit(fn, reps=5):
    import jax

    out = fn()
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(leaf).ravel()[0])  # force sync transport mode
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from probreg_tpu import config as pconfig
    from probreg_tpu.ops import estep_pallas as ep
    from probreg_tpu.ops.spatial import morton_order_np
    from probreg_tpu.utils.datagen import blobby_surface

    # Reruns of this sweep recompile ~10 programs; the persistent cache
    # works through the axon tunnel (BENCHMARKS.md).
    pconfig.enable_compilation_cache(
        __file__.rsplit("/", 2)[0] + "/.jax_compile_cache")

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    tile_m = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    tile_n = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    n = m
    sigma2 = 6.7e-1          # dense regime (no tile culled)
    src = blobby_surface(m, seed=0)
    tgt = (src + 0.002 * np.random.default_rng(1).normal(size=src.shape)
           ).astype(np.float32)
    src = src[morton_order_np(src)]
    tgt = tgt[morton_order_np(tgt)]
    pairs = float(m) * n

    ys_t, y2 = ep._pad_transpose(jnp.asarray(src), tile_m)
    xs_t, x2 = ep._pad_transpose(jnp.asarray(tgt), tile_n)
    # Channel rows: [y... wait — moments use TARGET channels]
    mp, np_ = ys_t.shape[1], xs_t.shape[1]
    n_i, n_j = mp // tile_m, np_ // tile_n
    inv2s2 = jnp.float32(0.5 / sigma2)
    scal = jnp.stack([inv2s2, jnp.float32(1e-6)])
    mask = jnp.ones((n_i, n_j), jnp.float32)
    act, eff = ep._stripe_compaction(mask)
    xs_blocks = xs_t.reshape(ep._SUBLANES, n_j, tile_n).transpose(1, 0, 2)
    x2_blocks = x2.reshape(1, n_j, tile_n).transpose(1, 0, 2)

    results = {}

    def emit(name, gpairs):
        # Print incrementally: a later-variant lowering failure must not
        # lose the measurements already taken (happened with HIGH dots).
        results[name] = gpairs
        print(json.dumps({"metric": f"stash_{name}_gpairs",
                          "value": round(gpairs, 1), "unit": "Gpair/s",
                          "m": m, "tile": [tile_m, tile_n]}), flush=True)

    # ---- full kernel (production entry), f32 + bf16 stash
    @jax.jit
    def full_f32():
        return ep.fused_stash_core(scal, ys_t, y2, xs_t, x2,
                                   tile_m=tile_m, tile_n=tile_n)[1]

    @jax.jit
    def full_bf16():
        return ep.fused_stash_core(scal, ys_t, y2, xs_t, x2,
                                   tile_m=tile_m, tile_n=tile_n,
                                   stash_dtype=jnp.bfloat16)[1]

    @jax.jit
    def merged_f32():
        return ep.fused_stash_merged_core(scal, ys_t, y2, xs_t, x2,
                                          tile_m=tile_m, tile_n=tile_n)[1]

    @jax.jit
    def merged_bf16():
        return ep.fused_stash_merged_core(scal, ys_t, y2, xs_t, x2,
                                          tile_m=tile_m, tile_n=tile_n,
                                          stash_dtype=jnp.bfloat16)[1]

    # Start-temperature fast mode: DEFAULT-precision d2 cross term (one
    # bf16 MXU pass instead of HIGHEST's six) — the d2+exp stage alone
    # measures 272 vs 99 Gpair/s, so this bounds the gated dense pipeline.
    @jax.jit
    def full_default():
        return ep.fused_stash_core(scal, ys_t, y2, xs_t, x2,
                                   tile_m=tile_m, tile_n=tile_n,
                                   precision=jax.lax.Precision.DEFAULT)[1]

    @jax.jit
    def full_default_bf16():
        return ep.fused_stash_core(scal, ys_t, y2, xs_t, x2,
                                   tile_m=tile_m, tile_n=tile_n,
                                   stash_dtype=jnp.bfloat16,
                                   precision=jax.lax.Precision.DEFAULT)[1]

    emit("full_f32", pairs / _timeit(full_f32) / 1e9)
    emit("full_bf16", pairs / _timeit(full_bf16) / 1e9)
    emit("full_default", pairs / _timeit(full_default) / 1e9)
    emit("full_default_bf16", pairs / _timeit(full_default_bf16) / 1e9)
    emit("merged_f32", pairs / _timeit(merged_f32) / 1e9)
    emit("merged_bf16", pairs / _timeit(merged_bf16) / 1e9)

    # ---- pass A only (den+stash, no moment kernel)
    den_kernel = pl.pallas_call(
        ep._stash_den_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ep._SUBLANES, tile_m),
                             lambda i, act, eff: (0, eff[i])),
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, eff[i])),
                pl.BlockSpec((ep._SUBLANES, tile_n),
                             lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, 1), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff: (eff[i], 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, tile_n), jnp.float32),
            jax.ShapeDtypeStruct((1, tile_n), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, tile_n), jnp.float32),
        ],
    )

    @jax.jit
    def pass_a_only():
        def stripe(carry, blk):
            xs_b, x2_b, act_b, eff_b = blk
            den, pt1_b, xx_b, gst = den_kernel(
                act_b, eff_b, scal, ys_t, y2, xs_b, x2_b)
            # consume den only (gst write still happens; stash unread)
            return carry + xx_b[0, 0], None
        acc, _ = jax.lax.scan(
            stripe, jnp.zeros((), jnp.float32),
            (xs_blocks, x2_blocks, act, eff))
        return acc

    emit("pass_a", pairs / _timeit(pass_a_only) / 1e9)

    # ---- pass B only (moment kernel over a prebuilt stash, reused per
    # stripe: measures pass B's sustained rate on stash-sized blocks)
    moment_kernel = pl.pallas_call(
        ep._stash_moment_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec((ep._SUBLANES, tile_n),
                             lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff: (eff[i], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, i)),
                pl.BlockSpec((ep._SUBLANES, tile_m),
                             lambda i, act, eff: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((ep._SUBLANES, mp), jnp.float32),
        ],
    )
    gst_fix = jnp.ones((mp, tile_n), jnp.float32) * 0.1
    den_fix = jnp.ones((1, tile_n), jnp.float32)

    @jax.jit
    def pass_b_only():
        def stripe(carry, blk):
            xs_b, act_b, eff_b = blk
            p1_b, px_b = moment_kernel(act_b, eff_b, xs_b, den_fix, gst_fix)
            return (carry[0] + p1_b, carry[1] + px_b), None
        (p1, px), _ = jax.lax.scan(
            stripe,
            (jnp.zeros((1, mp), jnp.float32),
             jnp.zeros((ep._SUBLANES, mp), jnp.float32)),
            (xs_blocks, act, eff))
        return p1
    emit("pass_b", pairs / _timeit(pass_b_only) / 1e9)

    # ---- pass A sub-stages: d2 matmul only; d2+exp (no stash write)
    def _d2_kernel(act_ref, eff_ref, scal_ref, ys_ref, y2_ref, xs_ref,
                   x2_ref, out_ref):
        d2 = jnp.maximum(
            y2_ref[:].reshape(-1, 1) + x2_ref[:].reshape(1, -1)
            - 2.0 * jax.lax.dot_general(
                ys_ref[:], xs_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), 0.0)
        out_ref[:] = jnp.sum(d2, axis=0, keepdims=True)

    def _d2exp_kernel(act_ref, eff_ref, scal_ref, ys_ref, y2_ref, xs_ref,
                      x2_ref, out_ref):
        g = ep._dist_tile(ys_ref[:], y2_ref[:], xs_ref[:], x2_ref[:],
                          scal_ref[0])
        out_ref[:] = jnp.sum(g, axis=0, keepdims=True)

    # ---- precision variants: the d2 matmul at HIGH (bf16x3) instead of
    # HIGHEST (bf16x6), and a folded pure-MXU pass B.
    def _d2exp_default_kernel(act_ref, eff_ref, scal_ref, ys_ref, y2_ref,
                              xs_ref, x2_ref, out_ref):
        # Mosaic lowers only DEFAULT/HIGHEST dots; DEFAULT = one bf16 pass.
        xy = jax.lax.dot_general(
            ys_ref[:], xs_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        d2 = jnp.maximum(
            y2_ref[:].reshape(-1, 1) + x2_ref[:].reshape(1, -1) - 2.0 * xy,
            0.0)
        out_ref[:] = jnp.sum(jnp.exp(-d2 * scal_ref[0]), axis=0,
                             keepdims=True)

    def _folded_moment_kernel(act_ref, eff_ref, xs_ref, den_ref, gst_ref,
                              p1_ref, px_ref):
        i = pl.program_id(0)

        @pl.when(act_ref[i] == 1)
        def _():
            g = gst_ref[:].astype(jnp.float32)
            den = den_ref[:]
            rowsel = jax.lax.broadcasted_iota(
                jnp.int32, (ep._SUBLANES, den.shape[1]), 0) == 3
            chan = jnp.where(rowsel, den, xs_ref[:] * den)
            mom = jax.lax.dot_general(
                chan, g, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            px_ref[:] = mom
            p1_ref[:] = mom[3:4]

        @pl.when(act_ref[i] == 0)
        def _():
            p1_ref[:] = jnp.zeros_like(p1_ref)
            px_ref[:] = jnp.zeros_like(px_ref)

    folded_kernel = pl.pallas_call(
        _folded_moment_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec((ep._SUBLANES, tile_n),
                             lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff: (eff[i], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, i)),
                pl.BlockSpec((ep._SUBLANES, tile_m),
                             lambda i, act, eff: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((ep._SUBLANES, mp), jnp.float32),
        ],
    )

    @jax.jit
    def pass_b_folded():
        def stripe(carry, blk):
            xs_b, act_b, eff_b = blk
            p1_b, px_b = folded_kernel(act_b, eff_b, xs_b, den_fix, gst_fix)
            return (carry[0] + p1_b, carry[1] + px_b), None
        (p1, px), _ = jax.lax.scan(
            stripe,
            (jnp.zeros((1, mp), jnp.float32),
             jnp.zeros((ep._SUBLANES, mp), jnp.float32)),
            (xs_blocks, act, eff))
        return p1
    emit("pass_b_folded", pairs / _timeit(pass_b_folded) / 1e9)

    for name, kern in (("d2_only", _d2_kernel), ("d2_exp", _d2exp_kernel),
                       ("d2_exp_default", _d2exp_default_kernel)):
        call = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_i,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((ep._SUBLANES, tile_m),
                                 lambda i, act, eff: (0, eff[i])),
                    pl.BlockSpec((1, tile_m),
                                 lambda i, act, eff: (0, eff[i])),
                    pl.BlockSpec((ep._SUBLANES, tile_n),
                                 lambda i, act, eff: (0, 0)),
                    pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, tile_n),
                                       lambda i, act, eff: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((1, tile_n), jnp.float32),
        )

        @jax.jit
        def run(call=call):
            def stripe(carry, blk):
                xs_b, x2_b, act_b, eff_b = blk
                out = call(act_b, eff_b, scal, ys_t, y2, xs_b, x2_b)
                return carry + out[0, 0], None
            acc, _ = jax.lax.scan(
                stripe, jnp.zeros((), jnp.float32),
                (xs_blocks, x2_blocks, act, eff))
            return acc
        emit(name, pairs / _timeit(run) / 1e9)



if __name__ == "__main__":
    main()
