"""Global configuration for the TPU-native probreg framework.

The reference library hard-codes float32 in its C++ kernels
(/root/reference/probreg/cc/types.h:5-7) and uses numpy float64 on the Python
side. On TPU the natural compute dtype is float32 (MXU accumulates in f32);
bfloat16 is available for the pairwise-distance matmuls via ``matmul_dtype``.

Mutation semantics: kernel-dispatch knobs (``use_culled_estep``, the
``*_max_pairs`` thresholds, ``stash_dtype``, the ``*_stash_max_bytes``
caps) are read when a registration program is TRACED. Registrations are
single jitted whole-EM dispatches, so a shape that has already compiled
keeps its old dispatch decisions even after the knob changes — call
:func:`clear_caches` after mutating one of these to make it apply to
every subsequent call. The eager-path guards (``bcpd_guard_max_pairs``)
are read per call and are always live.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class Config:
    # dtype used for point clouds and EM state.
    dtype: jnp.dtype = jnp.float32
    # dtype fed to the MXU for the pairwise inner products. bfloat16 doubles
    # MXU throughput; the Gaussian kernel is tolerant of the mantissa loss
    # because results are renormalized per-column.
    matmul_dtype: jnp.dtype = jnp.float32
    # Default target-chunk size for the streaming (non-Pallas) E-step.
    estep_chunk: int = 4096
    # Use the fused Pallas E-step kernel on TPU when shapes are large enough.
    # Default False: measured on v5e, the XLA scan path sustains ~63 Gpair/s
    # vs ~49 for the Pallas kernel — the Pallas two-pass design pays the
    # per-pair exp twice (the column normalizer forces it), and the E-step is
    # transcendental-bound, not HBM-bound, at these shapes. Per-pass the
    # Pallas kernel is actually faster (~98G exp/s vs ~63G); it will win if a
    # one-pass variant (cached g column, small M) is used.
    use_pallas: bool = False
    # Minimum M*N above which the Pallas kernel is preferred over plain XLA.
    pallas_min_pairs: int = 1 << 22
    # Route large E-steps through the Morton-sorted tile-culled Pallas
    # kernel (ops/estep_pallas.estep_auto — the single-exp g-stash kernel).
    # Exact: culled tiles are ones whose box-gap bound proves every exp
    # underflows f32 to 0. One exp + 8 stash-bytes per ACTIVE pair beats
    # the XLA scan (1 exp + 12 HBM bytes, always dense) at every density:
    # measured v5e 131k x 131k, 62 vs 59 Gpair/s at full density and
    # 264 vs 58 at active fraction 0.12.
    use_culled_estep: bool = True
    # Minimum M*N for the culled path (below this the XLA scan E-step or
    # the small single-launch kernel is faster anyway).
    culled_estep_min_pairs: int = 1 << 24
    # Stash precision for the single-exp E-step's exp'd tiles. bfloat16
    # halves the pass-B HBM traffic; measured on v5e at 131k it buys only
    # ~3% dense (pass A's exp dominates), so the default stays exact f32.
    # SINGLE-CHIP only: the mesh kernels (fused_stash_core_spmd) keep f32.
    # The posterior NORMALIZER stays f32 either way (summed before the
    # cast); bf16 quantizes only the moment numerators (~0.4% relative).
    stash_dtype: jnp.dtype = jnp.float32
    # Start-temperature fast mode for the single-exp stash E-step
    # (estep_auto): when the bf16 rounding of the d2 cross term cannot
    # perturb any exp ARGUMENT by more than estep_fast_start_tol (bound:
    # (1/2s2) * 8 * 2^-9 * sqrt(max|y|^2 * max|x|^2), checked at runtime
    # inside the compiled program), run the d2 matmul at DEFAULT precision
    # (one bf16 MXU pass instead of HIGHEST's six) with a bf16 stash.
    # Measured v5e 131k dense: 63.7 -> 103.9 Gpair/s (BENCHMARKS.md
    # round-5 decomposition). Engages exactly in the dense start-
    # temperature regime (sigma2 ~ cloud scale^2, smooth posteriors where
    # ~1e-2 exp-arg noise is far below the posterior's own temperature);
    # annealed iterations keep the HIGHEST path, which EM convergence
    # needs (CLAUDE.md). The lax.cond reserves BOTH branches' stashes —
    # budget accounting in estep_auto scales by 2/3 accordingly.
    estep_fast_start: bool = True
    # Max absolute exp-argument error admitted on the fast branch.
    estep_fast_start_tol: float = 0.02
    # Pipelined single-launch-per-stripe stash E-step
    # (fused_stash_merged_core): pass B of stripe j-1 runs fused under
    # pass A of stripe j, overlapping the moment matmul + stash DMA with
    # the exp instead of serializing two kernels. Costs a SECOND resident
    # g-stash buffer (the budget accounting below halves accordingly).
    use_merged_stash: bool = False
    # Stash-allocation cap for the CPD single-exp culled kernel
    # (fused_stash_core via estep_auto): the (M_padded, tile_n) g-stash is
    # 4.1 GB at the validated 1M x 1024 f32; beyond ~6 GB per buffer the
    # v5e worker faults rather than OOMs cleanly. estep_auto halves
    # tile_n (lane-multiple, floor 256) to fit, and falls back to the
    # streaming XLA scan when even the floor exceeds the cap.
    cpd_stash_max_bytes: int = 6 << 30
    # Stash-allocation cap for the BCPD row-weighted culled kernel: its
    # (M_padded, tile_n) g-stash at 1M x 1024 f32 is 4 GB, which crashes
    # the v5e worker alongside the VI's resident state (Nystrom factor,
    # v field, channel blocks). tile_n is halved until the stash fits.
    # The CPD kernel keeps its measured (512, 1024) default — the EM
    # holds far less resident HBM and 1M is validated there.
    bcpd_stash_max_bytes: int = 2 << 30
    # Retained for API compatibility: the round-2 two-branch estep_auto
    # switched to the XLA scan above this active fraction; the round-3
    # single-exp kernel wins at every fraction, so nothing branches on
    # this anymore.
    culled_switch_frac: float = 0.7
    # Maximum M*N routed to the single-launch VMEM-resident E-step kernel
    # (ops/estep_pallas.estep_small): the (M, N) posterior tile + operands
    # must fit comfortably in v5e's 16 MB VMEM.
    small_estep_max_pairs: int = 1024 * 1024
    # Run small rigid 3-D CPD registrations as ONE Pallas kernel launch
    # (ops/em_pallas.py): the whole EM loop in VMEM, ~3x over the
    # transposed XLA path at bunny size.
    use_fused_em: bool = True
    fused_em_max_pairs: int = 1024 * 1024
    # Maximum M*N for the transposed whole-EM fast path (cpd._run_em_t),
    # which materializes the (M, N) posterior: ~4 live M x N f32 arrays.
    # 1<<28 pairs ~= 4 GB peak on a 16 GB v5e. Beyond this, registration
    # falls back to the streaming-E-step loop (peak O(M * estep_chunk)).
    transposed_em_max_pairs: int = 1 << 28
    # Hardware-safety guard for huge unmeshed BCPD on TPU. Three 1M-class
    # single-chip BCPD attempts faulted the v5e worker (a ~10-40 min heal
    # plus hours of degraded compiles) — including one with the g-stash
    # capped at 2 GB, so the fault is not just the stash allocation; the
    # remaining suspects are the row-weighted kernel's 1M-scale grids and
    # sustained multi-minute single-program load (a known tunnel fault
    # mode). Above this M*N, a single-device whole-VI dispatch is only
    # allowed to run ``bcpd_guard_chunk`` iterations per program:
    # registration_bcpd_pyramid auto-applies ``dispatch_chunk`` and
    # registration_bcpd raises a clear error naming the validated paths
    # instead of faulting the device. 0 disables the guard. The default
    # sits at the largest single-chip-validated size (~500k^2, the BCPD
    # pyramid's finest level; BENCHMARKS.md).
    bcpd_guard_max_pairs: int = 250_000_000_000
    # Iterations per device program allowed above the guard threshold
    # (and the dispatch_chunk the BCPD pyramid auto-applies there). At
    # 500k-1M each culled-regime VI iteration costs ~2-4 s on v5e, so 4
    # iterations keep a program ~10 s — far from the multi-minute
    # sustained-load fault regime.
    bcpd_guard_chunk: int = 4
    # Largest SOURCE cloud the BCPD row-weighted culled stash kernel is
    # used for on a single chip. 700k validated fault-free (round 4);
    # at 1M the kernel (2 GB capped stash, 977-tile scalar-prefetch
    # grid) faults the v5e worker, while the same guarded registration
    # with the streaming XLA E-step completes fault-free (round-5 probe:
    # 1058 s, quality matches). Above this, unmeshed BCPD streams.
    bcpd_culled_max_points: int = 750_000


config = Config()


def eps(dtype=None) -> float:
    return float(jnp.finfo(dtype or config.dtype).eps)


def clear_caches() -> None:
    """Drop every compiled registration program so changed config knobs
    take effect.

    Kernel-dispatch knobs are read at trace time (module docstring); a
    shape registered before the change replays its cached whole-EM
    program otherwise. This is the documented way to make a lowered
    ``cpd_stash_max_bytes``/``bcpd_stash_max_bytes`` (the crash guards)
    or a flipped ``use_culled_estep``/``stash_dtype`` apply to
    already-seen shapes. Thin wrapper over :func:`jax.clear_caches`
    (in-memory jit caches only; the persistent compilation cache keys on
    the program, which changes with the knobs, so it stays valid).
    """
    import jax

    jax.clear_caches()


def enable_compilation_cache(cache_dir: str,
                             min_compile_secs: float = 1.0) -> None:
    """Persist compiled XLA programs to ``cache_dir`` across processes.

    Registration programs are whole-EM compilations: at large sizes the
    FIRST run of a shape is compile-dominated (e.g. the 100k BCPD pyramid:
    99.8 s cold vs 3.4 s warm, BENCHMARKS.md). With the cache enabled, a
    production service that restarts (deploys, preemptions) skips those
    compiles for every shape it has seen before. Thin wrapper over JAX's
    persistent compilation cache; call once before the first registration.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
