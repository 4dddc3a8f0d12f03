"""Fused Pallas TPU kernel for the CPD E-step.

The XLA path (ops/estep.py) writes the exp'd M x block Gaussian matrix to HBM
at least once per scan step (the MXU matmul output cannot fuse into three
different reductions). At large M*N that HBM round-trip dominates: the E-step
is ~1 transcendental + ~10 flops per point pair but 4 bytes/pair of traffic.
This kernel keeps every (TM, TN) tile of exp(-d^2/2s2) in VMEM and never
materializes it, so traffic drops to O((M+N) * gridsteps) tile refetches.

Layout: points are stored transposed (D, M) with D zero-padded to the 8
sublanes — a (M, 3) array would waste 128/3 of every VMEM lane. Padded
points (to tile multiples) carry squared-norm 1e30 so exp underflows to
exactly 0 and they drop out of every moment.

Two passes (the posterior normalizer den_j is a column sum over ALL source
tiles, so single-pass online rescaling a la flash-attention cannot work: p1
mixes *columns* whose normalizers finalize at different times):

  Kernel A  grid (nN, nM):  den_j  = sum_i exp(.)  -> safe den, pt1, xx
  Kernel B  grid (nM, nN):  p1_i  += rowsum(exp(.) / den_j)
                            px_i  += X_tile @ (exp(.)/den_j)^T    (MXU, K=TN)

Each kernel's accumulator output block is revisited on *consecutive* grid
steps (reduction axis innermost), the standard Pallas TPU reduction pattern.

Tile culling (exact block sparsity)
-----------------------------------
Both kernels skip (source-tile, target-tile) pairs whose bounding-box
gap lower bound already forces every exp in the tile to underflow f32
to EXACTLY zero:  sum_d max(0, gap_d)^2 / 2s2 > 104
(exp(-104) < 2^-149, beneath the smallest f32 subnormal). This is the
reference's IFGT cutoff-radius idea (/root/reference/probreg/cc/ifgt.cc:
136-147) applied at MXU-tile granularity: the result is bit-identical to
the dense kernel, but as sigma2 anneals the surviving-tile fraction
collapses and the E-step cost drops with it. Culling only bites when tiles
are spatially compact — see ``estep_culled`` (Morton pre-sort) and
ops/spatial.py.

Reference semantics: probreg/cpd.py:71-88.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .estep import EstepMoments, outlier_constant

_BIG = 1e30  # squared-norm marker for padding points: exp(-BIG/2s2) == 0
_SUBLANES = 8
# Cull threshold: exp(-x) underflows below the smallest f32 subnormal
# (2^-149) for x > 103.28; 104 leaves margin for f32 bound arithmetic.
_CUT = 104.0


def _dist_tile(ys_t, y2, xs_t, x2, inv2s2,
               precision=jax.lax.Precision.HIGHEST):
    """exp(-|y_i - x_j|^2 / 2s2) for one (TM, TN) tile, MXU cross term.

    ``precision`` applies to the cross-term matmul only (y2/x2 stay f32).
    HIGHEST (bf16x6, f32-exact) is the default and is load-bearing for EM
    convergence in the ANNEALED regime; DEFAULT (one bf16 pass) is 2.7x
    faster on v5e (measured: 99 -> 272 Gpair/s for the d2+exp stage) and
    numerically safe only when sigma2 is large vs the cloud scale — the
    start-temperature gate in estep_auto decides at runtime.
    """
    xy = jax.lax.dot_general(
        ys_t, xs_t,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TM, TN)
    d2 = jnp.maximum(y2.reshape(-1, 1) + x2.reshape(1, -1) - 2.0 * xy, 0.0)
    return jnp.exp(-d2 * inv2s2)


def _tile_active(mbits_ref, q):
    """Bit q of the packed cull mask (SMEM scalar reads)."""
    word = mbits_ref[q >> 5]
    return ((word >> (q & 31)) & 1) > 0


def _den_kernel(scal_ref, mbits_ref, ys_ref, y2_ref, xs_ref, x2_ref,
                den_ref, pt1_ref, xx_ref):
    i = pl.program_id(1)  # source tile (reduction, innermost)
    j = pl.program_id(0)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        den_ref[:] = jnp.zeros_like(den_ref)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        xx_ref[:] = jnp.zeros_like(xx_ref)

    # Culled tiles would contribute exactly 0 to every den entry (all exps
    # underflow) — skip the MXU+exp work entirely.
    @pl.when(_tile_active(mbits_ref, i * n_j + j))
    def _():
        g = _dist_tile(ys_ref[:], y2_ref[:], xs_ref[:], x2_ref[:],
                       scal_ref[0])
        den_ref[:] += jnp.sum(g, axis=0, keepdims=True)

    @pl.when(i == n_i - 1)
    def _():
        den_raw = den_ref[:]
        eps = jnp.asarray(jnp.finfo(jnp.float32).eps, den_raw.dtype)
        den = jnp.where(den_raw == 0.0, eps, den_raw) + scal_ref[1]
        pt1 = den_raw / den
        pt1_ref[:] = pt1
        den_ref[:] = den
        x2 = x2_ref[:]
        xx_ref[:] += jnp.sum(
            jnp.where(x2 < _BIG * 0.5, pt1 * x2, 0.0), keepdims=True
        )


def _moment_kernel(scal_ref, mbits_ref, ys_ref, y2_ref, xs_ref, x2_ref,
                   den_ref, p1_ref, px_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)  # target tile (reduction, innermost)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        p1_ref[:] = jnp.zeros_like(p1_ref)
        px_ref[:] = jnp.zeros_like(px_ref)

    @pl.when(_tile_active(mbits_ref, i * n_j + j))
    def _():
        g = _dist_tile(ys_ref[:], y2_ref[:], xs_ref[:], x2_ref[:],
                       scal_ref[0])
        p = g / den_ref[:]  # (TM, TN) / (1, TN)
        p1_ref[:] += jnp.sum(p, axis=1, keepdims=True).reshape(1, -1)
        px_ref[:] += jax.lax.dot_general(
            xs_ref[:], p,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, TM)


def _pad_transpose(pts, tile):
    """(N, D) -> (8, Np) zero-padded transpose + (1, Np) squared norms
    with padding rows marked _BIG."""
    n, dim = pts.shape
    np_ = ((n + tile - 1) // tile) * tile
    pts_t = jnp.zeros((_SUBLANES, np_), pts.dtype)
    pts_t = pts_t.at[:dim, :n].set(pts.T)
    sq = jnp.full((1, np_), _BIG, pts.dtype)
    sq = sq.at[0, :n].set(jnp.sum(pts * pts, axis=1))
    return pts_t, sq


def _tile_bounds(pts_t, sq, tile):
    """Per-tile axis-aligned bounding boxes: (8, nb) mins and maxes.

    Morton-sorted tiles are boxy, so AABBs are much tighter than bounding
    spheres. Padding points (sq == _BIG) are excluded via +/-inf sentinels;
    a fully-padded tile gets an empty box (+inf, -inf) whose gap to
    anything is +inf, so it is always culled — correct, because its exps
    all underflow anyway (|pad|^2 = _BIG).
    """
    sub, np_ = pts_t.shape
    nb = np_ // tile
    blocks = pts_t.reshape(sub, nb, tile)
    valid = sq.reshape(1, nb, tile) < _BIG * 0.5
    bmin = jnp.min(jnp.where(valid, blocks, jnp.inf), axis=2)      # (8, nb)
    bmax = jnp.max(jnp.where(valid, blocks, -jnp.inf), axis=2)     # (8, nb)
    return bmin, bmax


def _active_mask(ymin, ymax, xmin, xmax, inv2s2):
    """(nb_m, nb_n) f32 mask: 1 where the tile pair may contribute.

    Box-gap lower bound on any pairwise squared distance between tiles:
    sum_d max(0, gap_d)^2 with gap_d the per-axis box separation. The tile
    is culled when the bound's exponent exceeds _CUT (every exp underflows
    to exactly 0 in f32). Exponent convention matches _dist_tile:
    exp(-d2 * inv2s2), inv2s2 = 0.5 / sigma2.
    """
    return (_box_gap_lb2(ymin, ymax, xmin, xmax) * inv2s2
            <= _CUT).astype(jnp.float32)


def _box_gap_lb2(ymin, ymax, xmin, xmax):
    """(nb_m, nb_n) per-tile-pair box-gap d2 lower bound.

    Per-dimension 2-D outer ops: a (8, nbm, nbn) broadcast costs ~2 s at
    1M points / 512-tiles on TPU (sublane-axis reduce + 122 MB layout);
    the unrolled 2-D chain fuses into one (nbm, nbn) pass. Rows beyond
    the point dimensionality are all-zero bounds -> zero gap. Shared by
    _active_mask and bcpd_estep_culled (whose mask also folds row
    weights)."""
    lb2 = jnp.zeros((ymin.shape[1], xmin.shape[1]), jnp.float32)
    for d in range(ymin.shape[0]):
        gap = jnp.maximum(
            jnp.maximum(ymin[d][:, None] - xmax[d][None, :],
                        xmin[d][None, :] - ymax[d][:, None]), 0.0)
        lb2 = lb2 + gap * gap
    return lb2



def _pack_mask_bits(mask):
    """Bit-pack a 0/1 f32 mask row-major into int32 SMEM words.

    Packing via two exact f32 16-bit dot products (values <= 65535 are
    exact in f32) instead of a 32-wide int shift/sum: at 1M points the
    tile grid has ~4M entries and the naive pack materializes a
    (bits, 32) int32 temporary (~0.5 GB of traffic) every E-step call.
    """
    flat = mask.reshape(-1)
    pad_bits = (-flat.shape[0]) % 32
    if pad_bits:
        flat = jnp.concatenate([flat, jnp.ones((pad_bits,), flat.dtype)])
    halves = flat.reshape(-1, 2, 16)
    pow2 = (2.0 ** jnp.arange(16, dtype=jnp.float32))
    words = jnp.einsum("khb,b->kh", halves.astype(jnp.float32), pow2)
    lo = words[:, 0].astype(jnp.int32)
    hi = words[:, 1].astype(jnp.int32)
    return lo | (hi << 16)


def fused_core(scal, ys_t, y2, xs_t, x2, *, tile_m: int, tile_n: int,
               interpret: bool = False, cull: bool = True, mask=None):
    """Two-pass culled E-step on PRE-PADDED transposed operands.

    ``mask``: optionally a precomputed (n_i, n_j) active-tile mask
    (avoids recomputing the bounds).

    Inputs: ``scal`` = [0.5/sigma2, outlier c]; ``ys_t``/``xs_t`` (8, Mp) /
    (8, Np) zero-padded transposes whose lane counts are multiples of the
    tile sizes; ``y2``/``x2`` (1, Mp)/(1, Np) squared norms with excluded
    (padding / masked) columns set to ``_BIG``. Returns
    (pt1p (1, Np), p1p (1, Mp), pxp (8, Mp), xx (1, 1)) — still padded.

    Used by :func:`estep_fused`; the default dispatch (estep_auto) and
    the sharded runners moved to the round-3 single-exp
    :func:`fused_stash_core` — this two-pass variant remains the base of
    the BCPD row-weighted kernels.
    """
    mp, np_ = ys_t.shape[1], xs_t.shape[1]
    n_i, n_j = mp // tile_m, np_ // tile_n
    inv2s2 = scal[0]

    if mask is None:
        if cull:
            ymin, ymax = _tile_bounds(ys_t, y2, tile_m)
            xmin, xmax = _tile_bounds(xs_t, x2, tile_n)
            mask = _active_mask(ymin, ymax, xmin, xmax, inv2s2)  # (n_i, n_j)
        else:
            mask = jnp.ones((n_i, n_j), jnp.float32)
    mbits = _pack_mask_bits(mask)

    kwargs = dict(interpret=interpret)

    den, pt1p, xx = pl.pallas_call(
        _den_kernel,
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_SUBLANES, tile_m), lambda j, i: (0, i)),
            pl.BlockSpec((1, tile_m), lambda j, i: (0, i)),
            pl.BlockSpec((_SUBLANES, tile_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, tile_n), lambda j, i: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, tile_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * (_SUBLANES + 3),
            bytes_accessed=4 * (mp + np_) * _SUBLANES * (n_i + n_j),
            transcendentals=mp * np_,
        ),
        **kwargs,
    )(scal, mbits, ys_t, y2, xs_t, x2)

    p1p, pxp = pl.pallas_call(
        _moment_kernel,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_SUBLANES, tile_m), lambda i, j: (0, i)),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, i)),
            pl.BlockSpec((_SUBLANES, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_m), lambda i, j: (0, i)),
            pl.BlockSpec((_SUBLANES, tile_m), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((_SUBLANES, mp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * (_SUBLANES + 3) + 2 * mp * np_ * _SUBLANES,
            bytes_accessed=4 * (mp + np_) * _SUBLANES * (n_i + n_j),
            transcendentals=mp * np_,
        ),
        **kwargs,
    )(scal, mbits, ys_t, y2, xs_t, x2, den)

    return pt1p, p1p, pxp, xx


@functools.partial(
    jax.jit, static_argnames=("w", "tile_m", "tile_n", "interpret", "cull")
)
def estep_fused(
    t_source: jax.Array,
    target: jax.Array,
    sigma2,
    w: float = 0.0,
    tile_m: int = 1024,
    tile_n: int = 1024,
    interpret: bool = False,
    cull: bool = True,
) -> EstepMoments:
    """Fused-tile E-step. Exact (not an approximation), tile-culled.

    ``cull=True`` skips tile pairs whose box-gap bound proves every
    exp underflows to exactly 0 (see module docstring) — still exact. Only
    effective on spatially sorted inputs: use :func:`estep_culled` (Morton
    pre-sort) unless the caller already sorted.
    """
    t_source = jnp.asarray(t_source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    m, dim = t_source.shape
    n = target.shape[0]
    tile_m = min(tile_m, ((m + _SUBLANES - 1) // _SUBLANES) * _SUBLANES)
    tile_n = min(tile_n, ((n + 127) // 128) * 128)

    sigma2 = jnp.asarray(sigma2, jnp.float32)
    c = outlier_constant(sigma2, w, m, n, dim)
    scal = jnp.stack([0.5 / sigma2, c]).astype(jnp.float32)

    ys_t, y2 = _pad_transpose(t_source, tile_m)
    xs_t, x2 = _pad_transpose(target, tile_n)

    pt1p, p1p, pxp, xx = fused_core(
        scal, ys_t, y2, xs_t, x2, tile_m=tile_m, tile_n=tile_n,
        interpret=interpret, cull=cull)

    pt1 = pt1p[0, :n]
    p1 = p1p[0, :m]
    px = pxp[:dim, :m].T
    n_p = jnp.sum(p1)
    return EstepMoments(pt1, p1, px, n_p, xx[0, 0].astype(t_source.dtype))


# --------------------------------------------------------------------------
# Single-exp culled E-step (g-stash)
# --------------------------------------------------------------------------
#
# The two-pass kernels above pay the per-pair exp TWICE (den pass + moment
# pass): ~98 Gpair/s per pass -> ~49 net, vs the XLA scan's one-exp 64
# (which is HBM-bound at 12 B/pair: one g write + two reads). This variant
# pays the exp ONCE and 8 B/pair of HBM traffic: for each target stripe
# (all source tiles x TN columns), pass A computes each ACTIVE tile's exp'd
# Gaussian block, stashes it to an HBM scratch (Mp, TN), and accumulates
# den; pass B reloads the stashed blocks — no exp — normalizes, and emits
# the p1/px moments. An XLA lax.scan walks the stripes, so the stash never
# exceeds (Mp, TN) bytes regardless of N.
#
# Tile culling stays fully effective through scalar-prefetch index
# compaction: the block index maps of the stash (A's output, B's input) and
# of the source operands read eff[i] = "last active tile <= i" from SMEM,
# so consecutive culled tiles map to an UNCHANGED block index and Pallas
# issues no DMA for them — stash traffic is proportional to the active
# fraction, like the compute. Net cost model per pair: active_frac *
# (1 exp + 8 bytes) vs the two-pass kernels' active_frac * 2 exp and the
# XLA scan's 1 exp + 12 bytes: single-exp wins at every density, so the
# estep_auto lax.cond between a Pallas and a dense-XLA branch is gone.

def _stash_den_kernel(act_ref, eff_ref, scal_ref, ys_ref, y2_ref, xs_ref,
                      x2_ref, den_ref, pt1_ref, xx_ref, gst_ref, *,
                      precision=jax.lax.Precision.HIGHEST):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        den_ref[:] = jnp.zeros_like(den_ref)

    @pl.when(act_ref[i] == 1)
    def _():
        g = _dist_tile(ys_ref[:], y2_ref[:], xs_ref[:], x2_ref[:],
                       scal_ref[0], precision=precision)
        # The stash may be bf16 (config.stash_dtype, opt-in): den is summed
        # from the f32 g BEFORE the cast, so the normalizer stays exact and
        # only the moment numerators carry the ~0.4% bf16 quantization.
        gst_ref[:] = g.astype(gst_ref.dtype)
        den_ref[:] += jnp.sum(g, axis=0, keepdims=True)

    @pl.when(i == n_i - 1)
    def _():
        den_raw = den_ref[:]
        eps = jnp.asarray(jnp.finfo(jnp.float32).eps, den_raw.dtype)
        inv_den = 1.0 / (jnp.where(den_raw == 0.0, eps, den_raw)
                         + scal_ref[1])
        pt1 = den_raw * inv_den
        pt1_ref[:] = pt1
        # Hand the MOMENT kernel the reciprocal: its per-pair normalize is
        # then a broadcast MULTIPLY, not a multi-cycle VPU divide.
        den_ref[:] = inv_den
        x2 = x2_ref[:]
        xx_ref[:] = jnp.sum(
            jnp.where(x2 < _BIG * 0.5, pt1 * x2, 0.0), keepdims=True)


def _stash_moment_kernel(act_ref, eff_ref, xs_ref, den_ref, gst_ref,
                         p1_ref, px_ref):
    i = pl.program_id(0)

    @pl.when(act_ref[i] == 1)
    def _():
        p = gst_ref[:].astype(jnp.float32) * den_ref[:]    # (TM, TN)*(1, TN)
        p1_ref[:] = jnp.sum(p, axis=1, keepdims=True).reshape(1, -1)
        px_ref[:] = jax.lax.dot_general(
            xs_ref[:], p,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, TM)

    @pl.when(act_ref[i] == 0)
    def _():
        # Culled tiles' partials are summed by the caller — must be zeros,
        # not whatever the flushed VMEM buffer held.
        p1_ref[:] = jnp.zeros_like(p1_ref)
        px_ref[:] = jnp.zeros_like(px_ref)


def _stripe_compaction(mask):
    """Per-stripe scalar-prefetch arrays from the (n_i, n_j) active mask.

    act[j, i] = 1 iff tile (i, j) is active. eff[j, i] = index of the last
    active tile <= i in stripe j (forward-filled; backward-filled with the
    first active tile before it; 0 for all-culled stripes, whose act row is
    all zeros so the dummy index is never computed on). Consecutive culled
    steps thus present an UNCHANGED block index to Pallas — no DMA.
    """
    maskT = mask.T > 0.0                                   # (n_j, n_i)
    n_j, n_i = maskT.shape
    idx = jnp.arange(n_i, dtype=jnp.int32)[None, :]
    ai = jnp.where(maskT, idx, jnp.int32(-1))
    ff = jax.lax.associative_scan(jnp.maximum, ai, axis=1)
    first = jnp.argmax(maskT, axis=1).astype(jnp.int32)    # 0 if none
    eff = jnp.where(ff >= 0, ff, first[:, None])
    act = maskT.astype(jnp.int32)
    return act, eff


def fused_stash_core(scal, ys_t, y2, xs_t, x2, *, tile_m: int, tile_n: int,
                     mask=None, interpret: bool = False,
                     stash_dtype=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST):
    """Single-exp culled E-step on PRE-PADDED transposed operands.

    Same contract as :func:`fused_core` (inputs padded to tile multiples,
    outputs still padded), one exp per active pair, 8 active-bytes/pair of
    HBM stash traffic. ``mask``: optional precomputed (n_i, n_j) tile mask.
    ``stash_dtype``: bfloat16 halves the stash traffic (6 B/pair) at ~0.4%
    relative error on the moment numerators — the normalizer stays f32 (see
    _stash_den_kernel); opt-in via config.stash_dtype. ``precision``: the
    d2 cross-term matmul precision (see _dist_tile — DEFAULT is the fast
    start-temperature mode, gated by estep_auto).
    """
    mp, np_ = ys_t.shape[1], xs_t.shape[1]
    n_i, n_j = mp // tile_m, np_ // tile_n
    inv2s2 = scal[0]

    if mask is None:
        ymin, ymax = _tile_bounds(ys_t, y2, tile_m)
        xmin, xmax = _tile_bounds(xs_t, x2, tile_n)
        mask = _active_mask(ymin, ymax, xmin, xmax, inv2s2)
    act, eff = _stripe_compaction(mask)                    # (n_j, n_i) each

    xs_blocks = xs_t.reshape(_SUBLANES, n_j, tile_n).transpose(1, 0, 2)
    x2_blocks = x2.reshape(1, n_j, tile_n).transpose(1, 0, 2)

    den_kernel = pl.pallas_call(
        functools.partial(_stash_den_kernel, precision=precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_SUBLANES, tile_m),
                             lambda i, act, eff: (0, eff[i])),
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, eff[i])),
                pl.BlockSpec((_SUBLANES, tile_n), lambda i, act, eff: (0, 0)),
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
            jax.ShapeDtypeStruct((mp, tile_n), stash_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * tile_n * (_SUBLANES + 2),
            bytes_accessed=4 * mp * tile_n,
            transcendentals=mp * tile_n,
        ),
        interpret=interpret,
    )

    moment_kernel = pl.pallas_call(
        _stash_moment_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec((_SUBLANES, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff: (eff[i], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, i)),
                pl.BlockSpec((_SUBLANES, tile_m),
                             lambda i, act, eff: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((_SUBLANES, mp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * tile_n * (_SUBLANES + 1),
            bytes_accessed=8 * mp * tile_n,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def stripe(carry, blk):
        p1a, pxa, xxa = carry
        xs_b, x2_b, act_b, eff_b = blk
        den, pt1_b, xx_b, gst = den_kernel(
            act_b, eff_b, scal, ys_t, y2, xs_b, x2_b)
        p1_b, px_b = moment_kernel(act_b, eff_b, xs_b, den, gst)
        return (p1a + p1_b, pxa + px_b, xxa + xx_b[0, 0]), pt1_b

    init = (jnp.zeros((1, mp), jnp.float32),
            jnp.zeros((_SUBLANES, mp), jnp.float32),
            jnp.zeros((), jnp.float32))
    (p1p, pxp, xx), pt1_stack = jax.lax.scan(
        stripe, init, (xs_blocks, x2_blocks, act, eff))
    pt1p = pt1_stack.transpose(1, 0, 2).reshape(1, np_)
    return pt1p, p1p, pxp, xx.reshape(1, 1)


def _stash_merged_kernel(act_ref, eff_ref, pact_ref, peff_ref, scal_ref,
                         ys_ref, y2_ref, xs_ref, x2_ref, pxs_ref, pden_ref,
                         pgst_ref, den_ref, pt1_ref, xx_ref, gst_ref,
                         p1_ref, px_ref):
    """One-launch-per-stripe pipeline: pass A (den+stash) for the CURRENT
    target stripe fused with pass B (moments) for the PREVIOUS stripe.

    The two-launch design serializes pass A (exp, VPU-bound) and pass B
    (stash reload + channel matmul, DMA/MXU-bound) — TPU kernels never
    overlap each other, so per-pair time is the SUM of the passes. Fused
    at a one-stripe offset, Mosaic schedules the B-half's MXU dot and
    both stash DMA streams under the A-half's exp, so per-pair time is
    the MAX — measured v5e: 63.6 -> ~90 Gpair/s dense (BENCHMARKS.md
    round-5 decomposition table).
    """
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    # ---- pass A: current stripe's den + stash
    @pl.when(i == 0)
    def _():
        den_ref[:] = jnp.zeros_like(den_ref)

    @pl.when(act_ref[i] == 1)
    def _():
        g = _dist_tile(ys_ref[:], y2_ref[:], xs_ref[:], x2_ref[:],
                       scal_ref[0])
        gst_ref[:] = g.astype(gst_ref.dtype)
        den_ref[:] += jnp.sum(g, axis=0, keepdims=True)

    @pl.when(i == n_i - 1)
    def _():
        den_raw = den_ref[:]
        eps = jnp.asarray(jnp.finfo(jnp.float32).eps, den_raw.dtype)
        inv_den = 1.0 / (jnp.where(den_raw == 0.0, eps, den_raw)
                         + scal_ref[1])
        pt1 = den_raw * inv_den
        pt1_ref[:] = pt1
        den_ref[:] = inv_den
        x2 = x2_ref[:]
        xx_ref[:] = jnp.sum(
            jnp.where(x2 < _BIG * 0.5, pt1 * x2, 0.0), keepdims=True)

    # ---- pass B: previous stripe's moments (pgst/pden/pxs), zero on the
    # first stripe (pact all 0) and on its culled tiles. The normalizer
    # is FOLDED into the (8, TN) channel matrix — one O(TN) broadcast —
    # instead of a per-pair (TM, TN) multiply + row-sum: the B-half's VPU
    # work would otherwise compete with the A-half's exp, which is the
    # whole pipeline's critical path. p1 rides the dot on channel row 3
    # (zero in _pad_transpose output for dim <= 3; holds inv_den here).
    @pl.when(pact_ref[i] == 1)
    def _():
        g = pgst_ref[:].astype(jnp.float32)
        pden = pden_ref[:]
        rowsel = jax.lax.broadcasted_iota(
            jnp.int32, (_SUBLANES, pden.shape[1]), 0) == 3
        chan = jnp.where(rowsel, pden, pxs_ref[:] * pden)
        mom = jax.lax.dot_general(
            chan, g,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, TM): rows 0-2 = px, row 3 = p1
        px_ref[:] = mom
        p1_ref[:] = mom[3:4]

    @pl.when(pact_ref[i] == 0)
    def _():
        p1_ref[:] = jnp.zeros_like(p1_ref)
        px_ref[:] = jnp.zeros_like(px_ref)


def fused_stash_merged_core(scal, ys_t, y2, xs_t, x2, *, tile_m: int,
                            tile_n: int, mask=None, interpret: bool = False,
                            stash_dtype=jnp.float32):
    """Single-exp culled E-step, pipelined: same contract and outputs as
    :func:`fused_stash_core`, but each stripe is ONE kernel launch that
    computes the current stripe's den/stash while emitting the previous
    stripe's moments (see _stash_merged_kernel). Costs a second resident
    g-stash buffer (the scan ping-pongs previous/current)."""
    mp, np_ = ys_t.shape[1], xs_t.shape[1]
    n_i, n_j = mp // tile_m, np_ // tile_n
    inv2s2 = scal[0]

    if mask is None:
        ymin, ymax = _tile_bounds(ys_t, y2, tile_m)
        xmin, xmax = _tile_bounds(xs_t, x2, tile_n)
        mask = _active_mask(ymin, ymax, xmin, xmax, inv2s2)
    act, eff = _stripe_compaction(mask)                    # (n_j, n_i) each

    xs_blocks = xs_t.reshape(_SUBLANES, n_j, tile_n).transpose(1, 0, 2)
    x2_blocks = x2.reshape(1, n_j, tile_n).transpose(1, 0, 2)

    merged_kernel = pl.pallas_call(
        _stash_merged_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_SUBLANES, tile_m),
                             lambda i, act, eff, pact, peff: (0, eff[i])),
                pl.BlockSpec((1, tile_m),
                             lambda i, act, eff, pact, peff: (0, eff[i])),
                pl.BlockSpec((_SUBLANES, tile_n),
                             lambda i, act, eff, pact, peff: (0, 0)),
                pl.BlockSpec((1, tile_n),
                             lambda i, act, eff, pact, peff: (0, 0)),
                pl.BlockSpec((_SUBLANES, tile_n),
                             lambda i, act, eff, pact, peff: (0, 0)),
                pl.BlockSpec((1, tile_n),
                             lambda i, act, eff, pact, peff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff, pact, peff: (peff[i], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_n),
                             lambda i, act, eff, pact, peff: (0, 0)),
                pl.BlockSpec((1, tile_n),
                             lambda i, act, eff, pact, peff: (0, 0)),
                pl.BlockSpec((1, 1),
                             lambda i, act, eff, pact, peff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff, pact, peff: (eff[i], 0)),
                pl.BlockSpec((1, tile_m),
                             lambda i, act, eff, pact, peff: (0, i)),
                pl.BlockSpec((_SUBLANES, tile_m),
                             lambda i, act, eff, pact, peff: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, tile_n), jnp.float32),
            jax.ShapeDtypeStruct((1, tile_n), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, tile_n), stash_dtype),
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((_SUBLANES, mp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * tile_n * (2 * _SUBLANES + 3),
            bytes_accessed=8 * mp * tile_n,
            transcendentals=mp * tile_n,
        ),
        interpret=interpret,
    )

    moment_kernel = pl.pallas_call(
        _stash_moment_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec((_SUBLANES, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff: (eff[i], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, i)),
                pl.BlockSpec((_SUBLANES, tile_m),
                             lambda i, act, eff: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((_SUBLANES, mp), jnp.float32),
        ],
        interpret=interpret,
    )

    zeros_i32 = jnp.zeros((n_i,), act.dtype)
    gst0 = jnp.zeros((mp, tile_n), stash_dtype)
    den0 = jnp.zeros((1, tile_n), jnp.float32)
    xs0 = jnp.zeros((_SUBLANES, tile_n), jnp.float32)

    def stripe(carry, blk):
        (p1a, pxa, xxa, gst_p, den_p, xs_p, act_p, eff_p) = carry
        xs_b, x2_b, act_b, eff_b = blk
        den, pt1_b, xx_b, gst, p1_b, px_b = merged_kernel(
            act_b, eff_b, act_p, eff_p, scal, ys_t, y2, xs_b, x2_b,
            xs_p, den_p, gst_p)
        return ((p1a + p1_b, pxa + px_b, xxa + xx_b[0, 0],
                 gst, den, xs_b, act_b, eff_b), pt1_b)

    init = (jnp.zeros((1, mp), jnp.float32),
            jnp.zeros((_SUBLANES, mp), jnp.float32),
            jnp.zeros((), jnp.float32),
            gst0, den0, xs0, zeros_i32, zeros_i32)
    (p1p, pxp, xx, gst_l, den_l, xs_l, act_l, eff_l), pt1_stack = \
        jax.lax.scan(stripe, init, (xs_blocks, x2_blocks, act, eff))
    # Epilogue: the last stripe's moments never ran inside the scan.
    p1_b, px_b = moment_kernel(act_l, eff_l, xs_l, den_l, gst_l)
    p1p = p1p + p1_b
    pxp = pxp + px_b
    pt1p = pt1_stack.transpose(1, 0, 2).reshape(1, np_)
    return pt1p, p1p, pxp, xx.reshape(1, 1)


def _stash_den_raw_kernel(act_ref, eff_ref, scal_ref, ys_ref, y2_ref,
                          xs_ref, x2_ref, den_ref, gst_ref):
    """Pass A without the normalizer finalization: RAW column sums only.

    The 2-D-mesh E-step psums the raw den across source shards (the
    cross-device posterior normalizer) BETWEEN pass A and pass B — the
    stash design splits exactly at the point where the collective goes.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        den_ref[:] = jnp.zeros_like(den_ref)

    @pl.when(act_ref[i] == 1)
    def _():
        g = _dist_tile(ys_ref[:], y2_ref[:], xs_ref[:], x2_ref[:],
                       scal_ref[0])
        gst_ref[:] = g
        den_ref[:] += jnp.sum(g, axis=0, keepdims=True)


def fused_stash_core_spmd(t_src_t, xs_loc, sm, xm, sigma2, c, *, m_axis,
                          tile_m: int, tile_n: int, interpret: bool = False):
    """Single-exp culled E-step INSIDE shard_map, source sharded on m_axis.

    Args (all per-device locals): ``t_src_t`` (D, Ml) transformed source
    shard, ``xs_loc`` (D, Nl) target shard, ``sm``/``xm`` (1, Ml)/(1, Nl)
    validity masks, scalar ``sigma2`` and outlier constant ``c``.

    For each target stripe: pass A computes the local active tiles' exp'd
    blocks once (stashed to HBM) and their RAW column sums; ``den_j`` is
    then ``psum``'d over ``m_axis`` — the cross-tile softmax denominator
    spanning every source shard — finalized to a reciprocal, and pass B
    reloads the stash to emit the moments without recomputing exp.

    Returns LOCAL results: (pt1 (1, Nl) [replicated across m_axis],
    p1 (Ml,), px_t (D, Ml), xx_part scalar) — the caller psums
    p1/px/xx over the target axis.
    """
    dim, ml = t_src_t.shape
    nl = xs_loc.shape[1]
    f32 = jnp.float32
    tile_m = min(tile_m, ((ml + _SUBLANES - 1) // _SUBLANES) * _SUBLANES)
    tile_n = min(tile_n, ((nl + 127) // 128) * 128)
    mp = -(-ml // tile_m) * tile_m
    nlp = -(-nl // tile_n) * tile_n
    n_i, n_j = mp // tile_m, nlp // tile_n
    eps = jnp.asarray(jnp.finfo(f32).eps, f32)

    ys8 = jnp.zeros((_SUBLANES, mp), f32).at[:dim, :ml].set(t_src_t)
    y2v = jnp.sum(t_src_t * t_src_t, axis=0)
    y2v = jnp.where(sm[0] > 0, y2v, _BIG)
    y2p = jnp.full((1, mp), _BIG, f32).at[0, :ml].set(y2v)
    xs8 = jnp.zeros((_SUBLANES, nlp), f32).at[:dim, :nl].set(xs_loc)
    x2v = jnp.sum(xs_loc * xs_loc, axis=0)
    x2v = jnp.where(xm[0] > 0, x2v, _BIG)
    x2p = jnp.full((1, nlp), _BIG, f32).at[0, :nl].set(x2v)
    inv2s2 = (0.5 / sigma2).astype(f32)
    scal = jnp.stack([inv2s2, jnp.asarray(c, f32)])

    ymin, ymax = _tile_bounds(ys8, y2p, tile_m)
    xmin, xmax = _tile_bounds(xs8, x2p, tile_n)
    mask = _active_mask(ymin, ymax, xmin, xmax, inv2s2)
    act, eff = _stripe_compaction(mask)

    xs_blocks = xs8.reshape(_SUBLANES, n_j, tile_n).transpose(1, 0, 2)
    x2_blocks = x2p.reshape(1, n_j, tile_n).transpose(1, 0, 2)

    den_raw_kernel = pl.pallas_call(
        _stash_den_raw_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_SUBLANES, tile_m),
                             lambda i, act, eff: (0, eff[i])),
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, eff[i])),
                pl.BlockSpec((_SUBLANES, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff: (eff[i], 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, tile_n), f32),
            jax.ShapeDtypeStruct((mp, tile_n), f32),
        ],
        interpret=interpret,
    )

    moment_kernel = pl.pallas_call(
        _stash_moment_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec((_SUBLANES, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff: (eff[i], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, i)),
                pl.BlockSpec((_SUBLANES, tile_m),
                             lambda i, act, eff: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), f32),
            jax.ShapeDtypeStruct((_SUBLANES, mp), f32),
        ],
        interpret=interpret,
    )

    def stripe(carry, blk):
        p1a, pxa, xxa = carry
        xs_b, x2_b, act_b, eff_b = blk
        den_part, gst = den_raw_kernel(act_b, eff_b, scal, ys8, y2p,
                                       xs_b, x2_b)
        # THE cross-device softmax denominator: every column's normalizer
        # spans all source shards on the m-axis.
        den_raw = jax.lax.psum(den_part, m_axis)
        inv_den = 1.0 / (jnp.where(den_raw == 0.0, eps, den_raw) + scal[1])
        pt1_b = den_raw * inv_den
        xx_b = jnp.sum(jnp.where(x2_b < _BIG * 0.5, pt1_b * x2_b, 0.0))
        p1_b, px_b = moment_kernel(act_b, eff_b, xs_b, inv_den, gst)
        return (p1a + p1_b, pxa + px_b, xxa + xx_b), pt1_b

    init = (jnp.zeros((1, mp), f32), jnp.zeros((_SUBLANES, mp), f32),
            jnp.zeros((), f32))
    (p1p, pxp, xx), pt1_stack = jax.lax.scan(
        stripe, init, (xs_blocks, x2_blocks, act, eff))
    pt1 = pt1_stack.transpose(1, 0, 2).reshape(1, nlp)[:, :nl]
    return pt1, p1p[0, :ml], pxp[:dim, :ml], xx


# --------------------------------------------------------------------------
# Row-weighted culled E-step (BCPD)
# --------------------------------------------------------------------------
#
# BCPD's posterior is pmat_mj = exp(rowlog_m - d2_mj/2s2) with
# rowlog_m = ln((1-w) alpha_m e^{-s^2 Sigma_mm D / 2s2} / (2 pi s2)^{D/2})
# and den_j = w/N + colsum (reference bcpd.py:53-72) — the CPD kernel with
# a per-source-row exponent offset and c := w/N. The cull bound gains the
# tile's max rowlog; the moment pass additionally tracks each source row's
# min d2 over ACTIVE tiles, which the caller combines with the culled
# tiles' box-gap lower bounds to drive the NN-RMSE convergence criterion.

def _wdist_tile(ys_t, y2, xs_t, x2, inv2s2, rowlog):
    xy = jax.lax.dot_general(
        ys_t, xs_t,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(y2.reshape(-1, 1) + x2.reshape(1, -1) - 2.0 * xy, 0.0)
    return jnp.exp(rowlog.reshape(-1, 1) - d2 * inv2s2), d2


def _wstash_den_kernel(act_ref, eff_ref, scal_ref, ys_ref, y2_ref, rl_ref,
                       xs_ref, x2_ref, den_ref, nud_ref, dmin_ref, gst_ref,
                       gd2_ref):
    """Row-weighted pass A (one target stripe): stash exp'd blocks, raw
    den, per-row d2 minima (computed HERE where d2 is live — the stash
    holds only g, and recovering d2 from it would cost a log per pair,
    exactly the transcendental the stash saves), and the residual-form
    sigma2 accumulator sum_m g * d2 per column (normalized to
    sum_m p * d2 at the last grid step — see bcpd._vi_mstep_t)."""
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        den_ref[:] = jnp.zeros_like(den_ref)
        gd2_ref[:] = jnp.zeros_like(gd2_ref)

    @pl.when(act_ref[i] == 1)
    def _():
        g, d2 = _wdist_tile(ys_ref[:], y2_ref[:], xs_ref[:], x2_ref[:],
                            scal_ref[0], rl_ref[:])
        gst_ref[:] = g
        den_ref[:] += jnp.sum(g, axis=0, keepdims=True)
        # g underflows to EXACTLY 0.0 wherever d2 is the padded-column
        # _BIG marker, so g * d2 contributes exactly 0 there.
        gd2_ref[:] += jnp.sum(g * d2, axis=0, keepdims=True)
        # Padded target columns carry |x|^2 = _BIG, which d2 inherits, so
        # no masking term is needed in the row minima.
        dmin_ref[:] = jnp.min(d2, axis=1, keepdims=True).reshape(1, -1)

    @pl.when(act_ref[i] == 0)
    def _():
        dmin_ref[:] = jnp.full_like(dmin_ref, _BIG)

    @pl.when(i == n_i - 1)
    def _():
        den_raw = den_ref[:]
        den = den_raw + scal_ref[1]                  # c = w / n_eff
        den = jnp.where(den == 0.0, scal_ref[2], den)  # eps
        nud_ref[:] = den_raw / den
        den_ref[:] = 1.0 / den                       # reciprocal for pass B
        gd2_ref[:] = gd2_ref[:] * den_ref[:]         # sum_m p * d2 per col


def _wstash_moment_kernel(act_ref, eff_ref, v_ref, den_ref, gst_ref,
                          mom_ref):
    i = pl.program_id(0)

    @pl.when(act_ref[i] == 1)
    def _():
        p = gst_ref[:] * den_ref[:]
        mom_ref[:] = jax.lax.dot_general(
            v_ref[:], p,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, TM)

    @pl.when(act_ref[i] == 0)
    def _():
        mom_ref[:] = jnp.zeros_like(mom_ref)


def _capped_stash_tile_n(m, tile_m, tile_n, itemsize=4, budget=None,
                         on_overflow="raise"):
    """Shrink tile_n until the (M_padded, tile_n) g-stash fits the budget.

    The BCPD VI holds more resident HBM than the CPD EM (the rank-K
    Nystrom factor, the v field, 8-channel vt blocks, Sigma diag), and a
    4 GB stash (1M x 1024 f32) alongside it crashes the v5e worker —
    observed twice on the 1M BCPD pyramid. Halving tile_n costs per-pass
    rate (measured 616/944 -> 523/744 G/s at 1M for the CPD twin) but
    keeps the allocation inside the budget (default:
    ``config.bcpd_stash_max_bytes``; estep_auto passes
    ``config.cpd_stash_max_bytes``).

    ``on_overflow``: when even the tile_n=256 floor exceeds the budget,
    ``"raise"`` refuses with the safe-path error (silently exceeding the
    budget would defeat the crash guard this cap exists for) and
    ``"fallback"`` returns None so the caller can route to a stash-free
    path (estep_auto falls back to the streaming XLA scan).
    """
    if budget is None:
        from ..config import config

        budget = getattr(config, "bcpd_stash_max_bytes", None)
    if not budget:
        return tile_n
    eff_tile_m = min(tile_m, ((m + _SUBLANES - 1) // _SUBLANES) * _SUBLANES)
    mp = ((m + eff_tile_m - 1) // eff_tile_m) * eff_tile_m
    while tile_n > 256 and mp * tile_n * itemsize > budget:
        # Keep the lane dim a multiple of 128 (Mosaic requirement; a
        # clamped odd multiple like 896 would otherwise halve to 448).
        tile_n = max(256, (tile_n // 2 // 128) * 128)
    if mp * tile_n * itemsize > budget:
        if on_overflow == "fallback":
            return None
        raise ValueError(
            f"BCPD g-stash needs {mp * tile_n * itemsize / 2**30:.1f} GiB "
            f"even at the tile_n=256 floor (M_padded={mp}), over "
            f"config.bcpd_stash_max_bytes={budget}; use a 2-axis mesh "
            "(registration_bcpd_pyramid(mesh=...)) or raise the budget.")
    return tile_n


def bcpd_estep_culled(t_source, target, rowlog, v_t, w_over_n, sigma2,
                      tile_m: int = 1024, tile_n: int = 1024,
                      interpret: bool = False):
    """Tile-culled BCPD E-step on Morton-sorted inputs (caller sorts).

    Args:
        t_source: (M, D) transformed source (sorted order).
        target: (N, D) target (sorted order).
        rowlog: (M,) per-source-row log weight (see module note).
        v_t: (C<=8, N) channel matrix whose per-source moments are wanted
            (BCPD uses [x; 1; |x|^2]).
        w_over_n: the outlier constant w / n_eff.
        sigma2: Gaussian variance.

    Returns (nu_d (N,), mom (C, M), dmin (M,), e1 ()) where dmin is each
    source row's min squared distance over ACTIVE tiles, min'd with the
    box-gap lower bound of its culled tiles — a tight lower bound on the
    true NN distance (exact whenever the NN lies in an active tile, which
    it does unless the row's entire neighborhood is culled) — and e1 is
    the residual-form sigma2 numerator sum_mn p_mn d2_mn, accumulated in
    pass A where d2 is live (culled pairs contribute ~0: their g
    underflows; see bcpd._vi_mstep_t).
    """
    t_source = jnp.asarray(t_source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    m, dim = t_source.shape
    n = target.shape[0]
    c = v_t.shape[0]
    sigma2 = jnp.asarray(sigma2, jnp.float32)
    inv2s2 = 0.5 / sigma2
    tile_m = min(tile_m, ((m + _SUBLANES - 1) // _SUBLANES) * _SUBLANES)
    tile_n = min(tile_n, ((n + 127) // 128) * 128)
    tile_n = _capped_stash_tile_n(m, tile_m, tile_n)

    ys_t, y2 = _pad_transpose(t_source, tile_m)
    xs_t, x2 = _pad_transpose(target, tile_n)
    mp, np_ = ys_t.shape[1], xs_t.shape[1]
    n_i, n_j = mp // tile_m, np_ // tile_n
    # Padded source rows: rowlog -inf-ish so their g underflows to 0
    # regardless of the _BIG |y|^2 marker (belt and braces).
    rl = jnp.full((1, mp), -1e30, jnp.float32).at[0, :m].set(
        jnp.asarray(rowlog, jnp.float32))
    vt = jnp.zeros((_SUBLANES, np_), jnp.float32).at[:c, :n].set(
        jnp.asarray(v_t, jnp.float32))

    # Cull bound with the GLOBAL max rowlog folded in: tile dead iff
    # max_rowlog - lb2 * inv2s2 < -_CUT. Deliberately global, not
    # per-source-tile: per-tile rowlog maxima could cull a spatially
    # OVERLAPPING tile (lb2 ~ 0) whose row weights underflow, and folding
    # its lb2 ~ 0 into the NN-distance minima below would deflate the VI
    # loop's rmse criterion. With the global bound every culled tile is
    # distance-culled, so its lb2 is a meaningful d2 lower bound.
    ymin, ymax = _tile_bounds(ys_t, y2, tile_m)
    xmin, xmax = _tile_bounds(xs_t, x2, tile_n)
    lb2 = _box_gap_lb2(ymin, ymax, xmin, xmax)             # (n_i, n_j)
    # Clamp the folded max-rowlog at -_CUT: if EVERY row weight underflows
    # (rlmax < -_CUT — a degenerate but reachable VI regime), an unclamped
    # bound would weight-cull even spatially OVERLAPPING tiles and their
    # lb2 ~ 0 would collapse the dmin NN bound to 0 — zeroing the VI
    # convergence RMSE and silently freezing best-state tracking on an
    # arbitrary early state. Clamped, overlapping tiles stay ACTIVE (their
    # g computes to ~0 — exact, just no cull savings) and dmin stays a
    # true NN distance.
    rlmax = jnp.maximum(jnp.max(rl[0, :m]), -_CUT)
    mask = (rlmax - lb2 * inv2s2 >= -_CUT).astype(jnp.float32)


    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, jnp.float32)
    scal = jnp.stack([inv2s2, jnp.asarray(w_over_n, jnp.float32),
                      eps]).astype(jnp.float32)
    act, eff = _stripe_compaction(mask)

    xs_blocks = xs_t.reshape(_SUBLANES, n_j, tile_n).transpose(1, 0, 2)
    x2_blocks = x2.reshape(1, n_j, tile_n).transpose(1, 0, 2)
    vt_blocks = vt.reshape(_SUBLANES, n_j, tile_n).transpose(1, 0, 2)

    den_kernel = pl.pallas_call(
        _wstash_den_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_SUBLANES, tile_m),
                             lambda i, act, eff: (0, eff[i])),
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, eff[i])),
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, eff[i])),
                pl.BlockSpec((_SUBLANES, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_m), lambda i, act, eff: (0, i)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff: (eff[i], 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, tile_n), jnp.float32),
            jax.ShapeDtypeStruct((1, tile_n), jnp.float32),
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((mp, tile_n), jnp.float32),
            jax.ShapeDtypeStruct((1, tile_n), jnp.float32),
        ],
        interpret=interpret,
    )

    moment_kernel = pl.pallas_call(
        _wstash_moment_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_i,),
            in_specs=[
                pl.BlockSpec((_SUBLANES, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((1, tile_n), lambda i, act, eff: (0, 0)),
                pl.BlockSpec((tile_m, tile_n),
                             lambda i, act, eff: (eff[i], 0)),
            ],
            out_specs=pl.BlockSpec((_SUBLANES, tile_m),
                                   lambda i, act, eff: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((_SUBLANES, mp), jnp.float32),
        interpret=interpret,
    )

    def stripe(carry, blk):
        mom_a, dmin_a, e1_a = carry
        xs_b, x2_b, vt_b, act_b, eff_b = blk
        inv_den, nud_b, dmin_b, gst, gd2_b = den_kernel(
            act_b, eff_b, scal, ys_t, y2, rl, xs_b, x2_b)
        mom_b = moment_kernel(act_b, eff_b, vt_b, inv_den, gst)
        return (mom_a + mom_b, jnp.minimum(dmin_a, dmin_b),
                e1_a + jnp.sum(gd2_b)), nud_b

    init = (jnp.zeros((_SUBLANES, mp), jnp.float32),
            jnp.full((1, mp), _BIG, jnp.float32),
            jnp.zeros((), jnp.float32))
    (mom, dminp, e1), nud_stack = jax.lax.scan(
        stripe, init, (xs_blocks, x2_blocks, vt_blocks, act, eff))
    nud = nud_stack.transpose(1, 0, 2).reshape(1, np_)

    # Fold culled tiles' box-gap lower bounds into the row minima: exact
    # whenever the NN lies in an active tile; a tight lower bound otherwise.
    lb2_culled = jnp.where(mask > 0, jnp.inf, lb2)         # (n_i, n_j)
    lb2_row_tile = jnp.min(lb2_culled, axis=1)             # (n_i,)
    dmin_tiles = jnp.repeat(lb2_row_tile, tile_m)[:mp]
    dmin = jnp.minimum(dminp[0, :m], dmin_tiles[:m])
    return nud[0, :n], mom[:c, :m], dmin, e1


# --------------------------------------------------------------------------
# Culled Gauss transform (single pass)
# --------------------------------------------------------------------------
#
# out[i, c] = sum_j exp(-|q_i - p_j|^2 / h^2) w[j, c] — FilterReg's E-step
# moments and the L2-dist costs are exactly this shape (<= 8 channels, so
# the whole weight block rides the 8 sublanes). No posterior normalizer
# means ONE pass: tile culling here has no double-exp penalty at all, so
# the kernel is used unconditionally (all-active mask == dense compute).

def _gt_kernel(scal_ref, mbits_ref, qs_ref, q2_ref, ps_ref, p2_ref, w_ref,
               out_ref, *, precision=jax.lax.Precision.HIGHEST):
    i = pl.program_id(0)   # query tile
    j = pl.program_id(1)   # point tile (reduction, innermost)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(_tile_active(mbits_ref, i * n_j + j))
    def _():
        g = _dist_tile(qs_ref[:], q2_ref[:], ps_ref[:], p2_ref[:],
                       scal_ref[0], precision=precision)  # (TM, TN)
        out_ref[:] += jax.lax.dot_general(
            w_ref[:], g,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, TM)


@functools.partial(
    jax.jit, static_argnames=("tile", "interpret", "cull", "sort"))
def gauss_transform_culled(
    source: jax.Array,
    target: jax.Array,
    weights: jax.Array,
    h,
    tile: int = 1024,
    interpret: bool = False,
    cull: bool = True,
    sort: bool = True,
) -> jax.Array:
    """Tile-culled exact Gauss transform (<= 8 weight channels).

    Same semantics/argument order as ops/gausstransform.gauss_transform:
    ``out[i, c] = sum_j exp(-|target_i - source_j|^2 / h^2) w[j, c]``
    (reference convention, h^2 not 2h^2). Exact: culled tiles are ones
    whose box-gap bound proves f32 underflow. ``sort=True`` Morton-sorts
    both clouds internally and returns output in the caller's order.
    """
    from .spatial import morton_order

    source = jnp.asarray(source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)
    squeeze = weights.ndim == 1
    if squeeze:
        weights = weights[:, None]
    m, dim = source.shape
    nq = target.shape[0]
    c = weights.shape[1]
    if c > _SUBLANES:
        raise ValueError(f"gauss_transform_culled supports <= {_SUBLANES} "
                         f"weight channels, got {c}")
    # Shared-centroid centering, like ops/pairwise.sqdist: the in-kernel
    # expanded-form distances lose ~|x|^2 * eps to f32 cancellation at
    # large coordinate magnitudes; the transform is translation
    # invariant, so centering is free and keeps the kernel consistent
    # with the (centered) dense oracle.
    cen = ((jnp.sum(source, axis=0) + jnp.sum(target, axis=0))
           / (m + nq))
    source = source - cen[None, :]
    target = target - cen[None, :]
    if sort:
        perm_p = morton_order(source)
        perm_q = morton_order(target)
        source = source[perm_p]
        weights = weights[perm_p]
        target = target[perm_q]

    tile_q = min(tile, ((nq + _SUBLANES - 1) // _SUBLANES) * _SUBLANES)
    tile_p = min(tile, ((m + 127) // 128) * 128)
    qs_t, q2 = _pad_transpose(target, tile_q)
    ps_t, p2 = _pad_transpose(source, tile_p)
    nqp, mp = qs_t.shape[1], ps_t.shape[1]
    n_i, n_j = nqp // tile_q, mp // tile_p
    w_t = jnp.zeros((_SUBLANES, mp), jnp.float32).at[:c, :m].set(weights.T)

    inv = 1.0 / (jnp.asarray(h, jnp.float32) ** 2)
    scal = jnp.stack([inv, jnp.zeros((), jnp.float32)])

    if cull:
        qmin, qmax = _tile_bounds(qs_t, q2, tile_q)
        pmin, pmax = _tile_bounds(ps_t, p2, tile_p)
        mask = _active_mask(qmin, qmax, pmin, pmax, inv)
    else:
        mask = jnp.ones((n_i, n_j), jnp.float32)
    mbits = _pack_mask_bits(mask)

    def _call(precision, scal):
        return pl.pallas_call(
            functools.partial(_gt_kernel, precision=precision),
            grid=(n_i, n_j),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_SUBLANES, tile_q), lambda i, j: (0, i)),
                pl.BlockSpec((1, tile_q), lambda i, j: (0, i)),
                pl.BlockSpec((_SUBLANES, tile_p), lambda i, j: (0, j)),
                pl.BlockSpec((1, tile_p), lambda i, j: (0, j)),
                pl.BlockSpec((_SUBLANES, tile_p), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((_SUBLANES, tile_q), lambda i, j: (0, i)),
            out_shape=jax.ShapeDtypeStruct((_SUBLANES, nqp), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * nqp * mp * (_SUBLANES + 3),
                bytes_accessed=4 * (nqp + mp) * _SUBLANES * (n_i + n_j),
                transcendentals=nqp * mp,
            ),
            interpret=interpret,
        )(scal, mbits, qs_t, q2, ps_t, p2, w_t)

    from ..config import config as _cfg

    if bool(getattr(_cfg, "estep_fast_start", True)):
        # Start-temperature fast mode, same bound as estep_auto: when the
        # bf16 rounding of the d2 cross term cannot move any exp argument
        # (here -d2/h^2) by more than tol, one bf16 MXU pass suffices.
        # Engages for FilterReg/L2 moment passes while the bandwidth is
        # large vs the (centered) cloud scale; annealed calls take the
        # HIGHEST branch. No recompile at the flip (lax.cond).
        tol = float(getattr(_cfg, "estep_fast_start_tol", 0.02))
        q2max = jnp.max(jnp.where(q2 < _BIG * 0.5, q2, 0.0))
        p2max = jnp.max(jnp.where(p2 < _BIG * 0.5, p2, 0.0))
        argerr = inv * 8.0 * (2.0 ** -9) * jnp.sqrt(q2max * p2max)
        outp = jax.lax.cond(
            argerr <= tol,
            functools.partial(_call, jax.lax.Precision.DEFAULT),
            functools.partial(_call, jax.lax.Precision.HIGHEST),
            scal)
    else:
        outp = _call(jax.lax.Precision.HIGHEST, scal)

    out = outp[:c, :nq].T
    if sort:
        out = jnp.zeros_like(out).at[perm_q].set(out)
    return out[:, 0] if squeeze else out


def active_tile_fraction(t_source, target, sigma2, tile_m=1024, tile_n=1024):
    """Fraction of (source, target) tile pairs the culled kernels compute.

    Diagnostic / benchmark helper: 1.0 means dense (nothing culled);
    the culled E-step's work scales with this fraction.
    """
    t_source = jnp.asarray(t_source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    ys_t, y2 = _pad_transpose(t_source, tile_m)
    xs_t, x2 = _pad_transpose(target, tile_n)
    inv2s2 = 0.5 / jnp.asarray(sigma2, jnp.float32)
    ymin, ymax = _tile_bounds(ys_t, y2, tile_m)
    xmin, xmax = _tile_bounds(xs_t, x2, tile_n)
    return jnp.mean(_active_mask(ymin, ymax, xmin, xmax, inv2s2))


@functools.partial(
    jax.jit, static_argnames=("w", "tile_m", "tile_n", "interpret")
)
def estep_culled(
    t_source: jax.Array,
    target: jax.Array,
    sigma2,
    w: float = 0.0,
    tile_m: int = 1024,
    tile_n: int = 1024,
    interpret: bool = False,
) -> EstepMoments:
    """Morton-sorted tile-culled E-step; results in ORIGINAL point order.

    Sorting makes tiles spatially compact so the AABB box-gap culling
    in :func:`estep_fused` actually fires (ops/spatial.py); the per-row
    moments are gathered back to input order afterwards. Sort + unsort are
    O((M+N) log) against the E-step's O(M*N) — negligible at the sizes
    where this kernel is selected.
    """
    from .spatial import morton_order

    t_source = jnp.asarray(t_source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    perm_y = morton_order(t_source)
    perm_x = morton_order(target)
    mom = estep_fused(
        t_source[perm_y], target[perm_x], sigma2, w,
        tile_m=tile_m, tile_n=tile_n, interpret=interpret, cull=True)
    m = t_source.shape[0]
    n = target.shape[0]
    pt1 = jnp.zeros((n,), mom.pt1.dtype).at[perm_x].set(mom.pt1)
    p1 = jnp.zeros((m,), mom.p1.dtype).at[perm_y].set(mom.p1)
    px = jnp.zeros(mom.px.shape, mom.px.dtype).at[perm_y].set(mom.px)
    return EstepMoments(pt1, p1, px, mom.n_p, mom.xx)


@functools.partial(
    jax.jit,
    static_argnames=("w", "tile_m", "tile_n", "interpret",
                     "assume_sorted", "stash_dtype", "fast_start"),
)
def estep_auto(
    t_source: jax.Array,
    target: jax.Array,
    sigma2,
    w: float = 0.0,
    tile_m: int = 512,
    tile_n: int = 1024,
    interpret: bool = False,
    switch_frac: float = None,
    block=None,
    assume_sorted: bool = False,
    stash_dtype=jnp.float32,
    fast_start: bool = None,
) -> EstepMoments:
    """Density-adaptive exact E-step: the single-exp g-stash kernel.

    One program for every density: the per-tile cull mask adapts to sigma2
    at runtime (sigma2 CHANGES ACROSS EM ITERATIONS inside one compiled
    while_loop), and :func:`fused_stash_core`'s cost model — one exp +
    8 stash bytes per ACTIVE pair — beats both the XLA scan (one exp +
    12 HBM bytes per pair, always dense) and the two-pass culled kernel
    (two exps per active pair) at every active fraction. Measured on v5e
    at 131k x 131k (tiles 512x1024): 62 Gpair/s at f=1.0 vs XLA's 59 and
    the two-pass kernel's 42; 264 Gpair/s at f=0.12. Round 2's
    ``lax.cond`` between a Pallas and a dense-XLA branch (which reserved
    BOTH branches' buffers) is gone.

    ``switch_frac``/``block`` are retained for call compatibility and
    ignored (there is no branch left to switch).

    ``assume_sorted``: the caller guarantees both clouds are already in a
    spatially coherent (Morton) order — skips the per-call argsort (a TPU
    sort of a 200k cloud costs ~0.3 s, dwarfing the culling gains when
    paid every EM iteration; cpd.registration sorts ONCE instead).
    """
    del switch_frac, block
    t_source = jnp.asarray(t_source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    m = t_source.shape[0]
    n = target.shape[0]
    sigma2 = jnp.asarray(sigma2, jnp.float32)

    # Stash-size guard (config.cpd_stash_max_bytes): the g-stash is
    # O(M_padded * tile_n) bytes regardless of N; unbounded it reaches
    # buffer sizes that FAULT the v5e worker (CLAUDE.md) instead of
    # OOM-ing cleanly. Shrink tile_n first; beyond the floor, fall back
    # to the streaming XLA scan (same exact moments, ~58 Gpair/s dense).
    # NOTE: like every kernel-dispatch knob, the budget is read at TRACE
    # time — call config.clear_caches() after changing it so
    # already-compiled shapes re-derive their tiles (config.py docstring).
    from ..config import config as _cfg

    merged = bool(getattr(_cfg, "use_merged_stash", False))
    if fast_start is None:
        fast_start = bool(getattr(_cfg, "estep_fast_start", True))
    fast_start = fast_start and not merged and jnp.dtype(stash_dtype) == \
        jnp.dtype(jnp.float32)
    budget = int(getattr(_cfg, "cpd_stash_max_bytes", 0) or 0)
    if budget:
        # The merged pipeline keeps TWO stash buffers resident (previous
        # + current stripe ping-pong through the scan).
        eff_budget = budget // 2 if merged else budget
        tn = _capped_stash_tile_n(
            m, tile_m, min(tile_n, ((n + 127) // 128) * 128),
            itemsize=jnp.dtype(stash_dtype).itemsize,
            budget=eff_budget,
            on_overflow="fallback")
        if tn is None:
            from .estep import estep_xla

            return estep_xla(t_source, target, sigma2, w)
        if fast_start:
            # The fast-start lax.cond reserves BOTH branches' stashes
            # (f32 exact + bf16 fast = 6 bytes per slot vs 4). At sizes
            # where that would force a SMALLER tile_n (1M-class: the
            # measured culled rate drops ~20% per halving), keep the
            # full-tile exact kernel instead — those runs live in the
            # annealed/culled regime where the gate would not fire.
            tn_gated = _capped_stash_tile_n(
                m, tile_m, min(tile_n, ((n + 127) // 128) * 128),
                itemsize=jnp.dtype(stash_dtype).itemsize,
                budget=(eff_budget * 2) // 3,
                on_overflow="fallback")
            if tn_gated is None or tn_gated < tn:
                fast_start = False
        tile_n = min(tile_n, tn)

    if assume_sorted:
        ys, xs = t_source, target
    else:
        from .spatial import morton_order

        perm_y = morton_order(t_source)
        perm_x = morton_order(target)
        ys = t_source[perm_y]
        xs = target[perm_x]
    dim = t_source.shape[1]
    tile_m = min(tile_m, ((m + _SUBLANES - 1) // _SUBLANES) * _SUBLANES)
    tile_n = min(tile_n, ((n + 127) // 128) * 128)
    ys_t, y2 = _pad_transpose(ys, tile_m)
    xs_t, x2 = _pad_transpose(xs, tile_n)

    c = outlier_constant(sigma2, w, m, n, dim)
    scal = jnp.stack([0.5 / sigma2, c]).astype(jnp.float32)
    core = fused_stash_merged_core if merged else fused_stash_core
    if fast_start:
        # Start-temperature fast mode (config.estep_fast_start): when the
        # bf16 rounding of the d2 cross term cannot move any exp argument
        # by more than tol, run DEFAULT-precision d2 + bf16 stash
        # (measured v5e 131k dense: 63.7 -> 103.9 Gpair/s). Bound per
        # pair: |err(2 y.x)| <= 8 * 2^-9 * sqrt(max|y|^2 max|x|^2)
        # (inputs round to bf16 at ~2^-9 relative; Cauchy-Schwarz on the
        # dim sum; factor-2 headroom), times 1/(2 sigma2). sigma2 anneals
        # DOWN across EM iterations inside one compiled while_loop, so
        # the branch flips from fast to exact mid-registration — exactly
        # once per run, with no recompile (lax.cond).
        tol = float(getattr(_cfg, "estep_fast_start_tol", 0.02))
        y2max = jnp.max(jnp.where(y2 < _BIG * 0.5, y2, 0.0))
        x2max = jnp.max(jnp.where(x2 < _BIG * 0.5, x2, 0.0))
        argerr = scal[0] * 8.0 * (2.0 ** -9) * jnp.sqrt(y2max * x2max)

        def _fast(scal):
            return fused_stash_core(
                scal, ys_t, y2, xs_t, x2, tile_m=tile_m, tile_n=tile_n,
                interpret=interpret, stash_dtype=jnp.bfloat16,
                precision=jax.lax.Precision.DEFAULT)

        def _exact(scal):
            return fused_stash_core(
                scal, ys_t, y2, xs_t, x2, tile_m=tile_m, tile_n=tile_n,
                interpret=interpret, stash_dtype=stash_dtype)

        pt1p, p1p, pxp, xx = jax.lax.cond(argerr <= tol, _fast, _exact,
                                          scal)
    else:
        pt1p, p1p, pxp, xx = core(
            scal, ys_t, y2, xs_t, x2, tile_m=tile_m, tile_n=tile_n,
            interpret=interpret, stash_dtype=stash_dtype)
    pt1s = pt1p[0, :n]
    p1s = p1p[0, :m]
    pxs = pxp[:dim, :m].T
    mom = EstepMoments(pt1s, p1s, pxs, jnp.sum(p1s),
                       xx[0, 0].astype(t_source.dtype))
    if assume_sorted:
        return mom
    pt1 = jnp.zeros((n,), mom.pt1.dtype).at[perm_x].set(mom.pt1)
    p1 = jnp.zeros((m,), mom.p1.dtype).at[perm_y].set(mom.p1)
    px = jnp.zeros(mom.px.shape, mom.px.dtype).at[perm_y].set(mom.px)
    return EstepMoments(pt1, p1, px, mom.n_p, mom.xx)


# --------------------------------------------------------------------------
# Small-problem single-launch kernel
# --------------------------------------------------------------------------
#
# At probreg-typical sizes (bunny: ~400 points) the XLA E-step costs
# ~0.25 ms/iter — almost entirely per-kernel launch overhead (the actual
# 150k-pair compute is microseconds). This kernel computes the ENTIRE
# E-step in one launch with everything resident in VMEM. The p1 reduction
# rides the px MXU matmul for free: xs is padded to 8 sublanes with row 3
# set to ones, so (xs_ext @ pmat^T) row 3 is exactly p1.

def _small_kernel(scal_ref, ys_ref, y2_ref, xs_ref, x2_ref,
                  pt1_ref, pxp_ref, xx_ref):
    g = _dist_tile(ys_ref[:], y2_ref[:], xs_ref[:], x2_ref[:], scal_ref[0])
    den_raw = jnp.sum(g, axis=0, keepdims=True)          # (1, Np)
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, g.dtype)
    den = jnp.where(den_raw == 0.0, eps, den_raw) + scal_ref[1]
    pt1 = den_raw / den
    pt1_ref[:] = pt1
    pmat = g / den                                       # (Mp, Np)
    pxp_ref[:] = jax.lax.dot_general(
        xs_ref[:], pmat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                    # (8, Mp)
    x2 = x2_ref[:]
    xx_ref[:] = jnp.sum(
        jnp.where(x2 < _BIG * 0.5, pt1 * x2, 0.0), keepdims=True)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def estep_small(
    t_source: jax.Array,
    target: jax.Array,
    sigma2,
    w: float = 0.0,
    interpret: bool = False,
) -> EstepMoments:
    """Whole E-step in ONE Pallas launch; for M*N tiles that fit VMEM."""
    t_source = jnp.asarray(t_source, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    m, dim = t_source.shape
    n = target.shape[0]
    sigma2 = jnp.asarray(sigma2, jnp.float32)
    c = outlier_constant(sigma2, w, m, n, dim)
    scal = jnp.stack([0.5 / sigma2, c]).astype(jnp.float32)

    ys_t, y2 = _pad_transpose(t_source, 8)
    xs_t, x2 = _pad_transpose(target, 128)
    # Row 3 (first unused sublane) of xs = 1 so px matmul also yields p1.
    ones_row = jnp.where(x2[0] < _BIG * 0.5, 1.0, 0.0)
    xs_t = xs_t.at[dim].set(ones_row)
    mp, np_ = ys_t.shape[1], xs_t.shape[1]

    pt1p, pxp, xx = pl.pallas_call(
        _small_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((_SUBLANES, mp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(scal, ys_t, y2, xs_t, x2)

    pt1 = pt1p[0, :n]
    px = pxp[:dim, :m].T
    p1 = pxp[dim, :m]
    n_p = jnp.sum(p1)
    return EstepMoments(pt1, p1, px, n_p, xx[0, 0].astype(t_source.dtype))
