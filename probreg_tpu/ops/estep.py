"""CPD expectation-step kernels: the framework's hottest loop.

Reference hot loop: probreg/cpd.py:71-88 — an M x N ``cdist`` + exp +
column-normalize (with the uniform-outlier constant ``c``) followed by the
moment reductions pt1 (N), p1 (M), px (M, D), n_p.

TPU-first redesign
------------------
The M x N posterior matrix is never a *result*, only its moments are. We
therefore compute, streaming over target blocks:

  den_j  = sum_i exp(-|y_i - x_j|^2 / 2s2)            (complete per column)
  pt1_j  = den_j / (den_j + c)
  p1_i   = sum_j exp(.) / (den_j + c)
  px_i   = sum_j exp(.) / (den_j + c) * x_j
  xx     = sum_j pt1_j |x_j|^2      (feeds tr(X^T d(pt1) X) in the M-step)

``xx`` makes the whole E-step output *psum-able*: the rigid/affine M-steps
(cpd.py:160-192, 219-244) only ever touch pt1 through column sums against the
target, and `sum_j pt1_j x_j == sum_i px_i`, so sharding the target over a
device mesh needs only an O(M*D) psum — see probreg_tpu/parallel/sharded.py.

Two implementations:
  * ``estep_xla`` — jnp + lax.scan over target blocks, fully fused by XLA.
  * ``estep_pallas`` — fused Pallas kernel tiling both M and N (ops/estep_pallas.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import config
from .pairwise import sqdist


class EstepMoments(NamedTuple):
    """Moment form of the CPD E-step result.

    pt1: (N,) target posterior mass; p1: (M,) source posterior mass;
    px: (M, D) weighted target sums; n_p: scalar total mass;
    xx: scalar sum_j pt1_j |x_j|^2.
    """

    pt1: jax.Array
    p1: jax.Array
    px: jax.Array
    n_p: jax.Array
    xx: jax.Array


def outlier_constant(sigma2, w: float, m: int, n: int, dim: int):
    """CPD uniform-distribution constant (reference cpd.py:78-79)."""
    c = (2.0 * jnp.pi * sigma2) ** (dim * 0.5)
    return c * w / (1.0 - w) * m / n


# Pad value for target blocks: |pad|^2 overwhelms any real exponent, so the
# Gaussian of a padded column underflows to exactly 0 — no per-pair mask
# multiply (saves one VPU op per pair in the hottest loop).
_PAD_BIG = 1e15


def _block_moments(t_source, x_blk, sigma2, c, eps):
    """Moments of one (M x B) block of the posterior.

    Padded columns (coordinates == _PAD_BIG) carry exactly zero Gaussian
    mass. The per-pair VPU work is minimized for the transcendental-bound
    regime: operands are pre-scaled by 1/sqrt(2*sigma2) (folds the exponent
    scale into O((M+B)*D) work), the normalizer is applied as a reciprocal
    MULTIPLY, and p1 rides the px matmul as an appended ones column (MXU,
    not a VPU row reduction).
    """
    inv_s = jax.lax.rsqrt(2.0 * sigma2).astype(t_source.dtype)
    ys = t_source * inv_s
    xs = x_blk * inv_s
    y2 = jnp.sum(ys * ys, axis=-1)[:, None]
    x2 = jnp.sum(xs * xs, axis=-1)[None, :]
    # precision=HIGHEST is load-bearing (see ops/pairwise.sqdist).
    yx = jax.lax.dot_general(
        ys.astype(config.matmul_dtype),
        xs.astype(config.matmul_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(t_source.dtype)
    g = jnp.exp(jnp.minimum(yx + yx - y2 - x2, 0.0))
    den_raw = jnp.sum(g, axis=0)
    inv_den = 1.0 / (jnp.where(den_raw == 0.0, eps, den_raw) + c)
    pt1 = den_raw * inv_den
    pmat = g * inv_den[None, :]
    xb_ext = jnp.concatenate(
        [x_blk, jnp.ones((x_blk.shape[0], 1), x_blk.dtype)], axis=1)
    # Padded rows of x_blk are _PAD_BIG, but their pmat column is exactly 0
    # (underflowed), so they contribute nothing here.
    pxp = jax.lax.dot_general(
        pmat.astype(config.matmul_dtype),
        xb_ext.astype(config.matmul_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(t_source.dtype)
    px = pxp[:, :-1]
    p1 = pxp[:, -1]
    x2r = jnp.sum(x_blk * x_blk, axis=1)
    # Pad filter on the SQUARED norm: pad rows sit at |x|^2 ~ D*_PAD_BIG^2
    # (3e30); comparing against the unsquared 1e15 misclassified real
    # points beyond |x| ~ 3e7 as padding (review finding; matches the
    # estep_pallas kernels' x2 < _BIG * 0.5 semantics).
    xx = jnp.sum(pt1 * jnp.where(x2r < 0.5 * _PAD_BIG ** 2, x2r, 0.0))
    return pt1, p1, px, xx


@partial(jax.jit, static_argnames=("w", "block"))
def estep_xla(
    t_source: jax.Array,
    target: jax.Array,
    sigma2: jax.Array,
    w: float = 0.0,
    block: Optional[int] = None,
) -> EstepMoments:
    """Streaming XLA E-step. Peak memory O(M * block), exact.

    One pass suffices because the normalizer ``den`` is a column sum: every
    column of the posterior lives entirely inside one target block.
    """
    t_source = jnp.asarray(t_source)
    target = jnp.asarray(target)
    m, dim = t_source.shape
    n = target.shape[0]
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, t_source.dtype)
    c = outlier_constant(jnp.asarray(sigma2, t_source.dtype), w, m, n, dim)

    if block is None:
        # Cap the live (M, block) Gaussian block at ~1 GB f32: at M = 1M
        # the flat estep_chunk default (4096) would be a 16 GB temporary —
        # enough to fault a 16 GB v5e (observed round 1; CLAUDE.md).
        mem_cap = max(128, ((1 << 28) // max(m, 1)) // 128 * 128)
        block = max(min(config.estep_chunk, n, mem_cap), 1)
    if n <= block:
        pt1, p1, px, xx = _block_moments(t_source, target, sigma2, c, eps)
        return EstepMoments(pt1, p1, px, jnp.sum(p1), xx)

    pad = (-n) % block
    tgt = jnp.concatenate(
        [target, jnp.full((pad, dim), _PAD_BIG, target.dtype)], axis=0)
    nb = tgt.shape[0] // block
    blocks = tgt.reshape(nb, block, dim)

    def body(carry, x_blk):
        p1_acc, px_acc, xx_acc = carry
        pt1_b, p1_b, px_b, xx_b = _block_moments(t_source, x_blk, sigma2, c, eps)
        return (p1_acc + p1_b, px_acc + px_b, xx_acc + xx_b), pt1_b

    init = (
        jnp.zeros((m,), t_source.dtype),
        jnp.zeros((m, dim), t_source.dtype),
        jnp.zeros((), t_source.dtype),
    )
    (p1, px, xx), pt1_blocks = jax.lax.scan(body, init, blocks)
    pt1 = pt1_blocks.reshape(-1)[:n]
    return EstepMoments(pt1, p1, px, jnp.sum(p1), xx)


def estep(
    t_source: jax.Array,
    target: jax.Array,
    sigma2,
    w: float = 0.0,
    use_pallas: Optional[bool] = None,
    assume_sorted: bool = False,
) -> EstepMoments:
    """Dispatch: single-launch Pallas kernel for small problems on TPU
    (one kernel instead of ~10 -> launch-overhead-bound regime); the
    Morton-sorted tile-culled Pallas kernel for large problems (exact —
    skips only tiles whose exps provably underflow to 0, the dominant
    regime as sigma2 anneals); XLA scan otherwise. The dense two-pass
    Pallas kernel stays opt-in (config.use_pallas)."""
    m, n = t_source.shape[0], target.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None and on_tpu and m * n <= config.small_estep_max_pairs:
        from . import estep_pallas

        return estep_pallas.estep_small(t_source, target, sigma2, w)
    # Pre-sorted callers (cpd sorted step variants) take the culled path
    # from 2^24 pairs. Unsorted callers only from 2^28: they pay a Morton
    # argsort PER ITERATION inside estep_auto (~0.3 s at 200k keys on TPU,
    # CLAUDE.md), which only amortizes once the E-step itself is seconds.
    min_pairs = (config.culled_estep_min_pairs if assume_sorted
                 else max(config.culled_estep_min_pairs, 1 << 28))
    if (use_pallas is None and on_tpu and config.use_culled_estep
            and m * n >= min_pairs):
        from . import estep_pallas

        return estep_pallas.estep_auto(
            t_source, target, sigma2, w,
            switch_frac=config.culled_switch_frac,
            assume_sorted=assume_sorted,
            stash_dtype=config.stash_dtype)
    if use_pallas is None:
        use_pallas = (
            config.use_pallas
            and m * n >= config.pallas_min_pairs
            and on_tpu
        )
    if use_pallas:
        from . import estep_pallas

        return estep_pallas.estep_fused(t_source, target, sigma2, w)
    return estep_xla(t_source, target, sigma2, w)
