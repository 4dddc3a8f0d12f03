"""Tile-culled E-step (VERDICT round-1 item 1): exactness + mask safety.

The culled Pallas kernels (ops/estep_pallas.py) skip tile pairs whose
box-gap lower bound proves every Gaussian underflows f32 to exactly zero,
so their output must match the dense XLA E-step to float32 reduction noise
at EVERY sigma2 — including ones where most tiles are culled. Kernels run
in interpreter mode on CPU (the same code compiles on TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probreg_tpu.ops import estep as eo
from probreg_tpu.ops import estep_pallas as ep
from probreg_tpu.ops.spatial import morton_code, morton_order


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))


def _blob_clouds(m=1024, n=1024, seed=1):
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[i * 5.0, j * 5.0, k * 5.0]
         for i in range(2) for j in range(2) for k in range(2)], np.float32)
    src = (centers[rng.integers(0, 8, m)]
           + rng.normal(0, 0.2, (m, 3))).astype(np.float32)
    tgt = (centers[rng.integers(0, 8, n)]
           + rng.normal(0, 0.2, (n, 3))).astype(np.float32)
    return src, tgt


@pytest.mark.parametrize("sigma2", [1.0, 1e-2, 1e-4])
def test_culled_matches_xla_uniform(sigma2):
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, (700, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (900, 3)).astype(np.float32)
    ref = eo.estep_xla(src, tgt, jnp.float32(sigma2), 0.1)
    out = ep.estep_culled(src, tgt, jnp.float32(sigma2), 0.1,
                          tile_m=128, tile_n=128, interpret=True)
    assert _rel(ref.pt1, out.pt1) < 5e-4
    assert _rel(ref.p1, out.p1) < 5e-4
    assert _rel(ref.px, out.px) < 5e-4
    np.testing.assert_allclose(float(ref.n_p), float(out.n_p), rtol=1e-4)
    np.testing.assert_allclose(float(ref.xx), float(out.xx), rtol=1e-4)


def test_culling_fires_and_stays_exact():
    """Separated blobs at small sigma2: a solid fraction of tiles is
    provably dead; results still match the dense E-step."""
    src, tgt = _blob_clouds()
    py = np.asarray(morton_order(src))
    px = np.asarray(morton_order(tgt))
    frac = float(ep.active_tile_fraction(src[py], tgt[px], 0.05, 128, 128))
    assert frac < 0.7, frac

    ref = eo.estep_xla(src, tgt, jnp.float32(0.05), 0.0)
    out = ep.estep_culled(src, tgt, jnp.float32(0.05), 0.0,
                          tile_m=128, tile_n=128, interpret=True)
    assert _rel(ref.pt1, out.pt1) < 1e-5
    assert _rel(ref.p1, out.p1) < 1e-4
    assert _rel(ref.px, out.px) < 1e-4


def test_mask_never_culls_a_live_tile():
    """Safety property: any tile pair containing a point pair whose
    exponent is ABOVE the f32 underflow threshold must stay active."""
    src, tgt = _blob_clouds(512, 512, seed=3)
    tile = 128
    py = np.asarray(morton_order(src))
    px = np.asarray(morton_order(tgt))
    s, t = src[py], tgt[px]
    sigma2 = 0.03
    inv2s2 = 0.5 / sigma2

    ys_t, y2 = ep._pad_transpose(jnp.asarray(s), tile)
    xs_t, x2 = ep._pad_transpose(jnp.asarray(t), tile)
    ymin, ymax = ep._tile_bounds(ys_t, y2, tile)
    xmin, xmax = ep._tile_bounds(xs_t, x2, tile)
    mask = np.asarray(ep._active_mask(ymin, ymax, xmin, xmax, inv2s2))

    nbm, nbn = mask.shape
    d2 = ((s[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    for i in range(nbm):
        for j in range(nbn):
            blk = d2[i * tile:(i + 1) * tile, j * tile:(j + 1) * tile]
            if blk.size and blk.min() * inv2s2 <= ep._CUT:
                assert mask[i, j] == 1.0, (i, j, blk.min())


@pytest.mark.parametrize("sigma2,expect_culled", [(5.0, False), (0.03, True)])
def test_estep_auto_matches_xla_both_regimes(sigma2, expect_culled):
    """estep_auto (the single-exp g-stash kernel, round-3) adapts to the
    active-tile fraction at runtime inside ONE program; it must agree with
    the dense reference in the dense AND the mostly-culled regime."""
    src, tgt = _blob_clouds(640, 640, seed=11)
    py = np.asarray(morton_order(src))
    px = np.asarray(morton_order(tgt))
    frac = float(ep.active_tile_fraction(src[py], tgt[px], sigma2, 128, 128))
    assert (frac <= 0.7) == expect_culled, frac
    ref = eo.estep_xla(src, tgt, jnp.float32(sigma2), 0.05)
    # fast_start=False: this test pins the EXACT (HIGHEST-precision)
    # branch; the start-temperature fast branch has its own tolerance
    # test (test_estep_auto_fast_start below).
    out = ep.estep_auto(src, tgt, jnp.float32(sigma2), 0.05,
                        tile_m=128, tile_n=128, interpret=True,
                        fast_start=False)
    # 3e-4: f32 reduction-order noise differs slightly between backends
    # (measured 1.01e-4 on a real TPU at sigma2=0.03).
    assert _rel(ref.pt1, out.pt1) < 3e-4
    assert _rel(ref.p1, out.p1) < 3e-4
    assert _rel(ref.px, out.px) < 3e-4

    # assume_sorted variant (the in-EM-loop mode: caller pre-sorted once):
    # moments come back in the sorted order and must match the dense
    # E-step evaluated on the sorted clouds.
    ref_s = eo.estep_xla(src[py], tgt[px], jnp.float32(sigma2), 0.05)
    out_s = ep.estep_auto(src[py], tgt[px], jnp.float32(sigma2), 0.05,
                          tile_m=128, tile_n=128, interpret=True,
                          assume_sorted=True, fast_start=False)
    assert _rel(ref_s.pt1, out_s.pt1) < 3e-4
    assert _rel(ref_s.p1, out_s.p1) < 3e-4
    assert _rel(ref_s.px, out_s.px) < 3e-4


@pytest.mark.parametrize("sigma2,expect_fast", [(1.0, True), (0.003, False)])
def test_estep_auto_fast_start(sigma2, expect_fast):
    """The start-temperature fast branch (config.estep_fast_start,
    DEFAULT-precision d2 + bf16 stash — 63.7 -> 103.9 Gpair/s dense on
    v5e): engages exactly when the bf16 exp-argument error bound is below
    tol, and its moments match the exact E-step within the bound's
    implied envelope (~tol on exp args -> ~2 tol relative on moments,
    plus the bf16 stash's 0.4%). At annealed sigma2 the gate must pick
    the exact branch — output then matches to reduction-order noise.
    Unit-scale clouds (the production regime: EM runners center, and the
    gate compares sigma2 against the centered cloud scale)."""
    src, tgt = _blob_clouds(640, 640, seed=11)
    src = (src * 0.15).astype(np.float32)
    tgt = (tgt * 0.15).astype(np.float32)
    y2m = float(np.max((src ** 2).sum(-1)))
    x2m = float(np.max((tgt ** 2).sum(-1)))
    argerr = 0.5 / sigma2 * 8.0 * 2.0 ** -9 * np.sqrt(y2m * x2m)
    from probreg_tpu.config import config as cfg

    assert (argerr <= cfg.estep_fast_start_tol) == expect_fast, argerr
    ref = eo.estep_xla(src, tgt, jnp.float32(sigma2), 0.05)
    out = ep.estep_auto(src, tgt, jnp.float32(sigma2), 0.05,
                        tile_m=128, tile_n=128, interpret=True,
                        fast_start=True)
    tol = 2.5 * cfg.estep_fast_start_tol + 8e-3 if expect_fast else 3e-4
    assert _rel(ref.pt1, out.pt1) < tol
    assert _rel(ref.p1, out.p1) < tol
    assert _rel(ref.px, out.px) < tol


def test_sharded_culled_matches_single_device(horse_cloud):
    """Per-shard culled E-step on the virtual 8-device mesh == the
    single-device registration (interpret-mode kernels; the global psum'd
    active-fraction cond keeps every device on the same branch)."""
    from probreg_tpu import cpd, parallel
    from probreg_tpu.utils import se3_op

    src = np.asarray(horse_cloud, dtype=np.float32)[::2]
    ang = np.deg2rad([5.0, -2.0, 7.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    tgt = src @ rot.T

    res_sh = parallel.registration_cpd_sharded(
        src, tgt, "rigid", maxiter=30, tol=1e-6,
        use_culled=True, culled_interpret=True, culled_tile=128)
    res_1d = cpd.registration_cpd(src, tgt, maxiter=30, tol=1e-6)
    np.testing.assert_allclose(np.asarray(res_sh.transformation.rot),
                               np.asarray(res_1d.transformation.rot),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_sh.transformation.t),
                               np.asarray(res_1d.transformation.t),
                               atol=5e-4)
    rec = np.asarray(se3_op.mat2euler(res_sh.transformation.rot))
    np.testing.assert_allclose(rec, ang, atol=1e-2)


@pytest.mark.parametrize("h", [2.0, 0.3, 0.05])
def test_gauss_transform_culled_matches_dense(h):
    """Single-pass culled Gauss transform == the streaming XLA transform
    at every bandwidth (multi-channel weights, unsorted caller order)."""
    from probreg_tpu.ops.gausstransform import gauss_transform

    src, tgt = _blob_clouds(600, 500, seed=13)
    rng = np.random.default_rng(4)
    w = rng.uniform(0.1, 1.0, (600, 5)).astype(np.float32)
    ref = np.asarray(gauss_transform(src, tgt, w, h))
    out = np.asarray(ep.gauss_transform_culled(src, tgt, w, h,
                                               tile=128, interpret=True))
    scale = max(1.0, np.abs(ref).max())
    # 2e-4: the dense oracle computes its distances CENTERED
    # (ops/pairwise.sqdist — the large-coordinate robustness fix) while
    # the kernel computes them raw; on O(1)-coordinate fixtures the two
    # valid f32 op orders differ by ~1e-4 relative.
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-4)

    # 1-D weights squeeze path.
    ref1 = np.asarray(gauss_transform(src, tgt, w[:, 0], h))
    out1 = np.asarray(ep.gauss_transform_culled(src, tgt, w[:, 0], h,
                                                tile=128, interpret=True))
    np.testing.assert_allclose(out1 / scale, ref1 / scale, atol=2e-4)


@pytest.mark.parametrize("sigma2", [2.0, 0.05])
def test_bcpd_culled_kernel_matches_dense_multitile(sigma2):
    """Row-weighted culled kernel vs direct dense BCPD E-step math on a
    MULTI-TILE grid (128-tiles over clustered clouds, so the bit-packed
    mask, cross-tile accumulation, w/n outlier term and the dmin lower
    bounds are all exercised; at sigma2=0.05 a fraction of tiles is
    actually culled)."""
    rng = np.random.default_rng(0)
    m, n = 700, 900
    centers = np.array([[i * 4.0, j * 4.0, 0.0]
                        for i in range(2) for j in range(2)], np.float32)
    src = (centers[rng.integers(0, 4, m)]
           + rng.normal(0, 0.3, (m, 3))).astype(np.float32)
    tgt = (centers[rng.integers(0, 4, n)]
           + rng.normal(0, 0.3, (n, 3))).astype(np.float32)
    s = src[np.asarray(morton_order(src))]
    t = tgt[np.asarray(morton_order(tgt))]

    dim, w = 3, 0.1
    alpha = rng.uniform(0.5, 1.5, m).astype(np.float32) / m
    sdiag = rng.uniform(0.0, 0.1, m).astype(np.float32)
    rowlog = (np.log((1 - w) * alpha)
              - 1.0 / (2 * sigma2) * sdiag * dim
              - dim * 0.5 * np.log(2 * np.pi * sigma2))
    d2 = ((s[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    pmat = np.exp(rowlog[:, None] - d2 / (2 * sigma2))
    den = w / n + pmat.sum(0)
    den = np.where(den == 0, np.finfo(np.float32).eps, den)
    pm = pmat / den
    x2 = (t * t).sum(1)
    v_t = np.concatenate([t.T, np.ones((1, n)), x2[None]], 0).astype(
        np.float32)
    mom_ref = v_t @ pm.T
    nud_ref = pm.sum(0)
    dmin_ref = d2.min(1)

    nud, mom, dmin, e1 = ep.bcpd_estep_culled(
        s, t, rowlog, v_t, w / n, sigma2, tile_m=128, tile_n=128,
        interpret=True)
    assert _rel(nud, jnp.asarray(nud_ref)) < 1e-4
    assert _rel(mom, jnp.asarray(mom_ref)) < 1e-4
    e1_ref = float((pm * d2).sum())
    assert abs(float(e1) - e1_ref) <= 1e-4 * max(abs(e1_ref), 1e-12)
    dmin = np.asarray(dmin)
    # dmin must lower-bound the truth everywhere and be exact wherever the
    # NN lies in an active tile (all rows here: clusters overlap src/tgt).
    assert np.all(dmin <= dmin_ref + 1e-3)
    assert np.mean(np.abs(dmin - dmin_ref) < 1e-3) > 0.99


def test_bcpd_culled_vi_matches_dense():
    """The tile-culled BCPD E-step (row-weighted kernels) drives the VI
    loop to the same trajectory as the dense/streaming E-step."""
    from probreg_tpu import bcpd as bm
    from probreg_tpu.ops import lowrank as lr
    from probreg_tpu.ops.spatial import morton_order_np
    from probreg_tpu.utils import math_utils as mu
    from probreg_tpu.utils import se3_op

    rng = np.random.default_rng(2)
    m = 800
    src = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
    rot = np.asarray(se3_op.euler2mat(*np.deg2rad([8.0, -4.0, 10.0])),
                     np.float32)
    tgt = (src @ rot.T).astype(np.float32)
    cen = np.concatenate([src, tgt]).mean(0)
    sc = float(np.sqrt(mu.squared_kernel_sum(
        jnp.asarray(src - cen), jnp.asarray(tgt - cen))))
    s0, t0 = (src - cen) / sc, (tgt - cen) / sc
    s = s0[morton_order_np(s0)].astype(np.float32)
    t = t0[morton_order_np(t0)].astype(np.float32)

    gmat = tuple(lr.lowrank_imq(jnp.asarray(s), 1.0, 50))
    sigma2_0 = mu.squared_kernel_sum(jnp.asarray(s), jnp.asarray(t))
    args = (jnp.asarray(s), jnp.asarray(t), gmat,
            jnp.asarray(10.0, jnp.float32), jnp.asarray(1e20, jnp.float32),
            jnp.asarray(sigma2_0, jnp.float32))
    kw = dict(w=0.0, maxiter=40, tol=1e-7, block=4096)
    tr_d, _, _, _, rmse_d, _ = bm._run_bcpd(*args, **kw)
    tr_c, _, _, _, rmse_c, _ = bm._run_bcpd(*args, **kw, use_culled=True,
                                            culled_interpret=True)
    np.testing.assert_allclose(float(rmse_c), float(rmse_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr_c.rigid_trans.rot),
                               np.asarray(tr_d.rigid_trans.rot), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tr_c.v), np.asarray(tr_d.v),
                               atol=1e-4)


def test_gauss_transform_culled_assume_sorted():
    """sort=False trusts the caller's Morton order (the in-while-loop mode
    of the streaming FilterReg runner) and must match the dense transform
    on those sorted inputs."""
    from probreg_tpu.ops.gausstransform import gauss_transform

    src, tgt = _blob_clouds(600, 500, seed=17)
    s = src[np.asarray(morton_order(src))]
    t = tgt[np.asarray(morton_order(tgt))]
    rng = np.random.default_rng(6)
    w = rng.uniform(0.1, 1.0, (600, 4)).astype(np.float32)
    ref = np.asarray(gauss_transform(s, t, w, 0.25))
    out = np.asarray(ep.gauss_transform_culled(s, t, w, 0.25, tile=128,
                                               interpret=True, sort=False))
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-4)


def test_morton_order_np_matches_jnp():
    rng = np.random.default_rng(9)
    pts = rng.uniform(-1, 2, (333, 3)).astype(np.float32)
    from probreg_tpu.ops.spatial import morton_order_np

    np.testing.assert_array_equal(np.asarray(morton_order(pts)),
                                  morton_order_np(pts))
    p2 = pts[:, :2]
    np.testing.assert_array_equal(np.asarray(morton_order(p2)),
                                  morton_order_np(p2))


def test_morton_order_is_permutation_and_local():
    rng = np.random.default_rng(5)
    pts = rng.uniform(-2, 3, (777, 3)).astype(np.float32)
    perm = np.asarray(morton_order(pts))
    assert sorted(perm.tolist()) == list(range(777))
    # Locality: mean hop between Z-order neighbors is far below the mean
    # distance between random pairs.
    s = pts[perm]
    hops = np.linalg.norm(np.diff(s, axis=0), axis=1).mean()
    rand = np.linalg.norm(pts[rng.permutation(777)] - pts, axis=1).mean()
    assert hops < 0.5 * rand, (hops, rand)
    # 2-D codes work too.
    p2 = np.asarray(morton_order(pts[:, :2]))
    assert sorted(p2.tolist()) == list(range(777))


def test_morton_code_groups_quadrants():
    """Points in the same octant share high code bits: codes of one blob
    form a contiguous run after sorting."""
    src, _ = _blob_clouds(m=512, n=8, seed=7)
    codes = np.asarray(morton_code(src))
    order = np.argsort(codes)
    blob = (src[order] / 2.5).round().astype(int)
    labels = blob[:, 0] * 4 + blob[:, 1] * 2 + blob[:, 2]
    # Each blob's points are contiguous in Z-order: label changes along
    # the sorted sequence == number of blobs - 1.
    changes = int((np.diff(labels) != 0).sum())
    assert changes <= 7, changes


@pytest.mark.parametrize("sigma2", [1.0, 1e-2, 1e-4])
def test_stash_core_matches_xla(sigma2):
    """Single-exp g-stash E-step (fused_stash_core): pass A stashes each
    active tile's exp'd block, pass B reloads without recomputing exp; the
    scalar-prefetch eff-index compaction must not corrupt results at any
    density (round-3 VERDICT item 3)."""
    from probreg_tpu.ops.estep import outlier_constant

    src, tgt = _blob_clouds(700, 900, seed=21)
    s = src[np.asarray(morton_order(src))]
    t = tgt[np.asarray(morton_order(tgt))]
    m, n, dim, w = 700, 900, 3, 0.05
    c = outlier_constant(jnp.float32(sigma2), w, m, n, dim)
    scal = jnp.stack([0.5 / jnp.float32(sigma2), c]).astype(jnp.float32)
    ys_t, y2 = ep._pad_transpose(jnp.asarray(s), 128)
    xs_t, x2 = ep._pad_transpose(jnp.asarray(t), 128)
    pt1p, p1p, pxp, xx = ep.fused_stash_core(
        scal, ys_t, y2, xs_t, x2, tile_m=128, tile_n=128, interpret=True)
    # The established two-pass culled kernel is the tight oracle (identical
    # per-pair arithmetic — stash changes only WHERE exp results live, so
    # the two must agree to reciprocal-multiply rounding at every sigma2).
    pt1f, p1f, pxf, xxf = ep.fused_core(
        scal, ys_t, y2, xs_t, x2, tile_m=128, tile_n=128, interpret=True,
        cull=True)
    assert _rel(pt1f, pt1p) < 1e-6
    assert _rel(p1f, p1p) < 1e-6
    assert _rel(pxf, pxp) < 1e-6
    np.testing.assert_allclose(float(xxf[0, 0]), float(xx[0, 0]), rtol=1e-5)
    if sigma2 >= 1e-2:
        # vs the XLA oracle at non-pathological sigma2 (at 1e-4 with w>0
        # the den ~ outlier-constant ~ 1e-30 regime amplifies f32
        # association noise identically for BOTH Pallas kernels).
        ref = eo.estep_xla(s, t, jnp.float32(sigma2), w)
        assert _rel(ref.pt1, pt1p[0, :n]) < 3e-4
        assert _rel(ref.p1, p1p[0, :m]) < 3e-4
        assert _rel(ref.px, pxp[:dim, :m].T) < 3e-4


def test_stripe_compaction_properties():
    """eff = last active tile <= i (clamped into the stripe's active set);
    act == (eff == i); all-culled stripes have act == 0 everywhere."""
    mask = jnp.asarray([
        [0.0, 1.0, 0.0],   # tile row 0 active in stripes 1
        [1.0, 1.0, 0.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],
    ])  # (n_i=4, n_j=3)
    act, eff = ep._stripe_compaction(mask)
    act, eff = np.asarray(act), np.asarray(eff)
    assert act.shape == eff.shape == (3, 4)
    np.testing.assert_array_equal(act[0], [0, 1, 0, 1])
    np.testing.assert_array_equal(eff[0], [1, 1, 1, 3])
    np.testing.assert_array_equal(act[1], [1, 1, 1, 0])
    np.testing.assert_array_equal(eff[1], [0, 1, 2, 2])
    # stripe 2: no active tiles -> act all zero (eff is a harmless dummy).
    np.testing.assert_array_equal(act[2], [0, 0, 0, 0])
    # active steps always map to themselves.
    np.testing.assert_array_equal(eff[act == 1],
                                  np.nonzero(act.ravel())[0] % 4)


def test_stash_bf16_within_tolerance():
    """Opt-in bfloat16 stash: the normalizer stays f32 (summed before the
    cast), so pt1 is near-exact and the moment numerators carry only bf16
    quantization (~4e-3 relative)."""
    from probreg_tpu.ops.estep import outlier_constant

    src, tgt = _blob_clouds(700, 900, seed=23)
    s = src[np.asarray(morton_order(src))]
    t = tgt[np.asarray(morton_order(tgt))]
    m, n, dim, w, sigma2 = 700, 900, 3, 0.05, 0.5
    c = outlier_constant(jnp.float32(sigma2), w, m, n, dim)
    scal = jnp.stack([0.5 / jnp.float32(sigma2), c]).astype(jnp.float32)
    ys_t, y2 = ep._pad_transpose(jnp.asarray(s), 128)
    xs_t, x2 = ep._pad_transpose(jnp.asarray(t), 128)
    ref = ep.fused_stash_core(scal, ys_t, y2, xs_t, x2, tile_m=128,
                              tile_n=128, interpret=True)
    out = ep.fused_stash_core(scal, ys_t, y2, xs_t, x2, tile_m=128,
                              tile_n=128, interpret=True,
                              stash_dtype=jnp.bfloat16)
    assert _rel(ref[0], out[0]) < 1e-5          # pt1: exact-normalizer path
    assert _rel(ref[1], out[1]) < 8e-3          # p1: bf16 numerators
    assert _rel(ref[2], out[2]) < 8e-3          # px


def test_bcpd_stash_tile_cap():
    # 1M x 1024 f32 stash = 4 GB > the 2 GB default budget -> tile_n halves
    # to 512; small sizes keep the requested tile; budget=None disables.
    from probreg_tpu import config as cfgmod
    from probreg_tpu.ops.estep_pallas import _capped_stash_tile_n

    assert _capped_stash_tile_n(1_000_000, 1024, 1024) == 512
    assert _capped_stash_tile_n(100_000, 1024, 1024) == 1024
    old = cfgmod.config.bcpd_stash_max_bytes
    try:
        cfgmod.config.bcpd_stash_max_bytes = 0
        assert _capped_stash_tile_n(10_000_000, 1024, 1024) == 1024
        # When even the tile_n=256 floor exceeds the budget, the cap must
        # REFUSE (silently exceeding it defeated the crash guard).
        cfgmod.config.bcpd_stash_max_bytes = 1 << 20
        with pytest.raises(ValueError, match="bcpd_stash_max_bytes"):
            _capped_stash_tile_n(10_000_000, 1024, 1024)
    finally:
        cfgmod.config.bcpd_stash_max_bytes = old


def test_cpd_stash_cap_falls_back_to_xla(rng, monkeypatch):
    """estep_auto above the CPD stash budget: shrink tile_n, then fall
    back to the exact XLA scan instead of allocating a buffer size that
    faults the worker (review finding)."""
    from probreg_tpu import config as cfgmod
    from probreg_tpu.ops import estep_pallas as ep
    from probreg_tpu.ops.estep import estep_xla

    src = rng.random((600, 3)).astype(np.float32)
    tgt = rng.random((700, 3)).astype(np.float32)
    # Budget below the tile_n=256 floor for this M -> XLA fallback.
    monkeypatch.setattr(cfgmod.config, "cpd_stash_max_bytes", 1 << 10)
    got = ep.estep_auto(src, tgt, 0.2, 0.1)
    want = estep_xla(jnp.asarray(src), jnp.asarray(tgt),
                     jnp.asarray(0.2, jnp.float32), 0.1)
    np.testing.assert_allclose(np.asarray(got.p1), np.asarray(want.p1),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.px), np.asarray(want.px),
                               rtol=2e-5, atol=1e-6)


def test_bcpd_culled_all_rowlog_underflow_keeps_dmin_honest(rng):
    """rlmax < -_CUT (every row weight underflows): overlapping tiles must
    stay ACTIVE so dmin remains a true NN distance — an unclamped bound
    weight-culled them and collapsed dmin (hence the VI rmse) to exactly 0
    (review finding, verified repro)."""
    from probreg_tpu.ops import estep_pallas as ep
    from probreg_tpu.ops.spatial import morton_order_np

    # Sparse lattice + half-spacing offset: the tile bounding boxes
    # OVERLAP (lb2 = 0) while every point pair is >= sqrt(3) apart — the
    # exact geometry where the unclamped mask returned dmin == 0.
    g = np.arange(4, dtype=np.float32) * 2.0
    src = np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3)
    src = src[morton_order_np(src)]
    tgt = (src + 1.0).astype(np.float32)
    m = src.shape[0]
    rowlog = np.full((m,), -120.0, np.float32)     # below -_CUT
    v_t = np.concatenate([tgt.T, np.ones((1, m), np.float32),
                          (tgt ** 2).sum(1)[None]], 0)
    _, _, dmin, _ = ep.bcpd_estep_culled(
        src, tgt, rowlog, v_t, 1e-3 / m, 0.05, tile_m=64, tile_n=64,
        interpret=True)
    true_nn = ((src[:, None] - tgt[None]) ** 2).sum(-1).min(1)
    # Overlapping-box tiles stay active, so dmin IS the true NN distance
    # (3.0 here), not the collapsed 0.0 of the unclamped mask.
    np.testing.assert_allclose(np.asarray(dmin), true_nn, atol=1e-4)

def test_cpd_stash_cap_honors_stash_dtype_itemsize(rng, monkeypatch):
    """The CPD stash budget must be computed with the CONFIGURED stash
    dtype's itemsize: a bf16 stash is half the bytes, so budgets that
    would shrink/fall back under f32 accounting keep the full tile
    (review finding: the cap hardcoded 4 bytes)."""
    from probreg_tpu.ops import estep_pallas as ep

    captured = {}
    orig = ep._capped_stash_tile_n

    def spy(m, tile_m, tile_n, itemsize=4, **kw):
        captured["itemsize"] = itemsize
        return orig(m, tile_m, tile_n, itemsize=itemsize, **kw)

    monkeypatch.setattr(ep, "_capped_stash_tile_n", spy)
    src = rng.random((600, 3)).astype(np.float32)
    tgt = rng.random((700, 3)).astype(np.float32)
    ep.estep_auto(src, tgt, 0.2, 0.1, interpret=True,
                  stash_dtype=jnp.bfloat16)
    assert captured["itemsize"] == 2
    ep.estep_auto(src, tgt, 0.2, 0.1, interpret=True)
    assert captured["itemsize"] == 4


def test_merged_stash_matches_two_launch(rng):
    """fused_stash_merged_core (one launch per stripe, pass B pipelined
    under the next stripe's pass A) matches fused_stash_core across dense
    and culled regimes, f32 and bf16 stash. pt1/xx/den are bit-identical
    (same pass-A code); p1/px differ only by the folded-normalizer
    rounding association (g * (x * inv_den) vs (g * inv_den) * x)."""
    from probreg_tpu.ops.spatial import morton_order_np

    for (m, n, s2, sd) in [(600, 900, 0.5, jnp.float32),
                           (600, 900, 1e-3, jnp.float32),
                           (1000, 500, 0.05, jnp.bfloat16)]:
        src = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
        tgt = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        src = src[morton_order_np(src)]
        tgt = tgt[morton_order_np(tgt)]
        tm, tn = 128, 256
        ys_t, y2 = ep._pad_transpose(jnp.asarray(src), tm)
        xs_t, x2 = ep._pad_transpose(jnp.asarray(tgt), tn)
        scal = jnp.stack([jnp.float32(0.5 / s2), jnp.float32(1e-4)])
        a = ep.fused_stash_core(scal, ys_t, y2, xs_t, x2, tile_m=tm,
                                tile_n=tn, interpret=True, stash_dtype=sd)
        b = ep.fused_stash_merged_core(scal, ys_t, y2, xs_t, x2, tile_m=tm,
                                       tile_n=tn, interpret=True,
                                       stash_dtype=sd)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
        tol = 1e-2 if sd == jnp.bfloat16 else 1e-5
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   rtol=tol, atol=tol)
        np.testing.assert_allclose(np.asarray(a[2][:3]),
                                   np.asarray(b[2][:3]),
                                   rtol=tol, atol=tol)


def test_estep_auto_merged_matches_default(rng):
    """estep_auto with config.use_merged_stash routes through the merged
    pipeline and returns the same moments."""
    from probreg_tpu.config import config as cfg

    src = rng.uniform(-1, 1, (700, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (800, 3)).astype(np.float32)
    base = ep.estep_auto(src, tgt, 0.3, 0.1, tile_m=128, tile_n=256,
                         interpret=True)
    old = cfg.use_merged_stash
    cfg.use_merged_stash = True
    try:
        import probreg_tpu.config as cmod
        cmod.clear_caches()
        merged = ep.estep_auto(src, tgt, 0.3, 0.1, tile_m=128, tile_n=256,
                               interpret=True)
    finally:
        cfg.use_merged_stash = old
        cmod.clear_caches()
    for xa, xb in zip(base, merged):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-6, atol=1e-7)
