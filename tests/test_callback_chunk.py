"""Chunked callback dispatch (VERDICT round-1 item 8).

``callback_chunk=K`` must keep per-iteration callback semantics — one
invocation per EM iteration, with that iteration's transform — while the
device work runs K iterations per dispatch. These tests record the callback
sequences at K=1 and K=4 and assert they match (count and values) for every
family, plus that convergence stops at the same iteration.
"""

import numpy as np

import _fixtures
import pytest

from probreg_tpu import bcpd, cpd, filterreg, gmmtree
from probreg_tpu.utils import se3_op


class Recorder:
    """Callback that records the per-iteration rigid parameters."""

    def __init__(self, extract):
        self._extract = extract
        self.rots = []
        self.ts = []

    def __call__(self, transformation):
        r, t = self._extract(transformation)
        self.rots.append(np.asarray(r, np.float64).copy())
        self.ts.append(np.asarray(t, np.float64).copy())


def _rigid_extract(tr):
    return tr.rot, tr.t


def _combined_extract(tr):
    return tr.rigid_trans.rot, tr.rigid_trans.t


def _clouds(horse_cloud, stride=3):
    src = np.asarray(horse_cloud, dtype=np.float32)[::stride]
    ang = np.deg2rad([6.0, -3.0, 8.0])
    rot = np.asarray(se3_op.euler2mat(*ang), np.float32)
    return src, src @ rot.T


def _assert_same_sequence(a: Recorder, b: Recorder, atol):
    assert len(a.rots) == len(b.rots), (len(a.rots), len(b.rots))
    for ra, rb, ta, tb in zip(a.rots, b.rots, a.ts, b.ts):
        np.testing.assert_allclose(ra, rb, atol=atol)
        np.testing.assert_allclose(ta, tb, atol=atol)


def test_cpd_chunked_callbacks(horse_cloud):
    src, tgt = _clouds(horse_cloud)
    rec1, rec4 = Recorder(_rigid_extract), Recorder(_rigid_extract)
    cpd.registration_cpd(src, tgt, maxiter=9, tol=0.0, callbacks=[rec1])
    cpd.registration_cpd(src, tgt, maxiter=9, tol=0.0, callbacks=[rec4],
                         callback_chunk=4)
    assert len(rec1.rots) == 9
    # Same program (same step fn under scan): tight tolerance.
    _assert_same_sequence(rec1, rec4, atol=1e-5)


def test_cpd_chunked_convergence_stop(horse_cloud):
    src, tgt = _clouds(horse_cloud)
    rec1, rec4 = Recorder(_rigid_extract), Recorder(_rigid_extract)
    r1 = cpd.registration_cpd(src, tgt, maxiter=50, tol=1e-3,
                              callbacks=[rec1])
    r4 = cpd.registration_cpd(src, tgt, maxiter=50, tol=1e-3,
                              callbacks=[rec4], callback_chunk=4)
    assert len(rec1.rots) == len(rec4.rots)
    assert len(rec1.rots) < 50  # actually converged early
    np.testing.assert_allclose(np.asarray(r1.transformation.rot),
                               np.asarray(r4.transformation.rot), atol=1e-5)


def test_filterreg_chunked_callbacks(horse_cloud):
    src, tgt = _clouds(horse_cloud)
    rec1, rec4 = Recorder(_rigid_extract), Recorder(_rigid_extract)
    filterreg.registration_filterreg(src, tgt, maxiter=9, tol=0.0,
                                     callbacks=[rec1])
    filterreg.registration_filterreg(src, tgt, maxiter=9, tol=0.0,
                                     callbacks=[rec4], callback_chunk=4)
    assert len(rec4.rots) == 9
    # Different layouts (host-loop E-step vs transposed scan): loose atol.
    _assert_same_sequence(rec1, rec4, atol=5e-4)


def test_bcpd_chunked_callbacks(horse_cloud):
    src, tgt = _clouds(horse_cloud, stride=6)
    rec1, rec4 = Recorder(_combined_extract), Recorder(_combined_extract)
    bcpd.registration_bcpd(src, tgt, maxiter=6, tol=0.0, callbacks=[rec1])
    bcpd.registration_bcpd(src, tgt, maxiter=6, tol=0.0, callbacks=[rec4],
                           callback_chunk=3)
    assert len(rec4.rots) == 6
    _assert_same_sequence(rec1, rec4, atol=5e-4)


def test_gmmtree_chunked_callbacks(horse_cloud):
    src, tgt = _clouds(horse_cloud)
    rec1, rec4 = Recorder(_rigid_extract), Recorder(_rigid_extract)
    gmmtree.registration_gmmtree(src, tgt, maxiter=8, tol=0.0,
                                 callbacks=[rec1])
    gmmtree.registration_gmmtree(src, tgt, maxiter=8, tol=0.0,
                                 callbacks=[rec4], callback_chunk=4)
    assert len(rec4.rots) == 8
    # Eager loop uses the reference-shaped E/M steps; the chunked scan uses
    # the transposed kernels (same math, different op order).
    _assert_same_sequence(rec1, rec4, atol=5e-4)
