"""Example helpers (parity with reference examples/utils.py, no open3d)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # The axon TPU plugin ignores the env var; force it via config.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from probreg_tpu.utils import io as pio
from probreg_tpu.utils import se3_op as so

# In-repo fixtures (data/, regenerable via data/make_fixtures.py); the
# reference checkout is only a fallback for files the repo doesn't ship.
_REPO_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
DATA_DIR = _REPO_DATA if os.path.exists(
    os.path.join(_REPO_DATA, "bunny.pcd")) else os.path.join(
        os.environ.get("PROBREG_REF_ROOT", "/root/reference"), "examples")


def prepare_source_and_target_rigid_3d(
    source_filename,
    noise_amp=0.001,
    n_random=500,
    orientation=np.deg2rad([0.0, 0.0, 30.0]),
    translation=np.zeros(3),
    voxel_size=0.005,
    normals=False,
    seed=4,
):
    rng = np.random.default_rng(seed)
    source = pio.read_point_cloud(source_filename)
    source = pio.voxel_down_sample(source, voxel_size)
    tp = source.copy()
    rng.shuffle(tp)
    rg = 1.5 * (tp.max(axis=0) - tp.min(axis=0))
    rands = (rng.random((n_random, 3)) - 0.5) * rg + tp.mean(axis=0)
    target = np.r_[tp + noise_amp * rng.standard_normal(tp.shape), rands]
    rot = np.asarray(so.euler2mat(*orientation))
    target = target @ rot.T + translation
    if normals:
        return source, target, estimate_normals(target)
    return source, target


def estimate_normals(pts, k=12):
    """PCA normals, consistently oriented outward."""
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    nbrs = pts[idx]
    ctr = nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", nbrs - ctr, nbrs - ctr)
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0]
    out = pts - pts.mean(0)
    sign = np.sign((normals * out).sum(1, keepdims=True))
    sign[sign == 0] = 1.0
    return (normals * sign).astype(pts.dtype)


def prepare_source_and_target_nonrigid_2d(source_filename, target_filename):
    return np.loadtxt(source_filename), np.loadtxt(target_filename)


def prepare_source_and_target_nonrigid_3d(source_filename, target_filename,
                                          voxel_size=5.0):
    source = pio.voxel_down_sample(np.loadtxt(source_filename), voxel_size)
    target = pio.voxel_down_sample(np.loadtxt(target_filename), voxel_size)
    return source, target
