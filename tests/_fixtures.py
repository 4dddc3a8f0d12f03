"""Shared test fixtures: in-repo data files, reference checkout fallback.

The repo ships the classic fish/bunny/horse fixtures under data/
(re-encoded/downsampled; regenerable via data/make_fixtures.py), so the
suite runs standalone. A reference checkout (PROBREG_REF_ROOT, default
/root/reference) is consulted only for files the repo doesn't ship.
Tests that need a missing fixture skip rather than error.
"""

import functools
import os

import numpy as np
import pytest

REF_ROOT = os.environ.get("PROBREG_REF_ROOT", "/root/reference")
REPO_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def ref_path(rel: str, *, skip: bool = True) -> str:
    local = os.path.join(REPO_DATA, os.path.basename(rel))
    if os.path.exists(local):
        return local
    p = os.path.join(REF_ROOT, rel)
    if skip and not os.path.exists(p):
        pytest.skip(f"fixture {rel} unavailable (ship it in data/ or set "
                    f"PROBREG_REF_ROOT)")
    return p


@functools.lru_cache(maxsize=None)
def _fish(which: str) -> np.ndarray:
    return np.loadtxt(ref_path(f"examples/fish_{which}.txt")).astype(
        np.float32)


def fish_source() -> np.ndarray:
    return _fish("source").copy()


def fish_target() -> np.ndarray:
    return _fish("target").copy()
