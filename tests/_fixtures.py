"""Shared test fixtures: reference data files with a configurable root.

The reference checkout (read-only) provides the classic fish/bunny/horse
fixtures. Its location defaults to /root/reference but is overridable via
PROBREG_REF_ROOT (CI clones the upstream repo and points this at it).
Tests that need a missing fixture skip rather than error.
"""

import functools
import os

import numpy as np
import pytest

REF_ROOT = os.environ.get("PROBREG_REF_ROOT", "/root/reference")


def ref_path(rel: str, *, skip: bool = True) -> str:
    p = os.path.join(REF_ROOT, rel)
    if skip and not os.path.exists(p):
        pytest.skip(f"reference fixture {rel} unavailable "
                    f"(set PROBREG_REF_ROOT)")
    return p


@functools.lru_cache(maxsize=None)
def _fish(which: str) -> np.ndarray:
    return np.loadtxt(ref_path(f"examples/fish_{which}.txt")).astype(
        np.float32)


def fish_source() -> np.ndarray:
    return _fish("source").copy()


def fish_target() -> np.ndarray:
    return _fish("target").copy()
