"""Automated API-parity sweep against the reference source tree.

Walks every public class, function, and public method the reference
(PROBREG_REF_ROOT, default /root/reference) defines — via ast, so the reference's
dependencies (open3d, sklearn, dq3d, cupy) need not be importable — and
asserts the same-named probreg_tpu module exposes the same names. This
pins SURVEY.md §2's component inventory as an executable check: a user of
the reference switching to probreg_tpu finds every symbol they had.
"""

import ast
import importlib
import pathlib
import warnings

import pytest

import _fixtures

REF = pathlib.Path(_fixtures.REF_ROOT) / "probreg"

# Modules without a public surface worth walking.
SKIP_MODULES = {"__init__", "version"}


def _ref_modules():
    if not REF.exists():
        return []
    return sorted(p.stem for p in REF.glob("*.py") if p.stem not in SKIP_MODULES)


def _public_surface(path):
    with warnings.catch_warnings():
        # The reference's own docstrings carry invalid escapes (e.g.
        # gauss_transform.py:12 "\\sum"); parsing them is not our warning.
        warnings.simplefilter("ignore", SyntaxWarning)
        tree = ast.parse(path.read_text())
    funcs = [n.name for n in tree.body
             if isinstance(n, ast.FunctionDef) and not n.name.startswith("_")]
    classes = {}
    for n in tree.body:
        if isinstance(n, ast.ClassDef) and not n.name.startswith("_"):
            classes[n.name] = [
                m.name for m in n.body
                if isinstance(m, (ast.FunctionDef,))
                and not m.name.startswith("_")
            ]
    return classes, funcs


@pytest.mark.parametrize("mod_name", _ref_modules())
def test_module_surface(mod_name):
    classes, funcs = _public_surface(REF / f"{mod_name}.py")
    ours = importlib.import_module(f"probreg_tpu.{mod_name}")
    missing = []
    for f in funcs:
        if not hasattr(ours, f):
            missing.append(f)
    for cls_name, methods in classes.items():
        cls = getattr(ours, cls_name, None)
        if cls is None:
            missing.append(cls_name)
            continue
        for m in methods:
            if not hasattr(cls, m):
                missing.append(f"{cls_name}.{m}")
    assert not missing, f"probreg_tpu.{mod_name} missing: {missing}"


def test_package_reexports():
    """probreg/__init__.py:1-3 re-exports these submodules."""
    import probreg_tpu

    for name in ("bcpd", "callbacks", "cpd", "filterreg", "gmmtree",
                 "l2dist_regs", "log", "math_utils", "transformation"):
        assert hasattr(probreg_tpu, name), name
