"""Generate the per-symbol API reference (docs/api/) from docstrings.

The reference ships a Sphinx tree (/root/reference/docs/source/); this
image has no sphinx/mkdocs, so the equivalent here is a self-contained
introspection generator: it imports every public probreg_tpu module,
walks the public classes/functions/methods (the same surface
tests/test_api_parity.py pins against the reference), and emits one
markdown page per module plus an index.

Usage:  python docs/gen_api.py        (writes docs/api/*.md)
        make docs                     (same)
"""

import importlib
import inspect
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "api")

MODULES = [
    # Registration algorithm families (reference module names).
    "probreg_tpu.cpd",
    "probreg_tpu.bcpd",
    "probreg_tpu.filterreg",
    "probreg_tpu.l2dist_regs",
    "probreg_tpu.gmmtree",
    "probreg_tpu.icp",
    # Composition layers (no reference counterpart).
    "probreg_tpu.pyramid",
    "probreg_tpu.tracking",
    # Transforms / features / costs.
    "probreg_tpu.models.transformation",
    "probreg_tpu.features",
    "probreg_tpu.cost_functions",
    # Numerics.
    "probreg_tpu.utils.math_utils",
    "probreg_tpu.utils.se3_op",
    "probreg_tpu.gauss_transform",
    "probreg_tpu.gaussian_filtering",
    # Kernels.
    "probreg_tpu.ops.estep",
    "probreg_tpu.ops.estep_pallas",
    "probreg_tpu.ops.em_pallas",
    "probreg_tpu.ops.gmmtree_pallas",
    "probreg_tpu.ops.sym3",
    "probreg_tpu.ops.pairwise",
    "probreg_tpu.ops.rigid_solvers",
    "probreg_tpu.ops.ifgt",
    "probreg_tpu.ops.gausstransform",
    "probreg_tpu.ops.permutohedral",
    "probreg_tpu.ops.lowrank",
    "probreg_tpu.ops.fpfh",
    "probreg_tpu.ops.spatial",
    # Parallelism.
    "probreg_tpu.parallel",
    "probreg_tpu.parallel.sharded",
    "probreg_tpu.parallel.sharded2d",
    # Aux subsystems.
    "probreg_tpu.config",
    "probreg_tpu.callbacks",
    "probreg_tpu.log",
    "probreg_tpu.cupy_utils",
    "probreg_tpu.utils.io",
    "probreg_tpu.utils.checkpoint",
    "probreg_tpu.utils.profiling",
    "probreg_tpu.utils.interop",
    "probreg_tpu.utils.dualquat",
    "probreg_tpu.utils.datagen",
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent=""):
    d = inspect.getdoc(obj)
    if not d:
        return ""
    return "\n".join(indent + line for line in d.splitlines())


def _public_members(mod):
    """Classes/functions DEFINED in this module (not re-exports), public."""
    out = []
    for name in sorted(vars(mod)):
        if name.startswith("_"):
            continue
        obj = vars(mod)[name]
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        out.append((name, obj))
    # Named-tuple results (EstepResult etc.) are classes; keep them.
    return out


def _render_module(modname):
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    moddoc = inspect.getdoc(mod)
    if moddoc:
        lines += [moddoc, ""]
    members = _public_members(mod)
    funcs = [(n, o) for n, o in members if inspect.isfunction(o)]
    classes = [(n, o) for n, o in members if inspect.isclass(o)]
    for name, obj in funcs:
        lines += [f"## `{name}{_sig(obj)}`", ""]
        d = _doc(obj)
        if d:
            lines += [d, ""]
    for name, obj in classes:
        lines += [f"## class `{name}`", ""]
        d = _doc(obj)
        if d:
            lines += [d, ""]
        for mname in sorted(vars(obj)):
            if mname.startswith("_") and mname != "__init__":
                continue
            m = inspect.getattr_static(obj, mname)
            if isinstance(m, (staticmethod, classmethod)):
                m = m.__func__
            if not inspect.isfunction(m):
                continue
            label = "constructor" if mname == "__init__" else "method"
            lines += [f"### {label} `{name}.{mname}{_sig(m)}`", ""]
            md = _doc(m)
            if md:
                lines += [md, ""]
    return "\n".join(lines) + "\n"


def main():
    sys.path.insert(0, ROOT)
    os.makedirs(OUT, exist_ok=True)
    index = [
        "# probreg_tpu API reference",
        "",
        "Generated from docstrings by `docs/gen_api.py` (`make docs`).",
        "One page per module; the public surface matches the reference's",
        "(pinned by `tests/test_api_parity.py`) plus the TPU-native",
        "extensions (pyramids, sharding, batching, tracking, kernels).",
        "",
    ]
    for modname in MODULES:
        page = modname.replace("probreg_tpu.", "").replace(".", "_") + ".md"
        text = _render_module(modname)
        with open(os.path.join(OUT, page), "w") as f:
            f.write(text)
        n_sym = text.count("\n## ")
        index.append(f"- [`{modname}`]({page}) — {n_sym} public symbols")
    with open(os.path.join(OUT, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES) + 1} pages to {OUT}")


if __name__ == "__main__":
    main()
