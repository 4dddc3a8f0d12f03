"""Build the native IO extension: python setup.py build_ext --inplace.

The package itself is pure Python/JAX; the extension is an optional native
data-loader (probreg_tpu/cc/io_native.cpp) that utils/io.py picks up when
present. Mirrors the role of the reference's setup.py-built pybind11
extensions (its IO went through Open3D C++).
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="probreg_tpu",
    version="0.1.0",
    packages=["probreg_tpu"],
    ext_modules=[
        Extension(
            "probreg_tpu._io_native",
            sources=["probreg_tpu/cc/io_native.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        )
    ],
)
