"""Multi-device execution: mesh construction, sharded E-step, sharded EM.

This subsystem has no counterpart in the reference (SURVEY.md §2.3: the
reference's entire parallelism surface is OpenMP + one cupy kernel). Here the
scaling axis is the target point count N: the CPD E-step is embarrassingly
parallel over target columns, and the EM moments (p1, px, n_p, xx) are tiny
psum payloads — O(M*D) bytes summarizing O(M*N) compute.
"""

from .sharded import (  # noqa: F401
    estep_sharded,
    make_mesh,
    registration_cpd_sharded,
    shard_points,
)
