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
    registration_bcpd_sharded,
    registration_cpd_batch_sharded,
    registration_cpd_sharded,
    registration_filterreg_sharded,
    registration_gmmreg_sharded,
    registration_gmmtree_sharded,
    registration_svr_sharded,
    shard_points,
    shard_points_t,
)
from .sharded2d import (  # noqa: F401
    make_mesh_2d,
    registration_bcpd_2d,
    registration_cpd_2d,
    registration_filterreg_2d,
)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kwargs):
    """Multi-host bring-up: jax.distributed.initialize + sanity logging.

    Call once per host before building meshes; afterwards ``make_mesh()``
    spans every chip in the slice and the sharded registrations psum over
    ICI within a host and DCN across hosts with no code changes.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kwargs)
    from ..log import log

    log.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count())
