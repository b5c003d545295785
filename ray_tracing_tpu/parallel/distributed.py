"""Multi-host execution helpers.

The reference is single-process/single-host (SURVEY §2.4); here the
communication backend is jax.distributed + XLA collectives: each host
runs the same program, the mesh spans every chip in the job, rays shard
globally along the mesh axis, and the only cross-host traffic is the
scene-gradient psum (DCN) — per-pass images reduce over ICI within a
slice first.

Typical multi-host driver::

    from ray_tracing_tpu.parallel import distributed as dist
    dist.initialize()                      # no-op single-process
    mesh = dist.global_mesh()
    img = sharded_render_pass(scene, camera, key, ..., mesh=mesh)
    # per-host tile of the image: dist.local_slice(img)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from ray_tracing_tpu.parallel.mesh import RAY_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed process group.

    With no arguments, reads the standard cluster environment
    (JAX_COORDINATOR_ADDRESS etc. / cloud-TPU metadata); a single
    process with no cluster config is a no-op.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # no cluster configuration: single-process mode
        pass


def global_mesh() -> Mesh:
    """1-D mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (RAY_AXIS,))


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
