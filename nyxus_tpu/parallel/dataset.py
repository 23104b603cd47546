"""Inter-host dataset sharding (DCN level).

The reference fans whole slides out over threads of one process
(workflow_2d_whole.cpp:292-330).  Multi-host TPU systems instead run one
process per host: shard the (intensity, mask) pair list by process index so
each host featurizes a disjoint slide subset with its own local devices.
Outputs compose trivially — each host writes its own per-slide rows (CSV /
Arrow streams are per-slide in the reference output contract too).
"""

from __future__ import annotations

import jax


def initialize_distributed(**kwargs) -> None:
    """Bring up the JAX distributed runtime (multi-host).  Thin gate around
    jax.distributed.initialize: no-op when already initialized or when the
    run is single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def process_shard(items):
    """This host's slice of a work list: round-robin by process index so
    heterogeneous slide sizes balance in expectation."""
    i = jax.process_index()
    n = jax.process_count()
    return list(items)[i::n]
