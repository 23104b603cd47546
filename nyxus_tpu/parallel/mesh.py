"""ROI-axis device mesh and batch sharding helpers.

Design: every feature family already runs as one batched kernel over a
padded ``[B, Hb, Wb]`` ROI batch (pipeline/runner.py).  Scaling out is
therefore pure data parallelism over B: place the batch inputs with a
``NamedSharding(mesh, P("roi", ...))`` and let ``jit`` compile the same
kernel SPMD.  No reference counterpart — the reference's unit of parallelism
is a std::async thread over a contiguous label range (parallel.h:36-40).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def roi_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the ROI batch axis.

    Uses all local devices by default; ``n_devices`` restricts to a prefix
    (useful for scaling-efficiency measurements at 1, 2, 4, ... chips).
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError("requested %d devices, %d available"
                             % (n_devices, len(devs)))
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("roi",))


def _pad_rows(a, n_pad: int):
    """Pad axis 0 with copies of row 0 (valid ROI data, so padded lanes never
    produce signalling garbage; they are dropped at collection time)."""
    if n_pad == 0:
        return jnp.asarray(a)
    a = jnp.asarray(a)
    pad = jnp.broadcast_to(a[:1], (n_pad,) + a.shape[1:])
    return jnp.concatenate([a, pad], axis=0)


def shard_batch(mesh: Mesh, arrays):
    """Shard a tuple of per-ROI batch arrays over the mesh's "roi" axis.

    Pads the batch dimension up to a multiple of the mesh size (XLA requires
    even shards) and device_puts each array with ``P("roi", None, ...)``.
    Returns (sharded_arrays, original_batch_size).
    """
    n = int(np.prod(mesh.devices.shape))
    b = arrays[0].shape[0]
    bp = -(-b // n) * n
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        a = _pad_rows(a, bp - b)
        spec = P("roi", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out), b


def replicate(mesh: Mesh, a):
    """Replicate an array (e.g. a resident slide) on every mesh device."""
    a = jnp.asarray(a)
    return jax.device_put(a, NamedSharding(mesh, P(*([None] * a.ndim))))
