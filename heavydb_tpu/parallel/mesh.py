"""Device-mesh management for multi-chip/multi-host query execution.

The analogue of the reference's multi-GPU fragment dispatch
(QueryFragmentDescriptor round-robin, Execute.cpp:3158) and the enterprise
aggregator/leaf cluster (Distributed/) — rebuilt as a jax.sharding Mesh:
tables are row-partitioned across devices on a 1-D 'shards' axis; partial
aggregates merge with psum/pmin/pmax collectives over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    return Mesh(np.array(devs[:n]), (SHARD_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows partitioned across the shard axis."""
    return NamedSharding(mesh, P(SHARD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
