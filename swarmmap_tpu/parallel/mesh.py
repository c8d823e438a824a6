"""Device-mesh helpers for multi-agent scaling.

The reference scales agents with one CPU thread each (swarm_map.cc:310);
the TPU-native strategy is agent data parallelism over a
jax.sharding.Mesh: each device tracks a shard of the agents with the
SAME program, and cross-agent reductions (place-recognition statistics,
merged-map BA) ride ICI collectives (SURVEY.md §2.10).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def agent_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the 'agents' axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("agents",))


def obs_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the 'obs' axis for observation-sharded server BA
    (ops.ba.bundle_adjust_sharded).  Uses the largest power-of-two device
    count so the power-of-two-padded observation bucket always divides."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else min(n_devices, len(devs))
    n = 1 << (n.bit_length() - 1)  # largest power of two <= n
    return Mesh(np.array(devs[:n]), axis_names=("obs",))


def shard_agents(mesh: Mesh, tree):
    """Place a batched-over-agents pytree onto the mesh (leading axis
    sharded across devices)."""
    sharding = NamedSharding(mesh, P("agents"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
