"""Device-mesh utilities: data-parallel training and atom-sharded inference.

The reference is single-process single-device (SURVEY §2.8); scaling here is
pure JAX: a ``Mesh`` + ``NamedSharding`` annotations, XLA inserts the
collectives (psum for gradient averaging rides ICI).  Nothing in this module
hand-writes communication.

Axes:
  * ``data`` — molecule batch axis (DP).  Used by the trainer.
  * ``atoms`` — row-block axis of the pair grid for graphs too big for one
    chip (the sequence-parallel analog, SURVEY §2.8): each device computes
    the message/transfer row sums for its atom rows against all atoms, then
    results concatenate along the atom axis.  Antisymmetry is evaluated
    per-row-block (both orderings from the same projections), so charge
    conservation survives the sharding exactly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
ATOM_AXIS = "atoms"


def make_mesh(
    n_data: Optional[int] = None,
    n_atoms: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, atoms) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = max(len(devices) // n_atoms, 1)
    if n_data * n_atoms > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_atoms} atoms) needs "
            f"{n_data * n_atoms} devices but only {len(devices)} are "
            f"visible ({devices[0].platform}). On CPU, request virtual "
            "devices BEFORE jax initializes: "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N"
        )
    if n_data * n_atoms != len(devices):
        devices = devices[: n_data * n_atoms]
    arr = np.asarray(devices).reshape(n_data, n_atoms)
    return Mesh(arr, (DATA_AXIS, ATOM_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Replicate train state (params are tiny — ≤75K, SURVEY §2.5; weight
    sharding would be pure overhead)."""
    return jax.device_put(state, replicated(mesh))


def shard_batch_args(args: Tuple, mesh: Mesh) -> Tuple:
    """Shard every batch array along its leading (molecule) axis."""
    sh = batch_sharding(mesh)
    out = []
    for a in args:
        a = np.asarray(a)
        n_shards = mesh.shape[DATA_AXIS]
        if a.shape[0] % n_shards:
            raise ValueError(
                f"batch dim {a.shape[0]} not divisible by data axis {n_shards}"
            )
        out.append(jax.device_put(a, sh))
    return tuple(out)
