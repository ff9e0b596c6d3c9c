"""Multi-host (multi-process) mesh surface: DCN × ICI device meshes.

The reference is single-process single-device (``charge_gn.py:1-7``); this
module is the SURVEY §2.8 "comm backend" row at pod scale: a thin,
documented wrapper over ``jax.distributed.initialize`` plus a mesh builder
that lays the framework's two axes onto the hardware fabric correctly:

* ``atoms`` (and the within-slice part of ``data``) ride **ICI** — the
  per-round all-gather of hidden rows (atom sharding) / the ``ppermute``
  block circulation (ring sharding) are latency-sensitive and must stay
  inside one ICI domain,
* only the **data** axis ever crosses **DCN** — data-parallel gradient
  psums are one small all-reduce per step (≤75K params, SURVEY §2.5),
  which is the one collective that tolerates DCN latency.

Run one process per host with the same program, e.g.::

    EPNN_COORDINATOR=host0:8476 EPNN_NUM_PROCESSES=4 EPNN_PROCESS_ID=$i \\
        python -m epnn_tpu train ... --multihost

or rely on ``jax.distributed.initialize()`` auto-detection on Cloud TPU
pods (GCE metadata supplies coordinator/process counts).

Environment limits (documented, not hidden): this repo's test environment
has one TPU chip, so multi-host cannot be integration-tested on real TPU
fabric here.  It IS integration-tested across real OS processes on CPU:
``tests/test_multihost.py::test_two_process_runtime_end_to_end`` runs two
processes (4 virtual devices each) through one distributed runtime — the
sharded forward and the sharded training step execute on the global mesh
with the data axis spanning the process boundary (XLA cross-process gloo
collectives), shard values checked against a single-chip reference and
training losses checked identical across processes.  The hybrid DCN×ICI
layout logic is additionally unit-tested under mocked slice indices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from epnn_tpu.parallel.sharding import ATOM_AXIS, DATA_AXIS, make_mesh

__all__ = [
    "initialize_distributed",
    "is_coordinator",
    "make_multihost_mesh",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    initialization_timeout: Optional[int] = None,
) -> None:
    """Start (or join) the JAX distributed runtime.

    Thin wrapper over :func:`jax.distributed.initialize` with the
    framework's env-var conventions: any argument left ``None`` falls back
    to ``EPNN_COORDINATOR`` / ``EPNN_NUM_PROCESSES`` / ``EPNN_PROCESS_ID``,
    and if those are absent too, to JAX's own auto-detection (Cloud TPU
    pod metadata).  Call BEFORE any other JAX API touches a backend —
    same contract as the underlying initializer.  Idempotent: a second
    call in an already-initialized process is a no-op.
    """
    if jax._src.distributed.global_state.client is not None:  # noqa: SLF001
        return  # already initialized (idempotence for REPL/driver reuse)
    if coordinator_address is None:
        coordinator_address = os.environ.get("EPNN_COORDINATOR") or None
    if num_processes is None:
        v = os.environ.get("EPNN_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = os.environ.get("EPNN_PROCESS_ID")
        process_id = int(v) if v else None
    kwargs = {
        k: v
        for k, v in dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
            initialization_timeout=initialization_timeout,
        ).items()
        if v is not None
    }
    jax.distributed.initialize(**kwargs)


def is_coordinator() -> bool:
    """True on the process that should own checkpoint writes / logging."""
    return jax.process_index() == 0


def _num_slices(devices) -> int:
    """Number of distinct ICI domains (TPU slices) among ``devices``.

    TPU devices carry ``slice_index``; CPU/GPU devices do not (one
    domain).  ``getattr`` default keeps this total on every backend.
    """
    return 1 + max(int(getattr(d, "slice_index", 0) or 0) for d in devices)


def make_multihost_mesh(
    n_data: Optional[int] = None,
    n_atoms: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global (data, atoms) mesh across every process's devices.

    Single ICI domain (one slice — including single-process and the
    virtual CPU mesh): identical to :func:`make_mesh` over the global
    device list; every collective rides ICI.

    Multiple slices (DCN in play): a hybrid mesh via
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` with ALL
    DCN parallelism assigned to the data axis — ``atoms`` (all-gather /
    ppermute per round) never crosses DCN.  ``n_atoms`` must therefore
    fit inside one slice; ``n_data`` defaults to every remaining device
    (within-slice data parallelism × one DCN factor per slice).
    """
    devices = list(devices if devices is not None else jax.devices())
    ns = _num_slices(devices)
    if ns == 1:
        return make_mesh(n_data, n_atoms, devices)
    per_slice = len(devices) // ns
    if len(devices) % ns:
        raise ValueError(
            f"uneven slices: {len(devices)} devices over {ns} slices")
    if n_atoms > per_slice or per_slice % n_atoms:
        raise ValueError(
            f"atoms axis ({n_atoms}) must evenly divide one ICI domain "
            f"({per_slice} devices/slice) — the per-round atom collectives "
            "(all-gather / ppermute) cannot cross DCN")
    ici_data = per_slice // n_atoms
    if n_data is None:
        n_data = ici_data * ns
    if n_data != ici_data * ns:
        raise ValueError(
            f"n_data={n_data} must equal (devices/slice ÷ n_atoms) × "
            f"slices = {ici_data} × {ns} = {ici_data * ns} (the data axis "
            "carries all DCN parallelism; shrink n_atoms or pass "
            "devices= explicitly to use a subset)")
    from jax.experimental import mesh_utils

    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(ici_data, n_atoms),
        dcn_mesh_shape=(ns, 1),
        devices=devices,
    )
    arr = np.asarray(arr)
    return Mesh(arr, (DATA_AXIS, ATOM_AXIS))
