"""Device mesh setup for data-parallel corpus scanning.

The reference is strictly single-threaded (SURVEY §2.4); its only scale
mechanism is amortizing one automaton over many haystacks.  Here that
pattern becomes an explicit 1-D ``("data",)`` mesh: haystack chunk rows are
sharded over chips, the compiled transition table is replicated per chip,
and match buffers/counts are combined with collectives (see shard_scan.py).

Multi-host: call :func:`init_distributed` once per process before building
the mesh; the mesh then spans all hosts' chips and XLA routes collectives
over ICI within a slice / DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime for multi-host scanning.

    No-op when single-process arguments are absent and env auto-detection
    finds nothing (safe to call unconditionally at startup).
    """
    if coordinator_address is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def data_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices on the ``data`` axis."""
    import numpy as np

    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (DATA_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows (batch dim) split over chips."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
