"""Device-mesh helpers.

TPU-native counterpart of the reference's process-group init
(/root/reference/tzrec/utils/dist_util.py:57-75). One process per host;
two mesh shapes:

- **Flat 1-D** ``("data",)`` over all chips (default): dense params are
  replicated (grad psum over "data"), embedding tables row-sharded over
  the same axis — the TorchRec hybrid-parallel layout (SURVEY.md §2.2).
- **Two-level 2-D** ``("dcn", "ici")`` (hosts x chips-per-host): the
  same hybrid layout, but the row dimension shards over the FLAT
  (dcn, ici) product while the embedding id/row exchanges run
  HIERARCHICALLY — an intra-host all_to_all on the ici axis followed by
  a cross-host all_to_all on the dcn axis that ships host-aggregated
  slabs (emb_engine._xchg). This is the mechanism that makes the
  planner's INTRA/CROSS_NODE bandwidth model (reference
  plan_util.py:111-114) describe the actual collective pattern: DCN
  carries exactly one aggregated message per host pair instead of
  C^2 chip-pair messages.

Numerics are identical between the two shapes (the two-stage exchange
is a permutation-equivalent factoring of the flat one; tested in
tests/test_two_level_mesh.py).
"""

from typing import Optional, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def create_mesh(devices=None, hosts: Optional[int] = None) -> Mesh:
    """Flat 1-D mesh, or a two-level (hosts x chips) mesh when
    ``hosts`` divides the device count and exceeds 1."""
    devices = devices if devices is not None else jax.devices()
    devices = np.asarray(devices)
    if hosts and hosts > 1:
        n = devices.size
        if n % hosts:
            raise ValueError(f"{n} devices not divisible by {hosts} hosts")
        return Mesh(
            devices.reshape(hosts, n // hosts), (DCN_AXIS, ICI_AXIS)
        )
    return Mesh(devices, (DATA_AXIS,))


def maybe_mesh(use_all_devices: bool = True) -> Optional[Mesh]:
    """Mesh over all devices; None when running single-device.

    TZREC_MESH_HOSTS=N opts into the two-level (N x chips) topology.
    """
    import os

    devs = jax.devices()
    if len(devs) <= 1:
        return None
    hosts = int(os.environ.get("TZREC_MESH_HOSTS", "0") or 0)
    return create_mesh(devs, hosts=hosts or None)


def data_axes(mesh: Optional[Mesh]):
    """The mesh's data-sharding axis spec: the axis NAME for a flat
    mesh, or the ("dcn", "ici") TUPLE for a two-level mesh. Valid both
    as a PartitionSpec entry (P(data_axes(m), None)) and as the
    axis_name of psum/all_gather/psum_scatter/axis_index."""
    if mesh is None:
        return None
    names = tuple(mesh.axis_names)
    if names == (DCN_AXIS, ICI_AXIS):
        return names
    return DATA_AXIS


def mesh_hier(mesh: Optional[Mesh]) -> Optional[Tuple[int, int]]:
    """(hosts, chips_per_host) for a two-level mesh, else None."""
    if mesh is not None and tuple(mesh.axis_names) == (DCN_AXIS, ICI_AXIS):
        return int(mesh.shape[DCN_AXIS]), int(mesh.shape[ICI_AXIS])
    return None


def replicated(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def row_sharded(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P(data_axes(mesh), None))


def batch_sharded(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P(data_axes(mesh)))
