"""Device-mesh helpers.

TPU-native counterpart of the reference's process-group init
(/root/reference/tzrec/utils/dist_util.py:57-75). One process per host,
a 1-D ``"data"`` axis over all chips: dense params are replicated
(grad psum over "data"), embedding tables are row-sharded over the same
axis — the TorchRec hybrid-parallel layout (SURVEY.md §2.2).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def maybe_mesh(use_all_devices: bool = True) -> Optional[Mesh]:
    """Mesh over all devices; None when running single-device."""
    devs = jax.devices()
    if len(devs) <= 1:
        return None
    return create_mesh(devs)


def replicated(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def row_sharded(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P(DATA_AXIS, None))


def batch_sharded(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P(DATA_AXIS))
