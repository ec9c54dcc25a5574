"""Real-TPU test lane (VERDICT r3 #3).

Unlike tests/ (which forces an 8-device virtual CPU mesh), this lane
runs on the real chip: Pallas kernels compile through Mosaic instead of
interpret mode, and HBM-layout/footprint bugs (round 3's packed-init
OOM class) become visible. Run it before committing anything that
touches ops/pallas or parallel/emb_engine:

    python -m pytest tests_tpu/ -q     # ~2 min on one v5e chip

The whole lane skips when no TPU is attached (CI boxes without the
tunnel), so it is safe to include in a full-repo pytest run.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    if on_tpu:
        return
    skip = pytest.mark.skip(reason="real TPU not attached")
    for item in items:
        item.add_marker(skip)
