"""Subprocess driver for the 2-process multi-host e2e test.

Not a pytest module — launched by tests/test_multihost.py, once per
jax process. Mirrors a real multi-host pod on CPU: each process owns
8//nproc virtual devices and joins a jax.distributed coordinator, so
collectives run over gloo exactly as the multi-host code paths expect.

Usage:
    python multihost_driver.py single <tmpdir>
    python multihost_driver.py multi  <tmpdir> <pid> <nproc> <port>
"""

import json
import os
import sys


def main() -> None:
    mode = sys.argv[1]
    tmp = sys.argv[2]
    if mode.startswith("multi"):
        pid, nproc, port = int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
        local_devices = 8 // nproc
    else:
        pid, nproc, port = 0, 1, None
        local_devices = 8

    # the container's sitecustomize registers an axon TPU backend and
    # PALLAS_AXON_POOL_IPS hangs cpu subprocesses at import — clear both
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if mode.startswith("multi"):
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=pid
        )
    assert jax.device_count() == 8, jax.device_count()

    from torcheasyrec_tpu import main as tzrec_main

    cfg = os.path.join(tmp, f"pipeline_{mode}.config")
    result = tzrec_main.train_and_evaluate(cfg)
    with open(os.path.join(tmp, f"result_{mode}_p{pid}.json"), "w") as f:
        json.dump(
            {k: float(v) for k, v in result.items()
             if isinstance(v, (int, float))},
            f,
        )


if __name__ == "__main__":
    main()
