"""Compute-kernel dispatch.

Counterpart of /root/reference/tzrec/ops/__init__.py (:19-24 Kernel enum)
with TPU backends: JAX = pure-XLA reference path, PALLAS = fused TPU
kernels. TRITON/PYTORCH/CUTLASS are accepted as aliases of JAX so
reference configs parse and run (ops/hstu_attention.py:103-118 fallback
semantics).
"""

import enum


class Kernel(enum.Enum):
    TRITON = "TRITON"
    PYTORCH = "PYTORCH"
    CUTLASS = "CUTLASS"
    JAX = "JAX"
    PALLAS = "PALLAS"


def normalize_kernel(kernel) -> "Kernel":
    if isinstance(kernel, Kernel):
        k = kernel
    elif isinstance(kernel, int):
        # proto enum value order: TRITON=0 PYTORCH=1 CUTLASS=2 JAX=3 PALLAS=4
        k = list(Kernel)[kernel]
    else:
        k = Kernel[str(kernel).upper()]
    if k in (Kernel.TRITON, Kernel.PYTORCH, Kernel.CUTLASS):
        return Kernel.JAX
    return k
