"""List checkpoint parameters and shapes.

Counterpart of /root/reference/tzrec/tools/list_distcp_param.py (the
torch.distributed.checkpoint inspector): prints every array in a saved
checkpoint with shape/dtype — useful for fine_tune_ckpt_param_map
authoring.
"""

import argparse

import numpy as np
import orbax.checkpoint as ocp


def list_params(ckpt_dir: str):
    import os

    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.join(ckpt_dir, "state"))
    out = []

    def _walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(v, f"{path}/{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                _walk(v, f"{path}/{i}")
        elif node is not None and hasattr(node, "shape"):
            a = np.asarray(node)
            out.append((path, tuple(a.shape), str(a.dtype)))

    _walk(raw, "")
    return out


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", required=True)
    args = parser.parse_args()
    for path, shape, dtype in list_params(args.checkpoint_path):
        print(f"{path}\t{shape}\t{dtype}")
