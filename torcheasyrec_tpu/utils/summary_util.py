"""TensorBoard summaries for the train loop.

Counterpart of the reference's TB logging (main.py:262-319, configured
by train_config.tensorboard_summaries: loss, learning_rate, parameter,
global_gradient_norm, gradient_norm, gradient). Uses
torch.utils.tensorboard (torch-cpu is in the image); falls back to
no-op when unavailable.
"""

from typing import Any, Dict, Optional, Sequence

import numpy as np

from torcheasyrec_tpu.utils.logging_util import logger


class SummaryWriter:
    def __init__(self, log_dir: str, summaries: Optional[Sequence[str]] = None):
        self._summaries = set(summaries or ["loss", "learning_rate"])
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._w = TBWriter(log_dir=log_dir)
        except Exception as e:  # noqa: BLE001
            logger.warning(f"tensorboard unavailable: {e}")
            self._w = None

    def enabled(self, kind: str) -> bool:
        return self._w is not None and kind in self._summaries

    def log_scalars(self, step: int, losses: Dict[str, Any],
                    lr: Optional[float] = None) -> None:
        if self._w is None:
            return
        if "loss" in self._summaries:
            for k, v in losses.items():
                self._w.add_scalar(f"loss/{k}", float(v), step)
        if lr is not None and "learning_rate" in self._summaries:
            self._w.add_scalar("learning_rate", float(lr), step)

    def log_params(self, step: int, params) -> None:
        if not self.enabled("parameter"):
            return
        import jax

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            arr = np.asarray(leaf)
            if arr.size:
                self._w.add_histogram(f"parameter/{name}", arr, step)

    def log_grad_norms(self, step: int, grads) -> None:
        import jax

        if self.enabled("global_gradient_norm"):
            total = 0.0
            for leaf in jax.tree_util.tree_leaves(grads):
                a = np.asarray(leaf, np.float64)
                total += float((a * a).sum())
            self._w.add_scalar(
                "global_gradient_norm", total ** 0.5, step
            )
        if self.enabled("gradient_norm"):
            flat = jax.tree_util.tree_flatten_with_path(grads)[0]
            for path, leaf in flat:
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                a = np.asarray(leaf, np.float64)
                self._w.add_scalar(
                    f"gradient_norm/{name}", float(np.sqrt((a * a).sum())),
                    step,
                )

    def log_eval(self, step: int, result: Dict[str, float]) -> None:
        if self._w is None:
            return
        for k, v in result.items():
            try:
                self._w.add_scalar(f"eval/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
