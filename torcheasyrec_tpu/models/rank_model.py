"""RankModel base: single-label ranking models.

Counterpart of /root/reference/tzrec/models/rank_model.py (RankModel:57,
build_input:114, _output_to_prediction:133-179, loss :264-287).
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.losses import create_loss_fn
from torcheasyrec_tpu.models.model import BaseModel, _grouping_value
from torcheasyrec_tpu.modules import module as M


class RankModel(BaseModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._label_name = self._labels[0] if self._labels else None
        self._sample_weight_name = (
            self._sample_weights[0] if self._sample_weights else None
        )
        self._loss_fns = [create_loss_fn(c) for c in self._loss_cfgs]
        self._build_embedding_group(
            wide_embedding_dim=getattr(
                self._model_config, "wide_embedding_dim", None
            ),
            wide_init_fn=getattr(self._model_config, "wide_init_fn", None),
        )

    # output head: logits [B] (num_class==1) or [B, C]
    def _output_to_prediction(
        self, output: jnp.ndarray, suffix: str = ""
    ) -> Dict[str, jnp.ndarray]:
        preds = {}
        output = output.astype(jnp.float32)
        use_softmax_ce = any(
            lf["name"] in ("softmax_cross_entropy", "jrc_loss")
            for lf in self._loss_fns
        )
        if self._num_class == 1 and not use_softmax_ce:
            logits = output[..., 0] if output.ndim > 1 else output
            preds[f"logits{suffix}"] = logits
            preds[f"probs{suffix}"] = jax.nn.sigmoid(logits)
        elif self._num_class <= 2 and use_softmax_ce:
            logits = output
            probs = jax.nn.softmax(logits, axis=-1)
            preds[f"logits{suffix}"] = logits
            preds[f"probs{suffix}"] = probs[..., 1]
        else:
            preds[f"logits{suffix}"] = output
            preds[f"probs{suffix}"] = jax.nn.softmax(output, axis=-1)
            preds[f"y{suffix}"] = output[..., 0]
        return preds

    def loss(
        self, predictions: Dict[str, jnp.ndarray], batch: Batch
    ) -> Dict[str, jnp.ndarray]:
        losses = {}
        label = batch.labels[self._label_name]
        for lf in self._loss_fns:
            name = lf["name"]
            kw: Dict[str, Any] = {}
            if name == "jrc_loss":
                sess = _grouping_value_dev(batch, lf["session_name"])
                kw["session_ids"] = sess
            inp = predictions["logits"]
            if name == "l2_loss":
                inp = predictions.get("y", predictions["probs"])
            per_sample = lf["fn"](inp, label, **kw)
            losses[name] = self._reduce(
                per_sample, batch, self._sample_weight_name
            )
        return losses


def _grouping_value_dev(batch: Batch, key: str):
    """Device-side grouping column (first id / label value)."""
    if key in batch.labels:
        return batch.labels[key]
    if key in batch.sparse_features:
        f = batch.sparse_features[key]
        if f.is_fixed:
            return f.values[:, 0]
        b = f.lengths.shape[0]
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(f.lengths.astype(jnp.int32))]
        )[:-1]
        starts = jnp.minimum(starts, f.values.shape[0] - 1)
        return jnp.where(f.lengths > 0, f.values[starts], -1)
    if key in batch.dense_features:
        return batch.dense_features[key].values[:, 0]
    raise KeyError(f"grouping key {key} not in batch")
