"""RocketLaunching light/booster co-trained distillation
(reference /root/reference/tzrec/models/rocket_launching.py, 323 LoC):
shared bottom -> booster MLP + light MLP; both take the labeled loss,
the light net additionally distills from the (gradient-stopped) booster
logits, optionally also from hidden features."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.losses import (
    binary_cross_entropy,
    softmax_cross_entropy,
)
from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.protos import simi_pb2
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class RocketLaunching(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._group = self.embedding_group.group_names()[0]
        in_dim = self.embedding_group.group_total_dim(self._group)
        mc = self._model_config
        self.share_mlp = (
            mlp_from_config(in_dim, config_to_kwargs(mc.share_mlp))
            if mc.HasField("share_mlp") else None
        )
        d = self.share_mlp.output_dim() if self.share_mlp else in_dim
        self.booster_mlp = mlp_from_config(
            d, config_to_kwargs(mc.booster_mlp)
        )
        self.light_mlp = mlp_from_config(d, config_to_kwargs(mc.light_mlp))
        self.feature_based = bool(mc.feature_based_distillation)

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 5)
        params = {}
        if self.share_mlp is not None:
            params["share"] = self.share_mlp.init(ks[0])
        params["booster"] = self.booster_mlp.init(ks[1])
        params["light"] = self.light_mlp.init(ks[2])
        params["booster_out"] = M.linear_init(
            ks[3], self.booster_mlp.output_dim(), self._num_class
        )
        params["light_out"] = M.linear_init(
            ks[4], self.light_mlp.output_dim(), self._num_class
        )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._group]
        if self.share_mlp is not None:
            x = self.share_mlp(params["share"], x, ctx, "share")
        hb = self.booster_mlp(params["booster"], x, ctx, "booster")
        hl = self.light_mlp(params["light"], x, ctx, "light")
        yb = M.linear_apply(params["booster_out"], hb, ctx)
        yl = M.linear_apply(params["light_out"], hl, ctx)
        preds = {}
        for k, v in self._output_to_prediction(yb).items():
            preds[f"{k}_booster"] = v
        for k, v in self._output_to_prediction(yl).items():
            preds[f"{k}_light"] = v
        # canonical outputs = light net (the served one)
        preds["logits"] = preds["logits_light"]
        preds["probs"] = preds["probs_light"]
        preds["__hidden_booster"] = hb
        preds["__hidden_light"] = hl
        return preds

    def loss(self, predictions, batch: Batch) -> Dict[str, jnp.ndarray]:
        label = batch.labels[self._label_name]
        losses = {}

        def _ce(logits):
            if logits.ndim == 2 and logits.shape[-1] > 1:
                # num_class >= 2: softmax CE over class logits
                return softmax_cross_entropy(logits, label)
            if logits.ndim == 2:
                logits = logits[:, 0]  # [B,1] -> [B] (bce broadcasts!)
            return binary_cross_entropy(logits, label)

        losses["bce_booster"] = self._reduce(
            _ce(predictions["logits_booster"]), batch,
            self._sample_weight_name,
        )
        losses["bce_light"] = self._reduce(
            _ce(predictions["logits_light"]), batch,
            self._sample_weight_name,
        )
        # logit distillation (booster frozen)
        t = jax.lax.stop_gradient(predictions["logits_booster"])
        losses["distill"] = jnp.mean(
            jnp.square(predictions["logits_light"] - t)
        )
        if self.feature_based:
            hb = jax.lax.stop_gradient(predictions["__hidden_booster"])
            hl = predictions["__hidden_light"]
            d = min(hb.shape[-1], hl.shape[-1])
            a = hl[..., :d].astype(jnp.float32)
            b = hb[..., :d].astype(jnp.float32)
            cos = jnp.sum(a * b, -1) * jax.lax.rsqrt(
                jnp.sum(a * a, -1) * jnp.sum(b * b, -1) + 1e-12
            )
            losses["feature_distill"] = jnp.mean(1.0 - cos)
        return losses

    def update_metrics(self, metrics, predictions, batch: Batch) -> None:
        import numpy as np

        from torcheasyrec_tpu.models.model import _grouping_value

        label = np.asarray(batch.labels[self._label_name])
        for m in metrics:
            # metric names follow reference: auc reported on the light net,
            # plus auc_booster
            kw = {}
            gk = m["config"].get("grouping_key")
            if gk:
                kw["grouping_key"] = _grouping_value(batch, gk)
            m["metric"].update(
                np.asarray(predictions["probs_light"]), label, **kw
            )

    def init_metrics(self):
        out = super().init_metrics()
        for m in out:
            if m["name"] == "auc":
                m["name"] = "auc_light"
        return out
