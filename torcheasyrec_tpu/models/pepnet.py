"""PEPNet (reference /root/reference/tzrec/models/pepnet.py, 244 LoC):
EPNet domain-gates the shared embedding; PPNet per-task towers are gated
by user/item priors (the 'ppnet' feature group) per task-domain."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.multi_task_rank import MultiTaskRank
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.personalized_net import EPNet, PPNet


class PEPNet(MultiTaskRank):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        mc = self._model_config
        self._main_group = "all"
        self._domain_group = "domain" \
            if self.embedding_group.has_group("domain") else None
        self._prior_group = "ppnet" \
            if self.embedding_group.has_group("ppnet") else None
        in_dim = self.embedding_group.group_total_dim(self._main_group)
        self.epnet = None
        if self._domain_group:
            self.epnet = EPNet(
                feature_dim=in_dim,
                domain_dim=self.embedding_group.group_total_dim(
                    self._domain_group
                ),
                hidden_dim=int(mc.epnet_hidden_unit or in_dim),
                gamma=float(mc.epnet_gamma),
            )
        prior_dim = (
            self.embedding_group.group_total_dim(self._prior_group)
            if self._prior_group else 0
        )
        self.ppnets = []
        for t in self._task_tower_cfgs:
            self.ppnets.append(PPNet(
                in_dim=in_dim,
                prior_dim=prior_dim,
                hidden_units=list(mc.ppnet_hidden_units) or [128, 64],
                activation=mc.ppnet_activation,
                dropout_ratio=list(mc.ppnet_dropout_ratio),
                gamma=float(mc.ppnet_gamma),
            ))

    def init_dense(self, key: jax.Array) -> M.Params:
        params = {"ppnets": [], "outputs": []}
        if self.epnet is not None:
            key, sub = jax.random.split(key)
            params["epnet"] = self.epnet.init(sub)
        for t, pp in zip(self._task_tower_cfgs, self.ppnets):
            key, k1, k2 = jax.random.split(key, 3)
            params["ppnets"].append(pp.init(k1))
            params["outputs"].append(
                M.linear_init(k2, pp.output_dim(), int(t.num_class))
            )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._main_group]
        if self.epnet is not None:
            x = self.epnet(
                params["epnet"], x, grouped[self._domain_group], ctx
            )
        prior = (
            grouped[self._prior_group] if self._prior_group
            else jnp.zeros((x.shape[0], 0), x.dtype)
        )
        preds = {}
        for i, (t, pp) in enumerate(zip(self._task_tower_cfgs, self.ppnets)):
            h = pp(params["ppnets"][i], x, prior, ctx)
            y = M.linear_apply(params["outputs"][i], h, ctx)
            preds.update(self._task_output_to_prediction(t, y))
        return preds
