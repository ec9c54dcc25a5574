"""TDM tree-based deep match (reference
/root/reference/tzrec/models/tdm.py, 156 LoC): rank model over
(user history, tree node) pairs produced by the TDMSampler —
MultiWindowDIN attention over the history with the candidate node as
query, final MLP, BCE on is-ancestor labels. Retrieval is layer-wise
beam search over the tree (tools/tdm/retrieval.py counterpart)."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.modules.sequence import MultiWindowDINEncoder
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class TDM(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        mc = self._model_config
        dims = self.embedding_group.seq_group_dims()
        seq_groups = [
            k[: -len(".sequence")] for k in dims if k.endswith(".sequence")
        ]
        assert seq_groups, "TDM needs a SEQUENCE feature group"
        self._seq_group = seq_groups[0]
        mw = mc.multiwindow_din
        self.mwdin = MultiWindowDINEncoder(
            sequence_dim=dims[f"{self._seq_group}.sequence"],
            query_dim=dims.get(
                f"{self._seq_group}.query",
                dims[f"{self._seq_group}.sequence"],
            ),
            input=self._seq_group,
            attn_mlp=config_to_kwargs(mw.attn_mlp),
            windows_len=list(mw.windows_len),
        )
        extra_dims = sum(
            self.embedding_group.group_total_dim(g)
            for g in self._non_seq_groups()
        )
        self.final = mlp_from_config(
            self.mwdin.output_dim()
            + dims.get(f"{self._seq_group}.query", 0)
            + extra_dims,
            config_to_kwargs(mc.final),
        )

    def _non_seq_groups(self):
        return [
            g.group_name for g in self._base_model_config.feature_groups
            if g.group_name != self._seq_group
            and not self.embedding_group._group_is_sequence.get(g.group_name)
        ]

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 3)
        return {
            "mwdin": self.mwdin.init(ks[0]),
            "final": self.final.init(ks[1]),
            "output": M.linear_init(
                ks[2], self.final.output_dim(), self._num_class
            ),
        }

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        att = self.mwdin(params["mwdin"], grouped, ctx, "mwdin")
        parts = [att]
        qk = f"{self._seq_group}.query"
        if qk in grouped:
            parts.append(grouped[qk])
        for g in self._non_seq_groups():
            parts.append(grouped[g])
        h = self.final(
            params["final"], jnp.concatenate(parts, axis=-1), ctx, "final"
        )
        y = M.linear_apply(params["output"], h, ctx)
        return self._output_to_prediction(y)
