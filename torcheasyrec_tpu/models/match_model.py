"""MatchModel base + MatchTower: two-tower retrieval.

Counterpart of /root/reference/tzrec/models/match_model.py
(MatchModel:110, MatchTower:246, in-batch negatives :270-284).
Similarity layout: user [B, D] x item [B + num_neg, D] ->
sim [B, 1 + num_neg] with the positive in column 0 (sampled-softmax),
or [B, B] with diagonal positives for in-batch negatives. Loss is
temperature-scaled softmax CE on that row.
"""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.losses import softmax_cross_entropy
from torcheasyrec_tpu.metrics import create_metric
from torcheasyrec_tpu.models.model import BaseModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.protos import simi_pb2
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class MatchTower(M.Module):
    """Feature-group MLP tower + output projection to output_dim."""

    def __init__(self, tower_config, output_dim: int, similarity,
                 in_dim: int) -> None:
        self._config = tower_config
        self.mlp = (
            mlp_from_config(in_dim, config_to_kwargs(tower_config.mlp))
            if tower_config.HasField("mlp") else None
        )
        self._in_dim = in_dim
        self.output_dim = output_dim
        self.similarity = similarity

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        params = {}
        hidden = self._in_dim
        if self.mlp is not None:
            params["mlp"] = self.mlp.init(k1)
            hidden = self.mlp.output_dim()
        if self.output_dim > 0:
            params["output"] = M.linear_init(k2, hidden, self.output_dim)
        return params

    def __call__(self, params, x, ctx: M.Context,
                 path: str = "tower") -> jnp.ndarray:
        if self.mlp is not None:
            x = self.mlp(params["mlp"], x, ctx, f"{path}.mlp")
        if self.output_dim > 0:
            x = M.linear_apply(params["output"], x, ctx)
        if self.similarity == simi_pb2.COSINE:
            x = x * jax.lax.rsqrt(
                jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                        keepdims=True) + 1e-12
            ).astype(x.dtype)
        return x


class MatchModel(BaseModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        mc = self._model_config
        self._similarity = getattr(mc, "similarity", simi_pb2.INNER_PRODUCT)
        self._temperature = float(getattr(mc, "temperature", 1.0) or 1.0)
        self._in_batch_negative = bool(
            getattr(mc, "in_batch_negative", False)
        )
        self._output_dim = int(getattr(mc, "output_dim", 0) or 0)
        self._sample_weight_name = (
            self._sample_weights[0] if self._sample_weights else None
        )

    # -- per-tower serving (reference main.py:1032-1056 exports each
    # MatchTower separately: item tower feeds the ANN index build, user
    # tower serves online) -------------------------------------------------

    def tower_specs(self) -> Dict[str, Dict]:
        """tower name -> {groups, output}: the feature groups the tower
        consumes and the prediction key carrying its embedding."""
        mc = self._model_config
        return {
            "user": {"groups": [mc.user_tower.input],
                     "output": "user_tower_emb"},
            "item": {"groups": [mc.item_tower.input],
                     "output": "item_tower_emb"},
        }

    def predict_tower(self, params, grouped, batch, ctx,
                      tower: str) -> jnp.ndarray:
        """One tower's embedding from a grouped-subset forward."""
        mc = self._model_config
        if tower == "user":
            return self.user_tower(
                params["user_tower"], grouped[mc.user_tower.input], ctx,
                "user_tower",
            )
        if tower == "item":
            return self.item_tower(
                params["item_tower"], grouped[mc.item_tower.input], ctx,
                "item_tower",
            )
        raise ValueError(f"unknown tower {tower!r}")

    def _sim(
        self,
        user_emb: jnp.ndarray,
        item_emb: jnp.ndarray,
        hard_neg_indices: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """[B, 1+num_neg(+num_hard)] (col 0 = positive) or [B, B] in-batch.

        With ``hard_neg_indices`` [H, 2] (user_row, hard_col), the last H
        item rows are per-user hard negatives: each scores ONLY against
        its own user, scattered into columns [1+num_neg, 1+num_neg+
        H//B); absent slots (user_row == B, out of bounds) are dropped
        and masked to -1e9 (reference match_model.py:53-95
        _sim_with_sampler's sparse_coo + hard_neg_mask).

        MULTI-PROCESS batches are PER-PROCESS BLOCKS: the global item
        rows are [p0: Bl pos | S neg | Bl*k hard][p1: ...] (each host's
        sampler appended its own negatives before the global row
        concat), NOT [B pos | ...]. The block decomposition below keeps
        each process's users paired with their own positives and scored
        against their own process's negatives — the reference's
        per-rank loss semantics (each rank's sampler excluded ITS batch
        users' positive edges), and the alignment bug the naive slicing
        would hit (tests/test_multihost.py sampler e2e caught row
        misalignment that silently destroyed retrieval training)."""
        b = user_emb.shape[0]
        import jax as _jax

        if self._in_batch_negative:
            # full item matrix: B in-batch positives on the diagonal PLUS
            # any sampler-appended negatives (reference match_model.py:282).
            # Multi-process WITH appended negatives: reorder the
            # per-process [bl pos | S neg] blocks to [B pos | P*S neg]
            # so the diagonal-positive label convention (arange(b))
            # stays correct for every process's users
            Pi = _jax.process_count()
            rows = item_emb.shape[0]
            if Pi > 1 and rows != b and b % Pi == 0 and rows % Pi == 0:
                bl = b // Pi
                tot = rows // Pi
                blocks = item_emb.reshape(Pi, tot, item_emb.shape[-1])
                item_emb = jnp.concatenate([
                    blocks[:, :bl].reshape(b, -1),
                    blocks[:, bl:].reshape(Pi * (tot - bl), -1),
                ])
            return jnp.dot(
                user_emb, item_emb.T, preferred_element_type=jnp.float32
            )
        n_hard = (
            hard_neg_indices.shape[0] if hard_neg_indices is not None else 0
        )
        P = _jax.process_count()
        if P <= 1 or b % P or item_emb.shape[0] % P or n_hard % P:
            P = 1
        bl = b // P
        tot = item_emb.shape[0] // P
        hb = n_hard // P
        s = tot - bl - hb
        d = item_emb.shape[-1]
        blocks = item_emb.reshape(P, tot, d)
        pos_rows = blocks[:, :bl].reshape(b, d)
        pos = jnp.sum(
            user_emb.astype(jnp.float32) * pos_rows.astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        out = pos
        if s > 0:
            neg = jnp.einsum(
                "pbd,psd->pbs",
                user_emb.reshape(P, bl, d), blocks[:, bl : bl + s],
                preferred_element_type=jnp.float32,
            ).reshape(b, s)
            out = jnp.concatenate([pos, neg], axis=-1)
        if hb:
            hard_emb = blocks[:, bl + s :].reshape(n_hard, d)
            rows = hard_neg_indices[:, 0]  # process-LOCAL user rows
            cols = hard_neg_indices[:, 1]
            block_of = jnp.arange(n_hard, dtype=rows.dtype) // hb
            grows = jnp.where(rows >= bl, b, rows + block_of * bl)
            hard_user = jnp.take(
                user_emb, jnp.minimum(grows, b - 1), axis=0
            )
            hard_sim = jnp.sum(
                hard_user.astype(jnp.float32)
                * hard_emb.astype(jnp.float32),
                axis=-1,
            )
            n_cols = max(hb // bl, 1)
            hard_mat = jnp.full((b, n_cols), -1e9, jnp.float32)
            hard_mat = hard_mat.at[grows, cols].set(hard_sim, mode="drop")
            out = jnp.concatenate([out, hard_mat], axis=-1)
        return out

    def _sim_to_prediction(self, sim: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {"similarity": sim.astype(jnp.float32)}

    def loss(self, predictions, batch: Batch) -> Dict[str, jnp.ndarray]:
        sim = predictions["similarity"] / self._temperature
        b = sim.shape[0]
        if self._in_batch_negative:
            labels = jnp.arange(b, dtype=jnp.int32)
        else:
            labels = jnp.zeros((b,), jnp.int32)
        per_sample = softmax_cross_entropy(sim, labels)
        return {
            "softmax_cross_entropy": self._reduce(
                per_sample, batch, self._sample_weight_name
            )
        }

    def init_metrics(self) -> List[Dict]:
        return [create_metric(c) for c in self._metric_cfgs]

    def update_metrics(self, metrics, predictions, batch: Batch) -> None:
        import numpy as np

        sim = np.asarray(predictions["similarity"])
        if self._in_batch_negative:
            # rotate so the positive is column 0
            b = sim.shape[0]
            idx = (np.arange(sim.shape[1])[None, :] + np.arange(b)[:, None]) \
                % sim.shape[1]
            sim = np.take_along_axis(sim, idx, axis=1)
        for m in metrics:
            m["metric"].update(sim, None)
