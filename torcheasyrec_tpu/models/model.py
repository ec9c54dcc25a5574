"""BaseModel: model registry + loss/metric plumbing.

Counterpart of /root/reference/tzrec/models/model.py (BaseModel:41,
TrainWrapper:244, PredictWrapper:300, ScriptWrapper:352). Functional:
a model instance holds configuration and submodule descriptors;
parameters live in pytrees. The train/eval wrappers of the reference
collapse into the driver's jitted step functions (main.py), since
autocast/loss-collection are just function composition here.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.features.feature import BaseFeature
from torcheasyrec_tpu.metrics import TrainMetricWrapper, create_metric
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.embedding import EmbeddingGroup
from torcheasyrec_tpu.utils.load_class import get_register_class_meta

_MODEL_CLASS_MAP: Dict[str, type] = {}
_meta = get_register_class_meta(_MODEL_CLASS_MAP)


class BaseModel(metaclass=_meta):
    """Base of all models.

    Subclasses build an EmbeddingGroup (self.embedding_group) plus dense
    submodules in __init__, and implement:
      - init_dense(key) -> dense params (excluding embedding_group's)
      - predict(params, grouped, batch, ctx) -> predictions dict
      - loss(predictions, batch) -> dict of scalar losses
    """

    def __init__(
        self,
        model_config: Any,  # ModelConfig proto
        features: List[BaseFeature],
        labels: List[str],
        sample_weights: Optional[List[str]] = None,
        mesh=None,
        sparse_optimizer=None,
        **kwargs: Any,
    ) -> None:
        self._base_model_config = model_config
        self._features = features
        self._labels = list(labels)
        self._sample_weights = list(sample_weights or [])
        self._mesh = mesh
        self._sparse_optimizer = sparse_optimizer
        self._plan = kwargs.get("plan")
        self._num_class = int(getattr(model_config, "num_class", 1) or 1)
        which = model_config.WhichOneof("model")
        self._model_config = getattr(model_config, which) if which else None
        self._model_type = which
        self.embedding_group: Optional[EmbeddingGroup] = None
        self._loss_fns: List[Dict] = []
        self._metric_cfgs: List[Any] = list(model_config.metrics)
        self._train_metric_cfgs: List[Any] = list(model_config.train_metrics)
        self._loss_cfgs: List[Any] = list(model_config.losses)

    # -- wiring helpers ----------------------------------------------------

    def _build_embedding_group(self, wide_embedding_dim=None, wide_init_fn=None):
        self.embedding_group = EmbeddingGroup(
            self._features,
            list(self._base_model_config.feature_groups),
            mesh=self._mesh,
            sparse_optimizer=self._sparse_optimizer,
            wide_embedding_dim=wide_embedding_dim,
            wide_init_fn=wide_init_fn,
            plan=self._plan,
        )
        self._build_variational_dropout()

    def _build_variational_dropout(self) -> None:
        """Per-group VariationalDropout for feature importance (reference
        rank_model.py:96-131 / match_model.py:158-178): one module per
        non-sequence feature group with >1 feature."""
        from torcheasyrec_tpu.modules.variational_dropout import (
            VariationalDropout,
        )

        self.group_variational_dropouts: Dict[str, Any] = {}
        self.vd_feature_names: Dict[str, List[str]] = {}
        bc = self._base_model_config
        if bc is None or not bc.HasField("variational_dropout"):
            return
        cfg = bc.variational_dropout
        eg = self.embedding_group
        for gname in eg.group_names():
            names, dims = [], []
            for kind, key, dim in eg._group_slots[gname]:
                names.append(key.split(":")[1] if kind == "emb" else key)
                dims.append(dim)
            for i, enc in enumerate(eg._group_encoders.get(gname, [])):
                names.append(f"{gname}__encoder_{i}")
                dims.append(enc.output_dim())
            if len(dims) <= 1:
                continue
            self.group_variational_dropouts[gname] = VariationalDropout(
                dims,
                regularization_lambda=cfg.regularization_lambda,
                embedding_wise=cfg.embedding_wise_variational_dropout,
            )
            self.vd_feature_names[gname] = names

    def init_variational_dropout(self, key: jax.Array) -> M.Params:
        """VD params subtree; {} when not configured. Subclasses that
        override init() must merge this under "variational_dropout"."""
        if not self.group_variational_dropouts:
            return {}
        return {
            g: vd.init(key)
            for g, vd in self.group_variational_dropouts.items()
        }

    def build_input(
        self,
        params: M.Params,
        grouped: Dict[str, jnp.ndarray],
        batch: Batch,
        ctx: M.Context,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Apply group variational dropout between assemble and predict
        (reference rank_model.py:114-131 build_input). Returns the gated
        grouped dict plus ``{group}_feature_p_loss`` regularization terms
        the driver folds into the total loss."""
        if not self.group_variational_dropouts:
            return grouped, {}
        out = dict(grouped)
        aux: Dict[str, jnp.ndarray] = {}
        for g, vd in self.group_variational_dropouts.items():
            if g not in grouped:  # per-tower forward: subset of groups
                continue
            x, reg = vd(params["variational_dropout"][g], grouped[g], ctx)
            out[g] = x
            aux[f"{g}_feature_p_loss"] = reg
        return out, aux

    def _main_group(self) -> str:
        """The model's primary feature group: "all" when configured,
        else the first group (reference group_names()[0])."""
        names = self.embedding_group.group_names()
        if "all" in names or not names:
            return "all"
        return names[0]

    def group_dim(self, name: str) -> int:
        return self.embedding_group.group_total_dim(name)

    # -- params ------------------------------------------------------------

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        params = {"embedding_group": self.embedding_group.init(k1)}
        params.update(self.init_dense(k2))
        vd = self.init_variational_dropout(k2)
        if vd:
            params["variational_dropout"] = vd
        return params

    def init_dense(self, key: jax.Array) -> M.Params:
        raise NotImplementedError

    # -- forward -----------------------------------------------------------

    def predict(
        self,
        params: M.Params,
        grouped: Dict[str, jnp.ndarray],
        batch: Batch,
        ctx: M.Context,
    ) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def forward(
        self, params: M.Params, tables, batch: Batch, ctx: M.Context
    ) -> Dict[str, jnp.ndarray]:
        """Full forward for eval/predict (no grad split needed)."""
        grouped, _ = self.embedding_group.forward(
            tables, batch, params["embedding_group"], ctx
        )
        grouped, _ = self.build_input(params, grouped, batch, ctx)
        return self.predict(params, grouped, batch, ctx)

    # -- losses ------------------------------------------------------------

    def loss(
        self, predictions: Dict[str, jnp.ndarray], batch: Batch
    ) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def total_loss(self, losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return sum(jnp.asarray(v) for v in losses.values())

    def _reduce(
        self,
        per_sample: jnp.ndarray,
        batch: Batch,
        sample_weight_name: Optional[str] = None,
        extra_weight: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Weighted mean of per-sample losses."""
        w = None
        if sample_weight_name and sample_weight_name in batch.sample_weights:
            w = batch.sample_weights[sample_weight_name]
        if extra_weight is not None:
            w = extra_weight if w is None else w * extra_weight
        if per_sample.ndim == 0:
            return per_sample
        if w is None:
            return jnp.mean(per_sample)
        w = w.astype(jnp.float32)
        return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-12)

    # -- metrics (host side) -----------------------------------------------

    def init_metrics(self) -> List[Dict]:
        return [create_metric(c) for c in self._metric_cfgs]

    def init_train_metrics(self) -> List[Dict]:
        out = []
        for c in self._train_metric_cfgs:
            m = create_metric(c)
            m["metric"] = TrainMetricWrapper(
                m["metric"], decay_rate=c.decay_rate, decay_step=c.decay_step
            )
            out.append(m)
        return out

    def update_metrics(
        self, metrics: List[Dict], predictions: Dict[str, Any], batch: Batch
    ) -> None:
        """Feed numpy predictions/labels into metric accumulators."""
        label = batch.labels[self._labels[0]] if self._labels else None
        for m in metrics:
            kw = {}
            gk = m["config"].get("grouping_key")
            if gk:
                kw["grouping_key"] = _grouping_value(batch, gk)
            preds = predictions.get("probs", predictions.get("y"))
            if m["name"].startswith("recall@"):
                preds = predictions.get("similarity", preds)
            m["metric"].update(preds, label, **kw)

    def compute_metrics(self, metrics: List[Dict]) -> Dict[str, float]:
        return {m["name"]: m["metric"].compute() for m in metrics}

    # -- misc --------------------------------------------------------------

    @property
    def model_type(self) -> str:
        return self._model_type or type(self).__name__


def _grouping_value(batch: Batch, key: str):
    """Fetch a grouping column for GroupedAUC: label field or sparse id."""
    import numpy as np

    if key in batch.labels:
        return np.asarray(batch.labels[key])
    if key in batch.sample_weights:
        return np.asarray(batch.sample_weights[key])
    if key in batch.sparse_features:
        f = batch.sparse_features[key]
        if f.is_fixed:
            return np.asarray(f.values)[:, 0]
        vals = np.asarray(f.values)
        lengths = np.asarray(f.lengths)
        starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        out = np.zeros(len(lengths), vals.dtype)
        has = lengths > 0
        out[has] = vals[np.minimum(starts[has], max(len(vals) - 1, 0))]
        return out
    if key in batch.dense_features:
        return np.asarray(batch.dense_features[key].values)[:, 0]
    raise KeyError(f"grouping key {key} not found in batch")
