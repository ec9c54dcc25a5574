"""Semantic-ID generation models: RQ-VAE and RQ-KMeans.

Counterparts of /root/reference/tzrec/models/{sid_rqvae.py:259,
sid_rqkmeans.py:185, sid_model.py:262}: encode item vectors, residual-
quantize into L-level semantic IDs; RQ-VAE trains encoder/decoder +
codebooks with recon/commitment losses; RQ-KMeans fits per-level
k-means codebooks from accumulated samples at train end
(on_train_end hook, reference model.py:153-160 / main.py:556-560; the
reference uses FAISS — here plain Lloyd iterations in numpy, with
faiss used when importable).

Predictions expose ``codes`` [B, L] (the semantic ids) and ``recon``.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.metrics import Metric
from torcheasyrec_tpu.models.model import BaseModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import MLP
from torcheasyrec_tpu.modules.sid.quantizer import ResidualQuantizer


class UniqueRatio(Metric):
    """Fraction of distinct code tuples (reference metrics UniqueRatio)."""

    def __init__(self, **kw):
        self.reset()

    def reset(self):
        self._codes: List[np.ndarray] = []

    def update(self, preds, labels=None, **kw):
        self._codes.append(np.asarray(preds))

    def compute(self) -> float:
        c = np.concatenate(self._codes)
        tuples = {tuple(row) for row in c}
        return float(len(tuples) / max(len(c), 1))


class RelativeL1(Metric):
    """Mean symmetric relative-L1 reconstruction error
    |t - p| / (max(|t|, |p|) + epsilon) (reference
    metrics/relative_l1.py: bounded, 0 = exact; element-count-weighted
    mean; epsilon default 1e-4 matches the reference)."""

    def __init__(self, epsilon: float = 1e-4, **kw):
        self.eps = epsilon
        self.reset()

    def reset(self):
        self._sum = 0.0
        self._n = 0

    def update(self, preds, target=None, **kw):
        p = np.asarray(preds, np.float64)
        t = np.asarray(target, np.float64)
        rel = np.abs(t - p) / (np.maximum(np.abs(t), np.abs(p)) + self.eps)
        self._sum += float(rel.sum())
        self._n += rel.size

    def compute(self) -> float:
        return self._sum / max(self._n, 1)


class _SidMetricsMixin:
    """Shared SID metrics: code diversity + reconstruction error."""

    def init_metrics(self):
        return [
            {"name": "unique_ratio", "metric": UniqueRatio(),
             "config": {}},
            {"name": "rel_loss", "metric": RelativeL1(), "config": {}},
        ]

    def update_metrics(self, metrics, predictions, batch: Batch) -> None:
        for m in metrics:
            if m["name"] == "rel_loss":
                m["metric"].update(
                    np.asarray(predictions["recon"]),
                    np.asarray(predictions["__x"]),
                )
            else:
                m["metric"].update(np.asarray(predictions["codes"]))


class SidRqvae(_SidMetricsMixin, BaseModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._build_embedding_group()
        mc = self._model_config
        in_dim = self.embedding_group.group_total_dim(self._main_group())
        self.embed_dim = int(mc.embed_dim or 64)
        hidden = list(mc.hidden_dims) or [max(in_dim // 2, self.embed_dim)]
        self.encoder = MLP(in_dim, hidden + [self.embed_dim],
                           activation="nn.ReLU")
        self.decoder = MLP(self.embed_dim, hidden[::-1] + [in_dim],
                           activation="nn.ReLU")
        sk = mc.sinkhorn_config
        self.rq = ResidualQuantizer(
            self.embed_dim,
            list(mc.codebook) or [256, 256, 256],
            forward_mode=mc.forward_mode or "ste",
            distance_type="cosine" if mc.distance_type == "cosine" else "l2",
            normalize_residuals=bool(mc.normalize_residuals),
            sinkhorn_iters=int(sk.iters) if (
                mc.HasField("sinkhorn_config") and sk.enabled
            ) else 0,
            sinkhorn_epsilon=float(sk.epsilon or 10.0),
        )
        self._commitment_w = [1.0, 0.5]
        self._recon_type = "l2"
        self._use_contrastive = False
        for lc in self._loss_cfgs:
            which = lc.WhichOneof("sid_loss")
            if which == "commitment_loss" and len(
                lc.commitment_loss.latent_weight
            ):
                self._commitment_w = list(lc.commitment_loss.latent_weight)
            if which == "recon_loss":
                self._recon_type = lc.recon_loss.recon_type or "l2"
            if which == "contrastive_loss":
                self._use_contrastive = True
        self._contrastive_groups = None
        if mc.HasField("contrastive_config"):
            self._use_contrastive = True
            self._contrastive_groups = (
                mc.contrastive_config.pair_feature_group,
                mc.contrastive_config.pair_flag_feature_group,
            )
        self._in_dim = in_dim

    def init_dense(self, key: jax.Array) -> M.Params:
        k1, k2, k3 = M.split_keys(key, 3)
        return {
            "encoder": self.encoder.init(k1),
            "decoder": self.decoder.init(k2),
            "rq": self.rq.init(k3),
        }

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._main_group()].astype(jnp.float32)
        z = self.encoder(params["encoder"], x, ctx, "encoder")
        zq, codes, levels = self.rq(params["rq"], z, ctx)
        recon = self.decoder(params["decoder"], zq, ctx, "decoder")
        preds = {
            "codes": codes,
            "recon": recon,
            "__x": x,
            "__z": z,
            "__levels": levels,
        }
        if self._use_contrastive and self._contrastive_groups:
            pair_g, flag_g = self._contrastive_groups
            if pair_g in grouped:
                pair_x = grouped[pair_g].astype(jnp.float32)
                preds["__pair_z"] = self.encoder(
                    params["encoder"], pair_x, ctx, "encoder"
                )
                if flag_g in grouped:
                    preds["__pair_flag"] = grouped[flag_g][..., 0]
        return preds

    def loss(self, predictions, batch: Batch) -> Dict[str, jnp.ndarray]:
        x = predictions["__x"]
        recon = predictions["recon"].astype(jnp.float32)
        if self._recon_type == "l1":
            recon_loss = jnp.mean(jnp.abs(recon - x))
        elif self._recon_type == "cos":
            num = jnp.sum(recon * x, -1)
            den = jnp.sqrt(
                jnp.sum(recon * recon, -1) * jnp.sum(x * x, -1) + 1e-12
            )
            recon_loss = jnp.mean(1.0 - num / den)
        else:
            recon_loss = jnp.mean(jnp.square(recon - x))
        commit = jnp.float32(0.0)
        w_e, w_q = (self._commitment_w + [0.5, 0.5])[:2]
        for r_in, q in predictions["__levels"]:
            r = r_in.astype(jnp.float32)
            qf = q.astype(jnp.float32)
            commit = commit + w_e * jnp.mean(
                jnp.square(r - jax.lax.stop_gradient(qf))
            ) + w_q * jnp.mean(
                jnp.square(jax.lax.stop_gradient(r) - qf)
            )
        losses = {"recon_loss": recon_loss, "commitment_loss": commit}
        if "__pair_z" in predictions:
            # in-batch InfoNCE between item latents and their pair latents
            # (reference SID contrastive_loss)
            z = predictions["__z"].astype(jnp.float32)
            pz = predictions["__pair_z"].astype(jnp.float32)
            zn = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
            pn = pz / (jnp.linalg.norm(pz, axis=-1, keepdims=True) + 1e-12)
            sim = jnp.dot(zn, pn.T) / 0.1
            labels_idx = jnp.arange(z.shape[0])
            logp = jax.nn.log_softmax(sim, axis=-1)
            per = -logp[labels_idx, labels_idx]
            flag = predictions.get("__pair_flag")
            if flag is not None:
                w = (flag > 0).astype(jnp.float32)
                losses["contrastive_loss"] = jnp.sum(per * w) / jnp.maximum(
                    jnp.sum(w), 1.0
                )
            else:
                losses["contrastive_loss"] = jnp.mean(per)
        return losses


def _lloyd_kmeans(x: np.ndarray, k: int, iters: int = 20, seed: int = 0):
    try:
        import faiss  # host-side tooling; optional

        km = faiss.Kmeans(x.shape[1], k, niter=iters, seed=seed)
        km.train(np.ascontiguousarray(x, np.float32))
        return np.asarray(km.centroids).reshape(k, x.shape[1])
    except ImportError:
        pass
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    if len(centroids) < k:
        centroids = np.concatenate([
            centroids,
            rng.normal(size=(k - len(centroids), x.shape[1])).astype(
                x.dtype
            ),
        ])
    for _ in range(iters):
        d = (
            (x ** 2).sum(1, keepdims=True)
            + (centroids ** 2).sum(1)
            - 2 * x @ centroids.T
        )
        assign = d.argmin(1)
        for j in range(k):
            m = assign == j
            if m.any():
                centroids[j] = x[m].mean(0)
    return centroids


class SidRqkmeans(_SidMetricsMixin, BaseModel):
    """Accumulates encoder-free item vectors during 'training'; fits
    per-level k-means codebooks at on_train_end."""

    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._build_embedding_group()
        mc = self._model_config
        self._codebooks = list(mc.codebook) or [256, 256]
        self._normalize = bool(mc.normalize_residuals)
        self._sample_cap = int(mc.train_sample_size or 0) or 200_000
        self._buffer: List[np.ndarray] = []
        self._buffered = 0
        self._dim = self.embedding_group.group_total_dim(self._main_group())
        self.rq = ResidualQuantizer(
            self._dim, self._codebooks,
            normalize_residuals=self._normalize,
        )

    def init_dense(self, key: jax.Array) -> M.Params:
        return {"rq": self.rq.init(key)}

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._main_group()].astype(jnp.float32)
        zq, codes, levels = self.rq(params["rq"], x, ctx)
        if ctx.training and self._buffered < self._sample_cap:
            pass  # buffering happens host-side in collect()
        return {"codes": codes, "recon": zq, "__x": x, "__levels": levels}

    def collect(self, batch_x: np.ndarray) -> None:
        if self._buffered < self._sample_cap:
            self._buffer.append(np.asarray(batch_x, np.float32))
            self._buffered += len(batch_x)

    def loss(self, predictions, batch: Batch) -> Dict[str, jnp.ndarray]:
        # no gradient training; expose quantization error for logging
        x = predictions["__x"]
        q = predictions["recon"].astype(jnp.float32)
        return {
            "quant_error": jax.lax.stop_gradient(
                jnp.mean(jnp.square(x - q))
            )
        }

    def on_train_end(self, params: M.Params) -> M.Params:
        """Fit codebooks level by level from the buffered samples."""
        if not self._buffer:
            return params
        x = np.concatenate(self._buffer)[: self._sample_cap]
        rq_params = dict(params["rq"])
        residual = x.astype(np.float32)
        for i, k in enumerate(self._codebooks):
            r_in = residual
            if self._normalize:
                r_in = r_in / (
                    np.linalg.norm(r_in, axis=1, keepdims=True) + 1e-12
                )
            cb = _lloyd_kmeans(r_in, k, seed=i)
            rq_params[f"vq_{i}"] = {"codebook": jnp.asarray(cb)}
            d = (
                (r_in ** 2).sum(1, keepdims=True)
                + (cb ** 2).sum(1)
                - 2 * r_in @ cb.T
            )
            assign = d.argmin(1)
            residual = residual - cb[assign]
        return {**params, "rq": rq_params}

    def init_metrics(self):
        return [
            {"name": "unique_ratio", "metric": UniqueRatio(),
             "config": {}},
            {"name": "rel_loss", "metric": RelativeL1(), "config": {}},
        ]

    def update_metrics(self, metrics, predictions, batch: Batch) -> None:
        for m in metrics:
            if m["name"] == "rel_loss":
                m["metric"].update(
                    np.asarray(predictions["recon"]),
                    np.asarray(predictions["__x"]),
                )
            else:
                m["metric"].update(np.asarray(predictions["codes"]))


def _sid_collect_from_batch(self, batch: Batch) -> None:
    """Host-side sample buffering for the k-means fit: concat the 'all'
    group's dense slots in group order."""
    slots = self.embedding_group._group_slots.get("all", [])
    parts = []
    for kind, key, dim in slots:
        if kind == "dense" and key in batch.dense_features:
            parts.append(np.asarray(batch.dense_features[key].values))
    if parts:
        self.collect(np.concatenate(parts, axis=-1))


SidRqkmeans.collect_from_batch = _sid_collect_from_batch
