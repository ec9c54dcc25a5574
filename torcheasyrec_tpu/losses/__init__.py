"""Loss functions.

Counterpart of /root/reference/tzrec/loss/ (663 LoC): BCE/softmax CE via
jax/optax-style formulations, BinaryFocalLoss (focal_loss.py), JRCLoss
(jrc_loss.py), L2. All return per-sample losses [B]; reduction (with
sample weights) happens in the model base so task-space weighting works.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def binary_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """BCE with logits, per-sample."""
    labels = labels.astype(jnp.float32)
    if label_smoothing > 0:
        labels = labels * (1 - label_smoothing) + 0.5 * label_smoothing
    logits = logits.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def softmax_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """Multi-class CE; labels int [B] or probs [B, C]."""
    logits = logits.astype(jnp.float32)
    n_class = logits.shape[-1]
    if labels.ndim == logits.ndim - 1:
        onehot = jax.nn.one_hot(labels.astype(jnp.int32), n_class)
    else:
        onehot = labels.astype(jnp.float32)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / n_class
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(onehot * logp, axis=-1)


def l2_loss(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    d = preds.astype(jnp.float32) - labels.astype(jnp.float32)
    return 0.5 * d * d


def binary_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.5,
) -> jnp.ndarray:
    """Focal loss (reference loss/focal_loss.py)."""
    labels = labels.astype(jnp.float32)
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    ce = binary_cross_entropy(logits, labels)
    p_t = p * labels + (1 - p) * (1 - labels)
    alpha_t = alpha * labels + (1 - alpha) * (1 - labels)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def jrc_loss(
    logits: jnp.ndarray,  # [B, 2] two-class logits
    labels: jnp.ndarray,  # [B] 0/1
    session_ids: jnp.ndarray,  # [B]
    alpha: float = 0.5,
) -> jnp.ndarray:
    """Joint Ranking & Calibration loss (reference loss/jrc_loss.py;
    Sheng et al., KDD'22). CE part + session-wise generative listwise
    part where each sample competes against same-session samples.

    Returns a scalar (session-normalized); broadcast to [B] for the
    model-base reduction contract.
    """
    logits = logits.astype(jnp.float32)
    labels_i = labels.astype(jnp.int32)
    b = logits.shape[0]
    ce = softmax_cross_entropy(logits, labels_i)

    same_sess = session_ids[:, None] == session_ids[None, :]  # [B, B]
    y = labels_i.astype(jnp.float32)
    pos_logit = logits[:, 1]
    neg_logit = logits[:, 0]
    eye = jnp.eye(logits.shape[0], dtype=bool)

    def _listwise(sample_logits, indicator, other_class):
        # sample i competes against ITSELF plus same-session samples of
        # the OTHER class (reference loss/jrc_loss.py:89-104 masks out
        # other same-class samples)
        allow = same_sess & (eye | (other_class[None, :] > 0))
        masked = jnp.where(allow, sample_logits[None, :], -jnp.inf)
        logp = jax.nn.log_softmax(masked, axis=-1)
        diag = jnp.diagonal(logp)
        return -(diag * indicator)

    loss_pos = _listwise(pos_logit, y, 1.0 - y)
    loss_neg = _listwise(neg_logit, 1.0 - y, y)
    ge_loss = loss_pos + loss_neg
    return alpha * ce + (1 - alpha) * ge_loss


def create_loss_fn(loss_config) -> Dict:
    """LossConfig proto -> (name, callable(logits/preds, labels, batch))."""
    which = loss_config.WhichOneof("loss")
    cfg = getattr(loss_config, which)
    if which == "binary_cross_entropy":
        ls = cfg.label_smoothing
        return {
            "name": which,
            "num_class": 1,
            "fn": lambda logits, labels, **kw: binary_cross_entropy(
                logits, labels, ls
            ),
        }
    if which == "softmax_cross_entropy":
        ls = cfg.label_smoothing
        return {
            "name": which,
            "num_class": 2,
            "fn": lambda logits, labels, **kw: softmax_cross_entropy(
                logits, labels, ls
            ),
        }
    if which == "l2_loss":
        return {
            "name": which,
            "num_class": 1,
            "fn": lambda preds, labels, **kw: l2_loss(preds, labels),
        }
    if which == "binary_focal_loss":
        g, a = cfg.gamma, cfg.alpha
        return {
            "name": which,
            "num_class": 1,
            "fn": lambda logits, labels, **kw: binary_focal_loss(
                logits, labels, g, a
            ),
        }
    if which == "jrc_loss":
        a = cfg.alpha
        sess = cfg.session_name
        return {
            "name": which,
            "num_class": 2,
            "session_name": sess,
            "fn": lambda logits, labels, session_ids=None, **kw: jrc_loss(
                logits, labels, session_ids, a
            ),
        }
    raise ValueError(f"unsupported loss {which}")
