"""Fused sparse (embedding) optimizers as row-sparse functional updates.

TPU-native equivalent of the reference's in-backward fused optimizers
(/root/reference/tzrec/optim/optimizer_builder.py:30, applied via
torchrec ``apply_optimizer_in_backward`` in main.py:721-728, kernels in
fbgemm TBE). Here each optimizer is a pure function over the *touched
rows only*: given deduplicated row indices + summed row gradients it
scatters new weights/state into the (possibly sharded) table, so a
40M-row table costs only O(touched) bandwidth per step.

Dedup contract: callers pass ``uids`` [K_pad] (unique row ids, padding
slots set OUT OF BOUNDS so ``.at[].set(mode="drop")`` ignores them) and
``grads`` [K_pad, dim] (summed over duplicates). All updates run in fp32.

The math itself lives in :meth:`SparseOptimizer.apply_rows`, a pure
row-level function: (old weight rows, old state rows, grads) -> (new
rows, new state rows). ``apply`` wraps it with the gather/scatter pair
for unpacked ``[rows, dim]`` tables; the packed-row engine path
(parallel/emb_engine.py, TBE-style in-row state) calls ``apply_rows``
directly on rows extracted from 128-lane physical rows.

Covers the full sparse-optimizer oneof (optimizer.proto:4-16 /
reference optimizer.proto): sgd, adagrad, adam, lars_sgd, lamb,
partial_rowwise_lamb, partial_rowwise_adam, rowwise_adagrad, adadelta,
rmsprop.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# callers (emb_engine._dedup_apply) ALWAYS pass uids sorted ascending
# and unique, with an out-of-bounds sentinel RUN at the tail (dropped
# by mode="drop"); the hints let XLA take its merge-based scatter
# lowering — measured 24% faster on [126k, 256] rows on v5e, verified
# bit-identical against the unhinted scatter including the duplicate
# sentinel tail
_DROP = dict(mode="drop", indices_are_sorted=True, unique_indices=True)
_FILL_SORTED = dict(mode="fill", fill_value=0.0, indices_are_sorted=True)


def _dim_sum(x, axis_name: Optional[str], segs=None):
    """Row-wise sum over the embedding dim; psums across a column-sharded
    mesh axis so row-wise optimizer state (rowwise_adagrad acc, partial
    rowwise v, lamb/lars norms) is EXACT under column_wise sharding.

    ``segs`` (static column-segment widths, for merged co-keyed tables —
    see emb_engine.merge_cokeyed_tables): reductions run PER SEGMENT and
    return [K, n_seg], keeping each logical table's row-wise optimizer
    math identical to its unmerged form. Mutually exclusive with
    axis_name (merged groups are never column-sharded)."""
    if segs is not None and len(segs) > 1:
        off, parts = 0, []
        for w in segs:
            parts.append(jnp.sum(x[:, off : off + w], axis=-1,
                                 keepdims=True))
            off += w
        return jnp.concatenate(parts, axis=1)
    s = jnp.sum(x, axis=-1, keepdims=True)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


def _dim_mean(x, axis_name: Optional[str], full_dim: Optional[int],
              segs=None):
    if segs is not None and len(segs) > 1:
        d = jnp.asarray(segs, jnp.float32)[None, :]
    else:
        d = full_dim if full_dim is not None else x.shape[-1]
    return _dim_sum(x, axis_name, segs) / d


def _dim_norm(x, axis_name: Optional[str], segs=None):
    return jnp.sqrt(_dim_sum(x * x, axis_name, segs))


def _seg_expand(s, segs, dim):
    """[K, n_seg] per-segment values -> [K, dim] broadcast over each
    segment's columns (identity when unsegmented: n_seg == 1)."""
    if segs is None or len(segs) <= 1:
        return s
    return jnp.repeat(s, jnp.asarray(segs), axis=1, total_repeat_length=dim)


def _set_rows(weight, uids, new_rows):
    return weight.at[uids].set(new_rows.astype(weight.dtype), **_DROP)


def create_sparse_optimizer(type_name: str, cfg: Dict[str, Any]) -> "SparseOptimizer":
    return SparseOptimizer(type_name.replace("_optimizer", ""), cfg)


class SparseOptimizer:
    """Stateless descriptor; state lives in plain pytrees."""

    def __init__(self, kind: str, cfg: Dict[str, Any]) -> None:
        self.kind = kind
        self.cfg = dict(cfg)
        self.base_lr = float(cfg.get("lr", 0.002))

    # -- state -------------------------------------------------------------

    def row_state_widths(
        self, dim: int, col_segments: Optional[Tuple[int, ...]] = None,
    ) -> List[Tuple[str, int]]:
        """Per-row state columns as (name, width) — the order is the
        in-row layout contract for packed tables. With ``col_segments``
        (merged co-keyed tables) row-wise state keeps one column PER
        SEGMENT, matching the unmerged per-table math exactly."""
        k = self.kind
        ns = len(col_segments) if col_segments else 1
        if k == "sgd":
            return []
        if k == "adagrad":
            return [("acc", dim)]
        if k == "rowwise_adagrad":
            return [("acc", ns)]
        if k == "adam":
            return [("m", dim), ("v", dim)]
        if k == "partial_rowwise_adam":
            return [("m", dim), ("v", ns)]
        if k == "lamb":
            return [("m", dim), ("v", dim)]
        if k == "partial_rowwise_lamb":
            return [("m", dim), ("v", ns)]
        if k == "lars_sgd":
            return [("mom", dim)]
        if k == "adadelta":
            return [("acc", dim), ("delta_acc", dim)]
        if k == "rmsprop":
            return [("sq", dim)]
        raise ValueError(f"unknown sparse optimizer {self.kind}")

    def row_state_init(self) -> Dict[str, float]:
        """Fill value per row-state column at init."""
        if self.kind in ("adagrad", "rowwise_adagrad"):
            return {"acc": float(self.cfg.get("initial_accumulator_value", 0.0))}
        return {}

    def scalar_state_init(self) -> Params:
        """Non-row state (shared scalars), e.g. the adam/lamb step count."""
        if self.kind in ("adam", "partial_rowwise_adam", "lamb",
                         "partial_rowwise_lamb"):
            return {"step": jnp.zeros((), jnp.int32)}
        return {}

    def init_state(
        self, rows: int, dim: int,
        col_segments: Optional[Tuple[int, ...]] = None,
    ) -> Params:
        out: Params = dict(self.scalar_state_init())
        fills = self.row_state_init()
        for name, width in self.row_state_widths(dim, col_segments):
            out[name] = jnp.full((rows, width), fills.get(name, 0.0),
                                 jnp.float32)
        return out

    # -- row math ----------------------------------------------------------

    def apply_rows(
        self,
        w_rows: jnp.ndarray,  # [K, dim] fp32 (old weights, padding rows 0)
        srows: Params,        # {name: [K, width]} old row state
        grads: jnp.ndarray,   # [K, dim] fp32 (deduped row grad sums)
        lr: jnp.ndarray,      # scalar (schedule-scaled)
        scalar_state: Params,  # {"step": ...} for adam/lamb kinds
        dim_psum_axis: Optional[str] = None,
        full_dim: Optional[int] = None,
        col_segments: Optional[Tuple[int, ...]] = None,
    ) -> Tuple[jnp.ndarray, Params, Params]:
        """Pure row-level update: returns (new_rows, new_srows,
        new_scalar_state). No table access — callers own gather/scatter
        (unpacked tables) or pack/merge/write (packed tables).
        ``col_segments``: static widths of the logical tables fused into
        these rows; row-wise reductions run per segment."""
        segs = col_segments
        if segs is not None and len(segs) > 1 and dim_psum_axis is not None:
            raise ValueError(
                "merged (column-segmented) tables cannot be column-"
                "sharded: per-segment reductions don't compose with "
                "a dim psum"
            )
        c = self.cfg
        k = self.kind
        if c.get("gradient_clipping", False):
            mg = float(c.get("max_gradient", 1.0))
            grads = jnp.clip(grads, -mg, mg)
        w_rows = w_rows.astype(jnp.float32)
        wd = float(c.get("weight_decay", 0.0))
        if wd and k in ("adam", "lamb", "partial_rowwise_lamb",
                        "partial_rowwise_adam", "lars_sgd", "adadelta",
                        "rmsprop"):
            grads = grads + wd * w_rows

        if k == "sgd":
            return w_rows - lr * grads, {}, {}

        if k == "adagrad":
            eps = float(c.get("eps", 1e-10))
            acc = srows["acc"] + grads * grads
            new_rows = w_rows - lr * grads / (jnp.sqrt(acc) + eps)
            return new_rows, {"acc": acc}, {}

        if k == "rowwise_adagrad":
            eps = float(c.get("eps", 1e-10))
            acc = srows["acc"] + _dim_mean(grads * grads, dim_psum_axis,
                                           full_dim, segs)
            dim = w_rows.shape[-1]
            acc_e = _seg_expand(acc, segs, dim)
            new_rows = w_rows - lr * grads / (jnp.sqrt(acc_e) + eps)
            return new_rows, {"acc": acc}, {}

        if k in ("adam", "partial_rowwise_adam"):
            b1 = float(c.get("beta1", 0.9))
            b2 = float(c.get("beta2", 0.999))
            eps = float(c.get("eps", 1e-8))
            step = scalar_state["step"] + 1
            m = b1 * srows["m"] + (1 - b1) * grads
            g2 = grads * grads
            if k == "partial_rowwise_adam":
                g2 = _dim_mean(g2, dim_psum_axis, full_dim, segs)
            v = b2 * srows["v"] + (1 - b2) * g2
            mh = m / (1 - b1 ** step.astype(jnp.float32))
            vh = v / (1 - b2 ** step.astype(jnp.float32))
            if k == "partial_rowwise_adam":
                vh = _seg_expand(vh, segs, w_rows.shape[-1])
            new_rows = w_rows - lr * mh / (jnp.sqrt(vh) + eps)
            return new_rows, {"m": m, "v": v}, {"step": step}

        if k in ("lamb", "partial_rowwise_lamb"):
            b1 = float(c.get("beta1", 0.9))
            b2 = float(c.get("beta2", 0.999))
            eps = float(c.get("eps", 1e-6))
            step = scalar_state["step"] + 1
            m = b1 * srows["m"] + (1 - b1) * grads
            g2 = grads * grads
            if k == "partial_rowwise_lamb":
                g2 = _dim_mean(g2, dim_psum_axis, full_dim, segs)
            v = b2 * srows["v"] + (1 - b2) * g2
            mh = m / (1 - b1 ** step.astype(jnp.float32))
            vh = v / (1 - b2 ** step.astype(jnp.float32))
            if k == "partial_rowwise_lamb":
                vh = _seg_expand(vh, segs, w_rows.shape[-1])
            upd = mh / (jnp.sqrt(vh) + eps)
            w_norm = _dim_norm(w_rows, dim_psum_axis, segs)
            u_norm = _dim_norm(upd, dim_psum_axis, segs)
            trust = jnp.where(
                (w_norm > 0) & (u_norm > 0), w_norm / (u_norm + 1e-12), 1.0
            )
            trust = _seg_expand(trust, segs, w_rows.shape[-1])
            new_rows = w_rows - lr * trust * upd
            return new_rows, {"m": m, "v": v}, {"step": step}

        if k == "lars_sgd":
            momentum = float(c.get("momentum", 0.9))
            eta = float(c.get("eta", 0.001))
            w_norm = _dim_norm(w_rows, dim_psum_axis, segs)
            g_norm = _dim_norm(grads, dim_psum_axis, segs)
            local_lr = jnp.where(
                (w_norm > 0) & (g_norm > 0),
                eta * w_norm / (g_norm + 1e-12),
                1.0,
            )
            local_lr = _seg_expand(local_lr, segs, w_rows.shape[-1])
            mom = momentum * srows["mom"] + local_lr * lr * grads
            return w_rows - mom, {"mom": mom}, {}

        if k == "adadelta":
            rho = float(c.get("rho", 0.95))
            eps = float(c.get("eps", 1e-6))
            acc = rho * srows["acc"] + (1 - rho) * grads * grads
            delta = jnp.sqrt(srows["delta_acc"] + eps) / jnp.sqrt(acc + eps) * grads
            dacc = rho * srows["delta_acc"] + (1 - rho) * delta * delta
            new_rows = w_rows - lr * delta
            return new_rows, {"acc": acc, "delta_acc": dacc}, {}

        if k == "rmsprop":
            alpha = float(c.get("alpha", 0.99))
            eps = float(c.get("eps", 1e-8))
            sq = alpha * srows["sq"] + (1 - alpha) * grads * grads
            new_rows = w_rows - lr * grads / (jnp.sqrt(sq) + eps)
            return new_rows, {"sq": sq}, {}

        raise ValueError(f"unknown sparse optimizer {self.kind}")

    # -- update (unpacked [rows, dim] tables) --------------------------------

    def apply(
        self,
        weight: jnp.ndarray,  # [rows, dim] fp32
        state: Params,
        uids: jnp.ndarray,  # [K] int32, OOB for padding
        grads: jnp.ndarray,  # [K, dim] fp32 (deduped row sums)
        lr: jnp.ndarray,  # scalar (schedule-scaled)
        dim_psum_axis: Optional[str] = None,  # set under column_wise
        full_dim: Optional[int] = None,  # global dim when column-sharded
        col_segments: Optional[Tuple[int, ...]] = None,
    ) -> Tuple[jnp.ndarray, Params]:
        dim = weight.shape[-1]
        widths = self.row_state_widths(dim, col_segments)
        w_rows = weight.at[uids].get(**_FILL_SORTED)
        srows = {
            name: state[name].at[uids].get(**_FILL_SORTED)
            for name, _ in widths
        }
        scalar = {k: v for k, v in state.items()
                  if k not in {n for n, _ in widths}}
        new_rows, new_srows, new_scalar = self.apply_rows(
            w_rows, srows, grads, lr, scalar,
            dim_psum_axis=dim_psum_axis, full_dim=full_dim,
            col_segments=col_segments,
        )
        new_state: Params = dict(new_scalar)
        for name, _ in widths:
            new_state[name] = state[name].at[uids].set(
                new_srows[name], **_DROP
            )
        return _set_rows(weight, uids, new_rows), new_state
