"""Dense/sparse optimizer builders.

Counterpart of /root/reference/tzrec/optim/optimizer_builder.py
(create_sparse_optimizer:30, create_dense_optimizer:100,
create_part_optimizer:139, regex param groups :219-255). Dense
optimizers are optax chains with an injected schedule multiplier;
regex-scoped part-optimizers compose via optax.masked over param paths.
BatchNorm running stats (paths ending mean/var under a bn node) are
excluded from optimization (they update via ctx.state_updates).
"""

import re
from typing import Any, Dict, List, Tuple

import jax
import optax

from torcheasyrec_tpu.optim.lr_scheduler import create_lr_scheduler
from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


def create_sparse_optimizer(sparse_optimizer_config) -> Tuple[SparseOptimizer, Dict]:
    """SparseOptimizer proto -> (SparseOptimizer, lr schedule dict)."""
    which = sparse_optimizer_config.WhichOneof("optimizer")
    cfg = config_to_kwargs(getattr(sparse_optimizer_config, which))
    opt = SparseOptimizer(which.replace("_optimizer", ""), cfg)
    sched = create_lr_scheduler(sparse_optimizer_config, opt.base_lr)
    return opt, sched


def _make_optax(kind: str, cfg: Dict[str, Any]) -> optax.GradientTransformation:
    lr = float(cfg.get("lr", 0.002))
    wd = float(cfg.get("weight_decay", 0.0))
    if kind == "sgd_optimizer":
        mom = float(cfg.get("momentum", 0.9))
        tx = optax.sgd(
            lr, momentum=mom if mom > 0 else None,
            nesterov=bool(cfg.get("nesterov", False)),
        )
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx
    if kind == "adagrad_optimizer":
        return optax.adagrad(
            lr,
            initial_accumulator_value=float(
                cfg.get("initial_accumulator_value", 0.0)
            ),
            eps=float(cfg.get("eps", 1e-10)),
        )
    if kind == "adam_optimizer":
        tx = optax.adam(
            lr, b1=float(cfg.get("beta1", 0.9)),
            b2=float(cfg.get("beta2", 0.999)),
            eps=float(cfg.get("eps", 1e-8)),
        )
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx
    if kind == "adamw_optimizer":
        return optax.adamw(
            lr, b1=float(cfg.get("beta1", 0.9)),
            b2=float(cfg.get("beta2", 0.999)),
            eps=float(cfg.get("eps", 1e-8)),
            weight_decay=wd,
        )
    if kind == "adadelta_optimizer":
        return optax.adadelta(
            lr, rho=float(cfg.get("rho", 0.95)),
            eps=float(cfg.get("eps", 1e-6)),
        )
    if kind == "rmsprop_optimizer":
        return optax.rmsprop(
            lr, decay=float(cfg.get("alpha", 0.99)),
            eps=float(cfg.get("eps", 1e-8)),
        )
    raise ValueError(f"unknown dense optimizer {kind}")


def _param_paths(params) -> List[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return ["/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in flat]


def _is_bn_stat(path_str: str) -> bool:
    parts = path_str.split("/")
    return len(parts) >= 2 and parts[-1] in ("mean", "var") and (
        "bn" in parts[-2]
    )


def _mask_from_predicate(params, pred):
    flat, tree = jax.tree_util.tree_flatten_with_path(params)
    mask_leaves = []
    for path, _ in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        mask_leaves.append(bool(pred(p)))
    return jax.tree_util.tree_unflatten(tree, mask_leaves)


def create_dense_optimizer(
    dense_optimizer_config, params
) -> Tuple[optax.GradientTransformation, Dict]:
    """DenseOptimizer proto + params pytree -> (optax tx, lr schedule)."""
    which = dense_optimizer_config.WhichOneof("optimizer")
    cfg = config_to_kwargs(getattr(dense_optimizer_config, which))
    base_lr = float(cfg.get("lr", 0.002))
    sched = create_lr_scheduler(dense_optimizer_config, base_lr)

    part_cfgs = list(getattr(dense_optimizer_config, "part_optimizers", []))
    part_patterns = [re.compile(p.regex_pattern) for p in part_cfgs]

    def in_any_part(path: str) -> bool:
        return any(pat.search(path) for pat in part_patterns)

    txs = []
    # main optimizer: all trainable params not matched by part optimizers
    main_mask = _mask_from_predicate(
        params, lambda p: (not _is_bn_stat(p)) and (not in_any_part(p))
    )
    txs.append(optax.masked(_make_optax(which, cfg), main_mask))

    for pc, pat in zip(part_cfgs, part_patterns):
        pwhich = pc.WhichOneof("optimizer")
        pcfg = config_to_kwargs(getattr(pc, pwhich))
        mask = _mask_from_predicate(
            params,
            lambda p, pat=pat: (not _is_bn_stat(p)) and bool(pat.search(p)),
        )
        txs.append(optax.masked(_make_optax(pwhich, pcfg), mask))

    tx = optax.chain(*txs) if len(txs) > 1 else txs[0]
    return tx, sched


def create_grad_clipper(grad_clipping_config):
    """GradClipping proto -> optax transform or None."""
    if grad_clipping_config is None:
        return None
    ct = grad_clipping_config.clipping_type
    mg = float(grad_clipping_config.max_gradient)
    if ct == "norm":
        return optax.clip_by_global_norm(mg)
    if ct == "value":
        return optax.clip(mg)
    return None
