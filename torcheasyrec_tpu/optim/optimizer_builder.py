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


def _owner_index(path: str, part_patterns) -> int:
    """0 = main optimizer; i+1 = first part whose regex fullmatches
    (reference group_param_by_regex_pattern:222-241: re.fullmatch,
    first match wins)."""
    for i, pat in enumerate(part_patterns):
        if pat.fullmatch(path):
            return i + 1
    return 0


def create_dense_optimizer(
    dense_optimizer_config, params
) -> Tuple[optax.GradientTransformation, Dict]:
    """DenseOptimizer proto + params pytree -> (optax tx, lr schedule).

    With part_optimizers, each part may carry its OWN learning_rate
    oneof; a part without one inherits the main schedule config
    (reference create_part_optim_schedulers:179-218). The returned
    schedule dict's ``fn(step, epoch)`` yields a scalar multiplier, or
    — when per-part schedules exist — a params-shaped pytree of
    per-leaf multipliers (``per_part`` = True).
    """
    import jax.numpy as jnp

    which = dense_optimizer_config.WhichOneof("optimizer")
    cfg = config_to_kwargs(getattr(dense_optimizer_config, which))
    base_lr = float(cfg.get("lr", 0.002))
    main_sched = create_lr_scheduler(dense_optimizer_config, base_lr)

    part_cfgs = list(getattr(dense_optimizer_config, "part_optimizers", []))
    part_patterns = [re.compile(p.regex_pattern) for p in part_cfgs]

    flat, tree = jax.tree_util.tree_flatten_with_path(params)
    paths = ["/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in flat]
    owners = [_owner_index(p, part_patterns) for p in paths]
    bn = [_is_bn_stat(p) for p in paths]

    txs = []
    scheds = [main_sched]
    main_mask = jax.tree_util.tree_unflatten(
        tree, [o == 0 and not b for o, b in zip(owners, bn)]
    )
    txs.append(optax.masked(_make_optax(which, cfg), main_mask))
    for i, pc in enumerate(part_cfgs):
        pwhich = pc.WhichOneof("optimizer")
        pcfg = config_to_kwargs(getattr(pc, pwhich))
        mask = jax.tree_util.tree_unflatten(
            tree, [o == i + 1 and not b for o, b in zip(owners, bn)]
        )
        txs.append(optax.masked(_make_optax(pwhich, pcfg), mask))
        # per-part schedule: own learning_rate oneof, else the main
        # schedule config re-scaled against the part's base lr
        part_base = float(pcfg.get("lr", 0.002))
        if pc.WhichOneof("learning_rate") is not None:
            scheds.append(create_lr_scheduler(pc, part_base))
        else:
            scheds.append(
                create_lr_scheduler(dense_optimizer_config, part_base)
            )
    tx = optax.chain(*txs) if len(txs) > 1 else txs[0]

    per_part = len(part_cfgs) > 0 and any(
        pc.WhichOneof("learning_rate") is not None for pc in part_cfgs
    )

    def fn(step, epoch=None):
        def t_for(s):
            # by_epoch schedules step once per epoch (reference
            # lr_scheduler.py by_epoch contract)
            return epoch if (s["by_epoch"] and epoch is not None) else step

        if not per_part:
            return main_sched["fn"](t_for(main_sched))
        vals = [s["fn"](t_for(s)) for s in scheds]
        leaves = [
            jnp.float32(0.0) if b else vals[o]
            for o, b in zip(owners, bn)
        ]
        return jax.tree_util.tree_unflatten(tree, leaves)

    return tx, {
        "fn": fn,
        "by_epoch": main_sched["by_epoch"],
        "per_part": per_part,
    }


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
