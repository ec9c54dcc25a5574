"""ULTRA-HSTU (reference /root/reference/tzrec/models/ultra_hstu.py,
118 LoC): DlrmHSTU with a mixture of transducers — one STU stack per
configured ``hstu`` channel sharing one preprocessor, outputs averaged.
Semi-local attention / attention truncation ride on each channel's own
max_attn_len / min_full_attn_seq_len mask parameters."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.dlrm_hstu import DlrmHSTU
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.gr.stu import stu_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class _MixtureStack:
    """Averages the base stack's output with extra channels' outputs."""

    def __init__(self, base, extras):
        self.base = base
        self.extras = extras  # list of (stack, params)

    @property
    def num_layers(self):
        # truncation split indexes the BASE channel's layer count;
        # extra channels split at the same depth, clamped to their own
        return self.base.num_layers

    def __call__(self, p, x, lengths, ctx, num_targets=None,
                 scaling_seqlen=-1, start=0, end=None):
        def run(stack, sp):
            e = end if end is None else min(end, stack.num_layers)
            s0 = min(start, stack.num_layers)
            return stack(sp, x, lengths, ctx, num_targets,
                         scaling_seqlen, start=s0, end=e)

        outs = [run(self.base, p)]
        for st, sp in self.extras:
            outs.append(run(st, sp))
        return sum(outs) / len(outs)


class UltraHSTU(DlrmHSTU):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self.extra_stacks = []
        for hcfg in list(self._model_config.hstu)[1:]:
            stu_cfg = config_to_kwargs(hcfg.stu)
            assert int(stu_cfg["embedding_dim"]) == self._e, (
                "all UltraHSTU channels must share embedding_dim"
            )
            if not hcfg.stu.HasField("num_layers"):
                stu_cfg["num_layers"] = int(hcfg.attn_num_layers)
            st = stu_from_config(stu_cfg)
            # extra channels share the preprocessor's contextual prefix
            # (base stack gets this in DlrmHSTU.__init__)
            st.layer.contextual_seq_len = self.transducer.pre.n_ctx
            self.extra_stacks.append(st)

    def init_dense(self, key: jax.Array) -> M.Params:
        params = super().init_dense(key)
        params["extra_stacks"] = []
        for st in self.extra_stacks:
            key, sub = jax.random.split(key)
            params["extra_stacks"].append(st.init(sub))
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        if not self.extra_stacks:
            return super().predict(params, grouped, batch, ctx)
        orig = self.transducer.stack
        self.transducer.stack = _MixtureStack(
            orig, list(zip(self.extra_stacks, params["extra_stacks"]))
        )
        try:
            return super().predict(params, grouped, batch, ctx)
        finally:
            self.transducer.stack = orig
