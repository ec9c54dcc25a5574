"""BF16 embedding-table storage (feature config data_type)."""

import jax
import jax.numpy as jnp
import numpy as np
from google.protobuf import text_format

from torcheasyrec_tpu.datasets.utils import SparseField
from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.modules.embedding import EmbeddingGroup
from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer
from torcheasyrec_tpu.protos import feature_pb2, model_pb2


def test_bf16_table_training():
    fc = text_format.Parse(
        """id_feature {
            feature_name: 'f' num_buckets: 64 embedding_dim: 16
            data_type: 'BF16'
        }""",
        feature_pb2.FeatureConfig(),
    )
    feats = create_features([fc])
    mc = text_format.Parse(
        'feature_groups { group_name: "deep" feature_names: "f" '
        'group_type: DEEP }',
        model_pb2.ModelConfig(),
    )
    eg = EmbeddingGroup(
        feats, list(mc.feature_groups),
        sparse_optimizer=SparseOptimizer("adagrad", {"lr": 0.5}),
    )
    tables = eg.init_tables(jax.random.key(0))
    (gk,) = tables.keys()
    assert "bf16" in gk
    assert tables[gk].dtype == jnp.bfloat16

    st = eg.init_opt_state()
    sparse = {"f": SparseField(values=jnp.arange(8).reshape(8, 1))}
    out, res = eg.engine.lookup(tables, sparse)
    key = next(iter(out))
    # update moves touched rows; storage stays bf16
    grads = {key: jnp.ones_like(out[key])}
    nt, _ = eg.engine.update(tables, st, res, grads, jnp.float32(1.0))
    assert nt[gk].dtype == jnp.bfloat16
    before = eg.engine.extract_table(tables, feats[0].emb_config().name)
    after = eg.engine.extract_table(nt, feats[0].emb_config().name)
    assert np.abs(
        after[:8].astype(np.float32) - before[:8].astype(np.float32)
    ).sum() > 0
    np.testing.assert_array_equal(after[8:], before[8:])
