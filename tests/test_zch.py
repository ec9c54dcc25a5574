"""Zero-collision-hash tests: remap stability, eviction, e2e training."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from google.protobuf import text_format

from torcheasyrec_tpu.parallel import zch


def test_zch_stable_remap():
    state = zch.init_state(64)
    cfg = zch.ZchConfig(size=64, policy="lfu")
    ids = jnp.asarray([100, 200, 300, 100, 200], jnp.int32)
    slots1, state = zch.lookup_insert(state, cfg, ids, jnp.int32(1), True)
    s = np.asarray(slots1)
    # same id -> same slot; different ids -> different slots
    assert s[0] == s[3] and s[1] == s[4]
    assert len({s[0], s[1], s[2]}) == 3
    # second batch maps the same ids to the same slots
    slots2, state = zch.lookup_insert(state, cfg, ids, jnp.int32(2), True)
    np.testing.assert_array_equal(np.asarray(slots2), s)
    # read-only eval path also matches
    slots3, _ = zch.lookup_insert(state, cfg, ids, jnp.int32(3), False)
    np.testing.assert_array_equal(np.asarray(slots3), s)


def test_zch_lfu_eviction_prefers_cold_slots():
    size = 8
    state = zch.init_state(size)
    cfg = zch.ZchConfig(size=size, policy="lfu")
    # fill the table with hot ids (3 accesses each)
    hot = jnp.arange(1000, 1000 + size, dtype=jnp.int32)
    for step in range(3):
        _, state = zch.lookup_insert(
            state, cfg, hot, jnp.int32(step), True
        )
    # one cold insert then a wave of new ids: evictions happen (keys
    # change) but the hottest ids' slots survive more often than not
    keys_before = np.asarray(state["keys"]).copy()
    new_ids = jnp.arange(5000, 5016, dtype=jnp.int32)
    _, state = zch.lookup_insert(state, cfg, new_ids, jnp.int32(5), True)
    keys_after = np.asarray(state["keys"])
    assert (keys_after != keys_before).any()  # some eviction happened
    # padding ids (-1) are ignored
    _, state2 = zch.lookup_insert(
        state, cfg, jnp.full((4,), -1, jnp.int32), jnp.int32(6), True
    )
    np.testing.assert_array_equal(
        np.asarray(state2["keys"]), np.asarray(state["keys"])
    )


def test_zch_end_to_end_training(tmp_path):
    """DeepFM with a zch id feature: ids live in a huge raw space."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp_path = str(tmp_path)
    rng = np.random.default_rng(0)
    n = 1024
    # raw ids drawn from a giant space but only 80 distinct values
    vocab = rng.integers(0, 2 ** 31 - 1, size=80)
    ids = vocab[rng.integers(0, 80, n)]
    latent = rng.normal(size=80)
    id_to_latent = {int(v): latent[i] for i, v in enumerate(vocab)}
    score = 2.5 * np.asarray([id_to_latent[int(i)] for i in ids])
    labels = (rng.random(n) < 1 / (1 + np.exp(-score))).astype(np.float32)
    tbl = pa.table({
        "raw_id": pa.array(ids.astype(np.int64)),
        "label": pa.array(labels),
    })
    train = os.path.join(tmp_path, "train.parquet")
    evalp = os.path.join(tmp_path, "eval.parquet")
    pq.write_table(tbl.slice(0, 768), train)
    pq.write_table(tbl.slice(768), evalp)

    cfg_text = f"""
train_input_path: "{train}"
eval_input_path: "{evalp}"
model_dir: "{tmp_path}/model"
train_config {{
    sparse_optimizer {{ adagrad_optimizer {{ lr: 0.1 }}
                        constant_learning_rate {{}} }}
    dense_optimizer {{ adam_optimizer {{ lr: 0.01 }}
                       constant_learning_rate {{}} }}
    num_epochs: 8
    save_checkpoints_steps: 10000
}}
data_config {{
    batch_size: 128
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
}}
feature_configs {{
    id_feature {{
        feature_name: "raw_id"
        embedding_dim: 8
        zch {{ zch_size: 128 lfu {{}} }}
    }}
}}
model_config {{
    feature_groups {{ group_name: "wide" feature_names: "raw_id"
                      group_type: WIDE }}
    feature_groups {{ group_name: "fm" feature_names: "raw_id"
                      group_type: DEEP }}
    feature_groups {{ group_name: "deep" feature_names: "raw_id"
                      group_type: DEEP }}
    deepfm {{ deep {{ hidden_units: [16] }} }}
    losses {{ binary_cross_entropy {{}} }}
    metrics {{ auc {{}} }}
}}
"""
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc"] > 0.75, result


def test_zch_frequency_admission():
    """Ids below the admission threshold map to -1 (zeros, no update)
    until their hashed counter reaches the threshold."""
    cfg = zch.ZchConfig(
        size=64, policy="lfu", admit_threshold=3, counter_size=256
    )
    state = zch.init_state(64, counter_size=256)
    ids = jnp.asarray([7, 8], jnp.int32)
    # batches 1-2: counts 1, 2 -> not admitted
    for step in (1, 2):
        slots, state = zch.lookup_insert(
            state, cfg, ids, jnp.int32(step), True
        )
        np.testing.assert_array_equal(np.asarray(slots), [-1, -1])
    # batch 3: count reaches 3 -> admitted, real slots assigned
    slots, state = zch.lookup_insert(state, cfg, ids, jnp.int32(3), True)
    s = np.asarray(slots)
    assert (s >= 0).all() and s[0] != s[1]
    # eval path does not bump counters
    st_before = np.asarray(state["admit_cnt"]).copy()
    _, state = zch.lookup_insert(state, cfg, ids, jnp.int32(4), False)
    np.testing.assert_array_equal(np.asarray(state["admit_cnt"]), st_before)


def test_zch_interval_eviction_gates_displacement():
    """With eviction_interval=4, a new id arriving when the table is
    full only displaces an occupied slot on sweep steps."""
    size = 8  # tiny table so probes saturate
    cfg = zch.ZchConfig(size=size, policy="lfu", eviction_interval=4)
    # construct a fully-occupied table directly (batch insertion can
    # leave holes from within-batch slot races)
    state = {
        "keys": jnp.arange(100, 100 + size, dtype=jnp.int32),
        "count": jnp.full((size,), 5.0, jnp.float32),
        "last": jnp.full((size,), 12, jnp.int32),
    }
    keys_full = np.asarray(state["keys"]).copy()
    # off-sweep step: the cold newcomer must NOT displace anyone
    cold = jnp.asarray([999], jnp.int32)
    _, state = zch.lookup_insert(state, cfg, cold, jnp.int32(13), True)
    np.testing.assert_array_equal(np.asarray(state["keys"]), keys_full)
    # sweep step: displacement happens
    _, state = zch.lookup_insert(state, cfg, cold, jnp.int32(16), True)
    assert 999 in np.asarray(state["keys"])


def test_zch_threshold_filtering_func():
    """Lambda over batch id counts filters singleton ids from insertion."""
    cfg = zch.ZchConfig(
        size=64, policy="lfu",
        filter_fn="lambda counts: counts >= 2",
    )
    state = zch.init_state(64)
    ids = jnp.asarray([5, 5, 6], jnp.int32)  # 6 appears once
    slots, state = zch.lookup_insert(state, cfg, ids, jnp.int32(1), True)
    keys = np.asarray(state["keys"])
    assert 5 in keys and 6 not in keys


def test_zch_shared_embedding_one_mapping():
    """Features sharing an embedding_name share ONE collision mapping:
    the same raw id must land on the same slot from either feature."""
    from google.protobuf import text_format

    from torcheasyrec_tpu.datasets.utils import Batch, SparseField
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.modules.embedding import EmbeddingGroup
    from torcheasyrec_tpu.protos import feature_pb2, model_pb2

    fcs = [
        text_format.Parse(t, feature_pb2.FeatureConfig()) for t in [
            """id_feature { feature_name: 'item' embedding_dim: 8
               embedding_name: 'item_emb' zch { zch_size: 64 lfu {} } }""",
            """id_feature { feature_name: 'click_item' embedding_dim: 8
               embedding_name: 'item_emb' zch { zch_size: 64 lfu {} } }""",
        ]
    ]
    feats = create_features(fcs)
    mc = text_format.Parse(
        """feature_groups { group_name: "g"
             feature_names: ["item", "click_item"] group_type: DEEP }""",
        model_pb2.ModelConfig(),
    )
    eg = EmbeddingGroup(feats, list(mc.feature_groups))
    states = eg.init_zch_states()
    assert set(states) == {"item_emb"}
    batch = Batch(
        sparse_features={
            "item": SparseField(values=jnp.asarray([[42], [7]])),
            "click_item": SparseField(values=jnp.asarray([[42], [99]])),
        },
    )
    new_batch, _ = eg.remap_zch(batch, states, jnp.int32(1), True)
    s_item = np.asarray(new_batch.sparse_features["item"].values)
    s_click = np.asarray(new_batch.sparse_features["click_item"].values)
    # raw id 42 -> same slot via both features
    assert s_item[0, 0] == s_click[0, 0]
    assert s_item[1, 0] != s_click[1, 0]
