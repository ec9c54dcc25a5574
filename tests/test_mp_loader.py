"""Multi-process data loader (datasets/mp_loader.py): worker processes
produce disjoint shards whose union equals the single-process stream,
and the full train pipeline runs on top of it.

Reference counterpart: torch DataLoader worker pool
(tzrec/datasets/dataset.py:753-852).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from google.protobuf import text_format

from torcheasyrec_tpu.datasets.dataset import create_dataloader
from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.protos import pipeline_pb2

CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: "{model_dir}"
train_config {{
    sparse_optimizer {{
        adagrad_optimizer {{ lr: 0.05 }}
        constant_learning_rate {{}}
    }}
    dense_optimizer {{
        adam_optimizer {{ lr: 0.002 }}
        constant_learning_rate {{}}
    }}
    num_epochs: 4
    save_checkpoints_steps: 1000
    log_step_count_steps: 50
}}
eval_config {{}}
data_config {{
    batch_size: 128
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
    num_workers: 2
}}
feature_configs {{
    id_feature {{ feature_name: "cat_a" num_buckets: 64 embedding_dim: 8 }}
}}
feature_configs {{
    raw_feature {{ feature_name: "num_a" }}
}}
model_config {{
    feature_groups {{
        group_name: "wide"
        feature_names: "cat_a"
        group_type: WIDE
    }}
    feature_groups {{
        group_name: "fm"
        feature_names: "cat_a"
        group_type: DEEP
    }}
    feature_groups {{
        group_name: "deep"
        feature_names: "cat_a"
        feature_names: "num_a"
        group_type: DEEP
    }}
    deepfm {{
        deep {{ hidden_units: [32, 16] }}
        final {{ hidden_units: [16] }}
        wide_embedding_dim: 4
    }}
    num_class: 1
    metrics {{ auc {{}} }}
    losses {{ binary_cross_entropy {{}} }}
}}
"""


def _write_data(path, n, seed=0, row_group_size=256):
    rng = np.random.default_rng(seed)
    cat = rng.integers(0, 64, n)
    num = rng.normal(size=n).astype(np.float32)
    logits = (cat % 7 - 3) * 0.5 + num
    label = (logits + rng.normal(scale=0.3, size=n) > 0).astype(np.float32)
    # row_key: unique per row so shard disjointness is checkable
    tbl = pa.table(
        {
            "cat_a": pa.array(cat),
            "num_a": pa.array(num),
            "label": pa.array(label),
            "row_key": pa.array(np.arange(n, dtype=np.float32)),
        }
    )
    pq.write_table(tbl, path, row_group_size=row_group_size)


def _cfg(tmp_path):
    tmp_path = str(tmp_path)
    text = CONFIG.format(
        train=os.path.join(tmp_path, "train.parquet"),
        eval=os.path.join(tmp_path, "eval.parquet"),
        model_dir=os.path.join(tmp_path, "model"),
    )
    cfg = text_format.Parse(text, pipeline_pb2.EasyRecConfig())
    path = os.path.join(tmp_path, "pipeline.config")
    with open(path, "w") as f:
        f.write(text)
    return path, cfg


def test_mp_loader_union_matches_single_stream(tmp_path):
    cfg_path, cfg = _cfg(tmp_path)
    _write_data(os.path.join(str(tmp_path), "train.parquet"), 1024)
    _write_data(os.path.join(str(tmp_path), "eval.parquet"), 256, seed=1)
    features = create_features(list(cfg.feature_configs))
    # label_fields carries the row key through as a label so each
    # consumed row is identifiable
    dc = cfg.data_config
    dc.label_fields.append("row_key")
    dc.drop_remainder = False

    def _collect(num_workers_field):
        if num_workers_field is None:
            dc.ClearField("num_workers")
        else:
            dc.num_workers = num_workers_field
        dl = create_dataloader(
            dc, features, os.path.join(str(tmp_path), "train.parquet"),
            mode="eval",
        )
        keys = []
        n_batches = 0
        for batch, info in dl():
            hb = getattr(batch, "host_batch", None) or batch
            keys.extend(np.asarray(hb.labels["row_key"]).tolist())
            n_batches += 1
        return keys, n_batches

    mp_keys, mp_batches = _collect(2)
    single_keys, _ = _collect(None)
    assert len(mp_keys) == len(single_keys) == 1024
    assert sorted(mp_keys) == sorted(single_keys)
    assert mp_batches >= 2


def test_mp_loader_train_end_to_end(tmp_path):
    cfg_path, cfg = _cfg(tmp_path)
    _write_data(os.path.join(str(tmp_path), "train.parquet"), 4096)
    _write_data(os.path.join(str(tmp_path), "eval.parquet"), 1024, seed=1)

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc"] > 0.65, f"AUC too low with mp loader: {result}"


def test_mp_loader_worker_error_propagates(tmp_path):
    from torcheasyrec_tpu.datasets.mp_loader import MpBatchLoader

    def _factory(w):
        def _gen():
            raise ValueError("boom in worker")
            yield  # pragma: no cover

        return _gen()

    loader = MpBatchLoader(_factory, 2)
    try:
        import pytest

        with pytest.raises(RuntimeError, match="boom in worker"):
            next(loader)
    finally:
        loader.close()


def test_mp_loader_spawn_start_method(tmp_path, monkeypatch):
    """Spawn workers (fresh interpreters; the production mode whenever
    the TPU client is live in the parent) produce the same row union as
    the single-process stream — requires the dataset factory and every
    captured object (protos, features, sampler state) to pickle."""
    monkeypatch.setenv("TZREC_MP_START", "spawn")
    cfg_path, cfg = _cfg(tmp_path)
    _write_data(os.path.join(str(tmp_path), "train.parquet"), 1024)
    features = create_features(list(cfg.feature_configs))
    dc = cfg.data_config
    dc.label_fields.append("row_key")
    dc.drop_remainder = False
    dc.num_workers = 2
    dl = create_dataloader(
        dc, features, os.path.join(str(tmp_path), "train.parquet"),
        mode="eval",
    )
    keys = []
    for batch, info in dl():
        hb = getattr(batch, "host_batch", None) or batch
        keys.extend(np.asarray(hb.labels["row_key"]).tolist())
    assert sorted(keys) == list(map(float, range(1024)))


def test_mp_loader_dead_worker_raises(tmp_path):
    """A worker dying without reporting (the spawn-without-__main__-
    guard failure mode) must raise, not block the consumer forever."""
    from torcheasyrec_tpu.datasets.mp_loader import MpBatchLoader

    def _factory(w):
        os._exit(3)  # simulate a hard crash before any message

    loader = MpBatchLoader(_factory, 2)
    try:
        import pytest

        with pytest.raises(RuntimeError, match="died without reporting"):
            next(loader)
    finally:
        loader.close()


def test_mp_loader_deferred_on_resume(tmp_path):
    """A mid-epoch resume watermark is single-stream: the resumed
    epoch's iterator must be the thread loader (workers would skip a
    slower worker's unread rows); the NEXT epoch re-enables workers."""
    from torcheasyrec_tpu.datasets.dataset import PrefetchIterator
    from torcheasyrec_tpu.datasets.mp_loader import MpBatchLoader

    cfg_path, cfg = _cfg(tmp_path)
    _write_data(os.path.join(str(tmp_path), "train.parquet"), 1024)
    features = create_features(list(cfg.feature_configs))
    dc = cfg.data_config
    dc.num_workers = 2
    dl = create_dataloader(
        dc, features, os.path.join(str(tmp_path), "train.parquet"),
        mode="eval", resume_state={0: 256},
    )
    first = dl()
    assert isinstance(first, PrefetchIterator)
    n_resumed = sum(1 for _ in first)
    second = dl()
    assert isinstance(second, MpBatchLoader)
    n_fresh = sum(1 for _ in second)
    assert n_fresh > n_resumed  # fresh epoch reads from the start


def test_mp_loader_oversized_batch_queue_fallback():
    """A batch whose wire outgrows the shm slot (sized 2x the first
    batch, >= 1MB floor) must arrive intact via the queue fallback."""
    from torcheasyrec_tpu.datasets.mp_loader import MpBatchLoader
    from torcheasyrec_tpu.datasets.utils import BatchInfo

    def _factory(w):
        def _gen():
            yield {"x": np.arange(10, dtype=np.float32)}, BatchInfo()
            # > 1MB wire: exceeds the slot floor -> "big" path
            yield {"x": np.arange(400_000, dtype=np.float32)}, BatchInfo()
            yield {"x": np.arange(7, dtype=np.float32)}, BatchInfo()

        return _gen()

    loader = MpBatchLoader(_factory, 1)
    sizes = []
    for packed, info in loader:
        x = packed.host_batch["x"]
        sizes.append(x.size)
        np.testing.assert_array_equal(
            np.asarray(x), np.arange(x.size, dtype=np.float32)
        )
    assert sizes == [10, 400_000, 7]


def test_unify_spec_stabilizes_cross_worker_kinds():
    """Two workers packing the same pytree can pick different int wire
    dtypes (their sticky envelopes see different ids); unify_spec must
    converge them to one spec, preserving values."""
    import numpy as np

    from torcheasyrec_tpu.datasets import pack as pack_mod
    from torcheasyrec_tpu.datasets.pack import pack_batch, unify_spec, unpack_batch

    def _pack_fresh(ids):
        # fresh envelope state = a separate worker process
        saved = dict(pack_mod._ENVELOPES)
        pack_mod._ENVELOPES.clear()
        try:
            return pack_batch({"ids": ids, "x": np.float32([1.5, 2.5])})
        finally:
            pack_mod._ENVELOPES.clear()
            pack_mod._ENVELOPES.update(saved)

    small = _pack_fresh(np.int64([1, 2, 3]))       # fits i8/i16
    big = _pack_fresh(np.int64([1, 70_000, 3]))    # needs i32
    assert small.spec != big.spec

    state: dict = {}
    u1 = unify_spec(small, state)
    u2 = unify_spec(big, state)
    u3 = unify_spec(_pack_fresh(np.int64([4, 5, 6])), state)
    assert u2.spec == u3.spec  # stable from the widest batch onward

    for u, ids in ((u1, [1, 2, 3]), (u2, [1, 70_000, 3]), (u3, [4, 5, 6])):
        got = unpack_batch(u)
        np.testing.assert_array_equal(np.asarray(got["ids"]), ids)
        np.testing.assert_allclose(np.asarray(got["x"]), [1.5, 2.5])
        assert np.asarray(got["ids"]).dtype == np.int32
