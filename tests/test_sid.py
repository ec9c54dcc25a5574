"""Semantic-ID model tests: RQ-VAE training + RQ-KMeans codebook fit."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SID_CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: "{model_dir}"
train_config {{
    sparse_optimizer {{ adagrad_optimizer {{ lr: 0.01 }}
                        constant_learning_rate {{}} }}
    dense_optimizer {{ adam_optimizer {{ lr: 0.005 }}
                       constant_learning_rate {{}} }}
    num_epochs: {epochs}
    save_checkpoints_steps: 100000
}}
data_config {{
    batch_size: 64
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
}}
feature_configs {{
    raw_feature {{ feature_name: "item_emb" value_dim: 16 }}
}}
model_config {{
    feature_groups {{ group_name: "all" feature_names: "item_emb"
                      group_type: DEEP }}
    {model}
    losses {{ recon_loss {{}} }}
    losses {{ commitment_loss {{}} }}
}}
"""


def _gen(tmp_path, n=512):
    rng = np.random.default_rng(0)
    # 8 well-separated clusters in 16-d
    centers = rng.normal(size=(8, 16)) * 4
    x = centers[rng.integers(0, 8, n)] + rng.normal(size=(n, 16)) * 0.3
    sep = chr(3)
    col = [sep.join(f"{v:.4f}" for v in row) for row in x]
    tbl = pa.table({
        "item_emb": pa.array(col),
        "label": pa.array(np.zeros(n, np.float32)),
    })
    train = os.path.join(tmp_path, "t.parquet")
    evalp = os.path.join(tmp_path, "e.parquet")
    pq.write_table(tbl.slice(0, n - 128), train)
    pq.write_table(tbl.slice(n - 128), evalp)
    return train, evalp


def test_sid_rqvae(tmp_path):
    tmp_path = str(tmp_path)
    train, evalp = _gen(tmp_path)
    cfg = SID_CONFIG.format(
        train=train, eval=evalp, model_dir=os.path.join(tmp_path, "m"),
        epochs=10,
        model="""sid_rqvae {
            embed_dim: 8
            hidden_dims: [32]
            codebook: [16, 16]
        }""",
    )
    cfg_path = os.path.join(tmp_path, "p.config")
    with open(cfg_path, "w") as f:
        f.write(cfg)
    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["unique_ratio"] > 0.05
    assert result["loss_recon_loss"] < 20.0  # reconstructing, not diverging


def test_sid_rqkmeans(tmp_path):
    tmp_path = str(tmp_path)
    train, evalp = _gen(tmp_path)
    cfg = SID_CONFIG.format(
        train=train, eval=evalp, model_dir=os.path.join(tmp_path, "m"),
        epochs=1,
        model="""sid_rqkmeans {
            codebook: [8, 8]
        }""",
    )
    cfg_path = os.path.join(tmp_path, "p.config")
    with open(cfg_path, "w") as f:
        f.write(cfg)
    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    # after the k-means fit, quantization error must be far below the
    # raw data variance (~16 * 16); clusters are separable
    assert result["loss_quant_error"] < 2.0, result
