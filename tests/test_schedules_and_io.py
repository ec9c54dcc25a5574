"""Direct unit coverage: LR schedules, CSV reader, fg.json emit.

Reference counterparts: tzrec/optim/lr_scheduler_test.py,
tzrec/datasets/csv_dataset_test.py, tzrec/tools/create_fg_json.py.
"""

import math
import os

import numpy as np
import pytest
from google.protobuf import text_format

from torcheasyrec_tpu.optim.lr_scheduler import create_lr_scheduler
from torcheasyrec_tpu.protos import optimizer_pb2

# ------------------------------------------------------------- schedules


def _sched(txt, base_lr=0.1):
    cfg = text_format.Parse(
        f"adagrad_optimizer {{ lr: {base_lr} }}\n{txt}",
        optimizer_pb2.SparseOptimizer(),
    )
    return create_lr_scheduler(cfg, base_lr)


def test_exponential_decay_staircase_and_min():
    s = _sched("""exponential_decay_learning_rate {
        decay_size: 10 decay_factor: 0.5 staircase: true
        min_learning_rate: 0.02 }""")
    f = s["fn"]
    assert float(f(0)) == pytest.approx(1.0)
    assert float(f(9)) == pytest.approx(1.0)  # staircase: floor(9/10)=0
    assert float(f(10)) == pytest.approx(0.5)
    assert float(f(25)) == pytest.approx(0.25)
    # min_learning_rate 0.02 / base 0.1 -> ratio floor 0.2
    assert float(f(1000)) == pytest.approx(0.2)


def test_exponential_decay_warmup():
    s = _sched("""exponential_decay_learning_rate {
        decay_size: 10 decay_factor: 0.5
        warmup_learning_rate: 0.01 warmup_size: 4 }""")
    f = s["fn"]
    # warmup ramps from warmup_lr/base = 0.1 to 1.0 over 4 steps
    assert float(f(0)) == pytest.approx(0.1)
    assert float(f(2)) == pytest.approx(0.1 + 0.9 * 0.5)
    # decay restarts AFTER warmup: t = step - warmup_size
    assert float(f(4)) == pytest.approx(1.0)
    assert float(f(14)) == pytest.approx(0.5)


def test_manual_step_boundaries():
    s = _sched("""manual_step_learning_rate {
        schedule_sizes: [5, 5] learning_rates: [0.05, 0.01] }""")
    f = s["fn"]
    assert float(f(4)) == pytest.approx(1.0)
    assert float(f(5)) == pytest.approx(0.5)  # 0.05/0.1
    assert float(f(10)) == pytest.approx(0.1)  # 0.01/0.1
    assert float(f(99)) == pytest.approx(0.1)


def test_cosine_annealing():
    s = _sched("""cosine_annealing_learning_rate {
        T_max: 10 min_learning_rate: 0.01 }""")
    f = s["fn"]
    assert float(f(0)) == pytest.approx(1.0)
    mid = 0.1 + (1 - 0.1) * 0.5 * (1 + math.cos(math.pi * 0.5))
    assert float(f(5)) == pytest.approx(mid, rel=1e-5)
    assert float(f(10)) == pytest.approx(0.1, rel=1e-5)
    assert float(f(50)) == pytest.approx(0.1, rel=1e-5)  # clipped at T_max


@pytest.mark.parametrize("t_mult", [1, 2])
def test_cosine_warm_restarts_closed_form(t_mult):
    """The closed-form restart index must match a naive per-step loop."""
    t0 = 4
    s = _sched(f"""cosine_annealing_warm_restarts_learning_rate {{
        T_0: {t0} T_mult: {t_mult} }}""")
    f = s["fn"]

    def naive(step):
        t_i, t_cur = t0, step
        while t_cur >= t_i:
            t_cur -= t_i
            t_i *= t_mult
        return 0.5 * (1 + math.cos(math.pi * t_cur / t_i))

    for step in range(0, 40):
        assert float(f(step)) == pytest.approx(
            naive(step), rel=1e-4, abs=1e-5
        ), f"step {step}"


# ------------------------------------------------------------ csv reader


def _write_csv(path, rows, header=None):
    with open(path, "w") as f:
        if header:
            f.write(header + "\n")
        for r in rows:
            f.write(r + "\n")


def test_csv_reader_with_header(tmp_path):
    from torcheasyrec_tpu.datasets.csv_dataset import CsvReader

    p = str(tmp_path / "a.csv")
    _write_csv(p, [f"{i},{i * 0.5},u{i}" for i in range(10)],
               header="id,score,name")
    r = CsvReader(p, batch_size=4, with_header=True)
    batches = list(r.to_batches())
    total = sum(len(b["id"]) for b in batches)
    assert total == 10
    assert batches[0]["id"].to_pylist()[:3] == [0, 1, 2]
    assert batches[0]["name"].to_pylist()[0] == "u0"


def test_csv_reader_headerless_with_fields_and_glob(tmp_path):
    from torcheasyrec_tpu.datasets.csv_dataset import CsvReader

    for fi in range(2):
        _write_csv(str(tmp_path / f"part-{fi}.csv"),
                   [f"{fi * 10 + i},{i}.5" for i in range(5)])
    from torcheasyrec_tpu.protos import data_pb2

    fields = []
    for name, ftype in (("uid", data_pb2.FieldType.INT64),
                        ("val", data_pb2.FieldType.FLOAT)):
        fld = data_pb2.Field()
        fld.input_name = name
        fld.input_type = ftype
        fields.append(fld)
    r = CsvReader(
        str(tmp_path / "part-*.csv"), batch_size=100, input_fields=fields,
    )
    rows = []
    for b in r.to_batches():
        rows += b["uid"].to_pylist()
    assert sorted(rows) == list(range(5)) + list(range(10, 15))

    with pytest.raises(FileNotFoundError):
        CsvReader(str(tmp_path / "missing-*.csv"), batch_size=4)


def test_csv_reader_resume_state(tmp_path):
    from torcheasyrec_tpu.datasets.csv_dataset import CsvReader
    from torcheasyrec_tpu.datasets.utils import CKPT_ROW_IDX

    p = str(tmp_path / "a.csv")
    _write_csv(p, [f"{i}" for i in range(20)], header="id")
    r1 = CsvReader(p, batch_size=8, with_header=True)
    b1 = next(iter(r1.to_batches()))
    last = int(b1[CKPT_ROW_IDX].to_pylist()[-1])
    r2 = CsvReader(p, batch_size=8, with_header=True)
    r2.load_state({0: last})
    b2 = next(iter(r2.to_batches()))
    # resume continues at the next unread row
    assert b2["id"].to_pylist()[0] == last + 1


# ------------------------------------------------------------- fg.json


def test_create_fg_json_roundtrip(tmp_path):
    from torcheasyrec_tpu.features import create_features, create_fg_json
    from torcheasyrec_tpu.protos import feature_pb2
    from torcheasyrec_tpu.protos.data_pb2 import FgMode

    cfgs = [text_format.Parse(t, feature_pb2.FeatureConfig()) for t in [
        """id_feature { feature_name: 'uid' expression: 'user:uid'
           hash_bucket_size: 1000 embedding_dim: 16 }""",
        """raw_feature { feature_name: 'price' expression: 'item:price'
           normalizer: 'method=log10,threshold=1e-10,default=-10' }""",
        """combo_feature { feature_name: 'cx'
           expression: ['user:a', 'item:b'] hash_bucket_size: 50
           embedding_dim: 8 }""",
    ]]
    feats = create_features(cfgs, fg_mode=FgMode.FG_NORMAL)
    fg = create_fg_json(feats)
    by = {f["feature_name"]: f for f in fg["features"]}
    assert by["uid"]["feature_type"] == "id_feature"
    assert by["uid"]["hash_bucket_size"] == 1000
    assert by["uid"]["expression"] == "user:uid"
    assert by["price"]["normalizer"].startswith("method=log10")
    assert by["cx"]["feature_type"] == "combo_feature"

    # the emitted fg.json drives the TF-EasyRec converter back into a
    # parseable config (serving contract round-trip)
    from torcheasyrec_tpu.tools.convert_easyrec_config import convert
    from torcheasyrec_tpu.utils import config_util

    converted, _ = convert(
        'model_config { model_class: "DeepFM" '
        'feature_groups { group_name: "deep" feature_names: "uid" '
        'wide_deep: DEEP } '
        'feature_groups { group_name: "wide" feature_names: "uid" '
        'wide_deep: WIDE } }'
        "\ndata_config { batch_size: 16 label_fields: 'y' }",
        fg,
    )
    out = str(tmp_path / "rt.config")
    with open(out, "w") as f:
        f.write(converted)
    cfg = config_util.load_pipeline_config(out)
    assert len(cfg.feature_configs) == 3
