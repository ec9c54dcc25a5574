"""Metric-regression benchmark harness.

Counterpart of /root/reference/tzrec/benchmark/benchmark.py (:30-57):
runs configs ``run_cnt`` times, compares eval metrics against labeled
baselines with thresholds, and prints BETTER/WORSE/BALANCE per metric
(the reference's weekly CI lane, SURVEY.md §4).

Baseline file format (mirrors base_eval_metric.json):
{
  "<config path>": {
    "run_cnt": 2,
    "metrics": {"auc": {"value": 0.784, "threshold": 0.003}}
  }
}
"""

import argparse
import json
import os
from typing import Dict

from torcheasyrec_tpu.utils.logging_util import logger

BETTER = "BETTER"
WORSE = "WORSE"
BALANCE = "BALANCE"


def compare(value: float, baseline: float, threshold: float) -> str:
    if value > baseline + threshold:
        return BETTER
    if value < baseline - threshold:
        return WORSE
    return BALANCE


_DEFAULT_DATA_ROOT = "/tmp/tzrec_bench_data"


def _retarget_config(config_path: str, data_root: str, tmp_dir: str) -> str:
    """Rewrite hardcoded default data-root paths when TZREC_BENCH_DATA
    points elsewhere (the shipped configs pin /tmp/tzrec_bench_data)."""
    if data_root == _DEFAULT_DATA_ROOT:
        return config_path
    with open(config_path) as f:
        text = f.read()
    if _DEFAULT_DATA_ROOT not in text:
        return config_path
    out = os.path.join(tmp_dir, os.path.basename(config_path))
    with open(out, "w") as f:
        f.write(text.replace(_DEFAULT_DATA_ROOT, data_root))
    return out


def run_benchmark(
    baseline_path: str,
    edit_config_json: str = None,
) -> Dict[str, Dict[str, str]]:
    import shutil
    import tempfile

    from torcheasyrec_tpu import main as tzrec_main

    data_root = os.environ.get("TZREC_BENCH_DATA", _DEFAULT_DATA_ROOT)
    with open(baseline_path) as f:
        baselines = json.load(f)
    report: Dict[str, Dict[str, str]] = {}
    for config_path, spec in baselines.items():
        run_cnt = int(spec.get("run_cnt", 1))
        if spec.get("synthetic_criteo"):
            # materialize the pinned-seed synthetic dataset the configs
            # point at (benchmark/synthetic.py)
            from torcheasyrec_tpu.benchmark import synthetic

            synthetic.ensure_dataset(data_root)
        if spec.get("synthetic_hstu"):
            from torcheasyrec_tpu.benchmark import synthetic

            synthetic.ensure_hstu_dataset(data_root)
        agg: Dict[str, float] = {}
        for i in range(run_cnt):
            # fresh model_dir per run: pinned labels assume
            # from-scratch training
            run_dir = tempfile.mkdtemp(prefix="tzrec_bench_")
            run_config = _retarget_config(config_path, data_root, run_dir)
            edits = dict(json.loads(edit_config_json)
                         if edit_config_json else {})
            edits["model_dir"] = run_dir
            try:
                result = tzrec_main.train_and_evaluate(
                    run_config, edit_config_json=json.dumps(edits)
                )
            finally:
                shutil.rmtree(run_dir, ignore_errors=True)
            for k, v in result.items():
                try:
                    agg[k] = agg.get(k, 0.0) + float(v)
                except (TypeError, ValueError):
                    pass
        agg = {k: v / run_cnt for k, v in agg.items()}
        verdicts = {}
        for mname, mspec in spec.get("metrics", {}).items():
            if mname not in agg:
                verdicts[mname] = "MISSING"
                continue
            verdicts[mname] = compare(
                agg[mname], float(mspec["value"]),
                float(mspec.get("threshold", 0.003)),
            )
            logger.info(
                f"{config_path} {mname}: {agg[mname]:.4f} vs "
                f"{mspec['value']} -> {verdicts[mname]}"
            )
        report[config_path] = verdicts
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--baseline_path", required=True)
    parser.add_argument("--edit_config_json", default=None)
    args = parser.parse_args()
    report = run_benchmark(args.baseline_path, args.edit_config_json)
    worse = [
        (c, m) for c, ms in report.items()
        for m, v in ms.items() if v in ("WORSE", "MISSING")
    ]
    raise SystemExit(1 if worse else 0)
