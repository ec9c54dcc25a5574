"""Convert TF-EasyRec configs to torcheasyrec_tpu configs.

Counterpart of /root/reference/tzrec/tools/
convert_easyrec_config_to_tzrec_config.py (1012 LoC). Since the TF
EasyRec proto schema is not a dependency here, the converter parses the
text format generically (a proto text config is just `key: value` +
`key { ... }` blocks) and maps the common vocabulary: input paths,
data_config, feature_config.features (IdFeature/RawFeature/TagFeature/
SequenceFeature), model_config feature groups + the shared model
families, and train_config optimizers. Unmapped fields are reported so
the user can finish by hand — same contract as the reference tool.
"""

import argparse
from typing import Any, Dict, List, Tuple, Union

Node = Dict[str, List[Union[str, "Node"]]]


def parse_text_proto(text: str) -> Node:
    """Generic text-format parser -> nested dict of repeated values."""
    pos = 0
    tokens: List[str] = []
    import re

    for m in re.finditer(
        r"\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'|[{}:]|[^\s{}:]+", text
    ):
        tokens.append(m.group(0))
    # strip comments
    tokens = [t for t in tokens if not t.startswith("#")]

    def _parse_block(i: int) -> Tuple[Node, int]:
        node: Node = {}
        while i < len(tokens):
            t = tokens[i]
            if t == "}":
                return node, i + 1
            key = t
            i += 1
            if i < len(tokens) and tokens[i] == ":":
                i += 1
                val = tokens[i]
                i += 1
                if val == "{":
                    sub, i = _parse_block(i)
                    node.setdefault(key, []).append(sub)
                else:
                    node.setdefault(key, []).append(val.strip("'\""))
            elif i < len(tokens) and tokens[i] == "{":
                sub, i = _parse_block(i + 1)
                node.setdefault(key, []).append(sub)
            else:
                node.setdefault(key, []).append("true")
        return node, i

    node, _ = _parse_block(0)
    return node


def _one(node: Node, key: str, default=None):
    v = node.get(key)
    return v[0] if v else default


_FEATURE_TYPE_MAP = {
    "IdFeature": "id_feature",
    "TagFeature": "id_feature",  # multi-value id
    "RawFeature": "raw_feature",
    "ComboFeature": "combo_feature",
    "LookupFeature": "lookup_feature",
    "SequenceFeature": "sequence_id_feature",
    "ExprFeature": "expr_feature",
}

_MODEL_CLASS_MAP = {
    "DeepFM": "deepfm",
    "WideAndDeep": "wide_and_deep",
    "MultiTower": "multi_tower",
    "DCN": "dcn_v1",
    "DSSM": "dssm",
    "MMoE": "mmoe",
    "DBMTL": "dbmtl",
    "PLE": "ple",
    "SimpleMultiTask": "simple_multi_task",
    "MaskNet": "mask_net",
}


def convert(text: str) -> Tuple[str, List[str]]:
    src = parse_text_proto(text)
    out: List[str] = []
    warnings: List[str] = []

    for key in ("train_input_path", "eval_input_path", "model_dir"):
        v = _one(src, key)
        if v:
            out.append(f'{key}: "{v}"')

    # train_config
    tc = _one(src, "train_config", {})
    out.append("train_config {")
    out.append("    sparse_optimizer {")
    out.append("        adagrad_optimizer { lr: 0.001 }")
    out.append("        constant_learning_rate {}")
    out.append("    }")
    out.append("    dense_optimizer {")
    out.append("        adam_optimizer { lr: 0.001 }")
    out.append("        constant_learning_rate {}")
    out.append("    }")
    for k in ("num_steps", "save_checkpoints_steps", "log_step_count_steps"):
        v = _one(tc, k)
        if v:
            out.append(f"    {k}: {v}")
    if tc.get("optimizer_config"):
        warnings.append(
            "train_config.optimizer_config: review converted optimizers "
            "(defaults used: adagrad sparse / adam dense @ 0.001)"
        )
    out.append("}")
    out.append("eval_config {}")

    # data_config
    dc = _one(src, "data_config", {})
    out.append("data_config {")
    out.append(f"    batch_size: {_one(dc, 'batch_size', 1024)}")
    out.append("    dataset_type: ParquetDataset")
    out.append("    fg_mode: FG_NONE")
    for lbl in dc.get("label_fields", []):
        out.append(f'    label_fields: "{lbl}"')
    out.append("}")
    if _one(dc, "input_type"):
        warnings.append(
            f"data_config.input_type {_one(dc, 'input_type')}: converted "
            "to ParquetDataset; re-export your data to parquet"
        )

    # features
    emb_dims: Dict[str, str] = {}
    for fc_block in src.get("feature_config", src.get("feature_configs", [])):
        if isinstance(fc_block, str):
            continue
        for feat in fc_block.get("features", [fc_block]):
            if isinstance(feat, str):
                continue
            ftype = _one(feat, "feature_type", "IdFeature")
            mapped = _FEATURE_TYPE_MAP.get(ftype)
            if mapped is None:
                warnings.append(f"unsupported feature_type {ftype}; skipped")
                continue
            name = _one(feat, "input_names", _one(feat, "feature_name", "f"))
            lines = [f"feature_configs {{", f"    {mapped} {{",
                     f'        feature_name: "{name}"']
            dim = _one(feat, "embedding_dim")
            if dim and mapped != "raw_feature":
                lines.append(f"        embedding_dim: {dim}")
                emb_dims[name] = dim
            for k in ("hash_bucket_size", "num_buckets"):
                v = _one(feat, k)
                if v:
                    lines.append(f"        {k}: {v}")
            bl = feat.get("boundaries", [])
            if bl:
                lines.append(
                    "        boundaries: ["
                    + ", ".join(str(b) for b in bl) + "]"
                )
            if ftype == "SequenceFeature":
                lines.append(
                    f"        sequence_length: "
                    f"{_one(feat, 'sequence_length', 50)}"
                )
            lines += ["    }", "}"]
            out.extend(lines)

    # model_config
    mc = _one(src, "model_config", {})
    model_class = _one(mc, "model_class", "")
    mapped_model = _MODEL_CLASS_MAP.get(model_class)
    out.append("model_config {")
    for g in mc.get("feature_groups", []):
        if isinstance(g, str):
            continue
        gname = _one(g, "group_name", "deep")
        wide_deep = (_one(g, "wide_deep", "DEEP") or "DEEP").upper()
        gtype = "WIDE" if wide_deep == "WIDE" else "DEEP"
        out.append("    feature_groups {")
        out.append(f'        group_name: "{gname}"')
        for fn in g.get("feature_names", []):
            out.append(f'        feature_names: "{fn}"')
        out.append(f"        group_type: {gtype}")
        out.append("    }")
    if mapped_model:
        out.append(f"    {mapped_model} {{")
        out.append("        # TODO: review tower/MLP dims "
                   "(TF dims not auto-mapped)")
        if mapped_model in ("deepfm", "wide_and_deep"):
            out.append("        deep { hidden_units: [256, 128, 64] }")
            out.append("        final { hidden_units: [64] }")
        out.append("    }")
        if model_class and mapped_model != model_class:
            warnings.append(
                f"model_class {model_class} -> {mapped_model}: review "
                "tower configuration manually"
            )
    else:
        warnings.append(
            f"model_class {model_class!r} has no direct mapping; fill "
            "model_config.model manually"
        )
    out.append("    losses { binary_cross_entropy {} }")
    out.append("    metrics { auc {} }")
    out.append("}")
    return "\n".join(out) + "\n", warnings


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--easyrec_config_path", required=True)
    parser.add_argument("--output_tzrec_config_path", required=True)
    args = parser.parse_args()
    with open(args.easyrec_config_path) as f:
        text = f.read()
    converted, warnings = convert(text)
    with open(args.output_tzrec_config_path, "w") as f:
        f.write(converted)
    for w in warnings:
        print(f"WARNING: {w}")
    print(f"wrote {args.output_tzrec_config_path}")
