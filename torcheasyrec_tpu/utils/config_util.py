"""Pipeline-config load/save/edit utilities.

TPU-native counterpart of /root/reference/tzrec/utils/config_util.py
(:25 load_pipeline_config, :51 save_message, :66 config_to_kwargs,
:144 edit_config). The config language (proto2 text format) is the
user-facing API surface and is kept compatible.
"""

import os
import re
from typing import Any, Dict

from google.protobuf import json_format, text_format
from google.protobuf.message import Message

from torcheasyrec_tpu.protos import data_pb2, pipeline_pb2
from torcheasyrec_tpu.protos.data_pb2 import FgMode
from torcheasyrec_tpu.utils.logging_util import logger


def load_pipeline_config(
    pipeline_config_path: str, allow_unknown_field: bool = False
) -> pipeline_pb2.EasyRecConfig:
    """Load an EasyRecConfig from text-format (or json) file."""
    config = pipeline_pb2.EasyRecConfig()
    with open(pipeline_config_path) as f:
        if pipeline_config_path.endswith(".json"):
            json_format.Parse(
                f.read(), config, ignore_unknown_fields=allow_unknown_field
            )
        else:
            text_format.Merge(
                f.read(), config, allow_unknown_field=allow_unknown_field
            )
    config.data_config.fg_mode = _get_compatible_fg_mode(config.data_config)
    return config


def _get_compatible_fg_mode(data_config: data_pb2.DataConfig) -> "FgMode":
    """Map deprecated fg_encoded flag to FgMode (reference :80-100)."""
    if data_config.HasField("fg_encoded"):
        if data_config.HasField("fg_mode"):
            return data_config.fg_mode
        return FgMode.FG_NONE if data_config.fg_encoded else FgMode.FG_NORMAL
    return data_config.fg_mode


def save_message(message: Message, filepath: str) -> None:
    """Save a proto message to a text-format file."""
    directory, _ = os.path.split(filepath)
    if directory and not os.path.exists(directory):
        os.makedirs(directory, exist_ok=True)
    pbtxt = text_format.MessageToString(message, as_utf8=True)
    with open(filepath, "w") as f:
        f.write(pbtxt)


def config_to_kwargs(config: Message) -> Dict[str, Any]:
    """Convert a message to a plain dict (proto field names preserved)."""
    return json_format.MessageToDict(
        config,
        always_print_fields_with_no_presence=True,
        preserving_proto_field_name=True,
    )


def which_msg(config: Message, oneof_group: str) -> str:
    """Name of the message class set inside a oneof group."""
    which = config.WhichOneof(oneof_group)
    if which is None:
        raise ValueError(f"oneof {oneof_group} is not set in {type(config).__name__}")
    return getattr(config, which).__class__.__name__


_ARRAY_INDEX_RE = re.compile(r"(?P<name>[^\[\]]+)(\[(?P<index>.+)\])?")


def _resolve_attr(obj: Any, attr: str):
    """Resolve one path segment (possibly with [index] / [cond] suffix)."""
    m = _ARRAY_INDEX_RE.fullmatch(attr)
    name, index = m.group("name"), m.group("index")
    target = getattr(obj, name)
    if index is None:
        return [(obj, name, None)]
    # numeric index or slice a:b
    if re.fullmatch(r"-?\d+", index):
        return [(target, None, int(index))]
    if re.fullmatch(r"-?\d*:-?\d*", index):
        lo, hi = index.split(":")
        lo = int(lo) if lo else 0
        hi = int(hi) if hi else len(target)
        return [(target, None, i) for i in range(lo, hi)]
    # condition like feature_name=xyz or >=, <=, etc.
    cm = re.fullmatch(r"(?P<key>\w+)\s*(?P<op>>=|<=|=|>|<)\s*(?P<val>.+)", index)
    if cm is None:
        raise ValueError(f"cannot parse config path index [{index}]")
    key, op, val = cm.group("key"), cm.group("op"), cm.group("val")
    out = []
    for i, elem in enumerate(target):
        # elements may be oneof wrappers; search one level down too
        candidates = [elem]
        for _, sub in type(elem).DESCRIPTOR.oneofs_by_name.items():
            which = elem.WhichOneof(sub.name)
            if which is not None:
                candidates.append(getattr(elem, which))
        for c in candidates:
            if not hasattr(c, key):
                continue
            cur = getattr(c, key)
            try:
                ref = type(cur)(val)
            except (TypeError, ValueError):
                ref = val
            ok = {
                "=": cur == ref,
                ">": cur > ref,
                "<": cur < ref,
                ">=": cur >= ref,
                "<=": cur <= ref,
            }[op]
            if ok:
                out.append((target, None, i))
                break
    return out


def _set_leaf(parent: Any, name: str, index, value_str: str) -> None:
    if name is not None:
        cur = getattr(parent, name)
    else:
        cur = parent[index]
    if isinstance(cur, Message):
        text_format.Merge(value_str, cur)
        return
    if isinstance(cur, bool):
        value = value_str.strip().lower() in ("true", "1", "yes")
    elif isinstance(cur, (int, float)):
        try:
            value = type(cur)(value_str)
        except ValueError:
            # enum set by NAME (e.g. dataset_type: "ParquetDataset")
            if name is not None and isinstance(parent, Message):
                fd = parent.DESCRIPTOR.fields_by_name.get(name)
                if fd is not None and fd.enum_type is not None:
                    value = fd.enum_type.values_by_name[
                        value_str.strip()
                    ].number
                else:
                    raise
            else:
                raise
    elif isinstance(cur, str):
        value = value_str
    else:
        # repeated scalar field: replace contents
        try:
            elems = [type(cur[0])(v) if len(cur) else float(v) for v in
                     re.split(r"[,\s]+", value_str.strip().strip("[]")) if v]
            del cur[:]
            cur.extend(elems)
            return
        except Exception as e:  # noqa: BLE001
            raise ValueError(f"cannot assign {value_str!r}") from e
    if name is not None:
        setattr(parent, name, value)
    else:
        parent[index] = value


def edit_config(pipeline_config: Message, edits: Dict[str, str]) -> Message:
    """Apply path-edit overrides (reference :144).

    Paths look like ``train_config.num_steps`` or
    ``feature_configs[feature_name=cat_0].id_feature.embedding_dim`` or
    ``feature_configs[0].raw_feature.boundaries``.
    """
    for path, value in edits.items():
        segments = path.split(".")
        targets = [pipeline_config]
        for seg_i, seg in enumerate(segments):
            is_last = seg_i == len(segments) - 1
            new_targets = []
            for tgt in targets:
                resolved = _resolve_attr(tgt, seg)
                if is_last:
                    for parent, name, index in resolved:
                        _set_leaf(parent, name, index, str(value))
                else:
                    for parent, name, index in resolved:
                        new_targets.append(
                            getattr(parent, name) if name is not None
                            else parent[index]
                        )
            targets = new_targets
        logger.info(f"edit_config: {path} = {value}")
    return pipeline_config
