"""Class-registry utilities.

TPU-native counterpart of the reference's plugin registry
(/root/reference/tzrec/utils/load_class.py:117-146): features, datasets,
readers, writers, samplers, models, sequence encoders and LR schedules all
self-register via a metaclass so configs can name them by string.
"""

import importlib
import os
import pydoc
from typing import Any, Dict, Type


def _camel_to_snake(name: str) -> str:
    out = []
    for i, c in enumerate(name):
        if c.isupper() and i > 0 and (not name[i - 1].isupper()):
            out.append("_")
        out.append(c.lower())
    return "".join(out)


def get_register_class_meta(class_map: Dict[str, Type[Any]]) -> type:
    """Build a metaclass registering every subclass into ``class_map``."""

    class RegisterABCMeta(type):
        def __new__(mcs, name, bases, attrs):
            newclass = super().__new__(mcs, name, bases, attrs)
            if name not in class_map:
                class_map[name] = newclass
            snake = _camel_to_snake(name)
            if snake not in class_map:
                class_map[snake] = newclass

            @classmethod
            def create_class(cls, cls_name: str):
                if cls_name in class_map:
                    return class_map[cls_name]
                raise ValueError(
                    f"Class {cls_name} is not registered. "
                    f"Available: {sorted(set(class_map))}"
                )

            newclass.create_class = create_class
            return newclass

    return RegisterABCMeta


def load_by_path(path: str) -> Any:
    """Load a function or class by dotted path (e.g. ``jax.nn.relu``)."""
    path = path.strip()
    if not path:
        return None
    obj = pydoc.locate(path)
    if obj is None:
        module_path, _, attr = path.rpartition(".")
        if module_path:
            mod = importlib.import_module(module_path)
            obj = getattr(mod, attr, None)
    if obj is None:
        raise ValueError(f"Cannot load {path}")
    return obj


def auto_import(user_path: str = None) -> None:
    """Import user python files so their plugin classes register.

    Mirrors reference behavior: importing every .py in a directory given by
    env ``TZREC_USER_MODULE_DIR`` or an explicit path.
    """
    user_path = user_path or os.environ.get("TZREC_USER_MODULE_DIR")
    if not user_path or not os.path.isdir(user_path):
        return
    import sys

    sys.path.insert(0, user_path)
    for fname in os.listdir(user_path):
        if fname.endswith(".py") and not fname.startswith("_"):
            importlib.import_module(fname[:-3])
