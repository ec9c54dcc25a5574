"""Framework-wide constants (reference: tzrec/constant.py)."""

from enum import Enum


class Mode(Enum):
    """Run mode of a pipeline stage."""

    TRAIN = 1
    EVAL = 2
    PREDICT = 3


# tensorboard summary names
LOSS = "loss"
LEARNING_RATE = "learning_rate"
PARAMETER = "parameter"
GLOBAL_GRADIENT_NORM = "global_gradient_norm"
GRADIENT_NORM = "gradient_norm"
GRADIENT = "gradient"

# data-position checkpoint metadata columns injected by readers
CKPT_SOURCE_ID = "__ckpt_source_id__"
CKPT_ROW_IDX = "__ckpt_row_idx__"
DATA_TIMESTAMP = "__data_timestamp__"

# batch-size key of sampled-negative data groups
NEG_DATA_GROUP = "__NEG__"
BASE_DATA_GROUP = "__BASE__"

EASYREC_VERSION_KEY = "easyrec_version"
