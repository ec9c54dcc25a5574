"""Run-mode constants (reference /root/reference/tzrec/constant.py:16-30)."""

import enum


class Mode(enum.Enum):
    TRAIN = "train"
    EVAL = "eval"
    PREDICT = "predict"


TRAIN_EVAL_RESULT_FILENAME = "train_eval_result_v2.txt"
EVAL_RESULT_FILENAME = "eval_result.txt"
