"""Logger + rate-limited progress logging.

Counterpart of /root/reference/tzrec/utils/logging_util.py (ProgressLogger
:20) for per-step train/eval progress lines.
"""

import logging
import sys
import time

logger = logging.getLogger("tzrec_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(
        logging.Formatter("[%(asctime)s][%(levelname)s] %(message)s", "%H:%M:%S")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


class ProgressLogger:
    """Rate-limited progress printer for the train/eval hot loop."""

    def __init__(self, desc: str, start_n: int = 0, mininterval: float = 1.0) -> None:
        self._desc = desc
        self._mininterval = mininterval
        self._last_t = time.time()
        self._last_n = start_n

    def set_description(self, desc: str) -> None:
        self._desc = desc

    def log(self, n: int, suffix: str = "") -> None:
        t = time.time()
        if t - self._last_t >= self._mininterval:
            rate = (n - self._last_n) / max(t - self._last_t, 1e-9)
            logger.info(f"{self._desc}: {n}it [{rate:.2f}it/s] {suffix}")
            self._last_t = t
            self._last_n = n
