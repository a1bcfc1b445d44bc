"""Metrics logging.

The reference logs scalars to stdout and optionally ClearML (reference:
masked_pretraining/train.py:169-190). Here the same `report_scalar` interface
writes JSONL (machine-readable, greppable) next to stdout; a ClearML logger
can be slotted in behind the same interface where that service exists.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._file = None
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._file = open(path, "a")

    def report_scalar(self, title: str, series: str, value: float, iteration: int) -> None:
        if self._file is not None:
            self._file.write(
                json.dumps(
                    {"ts": time.time(), "title": title, "series": series, "value": value, "iteration": iteration}
                )
                + "\n"
            )
            self._file.flush()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
