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
    def __init__(self, path: Optional[str] = None, clearml_logger=None):
        self.path = path
        self._file = None
        self._clearml = clearml_logger
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
        if self._clearml is not None:
            self._clearml.report_scalar(title=title, series=series, value=value, iteration=iteration)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None


def init_clearml(project_name: Optional[str], task_name: Optional[str]):
    """ClearML task init matching the reference's surface
    (masked_pretraining/train.py:224-238). Returns (task, logger) or
    (None, None) when clearml is absent or names are unset — the package is
    optional here, unlike the reference's hard import."""
    if not project_name or not task_name:
        return None, None
    try:
        from clearml import Task  # type: ignore
    except ImportError:
        print("clearml not installed; --project-name/--task-name ignored (JSONL log still written)")
        return None, None
    task = Task.init(project_name=project_name, task_name=task_name, task_type=Task.TaskTypes.training)
    return task, task.get_logger()
