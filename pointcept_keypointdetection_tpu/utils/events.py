"""Scalar event storage for training telemetry.

Parity surface: the reference's ``EventStorage`` (`pointcept/utils/events.py:296`)
— per-key scalar histories with windowed smoothing, latest/avg/global-avg
accessors, and a context-manager stack so hooks can reach the active storage via
``get_event_storage()``.  The tensorboard/wandb writers of the reference map to
the ``InformationWriter`` hook writing from this storage.
"""

from __future__ import annotations

from collections import defaultdict, deque
from typing import Dict, Optional

_CURRENT_STORAGE_STACK = []


def get_event_storage() -> "EventStorage":
    assert _CURRENT_STORAGE_STACK, "get_event_storage() called outside a 'with EventStorage(...)'"
    return _CURRENT_STORAGE_STACK[-1]


class HistoryBuffer:
    """Track a series of scalars with a bounded smoothing window."""

    def __init__(self, window_size: int = 20):
        self._window = deque(maxlen=window_size)
        self._count = 0
        self._global_sum = 0.0
        self._latest = float("nan")

    def update(self, value: float):
        value = float(value)
        self._window.append(value)
        self._count += 1
        self._global_sum += value
        self._latest = value

    @property
    def latest(self) -> float:
        return self._latest

    def median(self) -> float:
        vals = sorted(self._window)
        return vals[len(vals) // 2] if vals else float("nan")

    def avg(self) -> float:
        return sum(self._window) / len(self._window) if self._window else float("nan")

    def global_avg(self) -> float:
        return self._global_sum / self._count if self._count else float("nan")

    @property
    def count(self) -> int:
        return self._count


class EventStorage:
    """The user-facing scalar store, usable as a context manager."""

    def __init__(self, start_iter: int = 0, window_size: int = 20):
        self._history: Dict[str, HistoryBuffer] = defaultdict(lambda: HistoryBuffer(window_size))
        self._iter = start_iter
        self._window_size = window_size

    def put_scalar(self, name: str, value) -> None:
        self._history[name].update(value)

    def put_scalars(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def history(self, name: str) -> HistoryBuffer:
        if name not in self._history:
            raise KeyError(f"No history metric '{name}'")
        return self._history[name]

    def histories(self) -> Dict[str, HistoryBuffer]:
        return dict(self._history)

    def latest(self) -> Dict[str, float]:
        return {k: v.latest for k, v in self._history.items()}

    @property
    def iter(self) -> int:
        return self._iter

    @iter.setter
    def iter(self, value: int):
        self._iter = int(value)

    def step(self):
        self._iter += 1

    def reset_histories(self, prefix: Optional[str] = None):
        if prefix is None:
            self._history.clear()
        else:
            for key in [k for k in self._history if k.startswith(prefix)]:
                del self._history[key]

    def __enter__(self):
        _CURRENT_STORAGE_STACK.append(self)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        assert _CURRENT_STORAGE_STACK[-1] is self
        _CURRENT_STORAGE_STACK.pop()


class ExceptionWriter:
    """Context manager logging uncaught exceptions to the root logger.

    Parity: `pointcept/utils/events.py:599` wraps the whole training loop so
    crashes land in the train log with a full traceback.
    """

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if exc_type is not None and exc_type is not KeyboardInterrupt:
            import traceback

            from .logger import get_root_logger

            get_root_logger().error(
                "Uncaught exception:\n%s", "".join(traceback.format_exception(exc_type, exc_val, exc_tb))
            )
        return False
