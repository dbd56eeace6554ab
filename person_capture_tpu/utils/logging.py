"""Throttled keyed status logging.

Reference contract: ``Processor._status`` (gui_app.py:8490-8531) — messages
are deduped per key at a minimum interval so hot loops can narrate without
flooding the log pane.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional


class StatusLogger:
    def __init__(self, sink: Optional[Callable[[str], None]] = None,
                 default_interval: float = 1.0):
        self.sink = sink or (lambda msg: None)
        self.default_interval = float(default_interval)
        self._last: Dict[str, float] = {}

    def __call__(self, msg: str, key: Optional[str] = None,
                 interval: Optional[float] = None, force: bool = False) -> bool:
        """Emit ``msg`` unless the same key fired within ``interval``
        seconds. Returns True when emitted."""
        k = key or msg
        iv = self.default_interval if interval is None else float(interval)
        now = time.monotonic()
        if not force and now - self._last.get(k, -1e18) < iv:
            return False
        self._last[k] = now
        self.sink(msg)
        return True

    def reset(self, key: Optional[str] = None) -> None:
        if key is None:
            self._last.clear()
        else:
            self._last.pop(key, None)
