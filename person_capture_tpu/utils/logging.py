"""Throttled keyed status logging.

Reference contract: ``Processor._status`` (gui_app.py:8490-8531) — messages
are throttled per logical channel (``key``) at a minimum interval so hot
loops can narrate without flooding the log pane. ``key=None`` shares ONE
``_global`` channel (not per-message buckets, which would defeat the
throttle for messages whose text changes every sample and grow state
unboundedly). Phase/state channels emit immediately when their text
changes.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional


class StatusLogger:
    #: channels whose text CHANGES bypass the interval (reference
    #: immediate_on_change set, gui_app.py:8512-8518): phase transitions
    #: must never be swallowed by the throttle
    IMMEDIATE_KEYS = frozenset({
        "phase", "hdr_state", "hdr_passthrough", "prescan_cache",
        "curate_done",
    })

    def __init__(self, sink: Optional[Callable[[str], None]] = None,
                 default_interval: float = 1.0):
        self.sink = sink or (lambda msg: None)
        self.default_interval = float(default_interval)
        self._last: Dict[str, float] = {}
        self._text: Dict[str, Optional[str]] = {}

    def __call__(self, msg: str, key: Optional[str] = None,
                 interval: Optional[float] = None, force: bool = False) -> bool:
        """Emit ``msg`` unless its channel fired within ``interval``
        seconds. Returns True when emitted."""
        k = key or "_global"
        iv = self.default_interval if interval is None else float(interval)
        iv = max(0.0, iv)
        now = time.monotonic()
        last_t = self._last.get(k)
        emit = (force or iv <= 0.0 or last_t is None
                or (k in self.IMMEDIATE_KEYS and msg != self._text.get(k))
                or (now - last_t) >= iv)
        self._text[k] = msg
        if not emit:
            return False
        self._last[k] = now
        self.sink(msg)
        return True

    def reset(self, key: Optional[str] = None) -> None:
        if key is None:
            self._last.clear()
            self._text.clear()
        else:
            self._last.pop(key, None)
            self._text.pop(key, None)
