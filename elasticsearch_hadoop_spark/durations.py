"""ES duration strings -> seconds — the ONE parser.

ILM min_age/max_age, watcher schedules/throttles, and transform
sync/retention all accept the same ES time-unit grammar; keeping a
single implementation stops the unit tables drifting apart (this
replaced three identical copies)."""

from __future__ import annotations

import re

_RX = re.compile(r"^(\d+(?:\.\d+)?)(ms|s|m|h|d)?$")
_UNIT = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0, None: 1.0}


def parse_duration(v, error: type[Exception] = ValueError) -> float:
    """``"7d"``/``"30m"``/``"500ms"`` or a bare number -> seconds.
    Raises ``error`` (the caller's domain exception) on bad input."""
    if isinstance(v, (int, float)):
        return float(v)
    m = _RX.match(str(v).strip())
    if not m:
        raise error(f"bad duration {v!r}")
    return float(m.group(1)) * _UNIT[m.group(2)]
