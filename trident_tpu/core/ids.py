"""Random 64-bit UUIDs (reference: Core/Utilities.cpp:36-42)."""

from __future__ import annotations

import secrets


def new_uuid() -> int:
    """Random non-zero 64-bit id."""
    value = 0
    while value == 0:
        value = secrets.randbits(64)
    return value
