"""Small general utilities (reference ``utils.py`` misc helpers)."""

from __future__ import annotations

import random
import string

__all__ = ["id_generator"]


def id_generator(size: int = 6, chars: str = string.ascii_lowercase + string.digits) -> str:
    """Random id string (reference ``utils.py:36-39``)."""
    return "".join(random.choice(chars) for _ in range(size))
