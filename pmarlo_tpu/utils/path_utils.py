"""Path helpers (reference: src/pmarlo/utils/path_utils.py)."""

from __future__ import annotations

import re
import time
from pathlib import Path


def ensure_directory(path: "str | Path") -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p


def resolve_project_path(path: "str | Path", base: "str | Path | None" = None) -> Path:
    p = Path(path)
    if p.is_absolute():
        return p
    return (Path(base) if base is not None else Path.cwd()) / p


def slugify(text: str) -> str:
    text = re.sub(r"[^A-Za-z0-9._-]+", "-", text.strip())
    return re.sub(r"-{2,}", "-", text).strip("-").lower()


def timestamp_slug() -> str:
    return time.strftime("%Y%m%d-%H%M%S")


__all__ = ["ensure_directory", "resolve_project_path", "slugify", "timestamp_slug"]
