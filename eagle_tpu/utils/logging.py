"""Structured logging (SURVEY.md section 5.5: the reference uses bare
prints; this is the structured replacement, opt-in via EAGLE_TPU_LOG)."""

from __future__ import annotations

import json
import logging
import os
import sys
import time

_LOGGER = logging.getLogger("eagle_tpu")
if not _LOGGER.handlers:
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter("%(message)s"))
    _LOGGER.addHandler(handler)
    _LOGGER.setLevel(os.environ.get("EAGLE_TPU_LOG", "WARNING").upper())
    _LOGGER.propagate = False


def get_logger() -> logging.Logger:
    return _LOGGER


def log_event(event: str, **fields) -> None:
    """One JSON line per event: {"ts", "event", ...fields}."""
    _LOGGER.info(json.dumps({"ts": round(time.time(), 3), "event": event, **fields}))
