"""Colored severity logging with file:line source info.

Equivalent of the reference's Boost.Log setup
(/root/reference/src/Logging.{h,cpp}): timestamp + severity + file:line
prefix, ANSI colors per level.  Thin wrapper over stdlib logging so the
whole framework shares one configured logger.
"""

from __future__ import annotations

import logging
import sys

_COLORS = {
    logging.DEBUG: "\x1b[36m",     # cyan
    logging.INFO: "\x1b[32m",      # green
    logging.WARNING: "\x1b[33m",   # yellow
    logging.ERROR: "\x1b[31m",     # red
    logging.CRITICAL: "\x1b[41m",  # red bg
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        color = _COLORS.get(record.levelno, "")
        base = super().format(record)
        if sys.stderr.isatty():
            return f"{color}{base}{_RESET}"
        return base


_LOGGER: logging.Logger | None = None


def get_logger() -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger("elevenrender_tpu")
        handler = logging.StreamHandler()
        handler.setFormatter(_ColorFormatter(
            "[%(asctime)s] [%(levelname)s] [%(filename)s:%(lineno)d] %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
        _LOGGER = logger
    return _LOGGER
