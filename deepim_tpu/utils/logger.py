"""Global logger: colored console + optional timestamped file handler.

Replaces lib/utils/logger.py:103-173 (tensorpack-derived) and
lib/utils/create_logger.py:13-33 (run-directory layout
<output_path>/<cfg_name>/<image_sets>/ with a timestamped log file).
"""
from __future__ import annotations

import logging
import os
import sys
import time

logger = logging.getLogger("deepim_tpu")
logger.setLevel(logging.INFO)
logger.propagate = False


class _ColorFormatter(logging.Formatter):
    COLORS = {
        logging.WARNING: "\033[33m",
        logging.ERROR: "\033[31m",
        logging.CRITICAL: "\033[31m",
    }

    def format(self, record):
        msg = super().format(record)
        color = self.COLORS.get(record.levelno)
        return f"{color}{msg}\033[0m" if color and sys.stderr.isatty() else msg


def _ensure_console() -> None:
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(_ColorFormatter("[%(asctime)s] %(message)s", datefmt="%m%d %H:%M:%S"))
        logger.addHandler(h)


_ensure_console()


def set_logger_dir(dirname: str, backup_existing: bool = True) -> str:
    """Attach a file handler writing into dirname (logger.py:103-173: the
    reference offers keep/delete/backup; we always keep and timestamp)."""
    os.makedirs(dirname, exist_ok=True)
    path = os.path.join(dirname, time.strftime("log_%Y%m%d_%H%M%S.txt"))
    fh = logging.FileHandler(path)
    fh.setFormatter(logging.Formatter("[%(asctime)s] %(message)s", datefmt="%m%d %H:%M:%S"))
    logger.addHandler(fh)
    logger.info("logging to %s", path)
    return path


def create_logger(output_path: str, cfg_name: str, image_set: str) -> str:
    """Run-directory layout <output_path>/<cfg_name>/<image_set>/
    (create_logger.py:13-33).  Returns the run directory."""
    run_dir = os.path.join(output_path, cfg_name, image_set)
    os.makedirs(run_dir, exist_ok=True)
    set_logger_dir(run_dir)
    return run_dir
