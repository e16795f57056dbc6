"""Timestamped logger (Common.IO/Logger.cs discipline: console + log file)."""
from __future__ import annotations

import datetime
import os
import sys
import threading
from typing import Optional

_lock = threading.Lock()
_log_file = None


def open_log(directory: str, name: str = "PiscesTpuLog.txt") -> None:
    global _log_file
    os.makedirs(directory, exist_ok=True)
    with _lock:
        _log_file = open(os.path.join(directory, name), "a")


def log(message: str, level: str = "INFO") -> None:
    ts = datetime.datetime.now().strftime("%m/%d/%Y %H:%M:%S")
    line = f"{ts} {os.getpid()}  {level}  {message}"
    with _lock:
        print(line, file=sys.stderr)
        if _log_file is not None:
            _log_file.write(line + "\n")
            _log_file.flush()


def warn(message: str) -> None:
    log(message, "WARNING")
