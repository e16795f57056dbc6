"""Application shell: the reference's BaseApplication discipline
(CommandLine.Options/BaseApplication.cs:11-150) — open log, snapshot the
options to JSON, run, then report wall time and peak memory; exceptions map
to exit codes (CommandLine.IO ExitCodeUtilities).
Benchmark mirrors CommandLine.IO/Utilities/Benchmark.cs:5-55.
"""
from __future__ import annotations

import dataclasses
import enum
import json
import os
import sys
import time
import traceback
from typing import Any, Callable, Optional

from pisces_tpu.utils import logger


class Benchmark:
    """Wall-clock timer with a units/s helper."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def elapsed_str(self) -> str:
        secs = self.elapsed()
        h, rem = divmod(int(secs), 3600)
        m, s = divmod(rem, 60)
        return f"{h:02d}:{m:02d}:{s:02d}.{int((secs % 1) * 1000):03d}"

    def rate(self, units: float, unit_name: str) -> str:
        dt = max(self.elapsed(), 1e-9)
        return f"{units / dt:,.1f} {unit_name}/s"


def peak_memory_mb() -> float:
    """Peak RSS of this process in MB (ru_maxrss is KB on Linux)."""
    try:
        import resource
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    except Exception:
        return 0.0


def _jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _jsonable(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, enum.Enum):
        return obj.name
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    if hasattr(obj, "__dict__"):
        return {k: _jsonable(v) for k, v in vars(obj).items()
                if not k.startswith("_")}
    return repr(obj)


def snapshot_options(options: Any, out_dir: Optional[str],
                     app_name: str) -> Optional[str]:
    """Write `<out>/<App>Options.used.json` (BaseApplication.cs:88-96)."""
    if not out_dir:
        return None
    try:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{app_name}Options.used.json")
        with open(path, "w") as f:
            json.dump(_jsonable(options), f, indent=2, sort_keys=True)
        return path
    except OSError:
        return None


def run_application(app_name: str, execute: Callable[[], int],
                    options: Any = None,
                    log_dir: Optional[str] = None) -> int:
    """Wrap an app's execution: log file, options snapshot, timing + peak
    memory on exit, exception -> nonzero exit code."""
    bench = Benchmark()
    if log_dir:
        logger.open_log(os.path.join(log_dir, f"{app_name}Logs"),
                        f"{app_name}Log.txt")
    logger.log(f"***** Starting {app_name} *****")
    if options is not None:
        snap = snapshot_options(options, log_dir, app_name)
        if snap:
            logger.log(f"Saved options to {snap}")
    try:
        code = execute()
    except FileNotFoundError as e:
        logger.log(f"ERROR: {e}", "ERROR")
        code = 2
    except ValueError as e:
        logger.log(f"ERROR: {e}", "ERROR")
        code = 3
    except Exception:
        logger.log("Unhandled exception:\n" + traceback.format_exc(), "ERROR")
        code = 1
    logger.log(f"Time: {bench.elapsed_str()}. "
               f"Peak memory: {peak_memory_mb():,.1f} MB")
    logger.log(f"***** Ending {app_name} (exit {code}) *****")
    return code
