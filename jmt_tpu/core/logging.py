"""Observability: JSON-lines + text + stdout logging.

Replaces the reference's vendored NVIDIA DLLogger fork (dllogger/logger.py:193,
244-313) with a small, dependency-free logger producing the same run
artifacts: ``log.json`` (JSON-lines, one record per call), ``log.txt``
(free text), and stdout mirroring. A module-level singleton mirrors the
reference's ``GLOBAL_LOGGER`` usage pattern (dllogger/__init__.py:78) so call
sites stay one-liners.
"""
from __future__ import annotations

import atexit
import datetime
import json
import os
import sys
from typing import Any, IO, Optional


class JsonLinesLogger:
    """Logs free-text or structured records to json-lines/text/stdout."""

    JSON_PREFIX = "DLLL "  # keep the reference's log.json line format

    def __init__(self, json_path: Optional[str] = None,
                 txt_path: Optional[str] = None,
                 stdout: bool = True):
        self._json_f: Optional[IO] = open(json_path, "a") if json_path else None
        self._txt_f: Optional[IO] = open(txt_path, "a") if txt_path else None
        self._stdout = stdout
        atexit.register(self.flush)

    def log(self, data: Any, step: Any = None) -> None:
        now = datetime.datetime.now().isoformat()
        if isinstance(data, str):
            record = {"timestamp": now, "step": step, "msg": data}
            text = data
        else:
            record = {"timestamp": now, "step": step, "data": data}
            text = json.dumps(data, default=str)
        if self._json_f:
            self._json_f.write(self.JSON_PREFIX
                               + json.dumps(record, default=str) + "\n")
        if self._txt_f:
            self._txt_f.write(f"{now} {text}\n")
        if self._stdout:
            print(text, file=sys.stdout)

    def metrics(self, step: Any, **metrics: Any) -> None:
        self.log(metrics, step=step)

    def flush(self) -> None:
        for f in (self._json_f, self._txt_f):
            if f and not f.closed:
                f.flush()

    def close(self) -> None:
        self.flush()
        for f in (self._json_f, self._txt_f):
            if f and not f.closed:
                f.close()


_GLOBAL: Optional[JsonLinesLogger] = None


def init_logger(outdir: Optional[str] = None, stdout: bool = True,
                ) -> JsonLinesLogger:
    """Initialize the global logger, writing log.json/log.txt under outdir
    (mirrors reference parseit.py:587-597). On multi-host runs only process
    0 writes (the reference's master-pid gating, dllogger/logger.py:61-63,
    generalized to hosts)."""
    global _GLOBAL
    try:
        import jax
        is_master = jax.process_index() == 0
    except Exception:
        is_master = True
    if not is_master:
        _GLOBAL = JsonLinesLogger(stdout=False)
        return _GLOBAL
    if outdir is not None:
        os.makedirs(outdir, exist_ok=True)
        _GLOBAL = JsonLinesLogger(os.path.join(outdir, "log.json"),
                                  os.path.join(outdir, "log.txt"),
                                  stdout=stdout)
    else:
        _GLOBAL = JsonLinesLogger(stdout=stdout)
    return _GLOBAL


def get_logger() -> JsonLinesLogger:
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = JsonLinesLogger(stdout=True)
    return _GLOBAL


def log(data: Any, step: Any = None) -> None:
    get_logger().log(data, step=step)
