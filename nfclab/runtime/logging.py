"""Hierarchical logging with an asynchronous appender.

Parity with ``rt::Logger`` (rt/Logger.h:33-110, Logger.cpp:99-150):
dot-hierarchical named loggers with per-logger levels configured from the
settings ``[logger]`` section, and a writer thread draining a queue so hot
paths never block on IO.  Logger names follow the reference convention
("decoder.NfcA", "worker.RadioDecoder", ...).
"""

from __future__ import annotations

import queue
import sys
import threading
import time

NONE, ERROR, WARN, INFO, DEBUG, TRACE = 0, 1, 2, 3, 4, 5
_LEVEL_NAMES = {ERROR: "ERROR", WARN: "WARN", INFO: "INFO", DEBUG: "DEBUG", TRACE: "TRACE"}
_NAME_LEVELS = {v: k for k, v in _LEVEL_NAMES.items()}


class _Appender:
    """Async writer thread draining a bounded queue (Logger.cpp:99-150)."""

    def __init__(self):
        self.queue: "queue.Queue[str | None]" = queue.Queue(maxsize=65536)
        self.stream = None
        self._thread: threading.Thread | None = None

    def start(self, stream):
        self.stream = stream
        if self._thread is None:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def _run(self):
        while True:
            line = self.queue.get()
            if line is None:
                break
            try:
                self.stream.write(line + "\n")
                self.stream.flush()
            except Exception:
                pass

    def append(self, line: str):
        if self.stream is None:
            return
        try:
            self.queue.put_nowait(line)
        except queue.Full:
            pass


_appender = _Appender()
_levels: dict[str, int] = {"": NONE}
_loggers: dict[str, "Logger"] = {}
_lock = threading.Lock()


def init(stream=None, levels: dict[str, str | int] | None = None, root_level: int = INFO):
    """Initialize the appender and per-logger levels (the [logger] section
    of the reference's settings, main.cpp:119-133)."""
    _appender.start(stream or sys.stderr)
    _levels[""] = root_level
    if levels:
        for name, lvl in levels.items():
            _levels[name] = _NAME_LEVELS.get(lvl, lvl) if isinstance(lvl, str) else lvl


class Logger:
    def __init__(self, name: str):
        self.name = name

    @staticmethod
    def get_logger(name: str) -> "Logger":
        with _lock:
            if name not in _loggers:
                _loggers[name] = Logger(name)
            return _loggers[name]

    def _effective_level(self) -> int:
        # hierarchical resolution: most specific configured prefix wins
        parts = self.name.split(".")
        for i in range(len(parts), 0, -1):
            prefix = ".".join(parts[:i])
            if prefix in _levels:
                return _levels[prefix]
        return _levels.get("", NONE)

    def _log(self, level: int, msg: str, *args):
        if level > self._effective_level():
            return
        if args:
            msg = msg.format(*args)
        ts = time.strftime("%H:%M:%S")
        _appender.append(f"{ts} {_LEVEL_NAMES[level]:5s} [{self.name}] {msg}")

    def error(self, msg, *args):
        self._log(ERROR, msg, *args)

    def warn(self, msg, *args):
        self._log(WARN, msg, *args)

    def info(self, msg, *args):
        self._log(INFO, msg, *args)

    def debug(self, msg, *args):
        self._log(DEBUG, msg, *args)

    def trace(self, msg, *args):
        self._log(TRACE, msg, *args)
