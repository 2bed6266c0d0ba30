"""Named pub/sub subjects — the inter-stage wiring of the streaming runtime.

Parity with ``rt::Subject`` (rt/Subject.h:37-204): process-global named
observable streams with retained last value, subscribe returning an
unsubscribe handle, and in-thread observer dispatch.  Stream names follow the
reference topology (SURVEY.md §1): ``radio.signal.raw``,
``radio.decoder.frame``, ``signal.fft``, ``adaptive.signal``,
``<task>.status`` / ``<task>.command``.
"""

from __future__ import annotations

import threading
from typing import Any, Callable


class Event:
    """Command envelope: code + payload map + resolve/reject callbacks
    (rt/Event.h:30-41, rt/Promise.h parity)."""

    def __init__(self, code: str, params: dict | None = None,
                 on_resolve=None, on_reject=None):
        self.code = code
        self.params = params or {}
        self._on_resolve = on_resolve
        self._on_reject = on_reject
        self.settled = False

    def resolve(self, *args):
        if not self.settled:
            self.settled = True
            if self._on_resolve:
                self._on_resolve(*args)

    def reject(self, *args):
        if not self.settled:
            self.settled = True
            if self._on_reject:
                self._on_reject(*args)

    def get(self, key, default=None):
        return self.params.get(key, default)


class Subject:
    _registry: dict[str, "Subject"] = {}
    _registry_lock = threading.Lock()

    def __init__(self, name: str):
        self.subject_name = name
        self._observers: list[Callable[[Any], None]] = []
        self._lock = threading.Lock()
        self._retained: Any = None
        self._has_retained = False

    @classmethod
    def name(cls, name: str) -> "Subject":
        """Global registry lookup/create (Subject.h:165-176)."""
        with cls._registry_lock:
            if name not in cls._registry:
                cls._registry[name] = cls(name)
            return cls._registry[name]

    @classmethod
    def clear_registry(cls):
        with cls._registry_lock:
            cls._registry.clear()

    @classmethod
    def registry_items(cls) -> list[tuple[str, "Subject"]]:
        """Snapshot of (name, subject) pairs — observability consumers
        (the live monitor) walk this for ``*.status`` subjects."""
        with cls._registry_lock:
            return list(cls._registry.items())

    @property
    def value(self):
        """The retained last value, or None (Subject.h retained slot)."""
        with self._lock:
            return self._retained if self._has_retained else None

    def next(self, value: Any, retain: bool = False):
        """Publish on the caller's thread (Subject.h:66-88)."""
        with self._lock:
            observers = list(self._observers)
            if retain:
                self._retained = value
                self._has_retained = True
        for obs in observers:
            obs(value)

    def subscribe(self, observer: Callable[[Any], None], replay: bool = True):
        """Subscribe; retained value replayed to the new observer
        (Subject.h:135-142).  Returns an unsubscribe callable."""
        with self._lock:
            self._observers.append(observer)
            retained = self._retained if self._has_retained else None
            has = self._has_retained
        if has and replay:
            observer(retained)

        def unsubscribe():
            with self._lock:
                if observer in self._observers:
                    self._observers.remove(observer)

        return unsubscribe
