"""Hierarchical per-query timers — the analogue of the reference's
DEBUG_TIMER tree (Logger/Logger.h:393-423, stopAndGetJson): RAII-nested
scopes aggregated per query, dumpable as JSON."""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import List, Optional


class TimerNode:
    __slots__ = ("name", "start", "elapsed_ms", "children")

    def __init__(self, name: str):
        self.name = name
        self.start = time.perf_counter()
        self.elapsed_ms = 0.0
        self.children: List[TimerNode] = []

    def to_dict(self) -> dict:
        d = {"name": self.name, "ms": round(self.elapsed_ms, 3)}
        if self.children:
            d["children"] = [c.to_dict() for c in self.children]
        return d


class QueryTimer:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.root: Optional[TimerNode] = None
        self._stack: List[TimerNode] = []

    @contextmanager
    def scope(self, name: str):
        if not self.enabled:
            yield
            return
        node = TimerNode(name)
        if self._stack:
            self._stack[-1].children.append(node)
        else:
            self.root = node
        self._stack.append(node)
        try:
            yield
        finally:
            node.elapsed_ms = (time.perf_counter() - node.start) * 1e3
            self._stack.pop()

    def to_dict(self) -> Optional[dict]:
        return self.root.to_dict() if self.root else None


class NullTimer:
    @contextmanager
    def scope(self, name: str):
        yield

    def to_dict(self):
        return None
