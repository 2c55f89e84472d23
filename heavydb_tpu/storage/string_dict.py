"""String dictionary: host-side string <-> int32 id mapping.

Equivalent of the reference's StringDictionary
(StringDictionary/StringDictionary.h:119-172): strings are interned once at
ingest; on-device all string columns are int32 id arrays.  String predicates
(LIKE, =, <) are evaluated over the *dictionary entries* on the host,
producing id sets / translation arrays that the device kernels consume — the
same trick as HeavyDB's dictionary translation maps
(StringDictionary/StringDictionaryProxy, StringDictionaryTranslationMgr).
"""

from __future__ import annotations

import fnmatch
import re
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

INVALID_STR_ID = -1  # reference StringDictionary::INVALID_STR_ID


class PyStringDictionary:
    """Append-only interning dictionary. Ids are dense [0, size).
    Pure-Python fallback; the default is the C++-backed NativeStringDictionary
    below (reference StringDictionary is native C++ for the same reason —
    bulk interning is the import hot path)."""

    def __init__(self, dict_id: int = 0):
        self.dict_id = dict_id
        self._str_to_id: Dict[str, int] = {}
        self._strings: List[str] = []

    def load_entries(self, strings):
        self._strings = list(strings)
        self._str_to_id = {s: i for i, s in enumerate(self._strings)}

    # ---- ingest ----
    def get_or_add(self, s: str) -> int:
        sid = self._str_to_id.get(s)
        if sid is None:
            sid = len(self._strings)
            self._str_to_id[s] = sid
            self._strings.append(s)
        return sid

    def get_or_add_bulk(self, values: Iterable[Optional[str]]) -> np.ndarray:
        """Vector intern; None → null sentinel (int32 min).
        Reference: StringDictionary::getOrAddBulk (parallel in C++; here a
        tight host loop over a python dict — revisit if import becomes hot)."""
        null_id = np.iinfo(np.int32).min
        out = np.empty(len(values) if hasattr(values, "__len__") else 0, np.int32)
        d = self._str_to_id
        strings = self._strings
        for i, s in enumerate(values):
            if s is None or (isinstance(s, float) and np.isnan(s)):
                out[i] = null_id
                continue
            if not isinstance(s, str):
                s = str(s)
            sid = d.get(s)
            if sid is None:
                sid = len(strings)
                d[s] = sid
                strings.append(s)
            out[i] = sid
        return out

    # ---- lookup ----
    def get_id(self, s: str) -> int:
        return self._str_to_id.get(s, INVALID_STR_ID)

    def get_string(self, sid: int) -> Optional[str]:
        if 0 <= sid < len(self._strings):
            return self._strings[sid]
        return None

    def get_strings(self, ids: np.ndarray) -> list:
        strings = self._strings
        n = len(strings)
        return [strings[i] if 0 <= i < n else None for i in ids.tolist()]

    @property
    def size(self) -> int:
        """Generation for multi-host consistency snapshots (reference
        StringDictionaryGenerations)."""
        return len(self._strings)

    def entries(self) -> Sequence[str]:
        return self._strings

    # ---- host-side predicate evaluation over dictionary entries ----
    def ids_where(self, pred) -> np.ndarray:
        """All ids whose string satisfies `pred` (reference
        StringDictionary::getLike/getCompare/getRegexpLike)."""
        return np.fromiter(
            (i for i, s in enumerate(self._strings) if pred(s)),
            dtype=np.int32,
            count=-1,
        )

    def like_ids(self, pattern: str, escape: Optional[str], icase: bool) -> np.ndarray:
        rx = like_to_regex(pattern, escape)
        flags = re.IGNORECASE | re.DOTALL if icase else re.DOTALL
        crx = re.compile(rx, flags)
        return self.ids_where(lambda s: crx.fullmatch(s) is not None)

    def regexp_ids(self, pattern: str, icase: bool = False) -> np.ndarray:
        flags = re.IGNORECASE if icase else 0
        crx = re.compile(pattern, flags)
        return self.ids_where(lambda s: crx.fullmatch(s) is not None)

    def compare_ids(self, op: str, literal: str) -> np.ndarray:
        import operator

        ops = {
            "=": operator.eq,
            "<>": operator.ne,
            "<": operator.lt,
            "<=": operator.le,
            ">": operator.gt,
            ">=": operator.ge,
        }
        f = ops[op]
        return self.ids_where(lambda s: f(s, literal))

    def translation_to(self, other: "StringDictionary") -> np.ndarray:
        """id-in-self → id-in-other (INVALID_STR_ID if missing).  Reference:
        StringDictionaryTranslationMgr / buildDictionaryTranslationMap."""
        out = np.empty(len(self._strings), np.int32)
        od = other._str_to_id
        for i, s in enumerate(self._strings):
            out[i] = od.get(s, INVALID_STR_ID)
        return out


class NativeStringDictionary:
    """C++-backed dictionary (heavydb_tpu/native/strdict_ext.cpp, a CPython
    extension): the bulk intern/lookup loops iterate Python string objects
    directly in C — no intermediate packing — mirroring the reference's
    native StringDictionary::getOrAddBulk hot path."""

    def __init__(self, dict_id: int = 0):
        from heavydb_tpu.native import load_strdict_ext

        self.dict_id = dict_id
        self._ext = load_strdict_ext()
        self._h = self._ext.create()
        # lazily-refreshed python mirror for entries()/get_string
        self._cache: List[str] = []

    # ---- ingest ----
    def get_or_add(self, s: str) -> int:
        return int(self.get_or_add_bulk([s])[0])

    def get_or_add_bulk(self, values) -> np.ndarray:
        if not isinstance(values, (list, tuple)):
            values = list(values)
        raw = self._ext.intern_bulk(self._h, values)
        return np.frombuffer(raw, np.int32).copy()

    def get_or_add_payload(self, raw) -> np.ndarray:
        """Bulk intern straight from a native-parser RawText column —
        no per-row Python strings anywhere on the import path."""
        # offsets/mask are contiguous numpy arrays (RawText guarantees
        # it) — pass them via the buffer protocol, no tobytes() copies
        ids = self._ext.intern_payload(
            self._h, raw.payload, memoryview(raw.offsets),
            memoryview(raw.mask),
        )
        return np.frombuffer(ids, np.int32).copy()

    def load_entries(self, strings):
        if strings:
            self.get_or_add_bulk(list(strings))

    # ---- lookup ----
    def get_id(self, s: str) -> int:
        raw = self._ext.lookup_bulk(self._h, [s])
        return int(np.frombuffer(raw, np.int32)[0])

    @property
    def size(self) -> int:
        return int(self._ext.count(self._h))

    def entries(self) -> List[str]:
        n = self.size
        if len(self._cache) != n:
            payload, offs_raw = self._ext.export_payload(self._h)
            offsets = np.frombuffer(offs_raw, np.int64)
            self._cache = [
                payload[offsets[i]: offsets[i + 1]].decode("utf-8")
                for i in range(n)
            ]
        return self._cache

    def get_string(self, sid: int) -> Optional[str]:
        e = self.entries()
        if 0 <= sid < len(e):
            return e[sid]
        return None

    def get_strings(self, ids: np.ndarray) -> list:
        e = self.entries()
        n = len(e)
        return [e[i] if 0 <= i < n else None for i in np.asarray(ids).tolist()]

    # ---- host-side predicate evaluation ----
    ids_where = PyStringDictionary.ids_where
    like_ids = PyStringDictionary.like_ids
    regexp_ids = PyStringDictionary.regexp_ids
    compare_ids = PyStringDictionary.compare_ids

    @property
    def _strings(self):
        return self.entries()

    def translation_to(self, other) -> np.ndarray:
        """Bulk id translation via one native lookup pass."""
        entries = self.entries()
        if isinstance(other, NativeStringDictionary):
            raw = other._ext.lookup_bulk(other._h, entries)
            return np.frombuffer(raw, np.int32).copy()
        return PyStringDictionary.translation_to(self, other)


def _make_dictionary(dict_id: int = 0):
    from heavydb_tpu.native import load_strdict_ext

    if load_strdict_ext() is not None:
        return NativeStringDictionary(dict_id)
    return PyStringDictionary(dict_id)


class StringDictionary:
    """Factory preserving the original class name: returns the native
    implementation when the C++ library is available."""

    def __new__(cls, dict_id: int = 0):
        return _make_dictionary(dict_id)


def like_to_regex(pattern: str, escape: Optional[str] = None) -> str:
    """SQL LIKE pattern → python regex."""
    esc = escape if escape else "\\"
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == esc and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    return "".join(out)
