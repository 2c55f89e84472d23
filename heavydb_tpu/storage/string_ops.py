"""Host-side string kernel implementations (reference StringOps/StringOps.h
op semantics), applied over dictionary entries to build translation maps."""

from __future__ import annotations

import base64
import re
import urllib.parse
from typing import Optional, Tuple


def _substring(s: str, start, length=None) -> str:
    start = int(start)
    # SQL 1-based; negative wraps like HeavyDB/Postgres substr
    if start > 0:
        i = start - 1
    else:
        i = max(len(s) + start, 0) if start < 0 else 0
    if length is None:
        return s[i:]
    return s[i : i + int(length)]


def apply_op(s: str, name: str, args: Tuple) -> Optional[str]:
    if name == "IDENTITY":
        return s
    if name in ("UPPER", "UCASE"):
        return s.upper()
    if name in ("LOWER", "LCASE"):
        return s.lower()
    if name == "INITCAP":
        return re.sub(r"[a-zA-Z]+", lambda m: m.group(0).capitalize(), s)
    if name == "REVERSE":
        return s[::-1]
    if name == "TRIM":
        return s.strip(args[0]) if args else s.strip()
    if name == "LTRIM":
        return s.lstrip(args[0]) if args else s.lstrip()
    if name == "RTRIM":
        return s.rstrip(args[0]) if args else s.rstrip()
    if name in ("SUBSTRING", "SUBSTR"):
        return _substring(s, *args)
    if name == "REPLACE":
        return s.replace(str(args[0]), str(args[1]))
    if name == "LPAD":
        width = int(args[0])
        pad = str(args[1]) if len(args) > 1 else " "
        if len(s) >= width:
            return s[:width]
        need = width - len(s)
        return (pad * need)[:need] + s
    if name == "RPAD":
        width = int(args[0])
        pad = str(args[1]) if len(args) > 1 else " "
        if len(s) >= width:
            return s[:width]
        need = width - len(s)
        return s + (pad * need)[:need]
    if name == "REPEAT":
        return s * int(args[0])
    if name == "SPLIT_PART":
        parts = s.split(str(args[0]))
        n = int(args[1])
        idx = n - 1 if n > 0 else len(parts) + n
        return parts[idx] if 0 <= idx < len(parts) else None
    if name == "REGEXP_REPLACE":
        repl = str(args[1]).replace("\\", "\\\\") if False else str(args[1])
        return re.sub(str(args[0]), repl, s)
    if name == "CONCAT":
        return s + str(args[0])
    if name == "PRECONCAT":
        return str(args[0]) + s
    if name == "OVERLAY":
        # OVERLAY(s PLACING r FROM start [FOR len]) — bound as
        # OVERLAY(s, r, start[, len]); 1-based start
        r = str(args[0])
        start = int(args[1])
        ln = int(args[2]) if len(args) > 2 else len(r)
        i = max(start - 1, 0)
        return s[:i] + r + s[i + ln:]
    if name == "JSON_VALUE":
        # simple JSONPath subset: $.a.b[0].c (reference JSON_VALUE op)
        import json as _json

        try:
            v = _json.loads(s)
        except _json.JSONDecodeError:
            return None
        path = str(args[0])
        if path.startswith("$"):
            path = path[1:]
        for part in re.findall(r"\.([A-Za-z_][\w]*)|\[(\d+)\]", path):
            key, idx = part
            try:
                v = v[key] if key else v[int(idx)]
            except (KeyError, IndexError, TypeError):
                return None
        if v is None or isinstance(v, (dict, list)):
            return None
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)
    if name == "REGEXP_SUBSTR":
        # REGEXP_SUBSTR(s, pattern[, position[, occurrence]])
        pat = str(args[0])
        pos = int(args[1]) if len(args) > 1 else 1
        occ = int(args[2]) if len(args) > 2 else 1
        ms = list(re.finditer(pat, s[max(pos - 1, 0):]))
        if len(ms) < occ or occ < 1:
            return None
        return ms[occ - 1].group(0)
    if name == "BASE64_ENCODE":
        return base64.b64encode(s.encode()).decode()
    if name == "BASE64_DECODE":
        try:
            return base64.b64decode(s.encode()).decode()
        except Exception:
            return None
    if name == "URL_ENCODE":
        return urllib.parse.quote(s, safe="")
    if name == "URL_DECODE":
        return urllib.parse.unquote(s)
    raise ValueError(f"unknown string op {name}")


def apply_chain(s: Optional[str], ops) -> Optional[str]:
    for name, args in ops:
        if s is None:
            return None
        s = apply_op(s, name, args)
    return s


def int_string_fn(s: str, fn: str, args: Tuple):
    """Integer-valued string kernels evaluated per dictionary entry
    (reference StringOps POSITION/REGEXP_COUNT/LEVENSHTEIN...)."""
    if fn == "POSITION":
        sub = str(args[0])
        start = int(args[1]) if len(args) > 1 else 1
        i = s.find(sub, max(start - 1, 0))
        return i + 1  # 0 = not found (1-based like the reference)
    if fn == "REGEXP_COUNT":
        pat = str(args[0])
        pos = int(args[1]) if len(args) > 1 else 1
        return len(re.findall(pat, s[max(pos - 1, 0):]))
    if fn == "LEVENSHTEIN":
        t = str(args[0])
        if len(s) < len(t):
            s, t = t, s
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]
    raise ValueError(fn)
