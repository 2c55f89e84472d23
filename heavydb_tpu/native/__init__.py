"""Native (C++) components, loaded via ctypes.

The library builds on first import (g++ is in the image); if the toolchain
is unavailable the callers fall back to pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


_EXT = None
_EXT_TRIED = False
_CSV_EXT = None
_CSV_TRIED = False


def load_csv_ext():
    """Native CSV parser extension (csv_ext.cpp) or None."""
    global _CSV_EXT, _CSV_TRIED
    with _LOCK:
        if _CSV_TRIED:
            return _CSV_EXT
        _CSV_TRIED = True
        import hashlib
        import importlib.util
        import sysconfig

        src = os.path.join(_HERE, "csv_ext.cpp")
        try:
            with open(src, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
        except OSError:
            return None
        out = os.path.join(_HERE, f"_csv_ext_{digest}.so")
        if not os.path.exists(out):
            inc = sysconfig.get_path("include")
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", f"-I{inc}", src, "-o", out],
                    check=True, capture_output=True, timeout=180,
                )
            except Exception:
                return None
        try:
            spec = importlib.util.spec_from_file_location("_csv_ext", out)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _CSV_EXT = mod
        except Exception:
            _CSV_EXT = None
        return _CSV_EXT


def load_strdict_ext():
    """CPython extension module (preferred) or None."""
    global _EXT, _EXT_TRIED
    with _LOCK:
        if _EXT_TRIED:
            return _EXT
        _EXT_TRIED = True
        import hashlib
        import sysconfig

        src = os.path.join(_HERE, "strdict_ext.cpp")
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        # content-addressed build output: a stale or foreign .so can never
        # be picked up (mtime comparisons fail on fresh clones)
        out = os.path.join(_HERE, f"_strdict_ext_{digest}.so")
        if not os.path.exists(out):
            inc = sysconfig.get_path("include")
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     f"-I{inc}", src, "-o", out],
                    check=True, capture_output=True, timeout=180,
                )
            except Exception:
                return None
        try:
            import importlib.util

            spec = importlib.util.spec_from_file_location("_strdict_ext", out)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _EXT = mod
        except Exception:
            _EXT = None
        return _EXT
