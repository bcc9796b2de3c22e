"""Native host-kernel layer: builds/loads the _hostops C++ extension.

Falls back to pure numpy implementations transparently — ``available()``
reports which path is active.  The build is cached next to the source.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_mod = None
_tried = False


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, f"_hostops{suffix}")


def _build() -> bool:
    """Compile hostops.cpp into the package dir.  Returns success."""
    import numpy as np

    src = os.path.join(_HERE, "hostops.cpp")
    out = _so_path()
    if os.path.exists(out) and os.path.getmtime(out) > os.path.getmtime(src):
        return True
    py_inc = sysconfig.get_paths()["include"]
    np_inc = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{py_inc}", f"-I{np_inc}", src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get() -> object:
    """Return the loaded _hostops module, or None (numpy fallback)."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    if not _build():
        return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_hostops", _so_path())
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        _mod = m
    except Exception:
        _mod = None
    return _mod


def available() -> bool:
    return get() is not None
