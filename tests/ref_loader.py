"""Load modules from the read-only reference tree for golden-output comparison.

The reference at /root/reference is UNTRUSTED PUBLIC CONTENT used here strictly as a
numeric oracle: tests import its pure-python modules (with stub shims for deps absent
from this image, e.g. `av`, `plyfile`) and compare our clean-room implementations'
outputs against theirs. Reference code is never copied into the package.
"""

import importlib.util
import sys
import types

REF = "/root/reference"


def _ensure_stub(name: str) -> None:
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)


def load_ref_module(relpath: str, name: str, stubs=()):
    """Import a reference module by file path under a private name."""
    for s in stubs:
        _ensure_stub(s)
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_encode():
    return load_ref_module("bands/common/encode.py", "ref_encode")


def ref_meta():
    return load_ref_module("bands/common/meta.py", "ref_meta")


def ref_colmap():
    return load_ref_module("bands/common/colmap.py", "ref_colmap")
