"""Load individual reference (torch) modules for golden parity tests.

The reference package __init__ pulls heavy deps (modelscope), so we register
fake parent packages whose __path__ points at the real files and import only
the leaf modules we need. Parity tests are skipped when /root/reference is
not present (the framework itself never imports the reference).
"""
import importlib
import os
import sys
import types

REF_ROOT = "/root/reference"


def ref_available() -> bool:
    return os.path.isdir(os.path.join(REF_ROOT, "diffsynth"))


def _fake_pkg(name: str, path: str):
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m


def load_ref(modname: str):
    """load_ref('models.wan_video_dit') -> the reference module object."""
    _fake_pkg("diffsynth", os.path.join(REF_ROOT, "diffsynth"))
    for sub in ("models", "schedulers", "pipelines", "prompters", "utils_pkg"):
        pass
    _fake_pkg("diffsynth.models", os.path.join(REF_ROOT, "diffsynth", "models"))
    _fake_pkg("diffsynth.schedulers", os.path.join(REF_ROOT, "diffsynth", "schedulers"))
    return importlib.import_module(f"diffsynth.{modname}")
