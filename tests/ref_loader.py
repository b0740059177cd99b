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


def _stub_torchvision():
    """torchvision is absent; the image-encoder module only uses
    T.Compose/Resize/Normalize at weight-load time, so a light stub suffices."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class _T:
        def __init__(self, *a, **k):
            self.args = a

        def __call__(self, x):
            return x

    class Normalize(_T):
        def __call__(self, x):
            import torch
            mean, std = self.args
            return (x - torch.tensor(mean).view(1, 3, 1, 1)) / \
                torch.tensor(std).view(1, 3, 1, 1)

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    transforms.Compose = Compose
    transforms.Resize = _T
    transforms.CenterCrop = _T
    transforms.ToTensor = _T
    transforms.Normalize = Normalize
    transforms.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def load_ref(modname: str):
    if modname.endswith("wan_video_image_encoder"):
        _stub_torchvision()
    """load_ref('models.wan_video_dit') -> the reference module object."""
    _fake_pkg("diffsynth", os.path.join(REF_ROOT, "diffsynth"))
    for sub in ("models", "schedulers", "pipelines", "prompters", "utils_pkg"):
        pass
    _fake_pkg("diffsynth.models", os.path.join(REF_ROOT, "diffsynth", "models"))
    _fake_pkg("diffsynth.schedulers", os.path.join(REF_ROOT, "diffsynth", "schedulers"))
    # fake every intermediate package so heavy package __init__s are skipped
    parts = modname.split(".")[:-1]
    for i in range(len(parts)):
        name = "diffsynth." + ".".join(parts[:i + 1])
        _fake_pkg(name, os.path.join(REF_ROOT, "diffsynth", *parts[:i + 1]))
    return importlib.import_module(f"diffsynth.{modname}")
