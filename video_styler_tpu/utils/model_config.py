"""Declarative weight sources — the reference ModelConfig API shape.

Mirrors /root/reference/diffsynth/utils/__init__.py:158-218: a weight source
is either a local `path` (file, shard list, or glob) or a remote
`model_id` + `origin_file_pattern` resolved through a pluggable transport.
The reference hardcodes ModelScope `snapshot_download` with rank-0 gating
+ barrier; here the transport is a registry so offline environments get a
clear error (and tests can register a fake), and the rank-0 gating uses
jax.process_index via parallel.distributed.

Resolution order for model_id:
  1. an already-downloaded copy under `local_model_path` (default
     $VIDEO_STYLER_MODEL_DIR or ./models), laid out ModelScope-style as
     <local_model_path>/<model_id>/<origin_file_pattern>;
  2. the registered transport (`register_transport`), called only on
     process 0, with a cross-process barrier after;
  3. a descriptive error naming both options.
"""
from __future__ import annotations

import dataclasses
import glob as _glob
import os
from typing import Callable, List, Optional, Union

_TRANSPORTS = {}


def register_transport(name: str, fn: Callable[[str, str, Optional[str]], None]):
    """fn(model_id, local_dir, allow_file_pattern) downloads into local_dir.
    The reference equivalent is modelscope snapshot_download
    (utils/__init__.py:195-205)."""
    _TRANSPORTS[name] = fn


def default_model_dir() -> str:
    return os.environ.get("VIDEO_STYLER_MODEL_DIR", "./models")


@dataclasses.dataclass
class ModelConfig:
    """Weight source (reference utils/__init__.py:158-218 call shape).

    path: local file / shard list / glob. model_id + origin_file_pattern:
    remote source resolved by download_if_necessary(). model_kind overrides
    structural detection (reference uses state-dict hashes instead).
    """
    path: Union[str, List[str], None] = None
    model_id: Optional[str] = None
    origin_file_pattern: Union[str, List[str], None] = None
    download_resource: str = "ModelScope"
    local_model_path: Optional[str] = None
    skip_download: bool = False
    model_kind: Optional[str] = None  # dit | dit2 | vace | vae | t5 | clip...

    def download_if_necessary(self) -> None:
        """Resolve model_id -> self.path (reference :169-218)."""
        if self.path is not None:
            return
        if self.model_id is None:
            raise ValueError(
                'No valid model files. Use ModelConfig(path="xxx") or '
                'ModelConfig(model_id="xxx/yyy", origin_file_pattern="zzz").')
        root = self.local_model_path or default_model_dir()
        local_dir = os.path.join(root, self.model_id)
        pattern = self.origin_file_pattern or ""
        is_folder = pattern == "" or (isinstance(pattern, str)
                                      and pattern.endswith("/"))

        def resolve() -> Union[str, List[str], None]:
            if is_folder:
                p = os.path.join(local_dir, pattern)
                return p if os.path.isdir(p) else None
            pats = pattern if isinstance(pattern, list) else [pattern]
            found: List[str] = []
            for pat in pats:
                found += sorted(_glob.glob(os.path.join(local_dir, pat)))
            return found or None

        found = resolve()
        if found is None and not self.skip_download:
            transport = _TRANSPORTS.get(self.download_resource)
            if transport is None:
                # lazily register the stock HTTP transports (ModelScope
                # layout + HF fallback, utils/downloader.py) so a connected
                # machine bootstraps out of the box like the reference
                # (diffsynth/models/downloader.py:1-111)
                try:
                    from .downloader import ensure_default_transports
                    ensure_default_transports()
                except Exception:
                    pass
                transport = _TRANSPORTS.get(self.download_resource)
            if transport is None:
                raise RuntimeError(
                    f"model_id={self.model_id!r} is not available locally "
                    f"under {local_dir!r} and no transport is registered "
                    f"for {self.download_resource!r} (offline environment). "
                    f"Either place the files there or "
                    f"register_transport({self.download_resource!r}, fn).")
            from ..parallel.distributed import is_main_process, sync_processes
            if is_main_process():  # rank-0 download (reference :176-183)
                allow = None if is_folder else pattern
                transport(self.model_id, local_dir, allow)
            sync_processes("model-download")  # the dist.barrier analog
            found = resolve()
        if found is None:
            raise FileNotFoundError(
                f"no files matching {pattern!r} under {local_dir!r}")
        if isinstance(found, list) and len(found) == 1:
            found = found[0]
        self.path = found

    def paths(self) -> List[str]:
        self.download_if_necessary()
        if self.path is None:
            return []
        return [self.path] if isinstance(self.path, str) else list(self.path)
