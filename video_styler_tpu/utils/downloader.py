"""HTTP weight/tokenizer download transports (ModelScope layout, HF fallback).

The reference bootstraps weights with `modelscope.snapshot_download` /
`huggingface_hub.hf_hub_download` (/root/reference/diffsynth/models/
downloader.py:1-111, utils/__init__.py:169-218). This build implements the
same two remote layouts directly over stdlib HTTP (urllib) — no SDK
dependency — behind the `register_transport` hook in utils/model_config.py:

  ModelScope:  GET {EP}/api/v1/models/{model_id}/repo/files?Recursive=true
               -> {"Data": {"Files": [{"Path": ...}, ...]}}
               GET {EP}/api/v1/models/{model_id}/repo?FilePath={path}
  HuggingFace: GET {EP}/api/models/{model_id}
               -> {"siblings": [{"rfilename": ...}, ...]}
               GET {EP}/{model_id}/resolve/main/{path}

Endpoints are env-overridable (VIDEO_STYLER_MODELSCOPE_ENDPOINT /
VIDEO_STYLER_HF_ENDPOINT, also honoring the conventional HF_ENDPOINT), which
is how the offline test suite exercises the full resolve->download->cache->
load chain against a local HTTP server. VIDEO_STYLER_OFFLINE=1 disables all
network with a descriptive error.

Rank-0 gating + the cross-process barrier live in ModelConfig
(utils/model_config.py:90-95), not here — a transport only ever runs on
process 0.
"""
from __future__ import annotations

import fnmatch
import json
import os
import shutil
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import List, Optional

DEFAULT_MODELSCOPE_ENDPOINT = "https://modelscope.cn"
DEFAULT_HF_ENDPOINT = "https://huggingface.co"


def _offline() -> bool:
    return os.environ.get("VIDEO_STYLER_OFFLINE", "0") == "1"


def _modelscope_endpoint() -> str:
    return os.environ.get("VIDEO_STYLER_MODELSCOPE_ENDPOINT",
                          DEFAULT_MODELSCOPE_ENDPOINT).rstrip("/")


def _hf_endpoint() -> str:
    return os.environ.get(
        "VIDEO_STYLER_HF_ENDPOINT",
        os.environ.get("HF_ENDPOINT", DEFAULT_HF_ENDPOINT)).rstrip("/")


def _http_get(url: str, dest: Optional[str] = None, retries: int = 3,
              backoff: float = 1.0, timeout: float = 60.0):
    """GET with exponential-backoff retry (the reference wraps its API calls
    the same way, src/utils/image_generation.py:80-129). Returns bytes, or
    writes to `dest` (atomic: .part then rename) and returns the path."""
    if _offline():
        raise RuntimeError(
            f"VIDEO_STYLER_OFFLINE=1: refusing network fetch of {url}")
    last = None
    for attempt in range(retries):
        try:
            req = urllib.request.Request(url, headers={
                "User-Agent": "video-styler-tpu/0.1"})
            with urllib.request.urlopen(req, timeout=timeout) as r:
                if dest is None:
                    return r.read()
                os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
                part = dest + ".part"
                with open(part, "wb") as f:
                    shutil.copyfileobj(r, f, length=1 << 20)
                os.replace(part, dest)
                return dest
        except (urllib.error.URLError, urllib.error.HTTPError,
                TimeoutError, OSError) as e:
            last = e
            if attempt + 1 < retries:
                time.sleep(backoff * (2 ** attempt))
    raise RuntimeError(f"download failed after {retries} attempts: {url} "
                       f"({type(last).__name__}: {last})")


def _match(files: List[str], allow_file_pattern) -> List[str]:
    """Filter a repo file listing by the ModelConfig origin_file_pattern
    semantics: None/'' = everything; 'dir/' = that subtree; otherwise
    fnmatch glob(s) (reference utils/__init__.py:186-194)."""
    if not allow_file_pattern:
        return files
    pats = (allow_file_pattern if isinstance(allow_file_pattern, list)
            else [allow_file_pattern])
    out: List[str] = []
    for pat in pats:
        if pat.endswith("/"):
            out += [f for f in files if f.startswith(pat)]
        else:
            out += [f for f in files if fnmatch.fnmatch(f, pat)]
    # stable de-dup
    return list(dict.fromkeys(out))


def modelscope_list_files(model_id: str) -> List[str]:
    url = (f"{_modelscope_endpoint()}/api/v1/models/{model_id}/repo/files"
           f"?Recursive=true")
    data = json.loads(_http_get(url))
    entries = (data.get("Data") or {}).get("Files") or []
    return [e["Path"] for e in entries
            if e.get("Type", "blob") != "tree" and "Path" in e]


def modelscope_transport(model_id: str, local_dir: str,
                         allow_file_pattern=None) -> List[str]:
    """Download (a filtered subset of) a ModelScope repo into local_dir,
    preserving relative paths — the snapshot_download layout ModelConfig
    resolves against (utils/model_config.py:70-78)."""
    files = _match(modelscope_list_files(model_id), allow_file_pattern)
    if not files:
        raise FileNotFoundError(
            f"ModelScope repo {model_id!r} has no files matching "
            f"{allow_file_pattern!r}")
    got = []
    for f in files:
        dest = os.path.join(local_dir, f)
        if not os.path.exists(dest):
            url = (f"{_modelscope_endpoint()}/api/v1/models/{model_id}/repo"
                   f"?FilePath={urllib.parse.quote(f)}")
            _http_get(url, dest=dest)
        got.append(dest)
    return got


def huggingface_list_files(model_id: str) -> List[str]:
    url = f"{_hf_endpoint()}/api/models/{model_id}"
    data = json.loads(_http_get(url))
    return [s["rfilename"] for s in data.get("siblings", [])
            if "rfilename" in s]


def huggingface_transport(model_id: str, local_dir: str,
                          allow_file_pattern=None) -> List[str]:
    files = _match(huggingface_list_files(model_id), allow_file_pattern)
    if not files:
        raise FileNotFoundError(
            f"HuggingFace repo {model_id!r} has no files matching "
            f"{allow_file_pattern!r}")
    got = []
    for f in files:
        dest = os.path.join(local_dir, f)
        if not os.path.exists(dest):
            url = (f"{_hf_endpoint()}/{model_id}/resolve/main/"
                   f"{urllib.parse.quote(f)}")
            _http_get(url, dest=dest)
        got.append(dest)
    return got


_REGISTERED = False


def ensure_default_transports() -> None:
    """Idempotently register the two stock transports under the names the
    reference uses for download_resource ("ModelScope", "HuggingFace")."""
    global _REGISTERED
    if _REGISTERED:
        return
    from .model_config import register_transport
    register_transport("ModelScope", modelscope_transport)
    register_transport("HuggingFace", huggingface_transport)
    _REGISTERED = True


# umT5-xxl tokenizer assets the reference vendors in-package
# (diffsynth/tokenizer_configs/, setup.py:28). We fetch them on demand
# instead of shipping third-party files.
UMT5_TOKENIZER_FILES = ["spiece.model", "tokenizer.json",
                        "tokenizer_config.json", "special_tokens_map.json"]


def download_tokenizer(model_id: str = "google/umt5-xxl",
                       local_dir: Optional[str] = None,
                       files: Optional[List[str]] = None) -> str:
    """Fetch tokenizer assets for `model_id` into the model cache and return
    the directory. Tries ModelScope first, then HuggingFace (the reference's
    downloading_priority, downloader.py:58)."""
    from .model_config import default_model_dir
    local_dir = local_dir or os.path.join(default_model_dir(), model_id)
    want = files or UMT5_TOKENIZER_FILES
    if all(os.path.isfile(os.path.join(local_dir, f)) for f in want[:1]):
        return local_dir
    errors = []
    for transport in (modelscope_transport, huggingface_transport):
        try:
            transport(model_id, local_dir, [f for f in want])
            return local_dir
        except Exception as e:  # noqa: BLE001 - try the next source
            errors.append(f"{transport.__name__}: {e}")
    raise RuntimeError(
        f"could not fetch tokenizer {model_id!r}: " + "; ".join(errors))
