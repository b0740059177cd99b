#!/usr/bin/env bash
# Bootstrap the Ditto weights (mirrors /root/reference/scripts/download_models.sh,
# which uses huggingface-cli) through this framework's own HTTP transport
# (utils/downloader.py: ModelScope repo API with HF fallback, stdlib urllib —
# no SDK needed). Files land in $VIDEO_STYLER_MODEL_DIR (default ./models)
# in the layout ModelConfig(model_id=...) resolves against.
set -euo pipefail
cd "$(dirname "$0")/.."

python - "$@" <<'EOF'
import sys
sys.path.insert(0, ".")
from video_styler_tpu.utils.downloader import (
    huggingface_transport, modelscope_transport, download_tokenizer)
from video_styler_tpu.utils.model_config import default_model_dir
import os

targets = sys.argv[1:] or [
    # the infer_ditto flagship (reference download_models.sh:2)
    "Wan-AI/Wan2.1-VACE-14B:*",
    # the Ditto LoRAs (reference :4)
    "QingyanBai/Ditto_models:models/*",
]
root = default_model_dir()
for spec in targets:
    model_id, _, pattern = spec.partition(":")
    dest = os.path.join(root, model_id)
    print(f"[download] {model_id} ({pattern or '*'}) -> {dest}")
    try:
        got = modelscope_transport(model_id, dest, pattern or None)
    except Exception as e:
        print(f"  ModelScope failed ({e}); trying HuggingFace")
        got = huggingface_transport(model_id, dest, pattern or None)
    print(f"  {len(got)} file(s)")
print("[download] umT5 tokenizer assets")
print(" ", download_tokenizer())
EOF
