"""Wan2.1-1.3b-speedcontrol-v1 inference recipe (mirrors
/root/reference/examples/wanvideo/model_inference/Wan2.1-1.3b-speedcontrol-v1.py).

Real run (downloads via the ModelScope/HF transport or local --dit_path):
    python examples/wanvideo/model_inference/Wan2.1-1.3b-speedcontrol-v1.py --prompt "..."
Smoke run (tiny random-init models, no checkpoints):
    python examples/wanvideo/model_inference/Wan2.1-1.3b-speedcontrol-v1.py --smoke
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from _runner import run  # noqa: E402

if __name__ == "__main__":
    run("Wan2.1-1.3b-speedcontrol-v1")
