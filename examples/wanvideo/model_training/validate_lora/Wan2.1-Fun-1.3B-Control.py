"""Validate a trained lora checkpoint for Wan2.1-Fun-1.3B-Control
(mirrors model_training/validate_lora/Wan2.1-Fun-1.3B-Control.py): load the recipe's base
weights, merge the checkpoint, render a clip.

    python examples/wanvideo/model_training/validate_lora/Wan2.1-Fun-1.3B-Control.py \
        --lora_path models/train/Wan2.1-Fun-1.3B-Control_lora/epoch-4.safetensors
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from _runner import run  # noqa: E402

if __name__ == "__main__":
    run("Wan2.1-Fun-1.3B-Control")
