"""Validate a trained full checkpoint for Wan2.2-I2V-A14B
(mirrors model_training/validate_full/Wan2.2-I2V-A14B.py): load the recipe's base
weights, merge the checkpoint, render a clip.

    python examples/wanvideo/model_training/validate_full/Wan2.2-I2V-A14B.py \
        --lora_path models/train/Wan2.2-I2V-A14B_full/epoch-4.safetensors
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from _runner import run  # noqa: E402

if __name__ == "__main__":
    run("Wan2.2-I2V-A14B")
