"""qwen_image LoRA training recipe (mirrors the reference's
train/qwen_image flow; objective in video_styler_tpu/trainers/image_training.py).

Smoke run — tiny model, a few optimizer steps, saves a LoRA safetensors:
    python examples/families/qwen_image/train_lora.py --smoke
Real run: convert the checkpoint through the family pipeline loader, cache
latents (trainers/latent_cache.py), then point this recipe at them.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from _family_runner import train  # noqa: E402

if __name__ == "__main__":
    train("qwen_image")
