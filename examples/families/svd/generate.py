"""svd inference recipe (mirrors the reference's
/root/reference/examples/video_synthesis/svd_text_to_video.py).

Smoke run (tiny random-init models, swept by tests/test_examples_smoke.py):
    python examples/families/svd/generate.py --smoke
Real run (full checkpoints through the family converters):
    python examples/video_gen.py --family svd --prompt "..." --dit_path ...
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from _family_runner import run  # noqa: E402

if __name__ == "__main__":
    run("svd")
