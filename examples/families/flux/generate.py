"""flux inference recipe (mirrors the reference's
/root/reference/examples/flux/model_inference/FLUX.1-dev.py).

Smoke run (tiny random-init models, swept by tests/test_examples_smoke.py):
    python examples/families/flux/generate.py --smoke
Real run (full checkpoints through the family converters):
    python examples/image_gen.py --family flux --prompt "..." --dit_path ...
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from _family_runner import run  # noqa: E402

if __name__ == "__main__":
    run("flux")
