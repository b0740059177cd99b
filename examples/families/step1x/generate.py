"""step1x inference recipe (mirrors the reference's
/root/reference/examples/step1x/step1x.py).

Smoke run (tiny random-init models, swept by tests/test_examples_smoke.py):
    python examples/families/step1x/generate.py --smoke
Real run (full checkpoints through the family converters):
    python examples/image_gen.py --family flux (+ step1x connector via FluxImagePipeline.step1x_connector_params) --prompt "..." --dit_path ...
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from _family_runner import run  # noqa: E402

if __name__ == "__main__":
    run("step1x")
