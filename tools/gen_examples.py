"""Generate the per-model example tree from examples/wanvideo/recipes.py.

Mirrors the reference's file matrix (/root/reference/examples/wanvideo/):
  model_inference/<Name>.py          (29 files)
  model_training/lora/<Name>.sh      (27)
  model_training/full/<Name>.sh      (27)
  model_training/validate_lora/<Name>.py
  model_training/validate_full/<Name>.py

Run `python tools/gen_examples.py` after editing recipes.py; the generated
files are committed so users can copy them like the reference's.
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "examples", "wanvideo"))
from recipes import RECIPES  # noqa: E402

WV = os.path.join(ROOT, "examples", "wanvideo")


def write(rel, content):
    path = os.path.join(WV, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


INFER_TPL = '''"""{name} inference recipe (mirrors
/root/reference/examples/wanvideo/model_inference/{name}.py).

Real run (downloads via the ModelScope/HF transport or local --dit_path):
    python examples/wanvideo/model_inference/{name}.py --prompt "..."
Smoke run (tiny random-init models, no checkpoints):
    python examples/wanvideo/model_inference/{name}.py --smoke
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from _runner import run  # noqa: E402

if __name__ == "__main__":
    run("{name}")
'''

VALIDATE_TPL = '''"""Validate a trained {kind} checkpoint for {name}
(mirrors model_training/validate_{kind}/{name}.py): load the recipe\'s base
weights, merge the checkpoint, render a clip.

    python examples/wanvideo/model_training/validate_{kind}/{name}.py \\
        --lora_path models/train/{name}_{kind}/epoch-4.safetensors
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from _runner import run  # noqa: E402

if __name__ == "__main__":
    run("{name}")
'''

TRAIN_TPL = '''#!/usr/bin/env bash
# {name} {kind} training recipe (mirrors
# /root/reference/examples/wanvideo/model_training/{kind}/{name}.sh).
# --smoke appended runs the tiny-config training path end-to-end.
python examples/train.py \\
  --dataset_base_path data/example_video_dataset \\
  --dataset_metadata_path data/example_video_dataset/metadata.csv \\
  --height {height} \\
  --width {width} \\
  --num_frames {frames} \\
  --dataset_repeat 100 \\
  --model_id_with_origin_paths "{models}" \\
  --learning_rate {lr} \\
  --num_epochs 5 \\
  --remove_prefix_in_ckpt "pipe.{base}." \\
  --output_path "./models/train/{name}_{kind}"{lora_args}{extra}{bounds} \\
  "$@"
'''


def model_list(r, expert=None):
    ids = []
    for p in r.files:
        ids.append(f"{r.model_id}:{p}")
    if r.dual_expert:
        hi, lo = r.high_low_files
        ids.insert(0, f"{r.model_id}:{hi if expert == 'high' else lo}")
    for mid, pat in r.extra_models:
        ids.append(f"{mid}:{pat}")
    return ",".join(ids)


def train_sh(r, kind):
    # dual-expert recipes get one stanza per expert with its timestep band
    # (Wan2.2 .sh comments: boundary corresponds to the expert's range)
    stanzas = []
    experts = (("high", 0), ("low", 1)) if r.dual_expert else ((None, None),)
    for expert, bi in experts:
        lora_args = ""
        if kind == "lora":
            lora_args = (f" \\\n  --lora_base_model \"{r.lora_base}\""
                         f" \\\n  --lora_target_modules \"q,k,v,o,ffn.0,ffn.2\""
                         f" \\\n  --lora_rank 32")
        extra = ""
        if r.extra_inputs:
            extra = f" \\\n  --extra_inputs \"{','.join(r.extra_inputs)}\""
        bounds = ""
        if r.boundaries and expert is not None:
            lo_b, hi_b = r.boundaries[bi]
            bounds = (f" \\\n  --min_timestep_boundary {lo_b}"
                      f" \\\n  --max_timestep_boundary {hi_b}")
        stanzas.append(TRAIN_TPL.format(
            name=r.name + (f"-{expert}-noise" if expert else ""),
            kind=kind, height=r.height, width=r.width, frames=r.num_frames,
            models=model_list(r, expert),
            lr="1e-4" if kind == "lora" else "1e-5",
            base=r.lora_base if kind == "lora" else "dit",
            lora_args=lora_args, extra=extra, bounds=bounds))
    return "\n".join(stanzas)


FAM = os.path.join(ROOT, "examples", "families")

FAM_INFER_TPL = '''"""{family} inference recipe (mirrors the reference\'s
/root/reference/{ref}).

Smoke run (tiny random-init models, swept by tests/test_examples_smoke.py):
    python examples/families/{family}/generate.py --smoke
Real run (full checkpoints through the family converters):
    python {real} --prompt "..." --dit_path ...
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from _family_runner import run  # noqa: E402

if __name__ == "__main__":
    run("{family}")
'''

FAM_TRAIN_TPL = '''"""{family} LoRA training recipe (mirrors the reference\'s
train/{family} flow; objective in video_styler_tpu/trainers/{trainer}).

Smoke run — tiny model, a few optimizer steps, saves a LoRA safetensors:
    python examples/families/{family}/train_lora.py --smoke
Real run: convert the checkpoint through the family pipeline loader, cache
latents (trainers/latent_cache.py), then point this recipe at them.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from _family_runner import train  # noqa: E402

if __name__ == "__main__":
    train("{family}")
'''


def write_fam(rel, content):
    path = os.path.join(FAM, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def gen_families():
    # both registries are named recipes.py — load the families one by path
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "family_recipes", os.path.join(FAM, "recipes.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    FAMILIES = mod.FAMILIES
    n_train = 0
    for family, meta in sorted(FAMILIES.items()):
        write_fam(f"{family}/generate.py", FAM_INFER_TPL.format(
            family=family, ref=meta["ref"], real=meta["real"]))
        if meta["train"]:
            trainer = ("sd_training.py" if family in ("sd", "sdxl")
                       else "image_training.py")
            write_fam(f"{family}/train_lora.py", FAM_TRAIN_TPL.format(
                family=family, trainer=trainer))
            n_train += 1
    print(f"generated {len(FAMILIES)} family inference + {n_train} training "
          f"recipes under {FAM}")


def main():
    for name, r in sorted(RECIPES.items()):
        write(f"model_inference/{name}.py", INFER_TPL.format(name=name))
        for kind in ("lora", "full"):
            write(f"model_training/{kind}/{name}.sh", train_sh(r, kind))
            write(f"model_training/validate_{kind}/{name}.py",
                  VALIDATE_TPL.format(name=name, kind=kind))
    n = len(RECIPES)
    print(f"generated {n} inference + {2*n} training + {2*n} validate files "
          f"under {WV}")
    gen_families()


if __name__ == "__main__":
    main()
