"""Smoke sweep of the generated examples tree — every recipe's inference
script runs end-to-end on tiny random-init models (the reference's examples
matrix is its only 'test suite', SURVEY.md §4; here it IS in the test suite).
"""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "examples", "wanvideo"))

from recipes import RECIPES  # noqa: E402

# one representative per family runs in the default (quick) tier; the full
# 28-recipe sweep is the slow tier
QUICK = ["Wan2.1-T2V-1.3B", "Wan2.1-VACE-14B", "Wan2.1-I2V-14B-480P",
         "Wan2.2-TI2V-5B", "Wan2.2-T2V-A14B",
         "Wan2.1-Fun-V1.1-1.3B-Control-Camera"]
SLOW = sorted(set(RECIPES) - set(QUICK))


def _run_recipe(name):
    from _runner import run
    out = run(name, argv=["--smoke"])
    assert out is not None


@pytest.mark.parametrize("name", QUICK)
def test_recipe_smoke_quick(name):
    _run_recipe(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_recipe_smoke_full(name):
    _run_recipe(name)


def test_generated_tree_is_current():
    """tools/gen_examples.py output matches the committed files — the
    registry is the single source of truth."""
    for name in RECIPES:
        for rel in (f"model_inference/{name}.py",
                    f"model_training/lora/{name}.sh",
                    f"model_training/full/{name}.sh",
                    f"model_training/validate_lora/{name}.py"):
            path = os.path.join(ROOT, "examples", "wanvideo", rel)
            assert os.path.isfile(path), f"missing generated file {rel}"


@pytest.mark.parametrize("script", ["teacache.py",
                                    "unified_sequence_parallel.py"])
def test_acceleration_demo_smoke(script):
    p = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "examples", "wanvideo", "acceleration", script),
         "--smoke"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert p.returncode == 0, p.stderr[-2000:]


# ---------------------------------------------------------------------------
# non-Wan family recipes (examples/families/, VERDICT r4 item 8)
# ---------------------------------------------------------------------------

import importlib.util  # noqa: E402

_fam_dir = os.path.join(ROOT, "examples", "families")
_spec = importlib.util.spec_from_file_location(
    "family_recipes", os.path.join(_fam_dir, "recipes.py"))
_fam_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_fam_mod)
FAMILIES = _fam_mod.FAMILIES

_rspec = importlib.util.spec_from_file_location(
    "family_runner", os.path.join(_fam_dir, "_family_runner.py"))
_fam_runner = importlib.util.module_from_spec(_rspec)
_rspec.loader.exec_module(_fam_runner)

FAM_QUICK = ["flux", "cog_video"]
FAM_SLOW = sorted(set(FAMILIES) - set(FAM_QUICK))
TRAIN_FAMS = sorted(n for n, m in FAMILIES.items() if m["train"])


@pytest.mark.parametrize("family", FAM_QUICK)
def test_family_smoke_quick(family):
    assert _fam_runner.run(family, argv=["--smoke"]) is not None


@pytest.mark.slow
@pytest.mark.parametrize("family", FAM_SLOW)
def test_family_smoke_full(family):
    assert _fam_runner.run(family, argv=["--smoke"]) is not None


@pytest.mark.parametrize("family", ["flux"])
def test_family_train_quick(family, tmp_path):
    losses = _fam_runner.train(
        family, argv=["--smoke", "--output_path",
                      str(tmp_path / "lora.safetensors")])
    assert losses[-1] < losses[0], "LoRA training loss did not decrease"
    assert os.path.exists(tmp_path / "lora.safetensors")


@pytest.mark.slow
@pytest.mark.parametrize("family", sorted(set(TRAIN_FAMS) - {"flux"}))
def test_family_train_full(family, tmp_path):
    losses = _fam_runner.train(
        family, argv=["--smoke", "--output_path",
                      str(tmp_path / "lora.safetensors")])
    assert losses[-1] < losses[0], "LoRA training loss did not decrease"
    assert os.path.exists(tmp_path / "lora.safetensors")


def test_family_tree_is_current():
    """tools/gen_examples.py output exists for every registry entry."""
    for family, meta in FAMILIES.items():
        assert os.path.isfile(os.path.join(_fam_dir, family, "generate.py"))
        if meta["train"]:
            assert os.path.isfile(
                os.path.join(_fam_dir, family, "train_lora.py"))
