"""Training stack: LoRA train/apply/export round trip, dataset operators."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit
from video_styler_tpu.models.wan_vace import VaceConfig, init_vace
from video_styler_tpu.trainers.lora_train import (
    init_lora, apply_lora, export_lora_state_dict,
)
from video_styler_tpu.lora import merge_lora
from video_styler_tpu.trainers.training import flow_match_loss, make_train_step
from video_styler_tpu.schedulers import FlowMatchScheduler

TINY = WanDiTConfig(dim=96, in_dim=4, ffn_dim=192, out_dim=4, num_heads=2,
                    num_layers=2, text_dim=64, freq_dim=32)


def test_lora_apply_equals_merge_of_export():
    """apply_lora(params, lora) == merge_lora(params, export(lora)) — proves
    checkpoints we train interoperate with the reference merge semantics."""
    params = init_wan_dit(jax.random.PRNGKey(0), TINY)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    # non-zero B so the delta is non-trivial
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape), lora)

    applied = apply_lora(params, lora)
    sd = export_lora_state_dict(lora)
    merged = merge_lora(params, sd, alpha=1.0)

    a_leaves = jax.tree_util.tree_leaves(applied)
    m_leaves = jax.tree_util.tree_leaves(merged)
    for a, m in zip(a_leaves, m_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(m),
                                   rtol=1e-5, atol=1e-6)
    # and it actually changed something
    p_leaves = jax.tree_util.tree_leaves(params)
    assert any(not np.allclose(np.asarray(a), np.asarray(p))
               for a, p in zip(a_leaves, p_leaves))


def test_vace_lora_export_naming():
    vcfg = VaceConfig(vace_layers=(0, 1), vace_in_dim=72, dim=96, num_heads=2,
                      ffn_dim=192)
    vparams = init_vace(jax.random.PRNGKey(0), vcfg)
    lora = init_lora(jax.random.PRNGKey(1), vparams, rank=4,
                     targets=("blocks.self_attn.q", "blocks.ffn.fc1"))
    sd = export_lora_state_dict(lora)
    sd = {k.replace("blocks.", "vace_blocks.", 1): v for k, v in sd.items()}
    assert "vace_blocks.0.self_attn.q.lora_A.weight" in sd
    assert "vace_blocks.1.ffn.0.lora_B.weight" in sd
    assert sd["vace_blocks.0.self_attn.q.lora_A.weight"].shape == (4, 96)


def test_train_step_reduces_loss():
    """A few supervised steps on a fixed batch should reduce the loss."""
    import optax
    params = init_wan_dit(jax.random.PRNGKey(0), TINY)
    sched = FlowMatchScheduler(shift=5.0, sigma_min=0.0, extra_one_step=True)
    sched.set_timesteps(1000, training=True)
    step = make_train_step(TINY, optax.adam(1e-3), scheduler=sched, remat=False)
    jstep = jax.jit(step)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 8, 8))
    context = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64))
    import optax
    opt_state = optax.adam(1e-3).init(params)
    rng = jax.random.PRNGKey(3)
    losses = []
    for i in range(8):
        loss, params, opt_state = jstep(params, opt_state, latents, context,
                                        jax.random.fold_in(rng, 0))  # fixed rng
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_unified_dataset_operators(tmp_path):
    from video_styler_tpu.trainers.unified_dataset import (
        UnifiedDataset, ToAbsolutePath, LoadImage, ImageCropAndResize,
        load_metadata)
    from PIL import Image
    img_path = tmp_path / "a.png"
    Image.new("RGB", (64, 48), (255, 0, 0)).save(img_path)
    csv_path = tmp_path / "meta.csv"
    csv_path.write_text("image,prompt\na.png,red square\n")

    op = ToAbsolutePath(str(tmp_path)) >> LoadImage() >> ImageCropAndResize(32, 32)
    ds = UnifiedDataset(base_path=str(tmp_path), metadata_path=str(csv_path),
                        data_file_keys=("image",), main_data_operator=op,
                        repeat=2)
    assert len(ds) == 2
    sample = ds[0]
    assert sample["prompt"] == "red square"
    assert sample["image"].size == (32, 32)


def test_model_logger(tmp_path):
    from video_styler_tpu.trainers.logger import ModelLogger
    params = init_wan_dit(jax.random.PRNGKey(0), TINY)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=2,
                     targets=("blocks.self_attn.q",))
    logger = ModelLogger(str(tmp_path), save_steps=2,
                         rename_blocks_to="vace_blocks")
    logger.on_step_end(lora)
    logger.on_step_end(lora)
    assert (tmp_path / "step-2.safetensors").exists()
    from safetensors.numpy import load_file
    sd = load_file(str(tmp_path / "step-2.safetensors"))
    assert "vace_blocks.0.self_attn.q.lora_A.weight" in sd
