"""The Wan model-recipe registry — the data behind the per-model example
scripts (mirrors /root/reference/examples/wanvideo/: 27 training recipes,
28 validate scripts, 29 inference scripts — here one registry + thin
generated files instead of 80 copies of near-identical boilerplate).

Each recipe names its weight sources (ModelScope ids + file patterns, same
strings as the reference .sh matrix), the extra pipeline inputs its family
needs, and the training arguments (lora base/targets, timestep boundaries
for the Wan2.2 MoE experts)."""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

T5 = "models_t5_umt5-xxl-enc-bf16.pth"
VAE21 = "Wan2.1_VAE.pth"
VAE22 = "Wan2.2_VAE.pth"
CLIP = "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"
DIT = "diffusion_pytorch_model*.safetensors"


@dataclasses.dataclass(frozen=True)
class WanRecipe:
    name: str
    model_id: str
    files: Tuple[str, ...]               # origin_file_patterns in model_id
    arch: str                            # t2v | i2v | ti2v | vace | animate | s2v
    extra_inputs: Tuple[str, ...] = ()   # training extra_inputs (train.py)
    num_frames: int = 81
    height: int = 480
    width: int = 832
    lora_base: str = "dit"
    dual_expert: bool = False            # Wan2.2 MoE: high/low noise experts
    # per-expert training timestep boundaries (Wan2.2 .sh comments)
    boundaries: Optional[Tuple[Tuple[float, float], Tuple[float, float]]] = None
    extra_models: Tuple[Tuple[str, str], ...] = ()  # (model_id, pattern)
    vae: str = VAE21

    @property
    def needs_clip(self) -> bool:
        return CLIP in self.files

    @property
    def high_low_files(self) -> Tuple[str, str]:
        return (f"high_noise_model/{DIT}", f"low_noise_model/{DIT}")


def _r(name, model_id, files, **kw):
    return WanRecipe(name=name, model_id=model_id, files=tuple(files), **kw)


RECIPES = {r.name: r for r in [
    # ---- Wan2.1 core (reference model_training/lora/*.sh) ----
    _r("Wan2.1-T2V-1.3B", "Wan-AI/Wan2.1-T2V-1.3B", [DIT, T5, VAE21],
       arch="t2v"),
    _r("Wan2.1-T2V-14B", "Wan-AI/Wan2.1-T2V-14B", [DIT, T5, VAE21],
       arch="t2v"),
    _r("Wan2.1-I2V-14B-480P", "Wan-AI/Wan2.1-I2V-14B-480P",
       [DIT, T5, VAE21, CLIP], arch="i2v", extra_inputs=("input_image",)),
    _r("Wan2.1-I2V-14B-720P", "Wan-AI/Wan2.1-I2V-14B-720P",
       [DIT, T5, VAE21, CLIP], arch="i2v", extra_inputs=("input_image",)),
    _r("Wan2.1-FLF2V-14B-720P", "Wan-AI/Wan2.1-FLF2V-14B-720P",
       [DIT, T5, VAE21, CLIP], arch="i2v",
       extra_inputs=("input_image", "end_image")),
    _r("Wan2.1-VACE-1.3B", "Wan-AI/Wan2.1-VACE-1.3B", [DIT, T5, VAE21],
       arch="vace", lora_base="vace",
       extra_inputs=("vace_video", "vace_reference_image")),
    _r("Wan2.1-VACE-1.3B-Preview", "Wan-AI/Wan2.1-VACE-1.3B-Preview",
       [DIT, T5, VAE21], arch="vace", lora_base="vace",
       extra_inputs=("vace_video", "vace_reference_image")),
    _r("Wan2.1-VACE-14B", "Wan-AI/Wan2.1-VACE-14B", [DIT, T5, VAE21],
       arch="vace", lora_base="vace",
       extra_inputs=("vace_video", "vace_reference_image")),
    _r("Wan2.1-1.3b-speedcontrol-v1", "Wan-AI/Wan2.1-T2V-1.3B",
       [DIT, T5, VAE21], arch="t2v", extra_inputs=("motion_bucket_id",),
       extra_models=(("DiffSynth-Studio/Wan2.1-1.3b-speedcontrol-v1",
                      "model.safetensors"),)),
    # ---- Wan2.1 Fun (PAI) ----
    _r("Wan2.1-Fun-1.3B-InP", "PAI/Wan2.1-Fun-1.3B-InP",
       [DIT, T5, VAE21, CLIP], arch="i2v",
       extra_inputs=("input_image", "end_image")),
    _r("Wan2.1-Fun-14B-InP", "PAI/Wan2.1-Fun-14B-InP",
       [DIT, T5, VAE21, CLIP], arch="i2v",
       extra_inputs=("input_image", "end_image")),
    _r("Wan2.1-Fun-1.3B-Control", "PAI/Wan2.1-Fun-1.3B-Control",
       [DIT, T5, VAE21, CLIP], arch="i2v", extra_inputs=("control_video",)),
    _r("Wan2.1-Fun-14B-Control", "PAI/Wan2.1-Fun-14B-Control",
       [DIT, T5, VAE21, CLIP], arch="i2v", extra_inputs=("control_video",)),
    _r("Wan2.1-Fun-V1.1-1.3B-InP", "PAI/Wan2.1-Fun-V1.1-1.3B-InP",
       [DIT, T5, VAE21, CLIP], arch="i2v",
       extra_inputs=("input_image", "end_image")),
    _r("Wan2.1-Fun-V1.1-14B-InP", "PAI/Wan2.1-Fun-V1.1-14B-InP",
       [DIT, T5, VAE21, CLIP], arch="i2v",
       extra_inputs=("input_image", "end_image")),
    _r("Wan2.1-Fun-V1.1-1.3B-Control", "PAI/Wan2.1-Fun-V1.1-1.3B-Control",
       [DIT, T5, VAE21, CLIP], arch="i2v",
       extra_inputs=("control_video", "reference_image")),
    _r("Wan2.1-Fun-V1.1-14B-Control", "PAI/Wan2.1-Fun-V1.1-14B-Control",
       [DIT, T5, VAE21, CLIP], arch="i2v",
       extra_inputs=("control_video", "reference_image")),
    _r("Wan2.1-Fun-V1.1-1.3B-Control-Camera",
       "PAI/Wan2.1-Fun-V1.1-1.3B-Control-Camera", [DIT, T5, VAE21, CLIP],
       arch="i2v", extra_inputs=("input_image", "camera_control_direction",
                                 "camera_control_speed")),
    _r("Wan2.1-Fun-V1.1-14B-Control-Camera",
       "PAI/Wan2.1-Fun-V1.1-14B-Control-Camera", [DIT, T5, VAE21, CLIP],
       arch="i2v", extra_inputs=("input_image", "camera_control_direction",
                                 "camera_control_speed")),
    # ---- Wan2.2 (dual-expert MoE unless TI2V/Animate) ----
    _r("Wan2.2-T2V-A14B", "Wan-AI/Wan2.2-T2V-A14B", [T5, VAE21],
       arch="t2v", num_frames=49, dual_expert=True,
       boundaries=((0.0, 0.417), (0.417, 1.0))),
    _r("Wan2.2-I2V-A14B", "Wan-AI/Wan2.2-I2V-A14B", [T5, VAE21],
       arch="i2v", num_frames=49, dual_expert=True,
       extra_inputs=("input_image",),
       boundaries=((0.0, 0.358), (0.358, 1.0))),
    _r("Wan2.2-TI2V-5B", "Wan-AI/Wan2.2-TI2V-5B", [DIT, T5, VAE22],
       arch="ti2v", num_frames=49, extra_inputs=("input_image",),
       vae=VAE22),
    _r("Wan2.2-Fun-A14B-InP", "PAI/Wan2.2-Fun-A14B-InP", [T5, VAE21],
       arch="i2v", num_frames=49, dual_expert=True,
       extra_inputs=("input_image", "end_image"),
       boundaries=((0.0, 0.358), (0.358, 1.0))),
    _r("Wan2.2-Fun-A14B-Control", "PAI/Wan2.2-Fun-A14B-Control", [T5, VAE21],
       arch="i2v", num_frames=49, dual_expert=True,
       extra_inputs=("control_video",),
       boundaries=((0.0, 0.358), (0.358, 1.0))),
    _r("Wan2.2-Fun-A14B-Control-Camera", "PAI/Wan2.2-Fun-A14B-Control-Camera",
       [T5, VAE21], arch="i2v", num_frames=49, dual_expert=True,
       extra_inputs=("input_image", "camera_control_direction",
                     "camera_control_speed"),
       boundaries=((0.0, 0.358), (0.358, 1.0))),
    _r("Wan2.2-VACE-Fun-A14B", "PAI/Wan2.2-VACE-Fun-A14B", [T5, VAE21],
       arch="vace", num_frames=49, dual_expert=True, lora_base="vace",
       extra_inputs=("vace_video", "vace_reference_image"),
       boundaries=((0.0, 0.358), (0.358, 1.0))),
    _r("Wan2.2-Animate-14B", "Wan-AI/Wan2.2-Animate-14B",
       [DIT, T5, VAE21, CLIP], arch="animate",
       extra_inputs=("input_image", "animate_pose_video",
                     "animate_face_video")),
    _r("Wan2.2-S2V-14B", "Wan-AI/Wan2.2-S2V-14B", [DIT, T5, VAE21],
       arch="s2v", extra_inputs=("input_image", "s2v_audio")),
]}
