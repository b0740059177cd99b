"""ModelLogger: periodic trainable-weights checkpointing.

Mirrors /root/reference/diffsynth/trainers/utils.py:480-518: saves the
trainable (LoRA) state as safetensors every N steps and at epoch end, with
reference-compatible key names so checkpoints interoperate.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

from .lora_train import export_lora_state_dict


class ModelLogger:
    def __init__(self, output_path: str, remove_prefix_in_ckpt: Optional[str] = None,
                 save_steps: Optional[int] = None, rename_blocks_to: Optional[str] = None):
        self.output_path = output_path
        self.remove_prefix_in_ckpt = remove_prefix_in_ckpt
        self.save_steps = save_steps
        self.rename_blocks_to = rename_blocks_to
        self.num_steps = 0
        os.makedirs(output_path, exist_ok=True)

    def _export(self, lora: Dict) -> Dict:
        sd = export_lora_state_dict(lora)
        if self.rename_blocks_to:
            sd = {k.replace("blocks.", self.rename_blocks_to + ".", 1)
                  if k.startswith("blocks.") else k: v for k, v in sd.items()}
        return sd

    def _save(self, lora: Dict, name: str):
        # rank-0-only IO under multi-host (reference: accelerator.
        # is_main_process gating at trainers/utils.py:493-517)
        from ..parallel.distributed import is_main_process
        if not is_main_process():
            return
        from safetensors.numpy import save_file
        save_file(self._export(lora), os.path.join(self.output_path, name))

    def on_step_end(self, lora: Dict):
        self.num_steps += 1
        if self.save_steps and self.num_steps % self.save_steps == 0:
            self._save(lora, f"step-{self.num_steps}.safetensors")

    def on_epoch_end(self, lora: Dict, epoch_id: int):
        if self.save_steps is None:
            self._save(lora, f"epoch-{epoch_id}.safetensors")
