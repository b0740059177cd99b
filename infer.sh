#!/bin/bash
# Ditto VACE edit — reference infer.sh surface.
# Fill in checkpoint paths for your environment.
python inference/infer_ditto.py \
  --input_video "${INPUT_VIDEO:-input.mp4}" \
  --prompt "${PROMPT:-turn the video into an oil painting style}" \
  --dit_path "${WAN_DIT_PATH:?set WAN_DIT_PATH to the Wan2.1-VACE-14B safetensors}" \
  --vae_path "${WAN_VAE_PATH:?set WAN_VAE_PATH}" \
  --t5_path "${WAN_T5_PATH:?set WAN_T5_PATH}" \
  --tokenizer_path "${WAN_TOKENIZER_PATH:?set WAN_TOKENIZER_PATH (umt5-xxl tokenizer dir)}" \
  --lora_path "${DITTO_LORA_PATH:-}" \
  --num_frames 73 --height 480 --width 832 --seed 42 \
  --num_inference_steps 50 --cfg_scale 5.0 \
  --output_path "${OUTPUT_PATH:-output.mp4}"
