#!/bin/bash
# Ditto LoRA training recipe — reference train.sh surface
# (rank-128 LoRA on the VACE branch: q,k,v,o,ffn.0,ffn.2; 480x832x73).
python examples/train.py \
  --dataset_base_path "${DATASET_BASE_PATH:-data/ditto}" \
  --dataset_metadata_path "${DATASET_METADATA_PATH:-data/ditto/metadata_vace.csv}" \
  --height 480 --width 832 --num_frames 73 \
  --dit_path "${WAN_DIT_PATH:?set WAN_DIT_PATH}" \
  --vae_path "${WAN_VAE_PATH:?set WAN_VAE_PATH}" \
  --t5_path "${WAN_T5_PATH:?set WAN_T5_PATH}" \
  --tokenizer_path "${WAN_TOKENIZER_PATH:?set WAN_TOKENIZER_PATH}" \
  --lora_base_model vace --lora_rank 128 \
  --lora_target_modules "q,k,v,o,ffn.0,ffn.2" \
  --extra_inputs vace_video \
  --learning_rate 1e-4 --num_epochs 5 --save_steps 500 \
  --output_path "${OUTPUT_PATH:-./models/train/Wan2.1-VACE-14B_ditto_lora}" \
  --resume
