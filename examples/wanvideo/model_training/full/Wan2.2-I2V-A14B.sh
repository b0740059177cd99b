#!/usr/bin/env bash
# Wan2.2-I2V-A14B-high-noise full training recipe (mirrors
# /root/reference/examples/wanvideo/model_training/full/Wan2.2-I2V-A14B-high-noise.sh).
# --smoke appended runs the tiny-config training path end-to-end.
python examples/train.py \
  --dataset_base_path data/example_video_dataset \
  --dataset_metadata_path data/example_video_dataset/metadata.csv \
  --height 480 \
  --width 832 \
  --num_frames 49 \
  --dataset_repeat 100 \
  --model_id_with_origin_paths "Wan-AI/Wan2.2-I2V-A14B:high_noise_model/diffusion_pytorch_model*.safetensors,Wan-AI/Wan2.2-I2V-A14B:models_t5_umt5-xxl-enc-bf16.pth,Wan-AI/Wan2.2-I2V-A14B:Wan2.1_VAE.pth" \
  --learning_rate 1e-5 \
  --num_epochs 5 \
  --remove_prefix_in_ckpt "pipe.dit." \
  --output_path "./models/train/Wan2.2-I2V-A14B-high-noise_full" \
  --extra_inputs "input_image" \
  --min_timestep_boundary 0.0 \
  --max_timestep_boundary 0.358 \
  "$@"

#!/usr/bin/env bash
# Wan2.2-I2V-A14B-low-noise full training recipe (mirrors
# /root/reference/examples/wanvideo/model_training/full/Wan2.2-I2V-A14B-low-noise.sh).
# --smoke appended runs the tiny-config training path end-to-end.
python examples/train.py \
  --dataset_base_path data/example_video_dataset \
  --dataset_metadata_path data/example_video_dataset/metadata.csv \
  --height 480 \
  --width 832 \
  --num_frames 49 \
  --dataset_repeat 100 \
  --model_id_with_origin_paths "Wan-AI/Wan2.2-I2V-A14B:low_noise_model/diffusion_pytorch_model*.safetensors,Wan-AI/Wan2.2-I2V-A14B:models_t5_umt5-xxl-enc-bf16.pth,Wan-AI/Wan2.2-I2V-A14B:Wan2.1_VAE.pth" \
  --learning_rate 1e-5 \
  --num_epochs 5 \
  --remove_prefix_in_ckpt "pipe.dit." \
  --output_path "./models/train/Wan2.2-I2V-A14B-low-noise_full" \
  --extra_inputs "input_image" \
  --min_timestep_boundary 0.358 \
  --max_timestep_boundary 1.0 \
  "$@"
