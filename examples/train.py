"""LoRA / full training CLI — the train.sh surface.

Mirrors the reference examples/wanvideo/model_training/train.py +
trainers/utils.py launch_training_task: UnifiedDataset over CSV metadata,
forward_preprocess with the same units as inference (VAE/T5/VACE encodes),
flow-match loss on random timesteps, AdamW, periodic safetensors checkpoints.

The Ditto recipe (reference train.sh:1-19) maps to:
  --lora_base_model vace --lora_rank 128 \
  --lora_target_modules "q,k,v,o,ffn.0,ffn.2" \
  --dataset_metadata_path metadata_vace.csv --extra_inputs vace_video

Distributed: accelerate/DeepSpeed is replaced by the dp/fsdp/sp mesh
(--mesh dp,fsdp,sp) — GSPMD shards params/grads/optimizer state (ZeRO) and
batches (DDP) from one jitted step.

--smoke runs the whole loop on tiny random models + synthetic data.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_base_path", type=str, default="")
    p.add_argument("--dataset_metadata_path", type=str, default=None)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--dataset_repeat", type=int, default=1)
    p.add_argument("--dit_path", type=str, default=None)
    p.add_argument("--model_id_with_origin_paths", type=str, default=None,
                   help='remote weight sources "id:pattern,id:pattern" '
                        '(reference train.py surface), resolved via '
                        'ModelConfig + the download transport')
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--t5_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--output_path", type=str, default="./models/train")
    p.add_argument("--remove_prefix_in_ckpt", type=str, default=None)
    p.add_argument("--save_steps", type=int, default=None)
    p.add_argument("--lora_base_model", type=str, default="dit",
                   choices=["dit", "vace"])
    p.add_argument("--lora_target_modules", type=str, default="q,k,v,o,ffn.0,ffn.2")
    p.add_argument("--lora_rank", type=int, default=32)
    p.add_argument("--lora_checkpoint", type=str, default=None)
    p.add_argument("--extra_inputs", type=str, default=None)
    p.add_argument("--max_timestep_boundary", type=float, default=1.0)
    p.add_argument("--min_timestep_boundary", type=float, default=0.0)
    p.add_argument("--mesh", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--task", type=str, default="train",
                   choices=["train", "data_process"],
                   help="data_process = offline latent-cache pass: run the "
                        "encoders once, save npz samples to output_path")
    p.add_argument("--cache_path", type=str, default=None,
                   help="train from a latent cache produced by "
                        "--task data_process (skips VAE/T5 encodes)")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume full train state (lora+optimizer+step) from "
                        "the newest orbax checkpoint in output_path")
    return p.parse_args()


def lora_targets(modules: str, base: str):
    name_map = {"ffn.0": "ffn.fc1", "ffn.2": "ffn.fc2"}
    targets = []
    for m in modules.split(","):
        m = m.strip()
        m = name_map.get(m, m)
        if "." in m:
            targets.append(f"blocks.{m}")
        else:
            targets.append(f"blocks.self_attn.{m}")
            targets.append(f"blocks.cross_attn.{m}")
    return tuple(targets)


def main():
    args = parse_args()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from video_styler_tpu.models import wan_dit as M
    from video_styler_tpu.schedulers import FlowMatchScheduler
    from video_styler_tpu.trainers.lora_train import init_lora, apply_lora
    from video_styler_tpu.trainers.logger import ModelLogger
    from video_styler_tpu.trainers.training import flow_match_loss

    if args.smoke:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "inference"))
        from infer_ditto import build_smoke_pipeline
        pipe = build_smoke_pipeline()
        args.height, args.width, args.num_frames = 32, 32, 5
        rows = [{"prompt": f"sample {i}", "video": None, "vace_video": None}
                for i in range(2)]
        dataset = rows
        args.lora_base_model = "vace"
        args.max_steps = args.max_steps or 3
    else:
        from video_styler_tpu.pipelines import WanVideoPipeline
        from video_styler_tpu.pipelines.wan_video import ModelConfig
        mcs = [ModelConfig(path=p.split("|")) for p in
               (args.dit_path, args.vae_path, args.t5_path) if p]
        # remote sources: "id:pattern,id:pattern" (the reference train.py's
        # --model_id_with_origin_paths, resolved through the download
        # transport or a pre-populated VIDEO_STYLER_MODEL_DIR)
        if args.model_id_with_origin_paths:
            for spec in args.model_id_with_origin_paths.split(","):
                mid, pat = spec.split(":", 1)
                mcs.append(ModelConfig(model_id=mid, origin_file_pattern=pat))
        pipe = WanVideoPipeline.from_pretrained(
            mcs, tokenizer_path=args.tokenizer_path, dtype=jnp.bfloat16)
        from video_styler_tpu.trainers.unified_dataset import UnifiedDataset
        op = UnifiedDataset.default_video_operator(
            args.dataset_base_path, num_frames=args.num_frames,
            height=args.height, width=args.width)
        keys = ["video"] + (args.extra_inputs.split(",") if args.extra_inputs else [])
        dataset = UnifiedDataset(
            base_path=args.dataset_base_path,
            metadata_path=args.dataset_metadata_path,
            repeat=args.dataset_repeat, data_file_keys=tuple(keys),
            main_data_operator=op)

    # scheduler in training mode (1000 timesteps, bell weights)
    scheduler = FlowMatchScheduler(shift=5.0, sigma_min=0.0, extra_one_step=True)
    scheduler.set_timesteps(1000, training=True)
    sigmas = jnp.asarray(scheduler.sigmas)
    timesteps = jnp.asarray(scheduler.timesteps)
    weights = jnp.asarray(scheduler.linear_timesteps_weights)
    min_tid = int(args.min_timestep_boundary * 1000)
    max_tid = int(args.max_timestep_boundary * 1000)

    base = pipe.vace_params if args.lora_base_model == "vace" else pipe.dit_params
    lora = init_lora(jax.random.PRNGKey(args.seed), base,
                     rank=args.lora_rank,
                     targets=lora_targets(args.lora_target_modules,
                                          args.lora_base_model))
    if args.lora_checkpoint:
        from video_styler_tpu.utils.ckpt import load_state_dict
        print(f"resuming LoRA from {args.lora_checkpoint}")
        # resume: merge nothing, load A/B back into the pytree
        sd = load_state_dict(args.lora_checkpoint)
        from video_styler_tpu.trainers.lora_train import export_lora_state_dict
        # invert naming: fill matching leaves
        for path, ab in lora.items():
            tp = path.replace("ffn.fc1", "ffn.0").replace("ffn.fc2", "ffn.2")
            if ab["A"].ndim == 3:
                head, tail = tp.split("blocks.", 1)
                A = np.stack([sd[f"{head}blocks.{i}.{tail}.lora_A.weight"].T
                              for i in range(ab["A"].shape[0])])
                B = np.stack([sd[f"{head}blocks.{i}.{tail}.lora_B.weight"].T
                              for i in range(ab["B"].shape[0])])
                lora[path] = {"A": jnp.asarray(A, ab["A"].dtype),
                              "B": jnp.asarray(B, ab["B"].dtype)}

    optimizer = optax.adamw(args.learning_rate)
    opt_state = optimizer.init(lora)
    logger = ModelLogger(
        args.output_path, remove_prefix_in_ckpt=args.remove_prefix_in_ckpt,
        save_steps=args.save_steps,
        rename_blocks_to="vace_blocks" if args.lora_base_model == "vace" else None)

    dit_cfg = pipe.dit_cfg
    vace_cfg = pipe.vace_cfg

    def loss_fn(lora, dit_params, vace_params, latents, context, vace_context, rng):
        if args.lora_base_model == "vace":
            vp = apply_lora(vace_params, lora)
            dp = dit_params
        else:
            dp = apply_lora(dit_params, lora)
            vp = vace_params
        return flow_match_loss(dp, dit_cfg, latents, context, rng,
                               sigmas, timesteps, weights,
                               min_tid=min_tid, max_tid=max_tid,
                               vace_params=vp, vace_cfg=vace_cfg,
                               vace_context=vace_context, remat=True)

    @jax.jit
    def train_step(lora, opt_state, dit_params, vace_params, latents, context,
                   vace_context, rng):
        loss, grads = jax.value_and_grad(loss_fn)(lora, dit_params, vace_params,
                                                  latents, context,
                                                  vace_context, rng)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return loss, lora, opt_state

    def preprocess(row):
        """forward_preprocess: the same units as inference (train.py:42)."""
        from video_styler_tpu.pipelines.wan_video import _preprocess_images
        prompt = row.get("prompt", "")
        context = pipe.encode_prompt(prompt)
        if args.smoke or row.get("video") is None:
            rng = np.random.default_rng(0)
            z = pipe.vae_cfg.z_dim
            up = pipe.vae_cfg.upsampling_factor
            latents = jnp.asarray(rng.standard_normal(
                (1, z, (args.num_frames - 1) // 4 + 1,
                 args.height // up, args.width // up)), jnp.float32)
            video_frames = None
        else:
            video_frames = row["video"]
            latents = pipe.encode_video(_preprocess_images(video_frames), tiled=False)
        vace_context = None
        if args.lora_base_model == "vace":
            vv = row.get("vace_video") or video_frames
            if vv is not None:
                vace_context = pipe.build_vace_context(
                    vv, None, None, args.height, args.width, args.num_frames,
                    tiled=False, tile_size=(30, 52), tile_stride=(15, 26))
            else:
                z = pipe.vae_cfg.z_dim
                up = pipe.vae_cfg.upsampling_factor
                vace_context = jnp.zeros(
                    (1, 2 * z + 64, (args.num_frames - 1) // 4 + 1,
                     args.height // up, args.width // up), jnp.float32)
        return latents, context, vace_context

    if args.task == "data_process":
        from video_styler_tpu.trainers.latent_cache import launch_data_process_task

        def preprocess_dict(row):
            latents, context, vace_context = preprocess(row)
            sample = {"latents": np.asarray(latents, np.float32),
                      "context": np.asarray(context, np.float32)}
            if vace_context is not None:
                sample["vace_context"] = np.asarray(vace_context, np.float32)
            return sample

        written = launch_data_process_task(dataset, preprocess_dict,
                                           args.output_path)
        print(f"data process done: {len(written)} samples cached "
              f"in {args.output_path}")
        return

    if args.cache_path:
        from video_styler_tpu.trainers.latent_cache import CachedLatentDataset
        dataset = CachedLatentDataset(args.cache_path,
                                      repeat=args.dataset_repeat)

    from video_styler_tpu.trainers.checkpoint import (
        save_train_state, restore_train_state, latest_checkpoint)
    rng = jax.random.PRNGKey(args.seed)
    step_count = 0
    if args.resume:
        ckpt = latest_checkpoint(args.output_path)
        if ckpt:
            like = {"step": 0, "lora": lora, "opt_state": opt_state,
                    "rng": np.asarray(rng)}
            restored = restore_train_state(ckpt, like=like)
            step_count = int(restored["step"])
            lora = restored["lora"]
            opt_state = restored["opt_state"]
            rng = jnp.asarray(restored["rng"], jnp.uint32)
            print(f"resumed full train state at step {step_count} from {ckpt}")
    for epoch in range(args.num_epochs):
        for i in range(len(dataset)):
            row = dataset[i]
            if getattr(dataset, "load_from_cache", False):
                latents = jnp.asarray(row["latents"])
                context = jnp.asarray(row["context"])
                vace_context = (jnp.asarray(row["vace_context"])
                                if "vace_context" in row else None)
            else:
                latents, context, vace_context = preprocess(row)
            rng, step_rng = jax.random.split(rng)
            loss, lora, opt_state = train_step(
                lora, opt_state, pipe.dit_params, pipe.vace_params,
                latents.astype(jnp.float32), context.astype(jnp.float32),
                None if vace_context is None else vace_context.astype(jnp.float32),
                step_rng)
            step_count += 1
            print(f"epoch {epoch} step {step_count} loss {float(loss):.4f}")
            logger.on_step_end(lora)
            if args.save_steps and step_count % args.save_steps == 0:
                save_train_state(
                    os.path.join(args.output_path, f"state-{step_count}"),
                    step_count, lora, opt_state, rng)
            if args.max_steps and step_count >= args.max_steps:
                break
        logger.on_epoch_end(lora, epoch)
        if args.max_steps and step_count >= args.max_steps:
            break
    print(f"training done: {step_count} steps, checkpoints in {args.output_path}")


if __name__ == "__main__":
    main()
