"""Sequence-parallel inference demo (mirrors
/root/reference/examples/wanvideo/acceleration/unified_sequence_parallel.py).

The reference monkey-patches xfuser USP forwards over torchrun+NCCL; here
parallelism is declared — a dp×fsdp×sp `jax.sharding.Mesh` plus the GSPMD
sharding context (parallel/context.py), and XLA inserts the collectives over
ICI. On a CPU host this demos on 8 virtual devices; on a TPU pod the same
code spans the slice (SURVEY.md §2.6 TPU plan).

    python examples/wanvideo/acceleration/unified_sequence_parallel.py --smoke
    python ... --model Wan2.1-T2V-1.3B --sp 4 --dit_path ...
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Wan2.1-T2V-1.3B")
    ap.add_argument("--prompt", default="a cat boxing on a stage")
    ap.add_argument("--sp", type=int, default=2, help="sequence-parallel degree")
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--dit_path"), ap.add_argument("--vae_path")
    ap.add_argument("--t5_path"), ap.add_argument("--clip_path")
    ap.add_argument("--tokenizer_path")
    args = ap.parse_args()

    n = args.sp * args.fsdp * args.dp
    if args.smoke:
        # virtual CPU mesh so the demo runs without a pod
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={max(n, 8)}")
    import jax
    if jax.device_count() < n:
        jax.config.update("jax_platforms", "cpu")
        import jax.extend.backend as _jb
        _jb.clear_backends()

    from _runner import RECIPES, build_real_pipe, build_smoke_pipe
    from video_styler_tpu.parallel import (
        make_mesh, ShardingContext, use_sharding, shard_params_fsdp)

    recipe = RECIPES[args.model]
    pipe = build_smoke_pipe(recipe) if args.smoke \
        else build_real_pipe(recipe, args)
    mesh = make_mesh(dp=args.dp, fsdp=args.fsdp, sp=args.sp)
    pipe.dit_params = shard_params_fsdp(pipe.dit_params, mesh)
    if getattr(pipe, "vace_params", None) is not None:
        pipe.vace_params = shard_params_fsdp(pipe.vace_params, mesh)
    ctx = ShardingContext(mesh)
    pipe.sharding_ctx = ctx
    kw = dict(height=32, width=32, num_frames=5, num_inference_steps=2,
              cfg_scale=1.0, tiled=False, return_latents=True) if args.smoke \
        else dict(seed=1, tiled=True)
    with use_sharding(ctx):
        out = pipe(args.prompt, seed=1, **kw)
    if args.smoke:
        import jax.numpy as jnp
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
        print(f"USP smoke OK on mesh dp={args.dp} fsdp={args.fsdp} "
              f"sp={args.sp} ({jax.device_count()} devices)")
    else:
        from video_styler_tpu.data.video import save_video
        save_video(out, "video_usp.mp4", fps=15, quality=5)


if __name__ == "__main__":
    main()
