"""TeaCache acceleration demo (mirrors
/root/reference/examples/wanvideo/acceleration/teacache.py:24-27):
`tea_cache_l1_thresh` skips DiT steps whose modulated-t-emb drift is small,
replaying the cached trunk residual. Larger = faster, worse quality.

Real run:   python examples/wanvideo/acceleration/teacache.py \
                --model Wan2.1-T2V-1.3B --tea_cache_l1_thresh 0.05
Smoke run:  python examples/wanvideo/acceleration/teacache.py --smoke
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from _runner import RECIPES, build_real_pipe, build_smoke_pipe  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Wan2.1-T2V-1.3B",
                    choices=sorted(RECIPES))
    ap.add_argument("--prompt", default="a cat boxing on a stage")
    ap.add_argument("--tea_cache_l1_thresh", type=float, default=0.05)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    recipe = RECIPES[args.model]
    if args.smoke:
        pipe = build_smoke_pipe(recipe)
        kw = dict(height=32, width=32, num_frames=5, num_inference_steps=6,
                  cfg_scale=1.0, tiled=False, return_latents=True)
        # the tiny random model's t-emb drift is large; a huge threshold
        # guarantees mid-loop skips so the demo exercises the skip path
        thresh = 10.0
    else:
        pipe = build_real_pipe(recipe, args)
        kw = dict(seed=1, tiled=True)
        thresh = args.tea_cache_l1_thresh

    t0 = time.perf_counter()
    out_plain = pipe(args.prompt, seed=1, **kw)
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_tea = pipe(args.prompt, seed=1,
                   tea_cache_l1_thresh=thresh,
                   tea_cache_model_id="Wan2.1-T2V-1.3B", **kw)
    t_tea = time.perf_counter() - t0
    print(f"plain {t_plain:.2f}s vs teacache {t_tea:.2f}s "
          f"(thresh={thresh})")
    if args.smoke:
        import jax.numpy as jnp
        assert bool(jnp.isfinite(out_tea.astype(jnp.float32)).all())
        print("teacache smoke OK")
    else:
        from video_styler_tpu.data.video import save_video
        save_video(out_plain, "video_plain.mp4", fps=15, quality=5)
        save_video(out_tea, "video_teacache.mp4", fps=15, quality=5)


if __name__ == "__main__":
    main()
