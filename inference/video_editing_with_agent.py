"""Integrated video editing: agent keyframe stylization -> flow-matching
editor in one process.

Re-design of the reference inference/video_editing_with_agent.py:1-200
(IntegratedVideoEditor): runs the step1 agent workflow (frame extraction ->
style analysis -> per-frame image editing with checkpoint/resume) and feeds
the produced keyframes straight into WanVideoEditorPipeline — the two-step
`step1_generate_keyframes.py` + `step2_video_editing.py` flow as one
command, sharing their exact drivers.

    python inference/video_editing_with_agent.py --video in.mp4 \
        --style "Van Gogh oil painting" --dit_path ... --vae_path ... \
        --t5_path ... --tokenizer_path ... --output_path out.mp4

`--smoke` runs the full code path on tiny random models with the mock image
provider (no checkpoints, no network).
"""
import argparse
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@contextlib.contextmanager
def _argv(args):
    saved = sys.argv
    sys.argv = [saved[0]] + args
    try:
        yield
    finally:
        sys.argv = saved


def main():
    p = argparse.ArgumentParser()
    # agent stage (step1 surface)
    p.add_argument("--video", type=str, required=True)
    p.add_argument("--style", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="agent_out")
    p.add_argument("--max_frames", type=int, default=10)
    p.add_argument("--image_provider", type=str, default="mock")
    p.add_argument("--config", type=str, default=None)
    # editor stage (step2 surface)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--output_path", type=str, default="edited.mp4")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--cfg_scale", type=float, default=5.0)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--alpha", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--dit_path", type=str, default=None)
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--t5_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--smoke", action="store_true")
    a = p.parse_args()

    import step1_generate_keyframes
    import step2_video_editing

    step1_args = ["--video", a.video, "--style", a.style,
                  "--output_dir", a.output_dir,
                  "--max_frames", str(a.max_frames),
                  "--image_provider", a.image_provider]
    if a.config:
        step1_args += ["--config", a.config]
    with _argv(step1_args):
        step1_generate_keyframes.main()
    info_path = os.path.join(a.output_dir, "keyframe_info.json")

    step2_args = ["--video", a.video, "--keyframe_info", info_path,
                  "--negative_prompt", a.negative_prompt,
                  "--output_path", a.output_path,
                  "--height", str(a.height), "--width", str(a.width),
                  "--num_frames", str(a.num_frames),
                  "--cfg_scale", str(a.cfg_scale),
                  "--num_inference_steps", str(a.num_inference_steps),
                  "--alpha", str(a.alpha), "--fps", str(a.fps)]
    if a.prompt:
        step2_args += ["--prompt", a.prompt]
    if a.seed is not None:
        step2_args += ["--seed", str(a.seed)]
    for flag, val in (("--dit_path", a.dit_path), ("--vae_path", a.vae_path),
                      ("--t5_path", a.t5_path),
                      ("--tokenizer_path", a.tokenizer_path)):
        if val:
            step2_args += [flag, val]
    if a.smoke:
        step2_args += ["--smoke"]
    with _argv(step2_args):
        step2_video_editing.main()
    print(f"integrated edit done: {a.output_path}")


if __name__ == "__main__":
    main()
