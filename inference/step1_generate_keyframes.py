"""Step 1: agentic keyframe stylization.

Mirrors /root/reference/inference/step1_generate_keyframes.py: run the
video-styling agent (frame extraction -> style analysis -> per-keyframe
image editing -> combine), writing keyframe_info.json for step 2.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", type=str, required=True)
    p.add_argument("--style", type=str, required=True,
                   help="style instruction, e.g. 'van gogh oil painting'")
    p.add_argument("--output_dir", type=str, default="agent_out")
    p.add_argument("--max_frames", type=int, default=10)
    p.add_argument("--image_provider", type=str, default="mock",
                   choices=["mock", "gemini", "openai", "qwen", "doubao"])
    p.add_argument("--config", type=str, default=None, help="agent YAML config")
    args = p.parse_args()

    from video_styler_tpu.agent import build_video_styling_app

    llm_fn = None
    if args.config:
        from video_styler_tpu.agent.config import ConfigManager
        ConfigManager(config_path=args.config)  # validates + env expansion

    app = build_video_styling_app(llm_fn=llm_fn,
                                  image_provider=args.image_provider)
    state = app.invoke({
        "video_url": args.video,
        "output_dir": args.output_dir,
        "style_instruction": args.style,
        "max_frames": args.max_frames,
    })

    info = {
        "generated_frames": [f["stylized_image_path"] for f in state["frames"]],
        "keyframe_timestamp": [f["timestamp"] for f in state["frames"]],
        "keyframe_fps": 1.0,
        "source_fps": state["video_metadata"]["fps"],
        "consistent_edit_prompt": state.get("consistent_edit_prompt", ""),
    }
    info_path = os.path.join(args.output_dir, "keyframe_info.json")
    with open(info_path, "w") as f:
        json.dump(info, f, indent=2)
    print(f"step1 done: {len(state['frames'])} styled keyframes, "
          f"info at {info_path}")


if __name__ == "__main__":
    main()
