"""SDVideoPipelineRunner: JSON-config-driven Diffutoon rendering.

Re-design of the reference runner
(/root/reference/diffsynth/pipelines/pipeline_runner.py:8-105): one config
dict/file describes models (state-dict paths, LoRAs, ControlNet units),
data (input video span, output folder, fps), an optional smoother chain,
and the pipeline inputs; `run(config)` loads, synthesizes, and saves
frames + video + the reproducibility config.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp


class SDVideoPipelineRunner:

    def __init__(self, in_streamlit: bool = False):
        # kept for signature parity; no streamlit in this environment
        self.in_streamlit = in_streamlit

    # ---------------- loading ----------------

    def load_pipeline(self, model_list, textual_inversion_folder=None,
                      device=None, lora_alphas=None, controlnet_units=None,
                      tokenizer_path=None):
        """model_list: state-dict paths; kinds are auto-detected. LoRAs merge
        with `lora_alphas` (parallel list). ControlNet units build a
        MultiControlNetManager."""
        from ..utils import ckpt as C
        from ..utils.sd_civitai import convert_sd_civitai
        from ..models.motion import convert_motion_model
        from .sd_video import SDVideoPipeline
        from ..controlnets import (ControlNetConfigUnit, ControlNetUnit,
                                   MultiControlNetManager, Annotator)

        pipe = SDVideoPipeline()
        lora_paths, lora_alphas = [], lora_alphas or []
        for path in model_list:
            sd = C.load_state_dict(path)
            if any(".lora_" in k or "lora_up" in k for k in sd):
                lora_paths.append(sd)
                continue
            if any("motion_modules." in k or "temporal_transformer" in k
                   for k in sd):
                pipe.motion_params = convert_motion_model(sd)
                continue
            parts = convert_sd_civitai(sd)
            if "unet" in parts:
                pipe.unet_params = parts["unet"]
            if "text_encoder" in parts:
                pipe.text_encoder_params = parts["text_encoder"]
            if "vae_encoder" in parts:
                pipe.vae_encoder_params = parts["vae_encoder"]
            if "vae_decoder" in parts:
                pipe.vae_decoder_params = parts["vae_decoder"]
        for i, sd in enumerate(lora_paths):
            from ..lora import merge_lora
            alpha = lora_alphas[i] if i < len(lora_alphas) else 1.0
            pipe.unet_params = merge_lora(pipe.unet_params, sd, alpha=alpha)
        if controlnet_units:
            units = []
            for u in controlnet_units:
                cn_sd = C.load_state_dict(u["model_path"])
                from ..models.controlnet import convert_controlnet
                units.append(ControlNetUnit(
                    processor=Annotator(u["processor_id"]),
                    params=convert_controlnet(cn_sd),
                    scale=u.get("scale", 1.0)))
            pipe.controlnet_manager = MultiControlNetManager(units)
        if tokenizer_path:
            from transformers import CLIPTokenizer
            pipe.tokenizer = CLIPTokenizer.from_pretrained(tokenizer_path)
        return pipe

    def load_smoother(self, smoother_configs):
        from ..processors import SequencialProcessor  # noqa
        return SequencialProcessor.from_config(smoother_configs)

    # ---------------- data ----------------

    def load_video(self, video_file=None, image_folder=None, height=None,
                   width=None, start_frame_id=None, end_frame_id=None):
        from ..data import VideoData
        src = video_file or image_folder
        if src is not None and os.path.isdir(src):
            video = VideoData(image_folder=src, height=height, width=width)
        else:
            video = VideoData(video_file=src, height=height, width=width)
        start = start_frame_id or 0
        end = end_frame_id if end_frame_id is not None else len(video)
        return [video[i] for i in range(start, end)]

    def add_data_to_pipeline_inputs(self, data: Dict, pipeline_inputs: Dict):
        frames = self.load_video(**data["input_frames"])
        pipeline_inputs["input_frames"] = frames
        pipeline_inputs["num_frames"] = len(frames)
        pipeline_inputs["width"], pipeline_inputs["height"] = frames[0].size
        if data.get("controlnet_frames"):
            pipeline_inputs["controlnet_frames"] = [
                self.load_video(**unit) for unit in data["controlnet_frames"]]
        return pipeline_inputs

    def save_output(self, video, output_folder: str, fps: int, config: Dict):
        from ..data import save_frames, save_video
        os.makedirs(output_folder, exist_ok=True)
        save_frames(video, os.path.join(output_folder, "frames"))
        save_video(video, os.path.join(output_folder, "video.mp4"), fps=fps)
        config = dict(config)
        config["pipeline"] = dict(config["pipeline"])
        config["pipeline"]["pipeline_inputs"] = {
            k: v for k, v in config["pipeline"]["pipeline_inputs"].items()
            if k not in ("input_frames", "controlnet_frames")}
        with open(os.path.join(output_folder, "config.json"), "w") as f:
            json.dump(config, f, indent=4)

    # ---------------- run ----------------

    def run(self, config: Dict, pipe=None):
        """config layout mirrors the reference (pipeline_runner.py:82-105);
        `pipe` can be injected (pre-built/tiny) to skip model loading."""
        if isinstance(config, str):
            with open(config) as f:
                config = json.load(f)
        inputs = self.add_data_to_pipeline_inputs(
            config["data"], dict(config["pipeline"]["pipeline_inputs"]))
        config["pipeline"]["pipeline_inputs"] = inputs
        if pipe is None:
            pipe = self.load_pipeline(**config["models"])
        smoother = (self.load_smoother(config["smoother_configs"])
                    if "smoother_configs" in config else None)
        frames = pipe(seed=config["pipeline"].get("seed", 0),
                      smoother=smoother, **inputs)
        self.save_output(frames, config["data"]["output_folder"],
                         config["data"].get("fps", 25), config)
        return frames
