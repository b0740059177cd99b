"""video-styler-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the Ditto /
DiffSynth-Studio instruction-based video-editing stack.

Design stance (see SURVEY.md §7): pure-functional models over explicit param
pytrees, GSPMD sharding instead of per-layer CPU offload, Pallas flash
attention instead of CUDA flash-attn, and jitted denoise loops instead of
imperative pipelines — while preserving the reference public API surface
(`WanVideoPipeline(prompt=..., vace_video=..., tiled=True)`).
"""

__version__ = "0.1.0"
