"""Audio feature extraction for S2V.

The reference vendors a wav2vec tower (diffsynth/models/wav2vec.py) and a
Wav2Vec2Processor pipeline unit (wan_video_new.py WanVideoUnit_S2V). The
tower is now native (models/wav2vec.py here — JAX forward + host-side
bucketing); this module is the checkpoint-loading front door. The output
contract matches the S2V model's `audio_input`: all hidden states stacked
per layer, resampled/bucketed to one feature column per video frame.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def extract_audio_features(
    audio: np.ndarray,
    sample_rate: int = 16000,
    num_frames: int = 80,
    fps: float = 16.0,
    model_path: Optional[str] = None,
) -> np.ndarray:
    """audio (T_samples,) float waveform -> (1, num_layers, dim, num_frames).

    `model_path`: a wav2vec2 checkpoint file (safetensors/pt) or an HF-style
    directory containing one; runs the native tower (models/wav2vec.py).
    """
    import os
    from ..utils import ckpt as K
    from . import wav2vec as W

    if sample_rate != 16000:
        n_out = int(len(audio) * 16000 / sample_rate)
        audio = np.interp(np.linspace(0, len(audio) - 1, n_out),
                          np.arange(len(audio)), audio).astype(np.float32)
    if model_path is None:
        raise ValueError("pass model_path to a local wav2vec2 checkpoint")
    if os.path.isdir(model_path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(model_path, name)
            if os.path.exists(cand):
                model_path = cand
                break
    params = W.convert_wav2vec(K.load_state_dict(model_path))
    chunks = W.get_audio_feats_per_inference(
        params, W.WAV2VEC2_XLSR_53, np.asarray(audio, np.float32),
        fps=int(fps), batch_frames=num_frames, m=0)
    return chunks[0]


def load_audio(path: str, sample_rate: int = 16000) -> np.ndarray:
    """Decode an audio file to a mono float waveform (ffmpeg or soundfile)."""
    try:
        import soundfile as sf
        data, sr = sf.read(path, dtype="float32")
        if data.ndim > 1:
            data = data.mean(axis=1)
        if sr != sample_rate:
            n_out = int(len(data) * sample_rate / sr)
            data = np.interp(np.linspace(0, len(data) - 1, n_out),
                             np.arange(len(data)), data).astype(np.float32)
        return data
    except ImportError:
        pass
    import subprocess
    proc = subprocess.run(
        ["ffmpeg", "-i", path, "-f", "f32le", "-ac", "1",
         "-ar", str(sample_rate), "-"],
        capture_output=True, check=True)
    return np.frombuffer(proc.stdout, np.float32)
