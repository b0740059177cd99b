"""Audio feature extraction for S2V.

The reference vendors a wav2vec tower (diffsynth/models/wav2vec.py) and a
Wav2Vec2Processor pipeline unit (wan_video_new.py WanVideoUnit_S2V). Here the
tower is delegated to transformers' Wav2Vec2Model (same architecture, host
CPU is fine — it's a one-shot preprocessing step); the output contract
matches the S2V model's `audio_input`: all hidden states stacked per layer,
resampled to one feature column per video frame.
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

    Requires a local wav2vec2 checkpoint dir (`model_path`); the reference
    downloads wav2vec2-large via ModelScope.
    """
    import torch
    from transformers import Wav2Vec2Model, Wav2Vec2Processor

    if model_path is None:
        raise ValueError("pass model_path to a local wav2vec2 checkpoint dir")
    processor = Wav2Vec2Processor.from_pretrained(model_path)
    model = Wav2Vec2Model.from_pretrained(model_path).eval()

    inputs = processor(audio, sampling_rate=sample_rate, return_tensors="pt")
    with torch.no_grad():
        out = model(inputs.input_values, output_hidden_states=True)
    # (num_layers, T_feat, dim)
    feats = torch.stack(out.hidden_states, dim=0)[:, 0]
    feats = feats.permute(0, 2, 1).numpy()          # (L, dim, T_feat)

    # resample features to one column per video frame (nearest)
    t_feat = feats.shape[-1]
    idx = np.clip((np.arange(num_frames) + 0.5) * t_feat / num_frames,
                  0, t_feat - 1).astype(int)
    return feats[None, :, :, idx]


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
