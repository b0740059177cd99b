"""Keyframe-guided flow-matching video editor (the Ditto novel pipeline).

Pure-functional port of WanVideoEditorPipeline
(/root/reference/diffsynth/pipelines/wan_video_editor.py:18-413):

  1. coupled noise — edited keyframes reuse the main video's noise slices at
     their positions (:48-75), so both denoising routes start identically
  2. shared RoPE ids — edited keyframes keep the temporal rotation index of
     the frame they edit (:77-105), via the DiT's rope_indices support
  3. velocity-field correction — v_main[kf] += alpha * r_k with residual
     r_k = (z_main[kf] - z_edit) - (v_main[kf] - v_edit) * dt (:107-165)
  4. independent single-frame VAE encode of each keyframe (:198-236) — no
     fake temporal continuity between distant keyframes

The joint [main | edit] latent is denoised by one DiT forward per step with
custom rope indices; steps 1-4 are elementwise jnp ops around it.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .wan_video import WanVideoPipeline, _preprocess_images, generate_noise


class WanVideoEditorPipeline(WanVideoPipeline):

    def prepare_coupled_noise(self, latent_shape, keyframe_indices: List[int],
                              seed: Optional[int] = None):
        """(noise_main, noise_edit): keyframe noise slices are shared
        (wan_video_editor.py:48-75)."""
        noise_main = generate_noise(latent_shape, seed=seed)
        noise_edit = noise_main[:, :, keyframe_indices, :, :].copy()
        return noise_main, noise_edit

    @staticmethod
    def construct_rope_ids(total_frames: int, keyframe_indices: List[int]) -> np.ndarray:
        """[0..T-1] ++ keyframe_indices (wan_video_editor.py:77-105)."""
        return np.concatenate([np.arange(total_frames),
                               np.asarray(keyframe_indices)]).astype(np.int32)

    @staticmethod
    def compute_velocity_correction(z_main, z_edit, v_main, v_edit,
                                    keyframe_indices, dt: float,
                                    alpha: float = 10.0, beta: float = 0.0):
        """r_k = Δz - Δv*dt; v_main[kf] += alpha*r_k (wan_video_editor.py:107-165)."""
        kf = np.asarray(keyframe_indices)
        v_main_at_keys = v_main[:, :, kf]
        z_diff = z_main[:, :, kf] - z_edit
        v_diff = v_main_at_keys - v_edit
        r_k = z_diff - v_diff * dt
        correction = alpha * r_k
        v_main_corrected = v_main.at[:, :, kf].add(correction)
        v_edit_corrected = v_edit - beta * correction if beta > 0 else v_edit
        return v_main_corrected, v_edit_corrected

    @staticmethod
    def compute_metrics(z_main, z_edit, v_main, v_edit, keyframe_indices,
                        dt: float) -> Dict[str, float]:
        kf = np.asarray(keyframe_indices)
        z_diff = z_main[:, :, kf] - z_edit
        v_diff = v_main[:, :, kf] - v_edit
        r_k = z_diff - v_diff * dt
        return {
            "r_k_norm": float(jnp.mean(jnp.abs(r_k))),
            "v_diff_norm": float(jnp.mean(jnp.abs(v_diff))),
            "delta_v_norm": float(jnp.mean(jnp.abs(z_diff))),
        }

    def encode_keyframes_independently(self, keyframes, **tiler_kwargs):
        """Each keyframe encoded as its own 1-frame video
        (wan_video_editor.py:198-236)."""
        lats = [self.encode_video(_preprocess_images([kf]), **tiler_kwargs)
                for kf in keyframes]
        return jnp.concatenate(lats, axis=2)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        source_video=None,
        edited_keyframes=None,
        keyframe_indices: Optional[List[int]] = None,
        seed: Optional[int] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        cfg_scale: float = 5.0,
        num_inference_steps: int = 50,
        sigma_shift: float = 5.0,
        alpha: float = 10.0,
        beta: float = 0.0,
        tiled: bool = True,
        tile_size: Tuple[int, int] = (30, 52),
        tile_stride: Tuple[int, int] = (15, 26),
        progress_bar_cmd=None,
        verbose: bool = True,
        return_latents: bool = False,
        tea_cache_l1_thresh: Optional[float] = None,
        tea_cache_model_id: str = "",
    ):
        if source_video is None or edited_keyframes is None or keyframe_indices is None:
            raise ValueError("source_video, edited_keyframes, and keyframe_indices are required")
        if len(edited_keyframes) != len(keyframe_indices):
            raise ValueError(
                f"Number of edited keyframes ({len(edited_keyframes)}) must "
                f"match keyframe_indices ({len(keyframe_indices)})")
        height, width, num_frames = self.check_resize(height, width, num_frames)
        if len(source_video) != num_frames:
            num_frames = len(source_video)
        kw = dict(tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)
        self.scheduler.set_timesteps(num_inference_steps, shift=sigma_shift)

        # encode source + keyframes
        z_main_clean = self.encode_video(_preprocess_images(source_video), **kw)
        z_edit_clean = self.encode_keyframes_independently(edited_keyframes, **kw)
        del z_edit_clean  # encoded for parity of the pipeline contract; the
        # editor denoises from pure coupled noise (wan_video_editor.py:337-339)

        # latent-space keyframe indices
        t_lat = z_main_clean.shape[2]
        kf_lat = sorted({min(k // 4, t_lat - 1) for k in keyframe_indices}) \
            if max(keyframe_indices) >= t_lat else list(keyframe_indices)

        noise_main, noise_edit = self.prepare_coupled_noise(
            z_main_clean.shape, kf_lat, seed=seed)
        z_main = jnp.asarray(noise_main, self.dtype)
        z_edit = jnp.asarray(noise_edit, self.dtype)

        ctx_posi = self.encode_prompt(prompt)
        ctx_nega = self.encode_prompt(negative_prompt) if cfg_scale != 1.0 else None

        rope_ids = self.construct_rope_ids(t_lat, kf_lat)

        # TeaCache per CFG branch — the skip decision rides the timestep
        # modulation exactly as in the base pipeline; a skipped step reuses
        # the cached trunk residual for the JOINT [main | edit] sequence, so
        # the velocity correction still runs every step on the approximated v.
        tc_posi = tc_nega = None
        if tea_cache_l1_thresh is not None:
            from .wan_video import TeaCache
            tc_posi = TeaCache(num_inference_steps, tea_cache_l1_thresh,
                               tea_cache_model_id)
            tc_nega = TeaCache(num_inference_steps, tea_cache_l1_thresh,
                               tea_cache_model_id)

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t_host = float(self.scheduler.timesteps[i])
            timestep = jnp.asarray([t_host], jnp.float32)
            z_concat = jnp.concatenate([z_main, z_edit], axis=2)
            v_posi = self._branch_forward("dit", self.dit_params, None,
                                          z_concat, timestep, ctx_posi, None,
                                          1.0, tc_posi, rope_indices=rope_ids)
            if cfg_scale != 1.0:
                v_nega = self._branch_forward("dit", self.dit_params, None,
                                              z_concat, timestep, ctx_nega, None,
                                              1.0, tc_nega, rope_indices=rope_ids)
                v = v_nega + cfg_scale * (v_posi - v_nega)
            else:
                v = v_posi
            v_main = v[:, :, :t_lat]
            v_edit = v[:, :, t_lat:]

            if i < len(self.scheduler.timesteps) - 1:
                dt = float(self.scheduler.timesteps[i] - self.scheduler.timesteps[i + 1])
            else:
                dt = 0.0
            v_main, v_edit = self.compute_velocity_correction(
                z_main.astype(jnp.float32), z_edit.astype(jnp.float32),
                v_main.astype(jnp.float32), v_edit.astype(jnp.float32),
                kf_lat, dt, alpha, beta)
            if verbose and i % 10 == 0:
                m = self.compute_metrics(z_main.astype(jnp.float32),
                                         z_edit.astype(jnp.float32),
                                         v_main, v_edit, kf_lat, dt)
                print(f"Step {i}: r_k={m['r_k_norm']:.6f}, "
                      f"v_diff={m['v_diff_norm']:.6f}, Δv={m['delta_v_norm']:.6f}")

            sigma, sigma_next = self.scheduler.sigma_pair(i)
            ds = sigma_next - sigma
            z_main = (z_main.astype(jnp.float32) + v_main * ds).astype(self.dtype)
            z_edit = (z_edit.astype(jnp.float32) + v_edit * ds).astype(self.dtype)

        if return_latents:
            return z_main
        video = self.decode_video(z_main, **kw)
        return self.vae_output_to_video(video)
