"""Video IO: lazy frame access, crop/resize, ffmpeg save.

Host-side port surface of /root/reference/diffsynth/data/video.py:9-217
(VideoData lazy reader, center crop+resize, imageio-ffmpeg writer, audio mux).
IO stays Python/ffmpeg on the host — only tensors go to the TPU.
"""
from __future__ import annotations

import os
import subprocess
from typing import List, Optional

import numpy as np
from PIL import Image


def crop_and_resize(image: Image.Image, height: int, width: int) -> Image.Image:
    """Center crop to the target aspect ratio then resize (video.py:67-80)."""
    w, h = image.size
    scale = max(width / w, height / h)
    image = image.resize((round(w * scale), round(h * scale)), Image.LANCZOS)
    w2, h2 = image.size
    left = (w2 - width) // 2
    top = (h2 - height) // 2
    return image.crop((left, top, left + width, top + height))


class LowMemoryVideo:
    def __init__(self, file_name: str):
        self.reader = None
        self.cap = None
        try:
            import imageio
            self.reader = imageio.get_reader(file_name)
            self.reader.count_frames()
        except Exception:
            # no ffmpeg backend for imageio in this env -> cv2 reader
            import cv2
            self.reader = None
            self.cap = cv2.VideoCapture(file_name)
            if not self.cap.isOpened():
                raise IOError(f"cannot open video {file_name}")
            self._n = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
            self._pos = 0

    def __len__(self):
        if self.reader is not None:
            return self.reader.count_frames()
        return self._n

    def __getitem__(self, item) -> Image.Image:
        if self.reader is not None:
            return Image.fromarray(
                np.array(self.reader.get_data(item))).convert("RGB")
        import cv2
        if item != self._pos:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, item)
        ok, frame = self.cap.read()
        self._pos = item + 1
        if not ok:
            raise IndexError(f"frame {item} unreadable")
        return Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))

    def __del__(self):
        if getattr(self, "reader", None) is not None:
            self.reader.close()
        if getattr(self, "cap", None) is not None:
            self.cap.release()


class LowMemoryImageFolder:
    def __init__(self, folder: str, file_list: Optional[List[str]] = None):
        if file_list is None:
            self.file_list = [os.path.join(folder, f)
                              for f in sorted(os.listdir(folder))]
        else:
            self.file_list = [os.path.join(folder, f) for f in file_list]

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, item) -> Image.Image:
        return Image.open(self.file_list[item]).convert("RGB")


class VideoData:
    """Lazy frame access with optional crop/resize (video.py:83-131)."""

    def __init__(self, video_file: Optional[str] = None,
                 image_folder: Optional[str] = None,
                 height: Optional[int] = None, width: Optional[int] = None,
                 **kwargs):
        if video_file is not None:
            self.data_type = "video"
            self.data = LowMemoryVideo(video_file)
        elif image_folder is not None:
            self.data_type = "images"
            self.data = LowMemoryImageFolder(image_folder, **kwargs)
        else:
            raise ValueError("Cannot open video or image folder")
        self.length = None
        self.height = height
        self.width = width

    def raw_data(self) -> List[Image.Image]:
        return [self[i] for i in range(len(self))]

    def set_length(self, length: int):
        self.length = length

    def set_shape(self, height: int, width: int):
        self.height = height
        self.width = width

    def __len__(self):
        return self.length if self.length is not None else len(self.data)

    def shape(self):
        if self.height is not None and self.width is not None:
            return self.height, self.width
        w, h = self[0].size
        return h, w

    def __getitem__(self, item) -> Image.Image:
        frame = self.data.__getitem__(item)
        if self.height is not None and self.width is not None:
            frame = crop_and_resize(frame, self.height, self.width)
        return frame

    def save_images(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        for i in range(len(self)):
            self[i].save(os.path.join(folder, f"{i}.png"))


def save_video(frames: List[Image.Image], save_path: str, fps: int = 25,
               quality: int = 5, ffmpeg_params=None):
    """imageio-ffmpeg writer (video.py:140-152); cv2 fallback when the
    ffmpeg backend is absent in the environment."""
    try:
        import imageio
        writer = imageio.get_writer(save_path, fps=fps, quality=quality,
                                    ffmpeg_params=ffmpeg_params)
        for frame in frames:
            writer.append_data(np.array(frame))
        writer.close()
        return
    except Exception:
        pass
    import cv2
    h, w = np.array(frames[0]).shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*("mp4v" if save_path.endswith(".mp4") else "XVID"))
    vw = cv2.VideoWriter(save_path, fourcc, fps, (w, h))
    if not vw.isOpened():
        raise RuntimeError(f"no available video writer for {save_path}")
    for frame in frames:
        vw.write(cv2.cvtColor(np.array(frame), cv2.COLOR_RGB2BGR))
    vw.release()


def save_frames(frames: List[Image.Image], save_path: str):
    os.makedirs(save_path, exist_ok=True)
    for i, frame in enumerate(frames):
        frame.save(os.path.join(save_path, f"{i}.png"))


def merge_video_audio(video_path: str, audio_path: str,
                      output_path: Optional[str] = None):
    """ffmpeg audio mux (video.py:163-217)."""
    out = output_path or (os.path.splitext(video_path)[0] + "_with_audio.mp4")
    cmd = ["ffmpeg", "-y", "-i", video_path, "-i", audio_path,
           "-c:v", "copy", "-c:a", "aac", "-shortest", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out
