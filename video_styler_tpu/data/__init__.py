from .video import VideoData, save_video, save_frames, merge_video_audio
