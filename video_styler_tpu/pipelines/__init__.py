from .wan_video import WanVideoPipeline, ModelConfig
from .wan_video_editor import WanVideoEditorPipeline
