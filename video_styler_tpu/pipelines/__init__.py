from .wan_video import WanVideoPipeline, ModelConfig
from .wan_video_editor import WanVideoEditorPipeline
from .wan_enhancer import WanEnhancerPipeline
from .sd_image import SDImagePipeline
from .sdxl_image import SDXLImagePipeline
from .sdxl_video import SDXLVideoPipeline
from .flux_image import FluxImagePipeline
from .sd3_image import SD3ImagePipeline
from .hunyuan_video import HunyuanVideoPipeline
from .svd_video import SVDVideoPipeline
from .sd_video import SDVideoPipeline
from .qwen_image import QwenImagePipeline
from .cog_video import CogVideoPipeline
from .step_video import StepVideoPipeline
from .hunyuan_image import HunyuanImagePipeline
from .omnigen_image import OmnigenImagePipeline
from .pipeline_runner import SDVideoPipelineRunner
