from .wan_dit import (
    WanDiTConfig,
    WAN_T2V_1_3B,
    WAN_T2V_14B,
    WAN_I2V_14B,
    WAN_TI2V_5B,
    WAN_DIT_TINY,
    init_wan_dit,
    wan_dit_forward,
)
from .wan_vace import VaceConfig, VACE_14B, VACE_1_3B, VACE_TINY, init_vace, vace_forward
from .wav2vec import (
    Wav2Vec2Config,
    WAV2VEC2_XLSR_53,
    WAV2VEC2_TINY,
    init_wav2vec,
    convert_wav2vec,
    wav2vec_forward,
    get_audio_feats_per_inference,
)
from .clip_dual import (
    CLIPDualConfig,
    CLIP_VIT_H_14_DUAL,
    CLIP_DUAL_TINY,
    init_clip_dual,
    convert_hf_clip,
    convert_open_clip,
    convert_cross_model,
    clip_image_features,
    clip_text_features,
    cross_model_forward,
)
from .blip_reward import (
    BlipRewardConfig,
    IMAGE_REWARD,
    BLIP_REWARD_TINY,
    convert_image_reward,
    image_reward_forward,
)
