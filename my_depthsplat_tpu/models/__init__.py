from .backbone import CNNEncoder
from .decoder import DecoderOutput, DecoderSplattingCfg, decode_splatting
from .dpt import DPTUpsamplerHead, PromptDPTHead
from .encoder import EncoderDepthSplat, EncoderDepthSplatCfg, knn_view_indices
from .ldm_unet import UNetModel
from .mv_transformer import MultiViewFeatureTransformer
from .promptda import PromptDA
from .unimatch import MultiViewUniMatch
from .vit import DinoViT, VIT_CONFIGS, ViTConfig
from .vit_fpn import ViTFeaturePyramid

__all__ = [
    "CNNEncoder",
    "DPTUpsamplerHead",
    "DecoderOutput",
    "DecoderSplattingCfg",
    "DinoViT",
    "EncoderDepthSplat",
    "EncoderDepthSplatCfg",
    "MultiViewFeatureTransformer",
    "MultiViewUniMatch",
    "PromptDA",
    "PromptDPTHead",
    "UNetModel",
    "VIT_CONFIGS",
    "ViTConfig",
    "ViTFeaturePyramid",
    "decode_splatting",
    "knn_view_indices",
]
