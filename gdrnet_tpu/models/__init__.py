from gdrnet_tpu.models.gdrn import GDRN, build_model
from gdrnet_tpu.models.resnet import ResNetBackbone
from gdrnet_tpu.models.heads import RotWithRegionHead, TransHeadNet
from gdrnet_tpu.models.conv_pnp_net import ConvPnPNet

__all__ = [
    "GDRN",
    "build_model",
    "ResNetBackbone",
    "RotWithRegionHead",
    "TransHeadNet",
    "ConvPnPNet",
]
