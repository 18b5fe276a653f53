from .discriminators import NLayerDiscriminator, PFDiscriminator
from .unet import UnetGenerator
from .unet_ipsr import UnetGeneratorIPSR
from .vgg16 import Vgg16, VggFeatures, apply_vgg16, vgg16_params
