from .attention import (attention_matrix, ipsr_attention,
                        ipsr_attention_batched)
from .convs import (InstanceNorm, TorchConv, TorchConvTranspose,
                    bilinear_resize, conv2d, conv_transpose2d, instance_norm,
                    make_norm, normal_init)
from .masks import (HOLE_FILL_RGB, center_mask, expand_mask, feat_mask,
                    fill_hole_with_mean, patch_flags, random_stroke_mask,
                    zero_hole)
