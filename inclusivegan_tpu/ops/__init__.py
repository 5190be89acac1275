from .upfirdn2d import (  # noqa: F401
    upfirdn2d, setup_filter, filter2d, upsample2d, downsample2d,
    upsample_conv2d, conv_downsample2d,
)
from .fused_bias_act import fused_bias_act, activation_funcs  # noqa: F401
