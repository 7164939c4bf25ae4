from fmri_tpu.ops.conv import (  # noqa: F401
    conv2d, conv2d_transpose, depthwise_conv2d,
)
from fmri_tpu.ops.pallas_ssim import ssim_pallas  # noqa: F401
