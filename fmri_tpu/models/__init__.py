from fmri_tpu.models.nets import (  # noqa: F401
    BN_EPS, BN_MOMENTUM, CognitiveEncoder, Decoder, DecoderBlock, EncoderBlock,
    ImageDiscriminator, LatentDiscriminator, ResNetEncoder, VisualEncoder,
    VoxelDecoder, WaeDecoder, reparameterize,
)
from fmri_tpu.models.resnet152 import (  # noqa: F401
    resnet152_trunk_fn, resnet_trunk,
)
