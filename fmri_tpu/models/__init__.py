from fmri_tpu.models.nets import (  # noqa: F401
    BN_EPS, BN_MOMENTUM, CognitiveEncoder, Decoder, DecoderBlock, EncoderBlock,
    ImageDiscriminator, LatentDiscriminator, ResNetEncoder, VisualEncoder,
    VoxelDecoder, WaeDecoder, reparameterize,
)
