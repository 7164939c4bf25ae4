"""fmri_tpu — TPU-native (JAX/XLA/Flax/Pallas/pjit) framework for fMRI-to-image
reconstruction, re-designing the capabilities of MariaPdg/thesis-fmri-reconstruction
(Dual-VAE/GAN + WAE/GAN families, 3-stage training, BOLD5000 pipeline) for TPU
hardware: SPMD over device meshes, one fused jitted train step per stage, and
Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
