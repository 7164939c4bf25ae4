from fmri_tpu.losses.gan_losses import (  # noqa: F401
    LOG_EPS, HeadLosses, VaeGanTerms, combine_mode, equilibrium_gate,
    vaegan_terms, wae_disc_losses, wae_penalty_mean, wae_penalty_sum,
    wae_recon_mean, wae_recon_sum,
)
from fmri_tpu.losses.aux_losses import (  # noqa: F401
    feature_cosine_loss, feature_loss, image_loss, norm_image_prediction,
    total_variation_l1, total_variation_l2, total_variation_loss, voxel_loss,
)
