from fmri_tpu.metrics.quality import (  # noqa: F401
    denormalize, gaussian_window, inception_score_from_probs, mse,
    objective_assessment, objective_assessment_batch, pearson_correlation, ssim,
)
from fmri_tpu.metrics.inception import inception_score, is_proxy  # noqa: F401
