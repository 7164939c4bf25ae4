from fmri_tpu.eval.evaluate import (  # noqa: F401
    objective_scores, quality_metrics, reconstruct_dataset,
    save_objective_bar_chart, save_objective_csv, save_reconstructions,
)
from fmri_tpu.eval.user_study import (  # noqa: F401
    REFERENCE_TASKS, TASK3_PREFERENCE, score_all, score_task,
)
