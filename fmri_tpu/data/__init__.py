from fmri_tpu.data.datasets import (  # noqa: F401
    Bold5000Volumes, BoldRoiDataset, CocoImages, Mnist69,
    prepare_external_data, split_subject_data,
)
from fmri_tpu.data.etl import (  # noqa: F401
    NUM_VOXELS, ROIS_MAX, SUBJECTS, aggregate_bold_sessions,
    concatenate_bold_data, extract_roi, extract_roi_by_mask, find_stimuli_path,
    get_fmri_path, get_identifier, get_stimuli_path, max_roi_length,
    split_dataset, train_test_stimuli_split, zscore,
)
from fmri_tpu.data.packed import (  # noqa: F401
    is_packed_dir, open_packed, pack_images_streaming, save_packed,
)
from fmri_tpu.data.pipeline import Batches, device_iterator  # noqa: F401
from fmri_tpu.data.transforms import (  # noqa: F401
    center_crop, decode_image, denormalize, eval_preprocess, grey_to_color,
    load_stimulus, normalize, random_flip_batch, random_shift_batch,
    resize_batch, resize_image, train_augment,
)
