from dfu_multimodal_tpu.data.layout import (  # noqa: F401
    CLASSES, IMAGE_EXTS, SPLITS, SplitIndex, dataset_statistics, list_images,
    print_dataset_statistics, scan_modality, scan_split)
from dfu_multimodal_tpu.data.leakage import (  # noqa: F401
    LeakageError, check_split_leakage, compute_sha256, hash_files)
from dfu_multimodal_tpu.data.loader import (  # noqa: F401
    ArrayDataset, batch_slices, device_prefetch, epoch_indices,
    get_dataloaders, load_image, load_paired, load_single_modality,
    sample_weights)
from dfu_multimodal_tpu.data.pairing import (  # noqa: F401
    Pair, aligned_pairs, pair_class_counts, pseudo_pairs)
from dfu_multimodal_tpu.data.synthetic import (  # noqa: F401
    make_image, make_synthetic_dataset)
from dfu_multimodal_tpu.data.transforms import (  # noqa: F401
    affine_warp, augment_and_normalize, eval_normalize, normalize,
    sample_inverse_affine)
