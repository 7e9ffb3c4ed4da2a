"""Data layer: datasets, augmentations, mosaic, converters, video, pipeline."""
from .augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Augmentation,
    BGR2RGB,
    Blur,
    CenterCrop,
    ChannelShuffle,
    HistEqualize,
    HorizontalFlip,
    HSVJitter,
    Jitter,
    Normalization,
    Padding,
    RandomCrop,
    Resize,
    ResizeByMax,
    VerticalFlip,
    build_augmentation,
)
from .class_names import (
    CIFAR10_CLASSES,
    COCO_CLASSES,
    DATASETS,
    categories_for,
    make_descriptor,
)
from .converters import (
    VOC_CLASSES,
    coco_80_to_91_ids,
    coco_90_to_80_map,
    coco_to_fastvision,
    voc_to_fastvision,
)
from .dataset import (
    ClassificationDataset,
    DetectionDataset,
    boxes_to_normalized_xywh,
    imread_rgb,
    letterbox,
    pad_labels,
    read_label_file,
)
from .mosaic import mosaic4
from .pipeline import (
    ClassificationLoader,
    DetectionLoader,
    host_shard_order,
    normalize_images,
    prefetch_to_device,
    resolve_host_shard,
)
from .video_dataset import VIDEO_EXTS, VideoClipLoader, VideoFolderDataset
from .video_sampler import (
    count_real_frames,
    load_clip,
    sample_clip_from_array,
    sample_indices,
)
