from gdrnet_tpu.data.synthetic import synthetic_roi_batch
from gdrnet_tpu.data.ref_meta import get_meta, DatasetMeta
from gdrnet_tpu.data.bop import load_bop_scene_dicts, load_detections
from gdrnet_tpu.data.model_store import ObjectModels
from gdrnet_tpu.data.mapper import GDRNTrainMapper, GDRNTestMapper, collate
from gdrnet_tpu.data.loader import TrainLoader, InferenceLoader
from gdrnet_tpu.data.augment import BackgroundReplacer, build_color_augmentor

__all__ = [
    "synthetic_roi_batch",
    "get_meta",
    "DatasetMeta",
    "load_bop_scene_dicts",
    "load_detections",
    "ObjectModels",
    "GDRNTrainMapper",
    "GDRNTestMapper",
    "collate",
    "TrainLoader",
    "InferenceLoader",
    "BackgroundReplacer",
    "build_color_augmentor",
]
