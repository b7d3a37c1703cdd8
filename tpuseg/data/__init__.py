from tpuseg.data.normalize import percentile_normalize
from tpuseg.data.synthetic import synthesize_touching_volume, synthesize_volume
from tpuseg.data.weak_targets import make_weak_targets
from tpuseg.data.augment import augment_patch
from tpuseg.data.sampler import PatchSampler

__all__ = [
    "percentile_normalize",
    "synthesize_touching_volume",
    "synthesize_volume",
    "make_weak_targets",
    "augment_patch",
    "PatchSampler",
]
