from tpuseg.eval.instance_f1 import instance_metrics, voxel_metrics

__all__ = ["instance_metrics", "voxel_metrics"]
