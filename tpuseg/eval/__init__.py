from tpuseg.eval.instance_f1 import instance_metrics

__all__ = ["instance_metrics"]
