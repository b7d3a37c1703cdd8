from tpuseg.parallel.halo import exchange_z_halo
from tpuseg.parallel.reconcile import merge_boundary_labels, global_compact_labels

__all__ = ["exchange_z_halo", "merge_boundary_labels", "global_compact_labels"]
