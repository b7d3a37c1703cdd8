from tpuseg.ops.peaks import peak_nms, seed_labels_from_peaks
from tpuseg.ops.watershed import ascent_labels, flood_labels, watershed
from tpuseg.ops.components import connected_components
from tpuseg.ops.filter import label_sizes, size_filter, size_filter_and_compact
from tpuseg.ops.relabel import compact_relabel

__all__ = [
    "apply_merge_table", "saddle_merge", "saddle_merge_table",
    "peak_nms",
    "seed_labels_from_peaks",
    "ascent_labels",
    "flood_labels",
    "watershed",
    "connected_components",
    "label_sizes",
    "size_filter",
    "size_filter_and_compact",
    "compact_relabel",
]
from tpuseg.ops.merge import apply_merge_table, saddle_merge, saddle_merge_table
