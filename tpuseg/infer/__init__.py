from tpuseg.infer.tiles import tiled_forward
from tpuseg.infer.pipeline import infer_volume, make_batched_infer_fn, make_infer_fn
from tpuseg.infer.sharded import (
    arrange_multislice_devices,
    make_multislice_zy_mesh,
    make_sharded_infer_fn,
    make_z_mesh,
    make_zy_mesh,
    multislice_mesh_shapes,
    shard_volume,
)
from tpuseg.infer.streaming import stream_infer

__all__ = [
    "tiled_forward",
    "infer_volume",
    "make_batched_infer_fn",
    "make_infer_fn",
    "arrange_multislice_devices",
    "make_multislice_zy_mesh",
    "make_sharded_infer_fn",
    "make_z_mesh",
    "make_zy_mesh",
    "multislice_mesh_shapes",
    "shard_volume",
    "stream_infer",
]
