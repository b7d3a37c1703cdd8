"""Volume I/O: microscopy stacks and label volumes (SURVEY.md C1, C16).

NORTH-STAR I/O contract: "checkpoint-in, instance-label-volume-out". Supported
containers, keyed by extension:

  .npy / .npz     numpy (fast path, always available)
  .h5 / .hdf5     HDF5 via h5py (dataset name "volume" by default)
  .tif / .tiff    multi-page TIFF via PIL (grayscale 8/16/32-bit pages)

skimage/tifffile are not in this environment; PIL covers the TIFF cases the
reference reads (plain multi-page microscopy stacks). Anything exotic
(BigTIFF, tiles, LZW-float) should be converted to HDF5/npy upstream.
"""

from __future__ import annotations

import os

import numpy as np


def load_volume(path: str, dataset: str = "volume") -> np.ndarray:
    """Read a (D, H, W) volume from npy/npz/h5/tiff."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        return np.load(path)
    if ext == ".npz":
        with np.load(path) as z:
            key = dataset if dataset in z else list(z.keys())[0]
            return z[key]
    if ext in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            key = dataset if dataset in f else list(f.keys())[0]
            return np.asarray(f[key])
    if ext in (".tif", ".tiff"):
        from PIL import Image, ImageSequence

        with Image.open(path) as im:
            pages = [np.asarray(p) for p in ImageSequence.Iterator(im)]
        return np.stack(pages, axis=0)
    raise ValueError(f"unsupported volume extension: {ext}")


def save_volume(path: str, vol: np.ndarray, dataset: str = "volume") -> None:
    """Write a (D, H, W) volume; container chosen by extension."""
    vol = np.asarray(vol)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        np.save(path, vol)
        return
    if ext == ".npz":
        np.savez_compressed(path, **{dataset: vol})
        return
    if ext in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "w") as f:
            f.create_dataset(dataset, data=vol, compression="gzip")
        return
    if ext in (".tif", ".tiff"):
        from PIL import Image

        if vol.dtype in (np.int64, np.uint64):
            vol = vol.astype(np.int32)
        pages = [Image.fromarray(vol[z]) for z in range(vol.shape[0])]
        pages[0].save(path, save_all=True, append_images=pages[1:])
        return
    raise ValueError(f"unsupported volume extension: {ext}")


def load_annotations(path: str):
    """Weak annotations: npz with ``centers`` (K,3) and ``half_sizes`` (K,3)."""
    with np.load(path) as z:
        return z["centers"].astype(np.float32), z["half_sizes"].astype(np.float32)


def save_annotations(path: str, centers: np.ndarray, half_sizes: np.ndarray) -> None:
    np.savez_compressed(path, centers=centers, half_sizes=half_sizes)
