"""Visualization export (SURVEY.md C16)."""

import numpy as np

from tpuseg.eval.viz import colorize_labels, export_overlay, label_colors, overlay


def _fixture():
    img = np.random.default_rng(0).random((8, 16, 16)).astype(np.float32)
    lab = np.zeros((8, 16, 16), np.int32)
    lab[2:5, 2:6, 2:6] = 1
    lab[5:7, 10:14, 10:14] = 2
    return img, lab


def test_palette_distinct_and_bg_black():
    pal = label_colors(50)
    assert (pal[0] == 0).all()
    assert len({tuple(c) for c in pal[1:]}) == 50  # all distinct


def test_colorize_shapes():
    _, lab = _fixture()
    rgb = colorize_labels(lab)
    assert rgb.shape == (8, 16, 16, 3) and rgb.dtype == np.uint8
    assert (rgb[lab == 0] == 0).all()
    assert (rgb[lab == 1] == rgb[lab == 1][0]).all()  # constant per instance


def test_overlay_only_tints_foreground():
    img, lab = _fixture()
    ov = overlay(img, lab)
    base = overlay(img, np.zeros_like(lab))
    assert np.array_equal(ov[lab == 0], base[lab == 0])
    assert not np.array_equal(ov[lab == 1], base[lab == 1])


def test_export_png_and_tiff(tmp_path):
    img, lab = _fixture()
    png = str(tmp_path / "proj.png")
    export_overlay(png, img, lab, projection=0)
    tif = str(tmp_path / "full.tiff")
    export_overlay(tif, img, lab, projection=None)
    from PIL import Image

    assert Image.open(png).size == (16, 16)
    with Image.open(tif) as im:
        assert im.n_frames == 8
