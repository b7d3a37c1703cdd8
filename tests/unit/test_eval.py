"""Instance matching / F1 (SURVEY.md C14)."""

import numpy as np
import pytest

from tpuseg.eval import instance_metrics


def _vol(assign):
    v = np.zeros((4, 8, 8), np.int32)
    for (sl, val) in assign:
        v[sl] = val
    return v


def test_perfect_match():
    gt = _vol([((slice(0, 2), slice(0, 4), slice(0, 4)), 1),
               ((slice(2, 4), slice(4, 8), slice(4, 8)), 2)])
    m = instance_metrics(gt.copy(), gt)
    assert m["f1"] == 1.0 and m["tp"] == 2 and m["fp"] == 0 and m["fn"] == 0
    assert m["mean_matched_iou"] == pytest.approx(1.0)


def test_label_permutation_invariance():
    gt = _vol([((slice(0, 2), slice(0, 4), slice(0, 4)), 1),
               ((slice(2, 4), slice(4, 8), slice(4, 8)), 2)])
    pred = np.where(gt == 1, 7, np.where(gt == 2, 3, 0)).astype(np.int32)
    m = instance_metrics(pred, gt)
    assert m["f1"] == 1.0


def test_missed_and_spurious():
    gt = _vol([((slice(0, 2), slice(0, 4), slice(0, 4)), 1),
               ((slice(2, 4), slice(4, 8), slice(4, 8)), 2)])
    pred = _vol([((slice(0, 2), slice(0, 4), slice(0, 4)), 1),
                 ((slice(0, 1), slice(6, 8), slice(0, 2)), 5)])  # miss #2, add junk
    m = instance_metrics(pred, gt)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1
    assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5


def test_iou_threshold():
    gt = _vol([((slice(0, 4), slice(0, 4), slice(0, 4)), 1)])
    # predicted instance covers half of gt -> IoU = 0.5
    pred = _vol([((slice(0, 4), slice(0, 2), slice(0, 4)), 1)])
    assert instance_metrics(pred, gt, iou_threshold=0.5)["tp"] == 1
    assert instance_metrics(pred, gt, iou_threshold=0.6)["tp"] == 0


def test_split_instance_matches_once():
    gt = _vol([((slice(0, 4), slice(0, 4), slice(0, 8)), 1)])
    pred = _vol([((slice(0, 4), slice(0, 4), slice(0, 4)), 1),
                 ((slice(0, 4), slice(0, 4), slice(4, 8)), 2)])
    m = instance_metrics(pred, gt, iou_threshold=0.4)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 0


def test_center_criterion():
    gt = _vol([((slice(0, 4), slice(0, 4), slice(0, 4)), 1)])
    pred = _vol([((slice(1, 3), slice(1, 3), slice(1, 3)), 9)])  # tiny but centered
    assert instance_metrics(pred, gt, criterion="center")["tp"] == 1
    assert instance_metrics(pred, gt, criterion="iou")["tp"] == 0


def test_empty_cases():
    gt = _vol([((slice(0, 2), slice(0, 2), slice(0, 2)), 1)])
    empty = np.zeros_like(gt)
    m = instance_metrics(empty, gt)
    assert m["f1"] == 0.0 and m["fn"] == 1 and m["n_pred"] == 0
    m2 = instance_metrics(gt, empty)
    assert m2["f1"] == 0.0 and m2["fp"] == 1


def test_voxel_metrics():
    import numpy as np

    from tpuseg.eval import voxel_metrics

    gt = np.zeros((4, 8, 8), np.int32)
    gt[1, 2:6, 2:6] = 1
    pred = np.zeros_like(gt)
    pred[1, 2:6, 2:4] = 3          # half the gt foreground
    m = voxel_metrics(pred, gt)
    assert abs(m["voxel_dice"] - 2 * 8 / (8 + 16)) < 1e-9
    assert abs(m["voxel_iou"] - 8 / 16) < 1e-9
    assert m["voxel_accuracy"] == 1.0 - 8 / gt.size

    perfect = voxel_metrics(gt, gt)
    assert perfect["voxel_dice"] == 1.0 and perfect["voxel_iou"] == 1.0


def test_center_criterion_order_invariant():
    """VERDICT r3 weak #6: when one predicted instance contains several GT
    centers, tp = number of DISTINCT claimed preds — the maximum bipartite
    matching (each GT has exactly one candidate pred) — for ANY GT ordering.
    Relabeling GT (permuting iteration order) must not change the metrics."""
    import numpy as np

    from tpuseg.eval import instance_metrics

    pred = np.zeros((8, 8, 8), np.int32)
    pred[0:4] = 1          # one big pred covering two GT instances
    pred[5:8] = 2
    gt = np.zeros((8, 8, 8), np.int32)
    gt[0:2] = 1            # center z≈0.5 -> inside pred 1
    gt[2:4] = 2            # center z≈2.5 -> inside pred 1 (already claimed)
    gt[5:7] = 3            # inside pred 2

    m1 = instance_metrics(pred, gt, criterion="center")
    # permute GT ids: 1<->3 reverses which GT hits pred 1 first
    perm = np.zeros(4, np.int32)
    perm[[1, 2, 3]] = [3, 2, 1]
    m2 = instance_metrics(pred, perm[gt], criterion="center")
    assert m1["tp"] == m2["tp"] == 2
    for k in ("precision", "recall", "f1", "fp", "fn"):
        assert m1[k] == m2[k], (k, m1[k], m2[k])
