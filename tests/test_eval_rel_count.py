"""Frequency-baseline eval modes (reference models/eval_rel_count.py):
predcls/sgcls/sgdet plumbing, the probability-matrix construction, and the
analysis numbers — on synthetic data with an oracle det_fn."""

import numpy as np

from neural_motifs_tpu.data.synthetic import SyntheticVG
from neural_motifs_tpu.training.eval_rel_count import (analysis_numbers,
                                                       eval_frequency_baseline,
                                                       freq_prob_matrix,
                                                       predict)


def deterministic_pair(num_images, seed):
    ds = SyntheticVG(num_images=num_images, num_classes=8, num_predicates=5,
                     seed=seed)
    for i in range(len(ds)):
        cls = ds.gt_classes[i]
        r = ds.relationships[i]
        r[:, 2] = (cls[r[:, 0]] + cls[r[:, 1]]) % 4 + 1
    return ds


def test_prob_matrix_shape_and_bg(tmp_path):
    train = deterministic_pair(20, 3)
    p = freq_prob_matrix(train, save_path=str(tmp_path / "ps.npy"))
    assert p.shape == (8, 8, 5)
    assert np.all(p[:, :, 0] == 0)           # bg zeroed after save
    saved = np.load(tmp_path / "ps.npy")
    assert np.all(saved[:, :, 0] > 0)        # saved table keeps bg+1
    np.testing.assert_allclose(saved.sum(2), 1.0)


def test_predict_zeroes_noncandidates():
    train = deterministic_pair(20, 3)
    p = freq_prob_matrix(train, save_path=None)
    boxes = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [100, 100, 110, 110]],
                     np.float32)
    cls = np.array([1, 2, 3])
    full = predict(p, boxes, cls, must_overlap=True)
    assert np.all(full[0, 2] == 0) and np.all(full[2, 0] == 0)  # disjoint
    assert full[0, 1].sum() > 0                                  # overlap
    full_all = predict(p, boxes, cls, must_overlap=False)
    assert full_all[0, 2].sum() > 0
    assert np.all(np.diagonal(full_all, axis1=0, axis2=1).T == 0)


def test_sgcls_sgdet_modes_with_oracle_det_fn():
    """With an oracle det_fn returning the GT, sgcls/sgdet must reach the
    same near-perfect recall as predcls on deterministic data."""
    train = deterministic_pair(40, 3)
    val = deterministic_pair(10, 3)
    prob = freq_prob_matrix(train, save_path=None)

    def det_fn(i):
        n = len(val.gt_classes[i])
        return val.gt_boxes[i].copy(), val.gt_classes[i].copy(), np.ones(n)

    for mode in ("sgcls", "sgdet"):
        ev = eval_frequency_baseline(train, val, mode=mode, prob=prob,
                                     det_fn=det_fn)
        r100 = np.mean(ev.result_dict[f"{mode}_recall"][100])
        assert r100 > 0.9, f"{mode} oracle baseline got {r100}"


def test_analysis_numbers():
    train = deterministic_pair(40, 3)
    val = deterministic_pair(10, 3)
    prob = freq_prob_matrix(train, save_path=None)
    most_freq, zeroshot = analysis_numbers(prob, val)
    # deterministic mapping -> the most frequent predicate is the only one
    assert most_freq > 0.9
    assert zeroshot < 0.1
    # an unseen-class-pair dataset is all zero-shot
    weird = deterministic_pair(10, 3)
    for i in range(len(weird)):
        weird.relationships[i][:, 2] = (weird.relationships[i][:, 2] % 4) + 1
        weird.relationships[i][:, 2] = 4 - (weird.relationships[i][:, 2] - 1)
    mf2, zs2 = analysis_numbers(prob, weird)
    assert zs2 > zeroshot or mf2 < most_freq
