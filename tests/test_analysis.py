"""Motif mining + per-predicate evaluator + visualization smoke tests."""

import numpy as np

from neural_motifs_tpu.analysis.motifs import MotifMiner
from neural_motifs_tpu.evaluation.sg_eval_all_rel_cates import PerPredicateEvaluator
from tests.test_sg_eval import make_scene


def test_motif_miner_finds_planted_motif():
    # plant a co-occurring pair of triples in many images
    rng = np.random.RandomState(0)
    classes, rels = [], []
    for i in range(300):
        cls = np.array([1, 2, 3, rng.randint(4, 8)])
        r = [(0, 1, 1), (2, 3, 2)]  # always co-occur
        if rng.rand() < 0.3:
            r.append((1, 2, rng.randint(3, 5)))
        classes.append(cls)
        rels.append(np.array([(s, o, p) for s, o, p in r]))
    miner = MotifMiner(count_threshold=20, pmi_threshold=1.5, iterations=3)
    found = miner.mine(classes, rels)
    assert len(found) >= 1
    names = [miner.token_str(t, [f"c{i}" for i in range(10)],
                             [f"p{i}" for i in range(10)]) for t, _ in found]
    assert any("&" in n for n in names)


def test_per_predicate_evaluator(rng):
    ev = PerPredicateEvaluator("sgdet", [f"p{i}" for i in range(10)])
    for _ in range(5):
        gt, pred = make_scene(rng)
        ev.evaluate_scene_graph_entry(gt, pred)
    assert 0.0 <= ev.mean_recall(100) <= 1.0


def test_draw_scene_graph(tmp_path, rng):
    from neural_motifs_tpu.analysis.visualize import draw_scene_graph
    gt, pred = make_scene(rng)
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    out = str(tmp_path / "sg.png")
    lines = draw_scene_graph(img, pred, [f"c{i}" for i in range(25)],
                             [f"p{i}" for i in range(12)], out,
                             score_thresh=0.0)
    import os
    assert os.path.exists(out)
    assert len(lines) > 0
