"""Training harness: optimizer wiring, plateau scheduler, frequency-baseline
end-to-end slice (data -> counts -> scoring -> evaluator)."""

import numpy as np
import jax.numpy as jnp
import optax

from neural_motifs_tpu.data.synthetic import SyntheticVG
from neural_motifs_tpu.training.eval_rel_count import eval_frequency_baseline
from neural_motifs_tpu.training.train_state import (PlateauScheduler,
                                                    make_optimizer)


def test_optimizer_fc_group_gets_lower_lr():
    params = {"roi_fmap": {"fc0": {"kernel": jnp.ones((4, 4))}},
              "other": {"kernel": jnp.ones((4, 4))}}
    tx = make_optimizer(1.0, l2=0.0, clip=1e9, fc_lr_factor=0.1)
    state = tx.init(params)
    grads = {"roi_fmap": {"fc0": {"kernel": jnp.ones((4, 4))}},
             "other": {"kernel": jnp.ones((4, 4))}}
    updates, _ = tx.update(grads, state, params)
    fc_step = float(np.abs(np.asarray(updates["roi_fmap"]["fc0"]["kernel"]))[0, 0])
    other_step = float(np.abs(np.asarray(updates["other"]["kernel"]))[0, 0])
    assert abs(fc_step / other_step - 0.1) < 1e-5


def test_plateau_scheduler():
    s = PlateauScheduler(patience=2, factor=0.1, cooldown=0)
    scale = 1.0
    for metric in [0.1, 0.2, 0.2, 0.2, 0.2]:   # 3 bad epochs after the best
        scale = s.step(metric)
    assert abs(scale - 0.1) < 1e-9
    # improvement resets
    scale = s.step(0.5)
    assert abs(scale - 0.1) < 1e-9


def test_frequency_baseline_end_to_end():
    """The SURVEY §7 step-3 minimum slice: counts -> lookup -> evaluator.
    A dataset whose val rels follow the same (s,o)->p map as train must
    score near-perfect R@100 on predcls with the count model."""
    train = SyntheticVG(num_images=40, num_classes=8, num_predicates=5, seed=3)
    # make predicate deterministic given the class pair, in BOTH splits
    for ds in (train,):
        for i in range(len(ds)):
            cls = ds.gt_classes[i]
            r = ds.relationships[i]
            r[:, 2] = (cls[r[:, 0]] + cls[r[:, 1]]) % 4 + 1
    val = SyntheticVG(num_images=10, num_classes=8, num_predicates=5, seed=3)
    for i in range(len(val)):
        cls = val.gt_classes[i]
        r = val.relationships[i]
        r[:, 2] = (cls[r[:, 0]] + cls[r[:, 1]]) % 4 + 1

    ev = eval_frequency_baseline(train, val, mode="predcls",
                                 must_overlap=False)
    r100 = np.mean(ev.result_dict["predcls_recall"][100])
    assert r100 > 0.9, f"frequency baseline should nail deterministic data, got {r100}"
