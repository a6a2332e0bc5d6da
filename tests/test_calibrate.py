"""calibrate_batch_stats: after exact recalibration, eval-mode BN output
matches train-mode normalization with the dataset statistics — closing the
train/eval gap that torch-momentum-0.001 BNs (reference rel_model.py:103)
leave after short runs."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from neural_motifs_tpu.models.context import MaskedBatchNorm
from neural_motifs_tpu.training.calibrate import calibrate_batch_stats


class Toy(nn.Module):
    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        return MaskedBatchNorm(momentum=0.999)(x, mask,
                                               use_running_average=not train)


def _batches(rng, n_batches=4, b=16, f=5):
    out = []
    for _ in range(n_batches):
        x = rng.randn(b, f).astype(np.float32) * 3.0 + 7.0
        mask = rng.rand(b) > 0.25
        mask[0] = True
        out.append(dict(x=jnp.asarray(x), mask=jnp.asarray(mask)))
    return out


def test_calibrated_stats_match_dataset_stats(rng):
    model = Toy()
    batches = _batches(rng)
    variables = model.init(jax.random.PRNGKey(0), batches[0]["x"],
                           batches[0]["mask"], train=True)
    params, stats = variables["params"], variables["batch_stats"]

    # stale running stats (fresh init: mean 0 var 1) -> eval output is off
    calibrated = calibrate_batch_stats(model.apply, params, stats, batches,
                                       rngs={})

    # ground truth: masked stats over the whole dataset
    xs = np.concatenate([np.asarray(b["x"])[np.asarray(b["mask"])]
                         for b in batches])
    leaf_mean = jax.tree_util.tree_leaves(
        {k: v for k, v in calibrated.items()})
    got_mean = np.asarray(calibrated["MaskedBatchNorm_0"]["mean"])
    got_var = np.asarray(calibrated["MaskedBatchNorm_0"]["var"])
    np.testing.assert_allclose(got_mean, xs.mean(0), rtol=0.05, atol=0.05)
    # pooled var: avg of batch vars + var of batch means ~= global var
    # (exact only for equal VALID counts; masked batches differ, so loose)
    np.testing.assert_allclose(got_var, xs.var(0), rtol=0.25, atol=0.25)

    # eval-mode output with calibrated stats tracks the true normalization
    x, mask = batches[0]["x"], batches[0]["mask"]
    y_eval = model.apply({"params": params, "batch_stats": calibrated},
                         x, mask, train=False)
    expect = (np.asarray(x) - xs.mean(0)) / np.sqrt(xs.var(0) + 1e-5)
    np.testing.assert_allclose(np.asarray(y_eval), expect, rtol=0.3,
                               atol=0.3)


def test_noop_on_statless_tree():
    out = calibrate_batch_stats(None, {}, {}, [], rngs={})
    assert out == {}
