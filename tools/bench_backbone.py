"""Per-block timing of the VGG16 backbone on the attached TPU.

The stage bench showed the conv trunk running at ~17 TFLOP/s (49ms for
~0.86 TFLOP at batch 8) — far off the MXU roofline. This micro-bench times
each conv block (and a few layout variants) to find the slow layer.

Usage: python tools/bench_backbone.py [batch] [iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timed(jf, args, iters):
    import jax
    import jax.numpy as jnp
    out = jf(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _i in range(iters):
        t0 = time.time()
        out = jf(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32)))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = np.random.RandomState(0)

    # block plan: (n_convs, channels, input hw, input channels)
    blocks = [(2, 64, 592, 3), (2, 128, 296, 64), (3, 256, 148, 128),
              (3, 512, 74, 256), (3, 512, 37, 512)]

    print(f"batch {batch}")
    total = 0.0
    for bi, (n, ch, hw, cin) in enumerate(blocks):
        class Block(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = x.astype(jnp.bfloat16)
                for i in range(n):
                    x = nn.Conv(ch, (3, 3), padding="SAME",
                                dtype=jnp.bfloat16,
                                param_dtype=jnp.float32)(x)
                    x = nn.relu(x)
                return nn.max_pool(x, (2, 2), strides=(2, 2))

        m = Block()
        x = jnp.asarray(rng.randn(batch, hw, hw, cin).astype(np.float32))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        jf = jax.jit(lambda vv, xx, m=m: m.apply(vv, xx))
        med = timed(jf, (v, x), iters)
        total += med
        flops = batch * n * hw * hw * ch * 9 * 2 * (cin if n == 1 else
                                                    (cin + (n - 1) * ch) / n)
        # more precisely: first conv cin->ch, rest ch->ch
        flops = batch * hw * hw * 9 * 2 * ch * (cin + (n - 1) * ch)
        print(f"block{bi + 1} ({n}x conv{ch} @{hw}^2): {med * 1000:7.2f} ms "
              f"({flops / med / 1e12:6.1f} TFLOP/s)", flush=True)
    print(f"sum of blocks: {total * 1000:.1f} ms")

    # variant: whole trunk fused (as the model runs it)
    from neural_motifs_tpu.models.backbone import VGG16Features
    m = VGG16Features()
    x = jnp.asarray(rng.randn(batch, 592, 592, 3).astype(np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    jf = jax.jit(lambda vv, xx: m.apply(vv, xx))
    med = timed(jf, (v, x), iters)
    print(f"full trunk: {med * 1000:.1f} ms ({batch / med:.1f} img/s)")


if __name__ == "__main__":
    main()
