"""Experiment: exact space-to-depth reformulation of VGG blocks 1-2.

The round-4 stage profile puts the VGG trunk at 83 ms of the 388 ms
batch-32 step, running at ~42% of bf16 peak; the FLOP math says blocks
1-2 (65.7 of 214 GFLOP/img) drag the average because their channel
counts (3/64/128) leave the 128-lane MXU mostly idle at 592^2/296^2.

The classic fix (MLPerf ResNet conv0) is space-to-depth: evaluate the
stride-1 3x3 convs on the 2x2-block representation [H/2, W/2, 4C], where
each of the 4 output offset groups is an exactly-equivalent 2x2 block
conv with remapped weights (9 of the 16 taps are the original kernel,
7 are structural zeros -> 16/9 more MACs at ~4x the channel density).
MaxPool 2x2/s2 aligns with the blocks, so it becomes a max over the 4
offset groups -- the whole transform is numerically a reordering of the
same f32 additions.

This tool A/Bs on the attached device (amortized-dispatch protocol):
  baseline   : blocks 1-2 as the model runs them (nn.Conv 3x3 SAME)
  s2d-b1     : block 1 in s2d form, block 2 unchanged
  s2d-b12    : both blocks in s2d form
and first verifies exactness of the remap vs the baseline weights.

RESULT (v5e, b32, 2026-08-19): NEGATIVE — the remap is exact (max rel
err 2e-7 at HIGHEST precision) but ~2x SLOWER (baseline 33.9 ms,
s2d-b1 62.2 ms, s2d-b12 72.2 ms). XLA:TPU already runs the thin-channel
early blocks at 62 semantic TFLOP/s via spatial tiling; four 2x2-kernel
group convs + concat lose more to launch/layout than the 4x channel
density buys, and the 16/9 structural-MAC overhead eats the rest. Kept
as a recorded experiment so the next round doesn't re-try it. With
blocks 1-2 at 33.9 ms of the 83.3 ms trunk, the remaining trunk runs at
~97 TFLOP/s — the trunk is NOT early-block-bound; there is no easy
backbone win left at these shapes.

Usage: python tools/exp_s2d_backbone.py [batch] [iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def s2d(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C]; channel layout (oi, oj, c)."""
    import jax.numpy as jnp
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // 2, w // 2, 4 * c)


def d2s(x, c):
    """Inverse of s2d: [B, Hb, Wb, 4C] -> [B, 2Hb, 2Wb, C]."""
    import jax.numpy as jnp
    b, hb, wb, _ = x.shape
    x = x.reshape(b, hb, wb, 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, 2 * hb, 2 * wb, c)


def remap_weight(w, di, dj):
    """Original kernel w [3, 3, C, K] -> block kernel [2, 2, 4C, K] for
    output offset group (di, dj). Tap (bu, bv) input channel (oi, oj, c)
    corresponds to original tap (u+1, v+1) with
      u = 2*bu + oi - (2 - di),  v = 2*bv + oj - (2 - dj)
    (zero when outside [-1, 1])."""
    c, k = w.shape[2], w.shape[3]
    w2 = np.zeros((2, 2, 2, 2, c, k), w.dtype)  # (bu, bv, oi, oj, c, k)
    for bu in range(2):
        for bv in range(2):
            for oi in range(2):
                for oj in range(2):
                    u = 2 * bu + oi - (2 - di)
                    v = 2 * bv + oj - (2 - dj)
                    if -1 <= u <= 1 and -1 <= v <= 1:
                        w2[bu, bv, oi, oj] = w[u + 1, v + 1]
    return w2.reshape(2, 2, 4 * c, k)


def s2d_conv(x, w, b):
    """3x3 SAME stride-1 conv (+bias) evaluated on the s2d representation.
    x [B, Hb, Wb, 4C], w [3, 3, C, K] original -> [B, Hb, Wb, 4K]."""
    import jax
    import jax.numpy as jnp
    outs = []
    for di in range(2):
        for dj in range(2):
            w2 = jnp.asarray(remap_weight(np.asarray(w, np.float32), di, dj),
                             x.dtype)
            pad = ((1 - di, di), (1 - dj, dj))
            y = jax.lax.conv_general_dilated(
                x, w2, window_strides=(1, 1), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(y + jnp.asarray(b, x.dtype))
    # stack in (di, dj) order -> s2d layout (di, dj, k)
    return jnp.concatenate(
        [o[..., None, :] for o in outs], axis=-2
    ).reshape(x.shape[0], x.shape[1], x.shape[2], -1)


def s2d_pool(x, k):
    """MaxPool 2x2 stride 2 on the s2d representation = max over the 4
    offset groups. x [B, Hb, Wb, 4K] -> [B, Hb, Wb, K]."""
    b, hb, wb, _ = x.shape
    return x.reshape(b, hb, wb, 4, k).max(axis=3)


def timed(name, jf, args, iters):
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    out = jf(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))
    compile_s = time.time() - t0
    t0 = time.time()
    for _i in range(iters):
        out = jf(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))
    med = (time.time() - t0) / iters
    print(f"{name:10s} {med * 1000:8.2f} ms  (compile {compile_s:.1f}s)",
          flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    rng = np.random.RandomState(0)

    # blocks 1-2 weights (f32 params, bf16 compute like the model)
    ws = {
        "c11": (rng.randn(3, 3, 3, 64) * 0.05, rng.randn(64) * 0.01),
        "c12": (rng.randn(3, 3, 64, 64) * 0.05, rng.randn(64) * 0.01),
        "c21": (rng.randn(3, 3, 64, 128) * 0.05, rng.randn(128) * 0.01),
        "c22": (rng.randn(3, 3, 128, 128) * 0.05, rng.randn(128) * 0.01),
    }
    ws = {k: (np.asarray(w, np.float32), np.asarray(b, np.float32))
          for k, (w, b) in ws.items()}

    def conv(x, key, dt):
        import jax
        w, b = ws[key]
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w, dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.asarray(b, dt)

    def pool(x):
        import flax.linen as nn
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    def baseline(x, dt=jnp.bfloat16):
        x = x.astype(dt)
        x = jax.nn.relu(conv(x, "c11", dt))
        x = jax.nn.relu(conv(x, "c12", dt))
        x = pool(x)
        x = jax.nn.relu(conv(x, "c21", dt))
        x = jax.nn.relu(conv(x, "c22", dt))
        return pool(x)

    def s2d_conv_k(x, key, dt):
        w, b = ws[key]
        return s2d_conv(x, w, b)

    def variant_b1(x, dt=jnp.bfloat16):
        x = s2d(x.astype(dt))
        x = jax.nn.relu(s2d_conv_k(x, "c11", dt))
        x = jax.nn.relu(s2d_conv_k(x, "c12", dt))
        x = s2d_pool(x, 64)                      # = pool1, normal rep @296^2
        x = jax.nn.relu(conv(x, "c21", dt))
        x = jax.nn.relu(conv(x, "c22", dt))
        return pool(x)

    def variant_b12(x, dt=jnp.bfloat16):
        x = s2d(x.astype(dt))
        x = jax.nn.relu(s2d_conv_k(x, "c11", dt))
        x = jax.nn.relu(s2d_conv_k(x, "c12", dt))
        x = s2d_pool(x, 64)
        x = s2d(x)
        x = jax.nn.relu(s2d_conv_k(x, "c21", dt))
        x = jax.nn.relu(s2d_conv_k(x, "c22", dt))
        return s2d_pool(x, 128)

    # ---- exactness check (f32 HIGHEST precision, small input; TPU's
    # default f32 conv runs bf16 passes, which is not what we're testing) ----
    xs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = baseline(xs, jnp.float32)
        for name, fn in (("s2d-b1", variant_b1), ("s2d-b12", variant_b12)):
            got = fn(xs, jnp.float32)
            err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
            print(f"exactness {name}: max rel err {err:.2e}")
            assert err < 1e-5, f"{name} not equivalent"

    # ---- timing at bench scale ----
    x = jnp.asarray(rng.randn(batch, 592, 592, 3).astype(np.float32) * 0.3)
    x = jax.device_put(x)
    gf = (batch * (1.21 + 25.8 + 12.9 + 25.8))  # semantic GFLOP, blocks 1-2
    rows = []
    for name, fn in (("baseline", baseline), ("s2d-b1", variant_b1),
                     ("s2d-b12", variant_b12)):
        med = timed(name, jax.jit(fn), (x,), iters)
        rows.append((name, med))
        print(f"  -> {gf / med / 1e3:.1f} semantic TFLOP/s")
    base = rows[0][1]
    for name, med in rows[1:]:
        print(f"{name}: {base / med:.3f}x vs baseline "
              f"({(base - med) * 1000:+.1f} ms @b{batch})")


if __name__ == "__main__":
    main()
