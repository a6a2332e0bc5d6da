"""Data pipeline: collate padding semantics, loader iteration, frequency
counts/bias table, runtime bindings."""

import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.batching import Loader, collate
from neural_motifs_tpu.data.synthetic import SyntheticVG
from neural_motifs_tpu.models.frequency import (FrequencyBias, box_filter,
                                                freq_bias_table, get_counts)
from neural_motifs_tpu.runtime import bbox_overlaps as rt_iou
from tests.test_boxes import np_iou, rand_boxes


def test_collate_shapes_and_scaling():
    ds = SyntheticVG(num_images=4)
    budgets = C.PadBudgets(max_gt_boxes=16, max_gt_rels=16)
    batch = collate([ds[i] for i in range(3)], budgets)
    assert batch.images.shape == (3, C.IM_SCALE, C.IM_SCALE, 3)
    assert batch.gt_boxes.shape == (3, 16, 4)
    # boxes scaled from BOX_SCALE to IM_SCALE
    n0 = batch.gt_mask[0].sum()
    np.testing.assert_allclose(batch.gt_boxes[0, :n0],
                               ds[0]["gt_boxes"][:n0] * C.IM_SCALE / C.BOX_SCALE,
                               rtol=1e-5)
    # padded rows zero / masked
    assert not batch.gt_mask[0, n0:].any()
    assert np.all(batch.gt_boxes[0, n0:] == 0)
    # rels reference valid boxes
    for b in range(3):
        r = batch.gt_rels[b][batch.gt_rel_mask[b]]
        assert (r[:, :2] < batch.gt_mask[b].sum()).all()


def test_loader_epoch():
    ds = SyntheticVG(num_images=10)
    loader = Loader(ds, batch_size=4, shuffle=True,
                    budgets=C.PadBudgets(max_gt_boxes=16, max_gt_rels=16))
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert all(b.images.shape[0] == 4 for b in batches)


def test_truncation_accounting():
    """VERDICT r2 #5: over-budget GT must be counted and reported loudly —
    the reference keeps all GT (visual_genome.py:313-330), so silent
    truncation costs recall."""
    ds = SyntheticVG(num_images=8)
    budgets = C.PadBudgets(max_gt_boxes=4, max_gt_rels=2)

    # fabricate an over-budget entry: 6 boxes (2 over), rels touching the
    # truncated endpoints plus more than fit the rel budget
    e = ds[0]
    e["gt_boxes"] = np.tile(e["gt_boxes"][:1], (6, 1)).astype(np.float32)
    e["gt_classes"] = np.ones(6, np.int32)
    e["gt_relations"] = np.array(
        [[0, 1, 1], [1, 2, 1], [2, 3, 1], [0, 5, 2], [4, 1, 2]], np.int32)
    batch = collate([e], budgets)
    # 2 boxes over budget; rels (0,5) and (4,1) lose endpoints; of the 3
    # surviving rels, 1 exceeds max_gt_rels=2
    np.testing.assert_array_equal(batch.truncation[0], [2, 2, 1])
    assert batch.gt_mask[0].sum() == 4
    assert batch.gt_rel_mask[0].sum() == 2

    # in-budget batches report zero truncation
    clean = collate([ds[i] for i in range(2)],
                    C.PadBudgets(max_gt_boxes=64, max_gt_rels=64))
    assert (clean.truncation == 0).all()

    # Loader aggregates per epoch and reports loudly
    class OverBudget(SyntheticVG):
        def __getitem__(self, i):
            entry = dict(super().__getitem__(i))
            entry["gt_boxes"] = np.tile(entry["gt_boxes"][:1], (6, 1)).astype(
                np.float32)
            entry["gt_classes"] = np.ones(6, np.int32)
            entry["gt_relations"] = np.array([[0, 5, 1]], np.int32)
            return entry

    loader = Loader(OverBudget(num_images=4), batch_size=2, shuffle=False,
                    budgets=budgets, process_index=0, process_count=1)
    list(loader)
    assert loader.trunc_images == 4 and loader.total_images == 4
    np.testing.assert_array_equal(loader.trunc_totals, [8, 4, 0])
    assert "WARNING" in loader.truncation_report()

    ok = Loader(SyntheticVG(num_images=4), batch_size=2, shuffle=False,
                budgets=C.PadBudgets(max_gt_boxes=64, max_gt_rels=64),
                process_index=0, process_count=1)
    list(ok)
    assert "none" in ok.truncation_report()


def test_uint8_images_match_host_normalized_f32():
    """The uint8 loader path (raw pixels, in-graph ImageNet normalize +
    im_hw mean-fill of the padding) must produce the same detector input as
    the legacy host path (normalize_array + zero-pad of the normalized
    array), to f32 rounding: same pixels inside, exact 0 (= mean) outside."""
    import jax
    import jax.numpy as jnp
    from neural_motifs_tpu.data.transforms import normalize_array
    from neural_motifs_tpu.models.detector import ObjectDetector

    rng = np.random.RandomState(3)
    b, H, W = 2, C.IM_SCALE, C.IM_SCALE
    raw = rng.randint(0, 256, (b, H, W, 3), np.uint8)
    hw = np.array([[H, W - 100], [H - 50, W]], np.float32)
    # zero the raw padding like collate does (entries are unpadded crops)
    for i in range(b):
        raw[i, int(hw[i, 0]):] = 0
        raw[i, :, int(hw[i, 1]):] = 0
    host = np.zeros((b, H, W, 3), np.float32)
    for i in range(b):
        eh, ew = int(hw[i, 0]), int(hw[i, 1])
        host[i, :eh, :ew] = normalize_array(raw[i, :eh, :ew])

    det = ObjectDetector(num_classes=4, mode="gtbox", dtype=jnp.float32)

    def normalize_in_graph(images, im_hw):
        # replicate the uint8 branch of ObjectDetector.__call__
        from neural_motifs_tpu.data.transforms import (IMAGENET_MEAN,
                                                       IMAGENET_STD)
        x = images.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        hh = jnp.arange(images.shape[1])[None, :, None]
        ww = jnp.arange(images.shape[2])[None, None, :]
        inside = ((hh < im_hw[:, 0, None, None])
                  & (ww < im_hw[:, 1, None, None]))
        return x * inside[..., None]

    got = np.asarray(jax.jit(normalize_in_graph)(jnp.asarray(raw),
                                                 jnp.asarray(hw)))
    np.testing.assert_allclose(got, host, rtol=0, atol=1e-6)
    # padding region is exactly zero (= ImageNet mean in normalized space)
    assert np.all(got[0, int(hw[0, 0]):] == 0)
    assert np.all(got[1, :, int(hw[1, 1]):] == 0)

    # and the real detector accepts uint8 end-to-end (gtbox smoke)
    boxes = jnp.asarray([[[4.0, 4, 60, 60], [10, 10, 90, 90]]] * b)
    out = det.init_with_output(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(raw), jnp.asarray(hw), gt_boxes=boxes,
        gt_classes=jnp.ones((b, 2), jnp.int32),
        gt_mask=jnp.ones((b, 2), bool), train=False)[0]
    assert np.isfinite(np.asarray(out.rm_boxes)).all()
    assert np.asarray(out.rm_valid).any()


def test_device_prefetch_order_and_errors():
    """device_prefetch must preserve batch order, apply prepare() to every
    batch, and re-raise worker exceptions in the consumer thread."""
    from neural_motifs_tpu.data.batching import device_prefetch

    items = list(range(7))
    got = list(device_prefetch(items, lambda x: x * 10, depth=3))
    assert [h for h, _ in got] == items
    assert [d for _, d in got] == [x * 10 for x in items]

    def bad_prepare(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    try:
        consumed = [h for h, _ in device_prefetch(items, bad_prepare)]
        raise AssertionError("worker exception not propagated")
    except RuntimeError as e:
        assert "boom" in str(e)


def test_get_counts_and_bias():
    ds = SyntheticVG(num_images=12, num_classes=10, num_predicates=6)
    fg, bg = get_counts(ds, must_overlap=False)
    assert fg.shape == (10, 10, 6)
    total_rels = sum(len(r) for r in ds.relationships)
    assert fg.sum() == total_rels
    table = freq_bias_table(fg=fg, bg=bg)
    assert table.shape == (100, 6)
    assert np.isfinite(table).all()
    fb = FrequencyBias(table, 10)
    import jax.numpy as jnp
    out = np.asarray(fb.index_with_labels(jnp.asarray([2]), jnp.asarray([3])))
    np.testing.assert_allclose(out[0], table[2 * 10 + 3], rtol=1e-6)


def test_box_filter_fallback():
    # non-overlapping boxes with must_overlap -> falls back to all pairs
    boxes = np.array([[0, 0, 10, 10], [500, 500, 520, 520]], float)
    pairs = box_filter(boxes, must_overlap=True)
    assert len(pairs) == 2  # (0,1) and (1,0)


def test_native_runtime_iou_matches_oracle(rng):
    a = rand_boxes(rng, 15)
    b = rand_boxes(rng, 9)
    np.testing.assert_allclose(rt_iou(a, b), np_iou(a, b), rtol=1e-6, atol=1e-9)


def test_native_greedy_nms_matches(rng):
    from neural_motifs_tpu.runtime import greedy_nms
    from tests.test_nms import np_greedy_nms
    boxes = rand_boxes(rng, 40, scale=100)
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    got = greedy_nms(boxes, scores, 0.5)
    exp = np_greedy_nms(boxes, scores, np.ones(40, bool), 0.5)
    np.testing.assert_array_equal(got, exp)


def test_native_resize_bitexact_vs_pil(rng):
    """nm_resize_bilinear_u8 must be byte-identical to PIL BILINEAR —
    square_pad_resize routes through it by default, so any deviation would
    silently change every pixel the models (and the parity gate) see."""
    from PIL import Image
    from neural_motifs_tpu.runtime import resize_bilinear_u8

    if resize_bilinear_u8(np.zeros((4, 4, 3), np.uint8), 2, 2) is None:
        import pytest
        pytest.skip("native runtime unavailable")
    # downscale, upscale, identity, extreme aspect, tiny
    for (h, w), (oh, ow) in [((600, 800), (444, 592)), ((100, 100), (592, 592)),
                             ((64, 48), (64, 48)), ((37, 5), (9, 592)),
                             ((2, 2), (5, 7)), ((480, 640), (444, 592))]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        exp = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
        got = resize_bilinear_u8(img, oh, ow)
        np.testing.assert_array_equal(got, exp, err_msg=f"{(h,w)}->{(oh,ow)}")


def test_square_pad_resize_native_matches_pil_path(rng):
    """The loader's square_pad_resize must give identical bytes whether or
    not the native fast path is active."""
    from PIL import Image
    from neural_motifs_tpu.data.transforms import square_pad_resize
    from neural_motifs_tpu import runtime as rt

    img = Image.fromarray(rng.randint(0, 256, (300, 420, 3)).astype(np.uint8))
    arr_native, meta_native = square_pad_resize(img)
    lib, tried = rt._LIB, rt._TRIED
    rt._LIB, rt._TRIED = None, True  # force the PIL fallback
    try:
        arr_pil, meta_pil = square_pad_resize(img)
    finally:
        rt._LIB, rt._TRIED = lib, tried
    assert meta_native == meta_pil
    np.testing.assert_array_equal(arr_native, arr_pil)


def test_native_jpeg_decode_bitexact_vs_pil(rng, tmp_path):
    """nm_decode_jpeg_scaled at 8/8 must byte-match PIL's decode (both are
    libjpeg; the loader self-check gates the native default on this)."""
    import io
    from PIL import Image
    from neural_motifs_tpu.runtime import decode_jpeg_scaled

    if decode_jpeg_scaled(b"", 8) is not None:  # pragma: no cover
        raise AssertionError("garbage stream must not decode")
    probe = np.kron(rng.randint(0, 256, (30, 40, 3)), np.ones((8, 8, 1)))
    cases = [(Image.fromarray(probe.astype(np.uint8)), q)
             for q in (70, 90, 95)]
    cases.append((Image.fromarray(probe[:, :, 0].astype(np.uint8), "L"), 90))
    import pytest
    for img, q in cases:
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=q)
        data = buf.getvalue()
        nat = decode_jpeg_scaled(data, 8)
        if nat is None:
            pytest.skip("native runtime unavailable")
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(nat, pil, err_msg=f"mode={img.mode} q={q}")


def test_decode_image_rgb_matches_pil_and_fast_mode(rng, tmp_path, monkeypatch):
    import io
    from PIL import Image
    from neural_motifs_tpu.data import transforms as T

    arr = np.kron(rng.randint(0, 256, (96, 128, 3)), np.ones((8, 8, 1)))
    big = Image.fromarray(arr.astype(np.uint8))  # 1024x768 (> 2x IM_SCALE? no: 1024)
    fn = str(tmp_path / "a.jpg")
    big.save(fn, quality=90)

    monkeypatch.delenv("NM_FAST_DECODE", raising=False)
    got = T.decode_image_rgb(fn)
    exp = np.asarray(Image.open(fn).convert("RGB"))
    np.testing.assert_array_equal(got, exp)

    # fast mode: 1024 long side has no M<=4 with ceil(1024*M/8) >= 592
    # (4/8 -> 512), so it must still decode at full resolution
    monkeypatch.setenv("NM_FAST_DECODE", "1")
    got_fast = T.decode_image_rgb(fn)
    np.testing.assert_array_equal(got_fast, exp)

    # a 2368-px image admits 2/8 (592) — fast mode may legally return the
    # scaled decode; it must cover IM_SCALE and stay close to a reference
    # downsample of the exact decode
    huge = Image.fromarray(np.kron(rng.randint(0, 256, (74, 74, 3)),
                                   np.ones((32, 32, 1))).astype(np.uint8))
    fn2 = str(tmp_path / "b.jpg")
    huge.save(fn2, quality=90)
    fast = T.decode_image_rgb(fn2)
    assert max(fast.shape[:2]) >= T.IM_SCALE
    assert fast.shape[0] == fast.shape[1] == 592  # ceil(2368 * 2/8) = 592
    # quality: scaled-DCT decode ~ area-downsampled exact decode
    exact = np.asarray(Image.open(fn2).convert("RGB"))
    ref = np.asarray(Image.fromarray(exact).resize((592, 592), Image.BILINEAR))
    err = np.abs(fast.astype(float) - ref.astype(float)).mean()
    assert err < 8.0, f"scaled decode too far from reference downsample: {err}"

    # non-JPEG falls back to PIL
    png = str(tmp_path / "c.png")
    Image.fromarray(rng.randint(0, 256, (20, 30, 3)).astype(np.uint8)).save(png)
    monkeypatch.delenv("NM_FAST_DECODE", raising=False)
    got_png = T.decode_image_rgb(png)
    np.testing.assert_array_equal(got_png,
                                  np.asarray(Image.open(png).convert("RGB")))


class _JpegMix:
    """Tiny mixed-aspect JPEG dataset for bucket tests."""

    def __init__(self, tmpdir, sizes):
        from PIL import Image
        self.filenames = []
        rng = np.random.RandomState(0)
        for i, (h, w) in enumerate(sizes):
            fn = f"{tmpdir}/m{i}.jpg"
            Image.fromarray(rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
                            ).save(fn, quality=85)
            self.filenames.append(fn)
        self.gt_boxes = [np.array([[1, 1, 30, 30]], np.float32)] * len(sizes)
        self.gt_classes = [np.array([1], np.int32)] * len(sizes)
        self.relationships = [np.zeros((0, 3), np.int32)] * len(sizes)

    def __len__(self):
        return len(self.filenames)

    def image_sizes(self):
        from PIL import Image
        from neural_motifs_tpu.runtime import jpeg_header
        out = np.zeros((len(self.filenames), 2), np.int64)
        for i, fn in enumerate(self.filenames):
            with open(fn, "rb") as f:
                hdr = jpeg_header(f.read(1 << 16))
            if hdr is not None:
                out[i] = (hdr[1], hdr[0])
            else:
                with Image.open(fn) as im:
                    out[i] = (im.size[1], im.size[0])
        return out

    def __getitem__(self, i):
        from neural_motifs_tpu.data.transforms import (decode_image_rgb,
                                                       square_pad_resize)
        arr, img_size = square_pad_resize(decode_image_rgb(self.filenames[i]))
        return {"img": arr, "img_size": img_size,
                "gt_boxes": self.gt_boxes[i], "gt_classes": self.gt_classes[i],
                "gt_relations": self.relationships[i],
                "scale": 1.0, "index": i, "flipped": False}


def test_loader_aspect_buckets(tmp_path):
    """im_buckets: every image lands exactly once, in the smallest bucket
    covering its post-resize shape; batches are shape-uniform; the partial
    final batch is padded by repeating the last image id."""
    from neural_motifs_tpu import config as C
    from neural_motifs_tpu.data.batching import Loader

    # landscape 4:3 (-> 444x592 -> (448, 592)), portrait (-> (592, 448)),
    # square (-> (592, 592)); counts 3/2/1 with batch 2 => landscape has a
    # padded tail batch
    sizes = [(600, 800), (612, 816), (608, 810), (800, 600), (816, 612),
             (700, 700)]
    ds = _JpegMix(str(tmp_path), sizes)
    loader = Loader(ds, 2, shuffle=False, drop_last=False, num_workers=1,
                    prefetch=0, process_index=0, process_count=1,
                    im_buckets=C.DEFAULT_IM_BUCKETS)
    seen = []
    shapes = {}
    for b in loader:
        assert len(set(b.images.shape[1:3])) >= 1
        for i, idx in enumerate(b.image_ids):
            if int(idx) >= 0 and int(idx) not in seen:  # -1 = tail pad
                seen.append(int(idx))
                shapes[int(idx)] = b.images.shape[1:3]
        # uniform shape within batch by construction
    assert sorted(seen) == list(range(6))
    assert shapes[0] == (448, 592) and shapes[3] == (592, 448)
    assert shapes[5] == (592, 592)
    # images bigger than every bucket raise loudly
    import pytest
    small = Loader(ds, 2, shuffle=False, drop_last=False, num_workers=1,
                   prefetch=0, process_index=0, process_count=1,
                   im_buckets=[(64, 64)])
    with pytest.raises(ValueError, match="no bucket"):
        next(iter(small))


def test_loader_tail_padding_covers_all_images(tmp_path):
    """drop_last=False pads the final chunk by repeating the last index —
    all images appear, shapes never change (no retrace), pad entries carry
    image id -1 so every host/consumer can skip them."""
    from neural_motifs_tpu.data.batching import Loader

    sizes = [(600, 800)] * 5
    ds = _JpegMix(str(tmp_path), sizes)
    loader = Loader(ds, 2, shuffle=False, drop_last=False, num_workers=1,
                    prefetch=0, process_index=0, process_count=1)
    ids = [list(map(int, b.image_ids)) for b in loader]
    assert ids == [[0, 1], [2, 3], [4, -1]]


def test_get_counts_matches_naive_loop():
    """The vectorized + native-kernel get_counts (nm_count_triples,
    csrc/nm_runtime.cpp) must count exactly what the reference's per-image
    python loop counts (get_dataset_counts.py:12-46), incl. mid-epoch chunk
    flushes."""
    ds = SyntheticVG(num_images=11, num_classes=8, num_predicates=5)
    fg, bg = get_counts(ds, must_overlap=True, chunk=3)
    fg2 = np.zeros_like(fg)
    bg2 = np.zeros_like(bg)
    for i in range(len(ds)):
        cls = ds.gt_classes[i]
        for (s, o, p) in ds.relationships[i]:
            fg2[cls[s], cls[o], p] += 1
        for (s, o) in box_filter(ds.gt_boxes[i], must_overlap=True):
            bg2[cls[s], cls[o]] += 1
    np.testing.assert_array_equal(fg, fg2)
    np.testing.assert_array_equal(bg, bg2)
