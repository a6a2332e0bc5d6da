"""Padded batch container — the TPU replacement for the reference's Blob.

The reference Blob (dataloaders/blob.py:10-229) concatenates ragged
per-image tensors with an image-index column, chunks them per GPU and
scatters. On TPU the whole step is one pjit program over a [B, ...] leading
batch axis, so the batch is just fixed-shape padded arrays + masks; the
image-offset arithmetic disappears entirely (a row's image is its batch
index) and "scatter" is a sharding annotation, not code.

Anchor targets — which the reference computes on CPU dataloader workers at
collate time (blob.py:92-102) — are computed *in-graph* on device
(ops/sampling.anchor_targets), so collate here is pure stacking/padding.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.utils.misc import pad_to


class Batch(NamedTuple):
    """One padded batch. All arrays are numpy on host; jit transfers them."""

    images: np.ndarray      # [B, IM_SCALE, IM_SCALE, 3] NHWC: uint8 raw
                            # pixels (normalized in-graph) or f32 normalized
    im_hw: np.ndarray       # [B, 2] float32 (valid h, w) at IM_SCALE
    im_scale: np.ndarray    # [B] float32 (resize factor from original pixels)
    gt_boxes: np.ndarray    # [B, G, 4] float32 at IM_SCALE coords
    gt_classes: np.ndarray  # [B, G] int32
    gt_mask: np.ndarray     # [B, G] bool
    gt_rels: np.ndarray     # [B, R, 3] int32 (sub, obj, predicate), local inds
    gt_rel_mask: np.ndarray # [B, R] bool
    image_ids: np.ndarray   # [B] int32 dataset indices
    proposals: Optional[np.ndarray] = None       # [B, P, 5] (score, x1, y1, x2, y2)
    proposal_mask: Optional[np.ndarray] = None   # [B, P] bool
    # per-image GT truncation telemetry (host-only; never enters the jit
    # step): columns = (boxes dropped over max_gt_boxes, rels dropped
    # because an endpoint was truncated, rels dropped over max_gt_rels).
    # The reference keeps ALL GT objects (visual_genome.py:313-330); any
    # nonzero count here silently costs recall vs the reference, so the
    # Loader aggregates these and the entry points report them loudly.
    truncation: Optional[np.ndarray] = None      # [B, 3] int32

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]


def collate(entries: Sequence[dict], budgets: C.PadBudgets | None = None,
            num_proposals: int = 2000,
            im_budget: tuple[int, int] | None = None) -> Batch:
    """Stack per-image dicts (from VG.__getitem__ / synthetic) into a Batch.

    Each entry: img [H, W, 3] uint8 raw (or f32 normalized); img_size (h, w, scale);
    gt_boxes [g, 4] at BOX_SCALE; gt_classes [g]; gt_relations [r, 3];
    index; optional proposals [p, 5].

    `im_budget` (pad_h, pad_w) pads images to a rectangular budget instead
    of the square IM_SCALE one (aspect-bucketed serving: a 4:3-landscape
    bucket at (448, 592) cuts ~25% of the backbone FLOPs; the anchor grid
    follows the budget and valid outputs are unchanged — see
    models/detector.py). Every image must fit; a too-small budget raises
    rather than silently cropping.
    """
    budgets = budgets or C.PadBudgets()
    g, r = budgets.max_gt_boxes, budgets.max_gt_rels
    b = len(entries)
    pad_h, pad_w = im_budget or (C.IM_SCALE, C.IM_SCALE)
    for e in entries:
        eh, ew = e["img"].shape[:2]
        if eh > pad_h or ew > pad_w:
            raise ValueError(
                f"image {e.get('index')} is ({eh}, {ew}) but the image pad "
                f"budget is ({pad_h}, {pad_w}) — use a larger bucket")

    # image dtype follows the entries: uint8 raw pixels from the real
    # datasets (normalized in-graph; 4x less host->device transfer), f32
    # pre-normalized arrays from synthetic/test paths
    img_dtype = np.asarray(entries[0]["img"]).dtype
    images = np.zeros((b, pad_h, pad_w, 3), img_dtype)
    im_hw = np.zeros((b, 2), np.float32)
    im_scale = np.zeros((b,), np.float32)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_classes = np.zeros((b, g), np.int32)
    gt_mask = np.zeros((b, g), bool)
    gt_rels = np.zeros((b, r, 3), np.int32)
    gt_rel_mask = np.zeros((b, r), bool)
    image_ids = np.zeros((b,), np.int32)
    has_props = all("proposals" in e for e in entries)
    props = np.zeros((b, num_proposals, 5), np.float32) if has_props else None
    prop_mask = np.zeros((b, num_proposals), bool) if has_props else None
    truncation = np.zeros((b, 3), np.int32)

    for i, e in enumerate(entries):
        img = e["img"]
        h, w = img.shape[:2]
        images[i, :h, :w] = img
        eh, ew, scale = e["img_size"]
        im_hw[i] = (eh, ew)
        im_scale[i] = scale
        n_g = min(len(e["gt_boxes"]), g)
        truncation[i, 0] = len(e["gt_boxes"]) - n_g
        # boxes stored at BOX_SCALE; bring to IM_SCALE (blob.py:76 'scale')
        gt_boxes[i, :n_g] = e["gt_boxes"][:n_g] * (C.IM_SCALE / C.BOX_SCALE)
        gt_classes[i, :n_g] = e["gt_classes"][:n_g]
        gt_mask[i, :n_g] = True
        rels = e["gt_relations"]
        # drop relations whose endpoints were truncated away
        if len(rels):
            keep = (rels[:, 0] < n_g) & (rels[:, 1] < n_g)
            truncation[i, 1] = len(rels) - int(keep.sum())
            rels = rels[keep]
        n_r = min(len(rels), r)
        truncation[i, 2] = len(rels) - n_r
        gt_rels[i, :n_r] = rels[:n_r]
        gt_rel_mask[i, :n_r] = True
        image_ids[i] = e["index"]
        if has_props:
            p = e["proposals"]
            n_p = min(len(p), num_proposals)
            props[i, :n_p, 0] = p[:n_p, 0]
            props[i, :n_p, 1:] = p[:n_p, 1:] * (C.IM_SCALE / C.BOX_SCALE)
            prop_mask[i, :n_p] = True

    return Batch(images=images, im_hw=im_hw, im_scale=im_scale,
                 gt_boxes=gt_boxes, gt_classes=gt_classes, gt_mask=gt_mask,
                 gt_rels=gt_rels, gt_rel_mask=gt_rel_mask, image_ids=image_ids,
                 proposals=props, proposal_mask=prop_mask,
                 truncation=truncation)


def measure_gt_budgets(dataset) -> tuple[int, int]:
    """Load-time scan of the dataset's per-image GT maxima: returns
    (max boxes/img, max rels/img). The reference never caps GT
    (dataloaders/visual_genome.py:313-330), so padded budgets must cover
    these maxima or recall is silently lost — the Loader warns when they
    don't. Cheap: the GT lists are already in memory after load_graphs."""
    boxes = getattr(dataset, "gt_classes", None)
    rels = getattr(dataset, "relationships", None)
    max_b = max((len(b) for b in boxes), default=0) if boxes is not None else 0
    max_r = max((len(r) for r in rels), default=0) if rels is not None else 0
    return int(max_b), int(max_r)


def device_prefetch(loader, prepare, depth: int = 2):
    """Background-thread host->device transfer: yields (host_batch,
    prepare(host_batch)) with `prepare` (device_put / shard_batch) running
    in the thread, `depth` batches ahead. jax.device_put is async, so the
    link transfer of batch k+1 overlaps device compute of batch k — without
    this, the eval loop pays the full image-upload latency inside its
    critical path (measured 26.5 -> ~36 img/s single-chip e2e on the
    remote-TPU bench, tools/bench_e2e_eval.py)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    SENTINEL = object()
    err = []
    stop = threading.Event()

    def worker():
        try:
            for b in loader:
                item = (b, prepare(b))
                # bounded put that notices consumer abandonment: if the
                # main loop died (jit/evaluator exception) the generator's
                # finally sets `stop`, and without this poll the worker
                # would block in q.put forever, pinning `depth` prepared
                # device batches in HBM for the process lifetime
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 - surface in main thread
            err.append(e)
        finally:
            while True:  # sentinel put must not block either
                try:
                    q.put(SENTINEL, timeout=0.5)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()  # unblock + release the worker's queued device buffers
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break


def _load_chunk(dataset, chunk, budgets, im_budget=None) -> Batch:
    """Decode + collate one batch worth of entries (runs in a worker
    process when num_workers > 1). Negative indices (-(i+1)) are pad
    repeats from Loader._pad_chunk: the real entry is loaded (shapes must
    stay uniform) but its image_id is stamped -1 so consumers skip it."""
    chunk = np.asarray(chunk)
    real = np.where(chunk >= 0, chunk, -chunk - 1)
    batch = collate([dataset[int(i)] for i in real], budgets,
                    im_budget=im_budget)
    if (chunk < 0).any():
        batch.image_ids[chunk < 0] = -1
        if batch.truncation is not None:   # don't double-count telemetry
            batch.truncation[chunk < 0] = 0
    return batch


# Worker-process state: the dataset/budgets are shipped ONCE per worker via
# the pool initializer (fork start method makes this nearly free) instead of
# being pickled with every chunk.
_WORKER_STATE: dict = {}


def _pool_init(dataset, budgets, seed_base: int):
    import os
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["budgets"] = budgets
    # decorrelate per-worker augmentation randomness (flip/dup-rel sampling)
    rng_attr = getattr(dataset, "rng", None)
    if rng_attr is not None:
        dataset.rng = np.random.RandomState(seed_base + os.getpid() % 100003)


def _pool_load(chunk, im_budget=None) -> Batch:
    return _load_chunk(_WORKER_STATE["dataset"], chunk,
                       _WORKER_STATE["budgets"], im_budget)


class Loader:
    """Epoch iterator producing padded Batches.

    Replaces VGDataLoader (dataloaders/visual_genome.py:394-424). Image
    decode stays on host; everything else runs on device.

    * num_workers > 1 uses a process pool for JPEG decode + collate (the
      role of the reference's torch DataLoader worker processes) with
      `prefetch` batches in flight.
    * Multi-host: every process constructs the Loader with the same seed so
      the global shuffle order agrees, and each host decodes only its
      jax.process_index() slice of every global batch — the sharded
      device_put then assembles the global array. batch_size is the GLOBAL
      batch size.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 budgets: C.PadBudgets | None = None, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 2, num_workers: int = 1,
                 process_index: int | None = None,
                 process_count: int | None = None,
                 im_budget: tuple[int, int] | None = None,
                 im_buckets=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.budgets = budgets or C.PadBudgets()
        self.im_budget = im_budget
        # aspect buckets: list of (pad_h, pad_w); each image is collated
        # into the smallest-area bucket covering its post-resize shape and
        # batches are shape-uniform (one compiled program per bucket).
        # Requires dataset.image_sizes() -> [N, 2] original (h, w).
        self.im_buckets = ([tuple(b) for b in im_buckets]
                           if im_buckets else None)
        if self.im_buckets and im_budget is not None:
            raise ValueError("im_budget and im_buckets are exclusive")
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.prefetch = max(prefetch, 1)
        self.num_workers = num_workers
        if process_index is None or process_count is None:
            import jax
            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = process_count
        if batch_size % self.process_count:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"{self.process_count} hosts")
        # epoch-level GT truncation telemetry (reset every __iter__)
        self.trunc_totals = np.zeros(3, np.int64)
        self.trunc_images = 0
        self.total_images = 0
        max_b, max_r = measure_gt_budgets(dataset)
        if max_b > self.budgets.max_gt_boxes or max_r > self.budgets.max_gt_rels:
            print(f"[Loader] WARNING: GT budgets under dataset maxima — "
                  f"max boxes/img {max_b} vs budget "
                  f"{self.budgets.max_gt_boxes}, max rels/img {max_r} vs "
                  f"budget {self.budgets.max_gt_rels}. Over-budget GT is "
                  f"TRUNCATED (the reference keeps all GT) and costs recall;"
                  f" raise -max_gt_boxes/-max_gt_rels to cover the maxima.",
                  flush=True)

    def _account(self, batch: Batch) -> Batch:
        if batch.truncation is not None:
            self.trunc_totals += batch.truncation.sum(axis=0, dtype=np.int64)
            self.trunc_images += int((batch.truncation.sum(axis=1) > 0).sum())
            self.total_images += batch.truncation.shape[0]
        return batch

    def truncation_report(self) -> str:
        """One-line epoch summary of GT dropped by the padding budgets."""
        b, re, rb = (int(v) for v in self.trunc_totals)
        if b == 0 and re == 0 and rb == 0:
            return (f"[Loader] GT truncation: none "
                    f"({self.total_images} images within budgets)")
        return (f"[Loader] WARNING: GT truncated on {self.trunc_images}/"
                f"{self.total_images} images — {b} boxes over "
                f"max_gt_boxes={self.budgets.max_gt_boxes}, {re} rels lost "
                f"to truncated endpoints, {rb} rels over "
                f"max_gt_rels={self.budgets.max_gt_rels}. These GT entries "
                f"are invisible to the model but still counted by the "
                f"evaluator: recall is silently capped below the "
                f"reference's. Raise the budgets.")

    def __len__(self):
        n = len(self.dataset)
        if self.im_buckets is not None:
            counts = np.bincount(self._bucket_of(self._resized_hw()),
                                 minlength=len(self.im_buckets))
            if self.drop_last:
                return int(sum(c // self.batch_size for c in counts))
            return int(sum(-(-c // self.batch_size) for c in counts if c))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _pad_chunk(self, chunk: np.ndarray) -> np.ndarray:
        """Pad a partial final chunk (drop_last=False) to batch_size by
        repeating its last index: shapes stay static (no jit retrace, equal
        multi-host shards). Pad entries are NEGATIVE-encoded (-(i+1)) so
        _load_chunk can stamp image_id = -1 on them — consumers skip
        negative ids, which stays correct even when a multi-host slice
        lands a pad copy on a host that never saw the real image."""
        if len(chunk) == self.batch_size:
            return chunk
        pad = np.full(self.batch_size - len(chunk), -(int(chunk[-1]) + 1),
                      chunk.dtype)
        return np.concatenate([chunk, pad])

    def _chunks(self):
        """Global order -> this host's slice of each global batch
        (replaces Blob.scatter + image_offset, dataloaders/blob.py:148-180:
        the per-host slice is by position, and 'which image' is just the
        row index — no offset arithmetic)."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        per_host = self.batch_size // self.process_count
        lo = self.process_index * per_host
        for s in range(0, len(idx) - (self.batch_size - 1 if self.drop_last else 0),
                       self.batch_size):
            chunk = self._pad_chunk(idx[s:s + self.batch_size])
            yield chunk[lo:lo + per_host]

    def _resized_hw(self):
        """Per-image post-resize (h', w') from dataset.image_sizes()
        (original (h, w) per image) — same rounding as square_pad_resize."""
        if not hasattr(self.dataset, "image_sizes"):
            raise ValueError(
                "im_buckets needs dataset.image_sizes() -> [N, 2] original "
                "(h, w); use a fixed im_budget for datasets without it")
        from neural_motifs_tpu.data.transforms import decoded_dims

        sizes = np.asarray(self.dataset.image_sizes())
        # NM_FAST_DECODE rescales via ceil'd libjpeg dims; predict from the
        # dims the decoder will actually produce or a 1px drift can push an
        # image past its predicted bucket and abort the eval in collate
        sizes = np.array([decoded_dims(int(h), int(w)) for h, w in sizes],
                         np.int64)
        long_side = sizes.max(axis=1).clip(min=1)
        scale = C.IM_SCALE / long_side
        hw = np.maximum(1, np.round(sizes * scale[:, None])).astype(np.int64)
        hw[sizes[:, 0] >= sizes[:, 1], 0] = C.IM_SCALE
        hw[sizes[:, 1] >= sizes[:, 0], 1] = C.IM_SCALE
        return hw

    def _bucket_of(self, hw: np.ndarray) -> np.ndarray:
        """Index of the smallest-area bucket that fits each (h', w')."""
        buckets = np.asarray(self.im_buckets)                     # [K, 2]
        order = np.argsort(buckets[:, 0] * buckets[:, 1], kind="stable")
        fits = ((hw[:, None, 0] <= buckets[None, order, 0])
                & (hw[:, None, 1] <= buckets[None, order, 1]))    # [N, K]
        first = fits.argmax(axis=1)
        if not fits.any(axis=1).all():
            bad = int(np.nonzero(~fits.any(axis=1))[0][0])
            raise ValueError(
                f"image {bad} resizes to {tuple(hw[bad])} but no bucket in "
                f"{self.im_buckets} covers it")
        return order[first]

    def _chunks_with_budget(self):
        """(host-chunk, im_budget) pairs. Without buckets this is
        _chunks() x the fixed budget; with buckets, the (shuffled) epoch
        order is partitioned per bucket so every batch is shape-uniform
        (one compiled program per bucket)."""
        if self.im_buckets is None:
            for chunk in self._chunks():
                yield chunk, self.im_budget
            return
        hw = self._resized_hw()
        bucket_idx = self._bucket_of(hw)
        if not getattr(self, "_buckets_logged", False):
            self._buckets_logged = True
            counts = np.bincount(bucket_idx, minlength=len(self.im_buckets))
            dist = ", ".join(f"{tuple(b)}: {int(c)}"
                             for b, c in zip(self.im_buckets, counts))
            print(f"[Loader] aspect buckets ({len(self.dataset)} images): "
                  f"{dist}", flush=True)
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        per_host = self.batch_size // self.process_count
        lo = self.process_index * per_host
        out = []
        for k in range(len(self.im_buckets)):
            sel = idx[bucket_idx[idx] == k]
            end = len(sel) - (self.batch_size - 1 if self.drop_last else 0)
            for s in range(0, max(end, 0), self.batch_size):
                chunk = self._pad_chunk(sel[s:s + self.batch_size])
                out.append((chunk[lo:lo + per_host],
                            tuple(self.im_buckets[k])))
        if self.shuffle:
            # interleave bucket batches so a training epoch isn't
            # bucket-contiguous (each batch stays shape-uniform; the same
            # rng on every host keeps the multi-host order in agreement)
            self.rng.shuffle(out)
        yield from out

    def _batches(self):
        for chunk, im_budget in self._chunks_with_budget():
            yield _load_chunk(self.dataset, chunk, self.budgets, im_budget)

    def peek(self) -> Batch:
        """First batch, loaded synchronously — for model init / example
        shapes. Unlike next(iter(loader)), this spins up NO prefetch
        thread/pool (an abandoned iterator's producer would decode ahead
        and then sit on its queued batches for the process lifetime)."""
        chunk, im_budget = next(self._chunks_with_budget())
        return _load_chunk(self.dataset, chunk, self.budgets, im_budget)

    def __iter__(self):
        """Prefetched iteration: decode + collate overlap the device step.
        num_workers=1 -> one background thread; >1 -> process pool.
        Truncation telemetry resets each epoch and accumulates as batches
        are yielded (works for the pool path too: counts ride the Batch)."""
        self.trunc_totals = np.zeros(3, np.int64)
        self.trunc_images = 0
        self.total_images = 0
        for batch in self._iter_raw():
            yield self._account(batch)

    def _iter_raw(self):
        if self.num_workers > 1:
            yield from self._iter_pool()
            return
        if self.prefetch <= 0:
            yield from self._batches()
            return
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def producer():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    # surface loader failures instead of silently ending
                    # the epoch early (a swallowed decode/collate error
                    # would truncate eval coverage without a trace)
                    raise err[0]
                break
            yield item

    def _iter_pool(self):
        """Process-pool decode: keeps `max(prefetch, num_workers)` batches
        in flight, yields in order. The dataset ships once per worker via
        the initializer."""
        import collections
        from concurrent.futures import ProcessPoolExecutor

        window = max(self.prefetch, self.num_workers)
        with ProcessPoolExecutor(
                max_workers=self.num_workers, initializer=_pool_init,
                initargs=(self.dataset, self.budgets,
                          int(self.rng.randint(1 << 30)))) as pool:
            pending: collections.deque = collections.deque()
            for chunk, im_budget in self._chunks_with_budget():
                pending.append(pool.submit(_pool_load, chunk, im_budget))
                if len(pending) >= window:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()

    @classmethod
    def splits(cls, train_data, val_data, batch_size: int,
               budgets: C.PadBudgets | None = None, **kw):
        return (cls(train_data, batch_size, shuffle=True, budgets=budgets, **kw),
                cls(val_data, batch_size, shuffle=False, budgets=budgets,
                    drop_last=False, **kw))


def loader_im_kw(cfg) -> dict:
    """-im_budget flag -> Loader kwargs: "auto" = aspect buckets (the
    smallest of config.DEFAULT_IM_BUCKETS per image), HxW tuple = fixed
    rect budget, None = square IM_SCALE. Shared by every eval entry
    point."""
    im_budget = getattr(cfg, "im_budget", None)
    if im_budget == "auto":
        return {"im_buckets": C.DEFAULT_IM_BUCKETS}
    return {"im_budget": im_budget}
