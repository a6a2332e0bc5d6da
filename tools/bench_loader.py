"""Host input-pipeline throughput: JPEG decode + SquarePad/resize + padded
collate, measured in images/sec for num_workers in {1, 2, 4} (VERDICT r1
item 6: the loader must out-run the device step).

Fabricates VG-sized JPEGs on disk (default 1024x768, the VG median aspect)
so the measurement includes real decode cost — no VG data needed.

Usage: python tools/bench_loader.py [n_images] [batch]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from neural_motifs_tpu import config as C
from neural_motifs_tpu.data.batching import Loader
from neural_motifs_tpu.data.transforms import square_pad_resize


class JpegDataset:
    """VG-shaped dataset over fabricated JPEGs: full decode + transform
    path, deterministic GT."""

    def __init__(self, image_dir: str, n: int, w: int = 1024, h: int = 768):
        from PIL import Image

        self.files = []
        rng = np.random.RandomState(0)
        for i in range(n):
            fn = os.path.join(image_dir, f"{i}.jpg")
            if not os.path.exists(fn):
                arr = rng.randint(0, 255, (h, w, 3), np.uint8)
                Image.fromarray(arr).save(fn, quality=85)
            self.files.append(fn)
        g = 12
        self.gt_boxes = [np.abs(rng.uniform(0, C.BOX_SCALE * 0.8, (g, 4))).astype(np.float32)
                         for _ in range(n)]
        for b in self.gt_boxes:
            b[:, 2:] = b[:, :2] + 32
        self.gt_classes = [rng.randint(1, 150, g).astype(np.int32) for _ in range(n)]
        self.relationships = [np.stack([rng.randint(0, g, 8),
                                        rng.randint(0, g, 8),
                                        rng.randint(1, 50, 8)], 1).astype(np.int32)
                              for _ in range(n)]

    def __len__(self):
        return len(self.files)

    def image_sizes(self):
        import numpy as _np
        from PIL import Image

        from neural_motifs_tpu.runtime import jpeg_header

        sizes = _np.zeros((len(self.files), 2), _np.int64)
        for i, fn in enumerate(self.files):
            with open(fn, "rb") as f:
                hdr = jpeg_header(f.read(65536))
            if hdr is not None:
                sizes[i] = (hdr[1], hdr[0])
            else:  # native runtime unavailable or SOF beyond the prefix
                with Image.open(fn) as im:
                    sizes[i] = (im.size[1], im.size[0])
        return sizes

    def __getitem__(self, i):
        from neural_motifs_tpu.data.transforms import decode_image_rgb

        img = decode_image_rgb(self.files[i])
        arr, img_size = square_pad_resize(img)
        return {"img": arr, "img_size": img_size,
                "gt_boxes": self.gt_boxes[i], "gt_classes": self.gt_classes[i],
                "gt_relations": self.relationships[i],
                "scale": C.IM_SCALE / C.BOX_SCALE, "index": i, "flipped": False}


def main(n_images=64, batch=8):
    tmp = os.path.join(tempfile.gettempdir(), "nm_loader_bench")
    os.makedirs(tmp, exist_ok=True)
    ds = JpegDataset(tmp, n_images)
    results = {}
    for nw in (1, 2, 4):
        loader = Loader(ds, batch, shuffle=False, num_workers=nw,
                        prefetch=4, process_index=0, process_count=1)
        # warm one epoch (page cache, pool startup)
        for _ in loader:
            pass
        t0 = time.time()
        count = 0
        for b in loader:
            count += b.images.shape[0]
        dt = time.time() - t0
        results[nw] = count / dt
        print(f"num_workers={nw}: {count / dt:7.2f} imgs/sec "
              f"({dt / (count / batch):.3f} s/batch of {batch})", flush=True)
    return results


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 64, int(a[1]) if len(a) > 1 else 8)
