"""Host-side image transforms (PIL/numpy): square-pad, resize, normalize,
photometric jitter, box-preserving random crop.

Behavioral equivalents of dataloaders/image_transforms.py:8-132 — pad
right/bottom with the ImageNet mean to a square, resize the long side to
IM_SCALE, photometric distortions applied in random order for COCO
pretraining (mscoco.py:29-37).
"""

from __future__ import annotations

import numpy as np

from neural_motifs_tpu.config import IM_SCALE

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def square_pad_resize(img) -> tuple[np.ndarray, tuple[int, int, float]]:
    """PIL image -> ([h', w', 3] uint8 RAW pixels, (h', w', scale)).

    Resizes so the long side is IM_SCALE; the collate pads to
    [IM_SCALE, IM_SCALE]. Pixels stay uint8 so each image ships to the
    device at 1 byte/channel (4x less host->device bandwidth than
    normalized f32 — on the remote-TPU bench the f32 transfer alone halved
    end-to-end eval throughput); the ImageNet normalize happens in-graph
    (ObjectDetector), which also mean-fills the padded region exactly from
    im_hw, matching the reference's mean padding
    (dataloaders/image_transforms.py SquarePad).
    """
    from PIL import Image

    w, h = img.size
    scale = IM_SCALE / max(w, h)
    if h > w:
        size = (max(1, round(w * scale)), IM_SCALE)
    else:
        size = (IM_SCALE, max(1, round(h * scale)))
    # native resample (csrc nm_resize_bilinear_u8): byte-identical to PIL's
    # BILINEAR but ~2x faster — the resize is the hottest host-side step in
    # the serving path (tools/bench_e2e_eval.py). Fall back to PIL when the
    # library is unavailable or the image isn't 8-bit RGB.
    if img.mode == "RGB":
        from neural_motifs_tpu.runtime import resize_bilinear_u8

        arr = resize_bilinear_u8(np.asarray(img, np.uint8), size[1], size[0])
        if arr is not None:
            return arr, (arr.shape[0], arr.shape[1], scale)
    img = img.resize(size, Image.BILINEAR)
    arr = np.asarray(img, np.uint8)
    return arr, (arr.shape[0], arr.shape[1], scale)


def normalize_array(arr: np.ndarray) -> np.ndarray:
    return (arr.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def random_photometric(img, rng: np.random.RandomState):
    """Random-order grayscale/brightness/contrast/sharpness/hue jitter
    (image_transforms.py Grayscale/Brightness/... applied via RandomOrder)."""
    from PIL import ImageEnhance

    ops = []

    def gray(im):
        return im.convert("L").convert("RGB") if rng.rand() < 0.1 else im

    def brightness(im):
        return ImageEnhance.Brightness(im).enhance(1 + 0.3 * (rng.rand() - 0.5))

    def contrast(im):
        return ImageEnhance.Contrast(im).enhance(1 + 0.3 * (rng.rand() - 0.5))

    def sharpness(im):
        return ImageEnhance.Sharpness(im).enhance(1 + 0.6 * (rng.rand() - 0.5))

    def hue(im):
        hsv = np.array(im.convert("HSV"))
        hsv[..., 0] = (hsv[..., 0].astype(int) + rng.randint(-10, 10)) % 255
        from PIL import Image
        return Image.fromarray(hsv, "HSV").convert("RGB")

    ops = [gray, brightness, contrast, sharpness, hue]
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    return img


def random_crop(img, boxes: np.ndarray, box_scale: float,
                rng: np.random.RandomState, max_crop_frac: float = 0.1):
    """Box-preserving crop of up to max_crop_frac per side
    (image_transforms.py random_crop): never crops into any GT box."""
    w, h = img.size
    sf = box_scale / max(w, h)
    if len(boxes):
        min_x1 = boxes[:, 0].min() / sf
        min_y1 = boxes[:, 1].min() / sf
        max_x2 = boxes[:, 2].max() / sf
        max_y2 = boxes[:, 3].max() / sf
    else:
        min_x1 = min_y1 = np.inf
        max_x2 = max_y2 = -np.inf
    l = int(rng.uniform(0, min(w * max_crop_frac, min_x1 + 1)))
    t = int(rng.uniform(0, min(h * max_crop_frac, min_y1 + 1)))
    r = int(w - rng.uniform(0, min(w * max_crop_frac, w - max_x2)))
    b = int(h - rng.uniform(0, min(h * max_crop_frac, h - max_y2)))
    r, b = max(r, l + 1), max(b, t + 1)
    img = img.crop((l, t, r, b))
    out_boxes = boxes.copy()
    if len(boxes):
        new_sf = box_scale / max(img.size)
        out_boxes[:, [0, 2]] = (boxes[:, [0, 2]] / sf - l) * new_sf
        out_boxes[:, [1, 3]] = (boxes[:, [1, 3]] / sf - t) * new_sf
    return img, out_boxes
