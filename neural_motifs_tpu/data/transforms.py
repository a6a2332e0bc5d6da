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


_NATIVE_DECODE_STATE = None  # None = unchecked; else bool


def _native_decode_ok() -> bool:
    """One-time self-check: the native libjpeg full decode must be
    byte-identical to PIL's on a probe JPEG. Pillow bundles its own
    libjpeg-turbo while csrc links the system one — identical in practice
    (both are fixed-point deterministic libjpeg numerics), but if a future
    image pairs versions whose IDCT output differs, this trips and the
    loader silently stays on PIL, preserving decode parity."""
    global _NATIVE_DECODE_STATE
    if _NATIVE_DECODE_STATE is None:
        try:
            import io

            from PIL import Image

            from neural_motifs_tpu.runtime import decode_jpeg_scaled

            rng = np.random.RandomState(7)
            probe = Image.fromarray(
                np.kron(rng.randint(0, 256, (12, 16, 3)),
                        np.ones((8, 8, 1))).astype(np.uint8))
            buf = io.BytesIO()
            probe.save(buf, "JPEG", quality=88)
            data = buf.getvalue()
            nat = decode_jpeg_scaled(data, 8)
            pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            _NATIVE_DECODE_STATE = (nat is not None
                                    and np.array_equal(nat, pil))
        except Exception:
            _NATIVE_DECODE_STATE = False
    return _NATIVE_DECODE_STATE


def fast_decode_enabled() -> bool:
    """NM_FAST_DECODE flag with the repo's env-flag convention:
    unset/''/'0'/'false' = off."""
    import os

    return os.environ.get("NM_FAST_DECODE", "").lower() not in ("", "0",
                                                                "false")


def fast_decode_scale(long_side: int) -> int:
    """libjpeg scale numerator M (of /8) for a full-res long side: the
    smallest M in {2, 3, 4} whose ceil-scaled long side still covers
    IM_SCALE, else 8 (full decode). M <= 4 only: libjpeg-turbo
    SIMD-optimizes the power-of-two IDCTs; 5/8..7/8 measured SLOWER than
    a full decode."""
    for m in (2, 3, 4):
        if -(-long_side * m // 8) >= IM_SCALE:
            return m
    return 8


def decoded_dims(h: int, w: int) -> tuple[int, int]:
    """(h, w) decode_image_rgb(allow_fast=True) would yield for an image
    whose full-resolution dims are (h, w) under the CURRENT env — used by
    the Loader's aspect-bucket assignment so predicted and actual collate
    shapes always agree (a 1px ceil drift here would abort an eval)."""
    if fast_decode_enabled() and _native_decode_ok():
        m = fast_decode_scale(max(h, w))
        if m < 8:
            return -(-h * m // 8), -(-w * m // 8)
    return h, w


def decode_image_rgb(path: str, allow_fast: bool = True) -> np.ndarray:
    """Image file -> [h, w, 3] uint8 RGB.

    Default: native libjpeg decode (csrc), verified byte-identical to PIL
    by the one-time self-check, with a PIL fallback for anything the
    native path rejects (non-JPEG, CMYK, truncated streams).

    NM_FAST_DECODE=1 (serving opt-in, never the parity path) decodes large
    images at M/8 scale via libjpeg's scaled IDCT — cheaper than full
    decode + downsample, but not pixel-identical. `allow_fast=False`
    ignores the flag: the TRAINING path always decodes exactly, because
    the GT clamp/flip math derives from the decoded dims and ceil-scaled
    dims would drift box coordinates by ~1px at BOX_SCALE.
    """
    if _native_decode_ok():
        from neural_motifs_tpu.runtime import decode_jpeg_scaled, jpeg_header

        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            data = None
        if data is not None:
            scale_num = 8
            hdr = None
            if allow_fast and fast_decode_enabled():
                hdr = jpeg_header(data)
                if hdr is not None and hdr[2]:
                    scale_num = fast_decode_scale(max(hdr[0], hdr[1]))
            arr = decode_jpeg_scaled(data, scale_num, hdr=hdr)
            if arr is not None:
                return arr
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def square_pad_resize(img) -> tuple[np.ndarray, tuple[int, int, float]]:
    """PIL image or [h, w, 3] uint8 array
    -> ([h', w', 3] uint8 RAW pixels, (h', w', scale)).

    Resizes so the long side is IM_SCALE; the collate pads to
    [IM_SCALE, IM_SCALE]. Pixels stay uint8 so each image ships to the
    device at 1 byte/channel (4x less host->device bandwidth than
    normalized f32 — on the remote-TPU bench the f32 transfer alone halved
    end-to-end eval throughput); the ImageNet normalize happens in-graph
    (ObjectDetector), which also mean-fills the padded region exactly from
    im_hw, matching the reference's mean padding
    (dataloaders/image_transforms.py SquarePad).
    """
    is_array = isinstance(img, np.ndarray)
    if is_array:
        h, w = img.shape[:2]
    else:
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
    if is_array or img.mode == "RGB":
        from neural_motifs_tpu.runtime import resize_bilinear_u8

        arr = resize_bilinear_u8(np.ascontiguousarray(img, np.uint8)
                                 if is_array else np.asarray(img, np.uint8),
                                 size[1], size[0])
        if arr is not None:
            return arr, (arr.shape[0], arr.shape[1], scale)
    from PIL import Image

    if is_array:
        img = Image.fromarray(img)
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
