"""Global configuration: dataset constants and the typed model config.

Mirrors the two-tier config of the reference (reference config.py:20-61 for
the frozen constants, config.py:63-197 for the ModelConfig argparse surface),
re-done as a frozen dataclass so a config can be hashed / passed through jit
boundaries as a static argument.

TPU additions: static padding budgets (MAX_* fields) that turn the
reference's ragged per-image tensors into fixed shapes, and mesh/precision
knobs.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Frozen dataset / task constants (reference config.py:33-61)
# ---------------------------------------------------------------------------

MODES = ("sgdet", "sgcls", "predcls")

BOX_SCALE = 1024  # scale at which GT boxes are stored
IM_SCALE = int(os.environ.get("NM_TPU_IM_SCALE", 592))
# aspect buckets for -im_budget auto (landscape / portrait / square); each
# image is collated into the smallest bucket covering its post-resize shape.
# 16-aligned so the stride-16 anchor grid tiles exactly.
DEFAULT_IM_BUCKETS = (((IM_SCALE * 3 // 4 + 15) // 16 * 16, IM_SCALE),
                      (IM_SCALE, (IM_SCALE * 3 // 4 + 15) // 16 * 16),
                      (IM_SCALE, IM_SCALE))
# ^ network input resolution (long side, square-padded). The env override is
# a dry-run/test hook ONLY (e.g. the parity-runbook fixture test) — the
# reference trains/evals at 592 and every released checkpoint assumes it.
if IM_SCALE != 592:
    print(f"[config] WARNING: NM_TPU_IM_SCALE={IM_SCALE} != 592 — NOT "
          f"reference-comparable; use only for dry runs/tests.", flush=True)

# Proposal assignment thresholds
BG_THRESH_HI = 0.5
BG_THRESH_LO = 0.0

RPN_POSITIVE_OVERLAP = 0.7
RPN_NEGATIVE_OVERLAP = 0.3

RPN_FG_FRACTION = 0.5
FG_FRACTION = 0.25
RPN_BATCHSIZE = 256
ROIS_PER_IMG = 256
REL_FG_FRACTION = 0.25
RELS_PER_IMG = 256
RELS_PER_IMG_REFINE = 64

BATCHNORM_MOMENTUM = 0.01
ANCHOR_SIZE = 16

# Learned anchor shapes (4 ratios x 5 scales = 20 anchors per cell)
ANCHOR_RATIOS = (0.23232838, 0.63365731, 1.28478321, 3.15089189)
ANCHOR_SCALES = (2.22152954, 4.12315647, 7.21692515, 12.60263013, 22.7102731)

FEAT_STRIDE = 16
FMAP_SIZE = IM_SCALE // FEAT_STRIDE  # 37
NUM_ANCHORS = len(ANCHOR_RATIOS) * len(ANCHOR_SCALES)  # 20

# Visual Genome "stanford filtered" taxonomy sizes (151 object classes incl.
# background, 51 predicates incl. background).
VG_NUM_CLASSES = 151
VG_NUM_PREDICATES = 51

# ---------------------------------------------------------------------------
# Data paths (override via env)
# ---------------------------------------------------------------------------

def enable_compile_cache():
    """Persistent XLA compile cache for every CLI entry point (previously
    only tests/tools set it). Full-scale f32 graphs take ~20 min of remote
    AOT compile AND balloon the axon client to ~30 GB host RSS while the
    compile RPC is pending (measured by the dress rehearsal, round 5) —
    a cache hit skips both. Opt out with NM_NO_COMPILE_CACHE=1."""
    if os.environ.get("NM_NO_COMPILE_CACHE"):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("NM_COMPILE_CACHE",
                                     "/root/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


DATA_PATH = os.environ.get("NM_TPU_DATA", os.path.join(os.path.dirname(__file__), "..", "data"))


def stanford_path(fn: str) -> str:
    return os.path.join(DATA_PATH, "stanford_filtered", fn)


VG_IMAGES = os.environ.get("NM_TPU_VG_IMAGES", os.path.join(DATA_PATH, "vg_images"))
IM_DATA_FN = stanford_path("image_data.json")
VG_SGG_FN = stanford_path("VG-SGG.h5")
VG_SGG_DICT_FN = stanford_path("VG-SGG-dicts.json")
PROPOSAL_FN = stanford_path("proposals.h5")
COCO_PATH = os.environ.get("NM_TPU_COCO", os.path.join(DATA_PATH, "mscoco"))
GLOVE_PATH = os.environ.get("NM_TPU_GLOVE", os.path.join(DATA_PATH, "glove"))


# ---------------------------------------------------------------------------
# Static padding budgets (TPU-specific: fixed shapes replace raggedness)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PadBudgets:
    """Fixed per-image shape budgets. Everything downstream of the data
    pipeline is padded/masked to these sizes so the whole step stays one
    compiled XLA program."""

    max_gt_boxes: int = 64       # GT objects per image (VG p99 is ~36)
    max_gt_rels: int = 128       # GT relations per image (pre-dedup)
    rois_per_img: int = ROIS_PER_IMG       # sampled RoIs for detector training
    objs_per_img: int = 64       # post-NMS objects per image (max_per_img=64)
    rels_per_img: int = RELS_PER_IMG       # sampled rel pairs (gtbox modes)
    rels_per_img_refine: int = RELS_PER_IMG_REFINE  # sampled rel pairs (sgdet)
    max_pairs_eval: int = 1024   # eval pair-compaction budget (serving mode):
                                 # all 64*63=4032 padded pairs collapse to
                                 # the top-1024 by object-score product —
                                 # exact while valid pairs <= 1024. sgdet's
                                 # overlap gating keeps real-VG images far
                                 # below that; the gtbox modes (predcls/
                                 # sgcls) score ALL ordered GT pairs, and a
                                 # VG p99 image (~36 objects) has 1260 >
                                 # 1024 — so ModelConfig.from_args defaults
                                 # the CLI to 4096 (exact) for those modes
                                 # unless -max_pairs_eval is given. The
                                 # eval entry points report any overflow;
                                 # the parity runbook always forces 4096.
    # reference object_detector.py:560 (roi_proposals defaults, used at
    # train) and :156-158 (test overrides): pre/post = 12000/2000 train,
    # 6000/1000 test. Train pre-NMS 12000 covers ~44% of the 37*37*20 =
    # 27380-anchor grid; matching it keeps the proposal pool the det
    # sampler sees parity-identical.
    rpn_pre_nms_topn_train: int = 12000
    rpn_post_nms_topn_train: int = 2000
    rpn_pre_nms_topn_test: int = 6000
    rpn_post_nms_topn_test: int = 1000
    rpn_train_anchors: int = RPN_BATCHSIZE  # sampled anchors per image
    per_class_nms_topk: int = 256  # per-class NMS candidate budget (None = exact)


# ---------------------------------------------------------------------------
# Model config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModelConfig:
    """Typed equivalent of the reference ModelConfig argparse wrapper
    (reference config.py:63-197). Field names/defaults match the reference
    flags so scripts translate one-to-one."""

    # run control
    mode: str = "sgdet"                 # sgdet | sgcls | predcls
    model: str = "motifnet"             # motifnet | stanford
    ckpt: Optional[str] = None
    det_ckpt: Optional[str] = None
    save_dir: Optional[str] = None
    cache: Optional[str] = None
    coco: bool = False
    test: bool = False
    num_epochs: int = 25
    print_interval: int = 100
    val_size: int = 5000

    # optimization
    lr: float = 1e-3
    batch_size: int = 2                 # per device
    l2: float = 1e-4
    clip: float = 5.0
    adam: bool = False

    # parallelism (replaces -ngpu; the mesh shape)
    num_devices: int = 1                # data-parallel mesh axis size
    num_workers: int = 1

    # model topology
    use_resnet: bool = False
    use_proposals: bool = False
    gt_box: bool = False   # dead in the reference too (config.py:80,180)
    order: str = "confidence"           # confidence | size | random | leftright
    nl_obj: int = 1
    nl_edge: int = 2
    hidden_dim: int = 256
    pooling_dim: int = 4096
    obj_dim: int = 4096     # VGG fc width (reference hardcodes 4096; a flag
                            # here so tiny dry-run configs stay end-to-end)
    embed_dim: int = 200
    pass_in_obj_feats_to_decoder: bool = False
    pass_in_obj_feats_to_edge: bool = False
    rec_dropout: float = 0.1
    use_bias: bool = False
    use_tanh: bool = False
    limit_vision: bool = False
    multi_pred: bool = False
    # parsed-but-dead in the REFERENCE as well (config.py:80,95,175,180 —
    # nothing consumes them there); kept for argparse-surface parity only
    old_feats: bool = False

    # TPU knobs
    compute_dtype: str = "bfloat16"     # conv/matmul compute precision
    param_dtype: str = "float32"
    remat: bool = False   # jax.checkpoint the conv backbone: recompute it
                          # in backward instead of storing 592^2 activations
                          # (enables larger detector-pretraining batches)
    budgets: PadBudgets = dataclasses.field(default_factory=PadBudgets)
    # rectangular image pad budget (pad_h, pad_w) for aspect-bucketed
    # serving: e.g. (448, 592) for a landscape-bucket eval cuts ~25% of the
    # backbone FLOPs vs the square (592, 592) budget. "auto" buckets every
    # image into the smallest of DEFAULT_IM_BUCKETS that covers it (one
    # compiled program per bucket). None = square IM_SCALE budget.
    # Rect-path fidelity is oracle-tested (tests/test_e2e_parity.py
    # sgdet rect case).
    im_budget: Optional[object] = None

    def __post_init__(self):
        if self.mode not in MODES:
            raise ValueError(f"Invalid mode {self.mode}; must be in {MODES}")
        if self.model not in ("motifnet", "stanford"):
            raise ValueError(f"Invalid model {self.model}")
        if self.order not in ("size", "confidence", "random", "leftright"):
            raise ValueError(f"Invalid order {self.order}")

    @property
    def num_gpus(self) -> int:  # legacy alias for reference parity
        return self.num_devices

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    # -- argparse surface (same flags as the reference) ---------------------

    @staticmethod
    def setup_parser() -> argparse.ArgumentParser:
        p = argparse.ArgumentParser(description="neural_motifs_tpu training code")
        p.add_argument("-coco", dest="coco", action="store_true")
        p.add_argument("-ckpt", dest="ckpt", type=str, default="")
        p.add_argument("-det_ckpt", dest="det_ckpt", type=str, default="")
        p.add_argument("-save_dir", dest="save_dir", type=str, default="")
        p.add_argument("-ngpu", "-ndev", dest="num_devices", type=int, default=1)
        p.add_argument("-nwork", dest="num_workers", type=int, default=1)
        p.add_argument("-lr", dest="lr", type=float, default=1e-3)
        p.add_argument("-b", dest="batch_size", type=int, default=2)
        p.add_argument("-val_size", dest="val_size", type=int, default=5000)
        p.add_argument("-l2", dest="l2", type=float, default=1e-4)
        p.add_argument("-clip", dest="clip", type=float, default=5.0)
        p.add_argument("-p", dest="print_interval", type=int, default=100)
        p.add_argument("-m", dest="mode", type=str, default="sgdet")
        p.add_argument("-model", dest="model", type=str, default="motifnet")
        p.add_argument("-old_feats", dest="old_feats", action="store_true")
        p.add_argument("-order", dest="order", type=str, default="confidence")
        p.add_argument("-cache", dest="cache", type=str, default="")
        p.add_argument("-gt_box", dest="gt_box", action="store_true")
        p.add_argument("-adam", dest="adam", action="store_true")
        p.add_argument("-test", dest="test", action="store_true")
        p.add_argument("-multipred", dest="multi_pred", action="store_true")
        p.add_argument("-nepoch", dest="num_epochs", type=int, default=25)
        p.add_argument("-resnet", dest="use_resnet", action="store_true")
        p.add_argument("-remat", dest="remat", action="store_true")
        p.add_argument("-proposals", dest="use_proposals", action="store_true")
        p.add_argument("-nl_obj", dest="nl_obj", type=int, default=1)
        p.add_argument("-nl_edge", dest="nl_edge", type=int, default=2)
        p.add_argument("-hidden_dim", dest="hidden_dim", type=int, default=256)
        p.add_argument("-pooling_dim", dest="pooling_dim", type=int, default=4096)
        p.add_argument("-obj_dim", dest="obj_dim", type=int, default=4096)
        p.add_argument("-embed_dim", dest="embed_dim", type=int, default=200)
        # padding budgets (TPU-specific; the Loader warns when the GT budgets
        # sit under the dataset maxima — raise them with these)
        p.add_argument("-max_gt_boxes", dest="max_gt_boxes", type=int,
                       default=PadBudgets.max_gt_boxes)
        p.add_argument("-max_gt_rels", dest="max_gt_rels", type=int,
                       default=PadBudgets.max_gt_rels)
        p.add_argument("-objs_per_img", dest="objs_per_img", type=int,
                       default=PadBudgets.objs_per_img)
        p.add_argument("-max_pairs_eval", dest="max_pairs_eval", type=int,
                       default=None)  # resolved mode-aware in from_args
        p.add_argument("-im_budget", dest="im_budget", type=str, default="",
                       help="HxW rectangular image pad budget for "
                            "aspect-bucketed serving, e.g. 448x592")
        p.add_argument("-pass_in_obj_feats_to_decoder",
                       dest="pass_in_obj_feats_to_decoder", action="store_true")
        p.add_argument("-pass_in_obj_feats_to_edge",
                       dest="pass_in_obj_feats_to_edge", action="store_true")
        p.add_argument("-rec_dropout", dest="rec_dropout", type=float, default=0.1)
        p.add_argument("-use_bias", dest="use_bias", action="store_true")
        p.add_argument("-use_tanh", dest="use_tanh", action="store_true")
        p.add_argument("-limit_vision", dest="limit_vision", action="store_true")
        p.add_argument("-dtype", dest="compute_dtype", type=str, default="bfloat16")
        return p

    @classmethod
    def from_args(cls, argv=None) -> "ModelConfig":
        enable_compile_cache()
        args = vars(cls.setup_parser().parse_args(argv))
        for k in ("ckpt", "det_ckpt", "save_dir", "cache"):
            if not args.get(k):
                args[k] = None
        budget_kw = {k: args.pop(k) for k in
                     ("max_gt_boxes", "max_gt_rels", "objs_per_img",
                      "max_pairs_eval")}
        if budget_kw["max_pairs_eval"] is None:
            # sgdet: overlap gating keeps valid pairs well under 1024.
            # gtbox modes score all ordered GT pairs (a VG p99 image has
            # ~1260), so the compaction default would silently cap
            # recall — default exact there.
            budget_kw["max_pairs_eval"] = (
                PadBudgets.max_pairs_eval if args.get("mode") == "sgdet"
                else 4096)
        args["budgets"] = PadBudgets(**budget_kw)
        if args.get("im_budget") == "auto":
            args["im_budget"] = "auto"
        elif args.get("im_budget"):
            h, w = args["im_budget"].lower().split("x")
            args["im_budget"] = (int(h), int(w))
        else:
            args["im_budget"] = None
        cfg = cls(**args)
        print("~~~~~~~~ Hyperparameters used: ~~~~~~~")
        for k, v in sorted(dataclasses.asdict(cfg).items()):
            print(f"{k} : {v}")
        return cfg
