#!/usr/bin/env bash
# Stanford message-passing baseline (reference scripts/train_stanford.sh).
MODE=${1:-sgcls}; shift || true
python -m neural_motifs_tpu.training.train_rels -m "$MODE" -model stanford \
    -b 6 -lr 1e-3 -clip 5 \
    -ckpt checkpoints/vgdet/vg-best.mp -save_dir "checkpoints/stanford-$MODE" "$@"
