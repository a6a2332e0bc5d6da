#!/usr/bin/env bash
# Canonical MotifNet runs (reference scripts/train_motifnet.sh /
# train_models_sgcls.sh): -order leftright -nl_obj 2 -nl_edge 4
# -hidden_dim 512 -pooling_dim 4096 -use_bias
MODE=${1:-sgcls}; shift || true
python -m neural_motifs_tpu.training.train_rels -m "$MODE" -model motifnet \
    -order leftright -nl_obj 2 -nl_edge 4 -hidden_dim 512 -pooling_dim 4096 \
    -use_bias -b 6 -lr 1e-3 -clip 5 \
    -ckpt checkpoints/vgdet/vg-best.mp -save_dir "checkpoints/motifnet-$MODE" "$@"
