#!/usr/bin/env bash
# SGDet refinement from an SGCls checkpoint at lr 1e-4
# (reference scripts/refine_for_detection.sh).
CKPT=${1:?usage: refine_for_detection.sh <sgcls-ckpt>}; shift || true
python -m neural_motifs_tpu.training.train_rels -m sgdet -model motifnet \
    -order leftright -nl_obj 2 -nl_edge 4 -hidden_dim 512 -pooling_dim 4096 \
    -use_bias -b 6 -lr 1e-4 -clip 5 -ckpt "$CKPT" \
    -save_dir checkpoints/motifnet-sgdet "$@"
