#!/usr/bin/env bash
# Canonical detector pretraining (reference scripts/pretrain_detector.sh:
# batch 6, lr 1e-3 * ndev * batch, 50 epochs).
python -m neural_motifs_tpu.training.train_detector -b 6 -lr 1e-3 -nepoch 50 \
    -save_dir checkpoints/vgdet "$@"
