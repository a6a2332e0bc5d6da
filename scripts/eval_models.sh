#!/usr/bin/env bash
# Eval (reference scripts/eval_models_sg{cls,det}.sh).
MODE=${1:-sgcls}
CKPT=${2:?usage: eval_models.sh <mode> <ckpt>}
shift 2 || true
python -m neural_motifs_tpu.training.eval_rels -m "$MODE" -model motifnet \
    -order leftright -nl_obj 2 -nl_edge 4 -hidden_dim 512 -pooling_dim 4096 \
    -use_bias -ckpt "$CKPT" -test "$@"
