from neural_motifs_tpu.evaluation.sg_eval import BasicSceneGraphEvaluator  # noqa: F401
