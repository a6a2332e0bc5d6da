from neural_motifs_tpu.ops import boxes, anchors, nms, roi_align, union_boxes, highway_lstm, sampling  # noqa: F401
