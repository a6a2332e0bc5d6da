"""Dataset-format adapters shared across data sources."""

from __future__ import annotations


def faux_coco_annotations(gt_classes, gt_boxes, ind_to_classes) -> dict:
    """Faux-COCO dict for detection mAP over any VG-schema dataset
    (reference dataloaders/visual_genome.py:102-127): every image id is its
    dataset index, boxes at BOX_SCALE in xywh with the reference's +1
    width/height convention."""
    anns, images = [], []
    for i, (cls_arr, box_arr) in enumerate(zip(gt_classes, gt_boxes)):
        images.append({"id": i})
        for cls, box in zip(cls_arr.tolist(), box_arr.tolist()):
            anns.append({
                "area": (box[3] - box[1] + 1) * (box[2] - box[0] + 1),
                "bbox": [box[0], box[1], box[2] - box[0] + 1,
                         box[3] - box[1] + 1],
                "category_id": cls, "id": len(anns), "image_id": i,
                "iscrowd": 0,
            })
    cats = [{"supercategory": "obj", "id": i, "name": n}
            for i, n in enumerate(ind_to_classes) if n != "__background__"]
    return {"info": {"description": "VG faux-coco"}, "images": images,
            "categories": cats, "annotations": anns}
