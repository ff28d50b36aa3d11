"""YOLOv5 person detector (native JAX implementation) — placeholder.

The reference loads YOLOv5 via torch.hub (models_/detectors/YOLOv5.py:61-66).
A native CSP/SPPF/PANet implementation with ultralytics checkpoint conversion
is planned; until then this raises with a clear message. YOLOv3 /
YOLOv3-tiny (detectors/yolov3.py) are fully supported.
"""

from __future__ import annotations


class YOLOv5:
    def __init__(self, model_def: str = 'yolov5m', device=None, dtype=None):
        raise NotImplementedError(
            'YOLOv5 support is not implemented yet in simple_hrnet_tpu; '
            "use yolo_version='v3' with 'yolov3' or 'yolov3-tiny'.")
