from .keypoint import (
    aggregate_keypoints,
    KeypointPredictor,
    OffsetKeypointPredictor,
)
