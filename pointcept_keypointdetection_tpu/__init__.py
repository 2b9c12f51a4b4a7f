"""TPU-native point-cloud perception + keypoint-detection + semantic-SLAM framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of the
Pointcept-KeypointDetection reference (see SURVEY.md at the repo root): a
config-driven training/evaluation engine for large point clouds, a geometry
kernel library replacing the reference's CUDA `libs/` (pointops, pointops2,
spconv, flash-attn), serialized point-transformer and sparse-UNet backbones,
semantic-segmentation / classification / keypoint heads, and a semantic-SLAM
frontend.

Conventional import alias::

    import pointcept_keypointdetection_tpu as pkt
"""

__version__ = "0.1.0"
