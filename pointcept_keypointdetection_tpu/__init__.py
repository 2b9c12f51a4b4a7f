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

# Honor JAX_PLATFORMS through jax.config BEFORE any backend initializes: the
# container's sitecustomize registers an external TPU platform whose backend
# hook ignores the env var, so a CPU-only run (tests, preprocessing, tools
# under JAX_PLATFORMS=cpu) would still dial the TPU tunnel — and hang forever
# when the tunnel is down.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
del _os
