"""person_capture_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of PersonCapture.

Turn a video plus reference photos of a target person into a curated image
dataset of that person. The compute path (face detection, identity embedding,
person detection, ReID, HDR tone-mapping) runs as batched, fused XLA programs
sharded over TPU meshes; the host side drives decode, span logic and export.

Layering (see SURVEY.md §7):
  core/      pure geometry + scoring (host numpy, mirrored jnp where hot)
  models/    JAX model families: SCRFD, ArcFace iResNet, YOLOv8, CLIP-ViT
  ops/       XLA ops: letterbox, NMS, 5-pt alignment, warp, quality
  kernels/   Pallas TPU kernels: HDR tone-map family, color-match LUT
  video/     host-side decode/probe/keyframe-index
  pipeline/  batched pre-scan, span builder + cache, main pass, async save
  hdr/       HDR->SDR still export pipeline
  curator/   MMR dataset curation
  parallel/  device mesh + sharding of frame batches
"""

__version__ = "0.1.0"

from .config import SessionConfig  # noqa: F401
