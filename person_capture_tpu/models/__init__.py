"""JAX model families (flax.linen, NHWC, bfloat16-friendly).

Re-implementations of the reference's inference stack — SCRFD face detector,
ArcFace iResNet embedder, YOLOv8 person detector, CLIP ViT ReID — designed
for the MXU: NHWC convolutions, fixed shapes, fused decode heads. Weights
load from ``.npz`` checkpoints produced by ``tools/convert_weights.py``
(gated on optional onnx/torch availability); fresh inits are deterministic.
"""
