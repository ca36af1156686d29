"""bodyfitting_tpu — a TPU-native multi-view SMPL/SMPL-X body-fitting framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`generalizable-neural-performer/bodyfitting` (multi-view SMPLify for the
GeneBody dataset and RenderPeople scans):

* the SMPL / SMPL-X body model is a pure jit-compiled function
  (:mod:`bodyfitting_tpu.models.body_model`),
* the staged SMPLify optimizer runs as a ``lax.scan`` inner loop
  (:mod:`bodyfitting_tpu.fitting.smplify`), vmapped across frames and views,
* the mesh nearest-point search and the differentiable rasterizer are
  Pallas TPU kernels (:mod:`bodyfitting_tpu.ops`),
* multi-chip scaling uses ``jax.sharding`` over a frame-sharded device mesh
  (:mod:`bodyfitting_tpu.parallel`) — no per-view Python loops anywhere.

External contracts kept compatible with the reference:
OpenPose JSON keypoints in, ``annots.npy`` cameras in, ``{smpl_type}_parameter.npy``
parameter dicts + ``.obj`` meshes out, SMPL/SMPL-X model assets (npz/pkl) in.
"""

__version__ = "0.1.0"
