"""ygz_slam_tpu — a TPU-native semi-direct visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PaoPaoRobot/ygz-slam (a C++ monocular SLAM mixing ORB-SLAM2-style
feature methods with SVO/DSO-style direct photometric methods).

Design stance (see SURVEY.md §7): the reference's pointer-graph of
Frame*/Feature*/MapPoint* objects and per-point scalar+SIMD loops is
inverted into fixed-shape batched tensors + pure jittable functions +
a thin host-side map server.  All hot per-point work (FAST, ORB, LK,
patch alignment, Hamming matching, BA residuals) is batched so the
VPU/MXU are the data-parallel dimension that replaces SSE2/NEON.

Layer map (mirrors the reference's 4-layer design, Readme.md:38-42):
  L1 basic data   -> ygz_slam_tpu.map.state (MapState pytree), geometry.camera
  L2 algorithms   -> ygz_slam_tpu.ops, ygz_slam_tpu.solvers
  L3 modules      -> ygz_slam_tpu.models (frontend, local mapping)
  L4 system       -> ygz_slam_tpu.system (System facade, config, trajectory)
  distribution    -> ygz_slam_tpu.parallel (mesh-sharded BA, collectives)
"""

__version__ = "0.1.0"
