"""swarmmap_tpu — a TPU-native multi-agent collaborative visual SLAM framework.

A from-scratch rebuild of the capabilities of MobiSense/SwarmMap (NSDI'22)
designed TPU-first:

- The ORB front-end (image pyramid, FAST corners, intensity-centroid
  orientation, rBRIEF descriptors) runs as fused JAX/XLA + Pallas device
  programs (reference spec: /root/reference/code/src/ORBextractor.cc,
  code/src/cuda/{Fast_gpu,Orb_gpu}.cu).
- Data association (reference: src/ORBmatcher.cc) is batched popcount
  matmuls on the MXU instead of per-keypoint scalar loops.
- Optimization (reference: src/Optimizer.cc on vendored g2o) is a JAX
  Levenberg-Marquardt suite with an implicit-Schur CG bundle adjuster.
- The multi-agent map-sync protocol (change-log push/pull, STS scheduling,
  MBP map profiling; reference: src/{Mapit,MediatorScheduler,
  LandmarkScoring,MapEnhancer}.cc) is host-side Python + C++ around the
  device programs.

Layer map (mirrors SURVEY.md §1):
  ops/      L1+L2  device programs (kernels, matching, geometry, optimizers)
  core/     L3     client SLAM core (tracking, local mapping, map store)
  sync/     L4     map synchronization (op-log, slices, codecs)
  net/      L5     websocket services
  server/   L6     edge-server layer (mediators, STS scheduler, MBP)
  cli/      L7     entry points (swarm_map / swarm_client / swarm_server ...)
  utils/    L0     config, logging, timing, datasets, trajectories
  parallel/        device-mesh multi-agent batching (pjit/shard_map)
  native/          C++ runtime components (octree, codec, aggregation)
"""

__version__ = "0.1.0"

MAP_BASE = 1_000_000  # global id stride per map (reference: code/include/Map.h:45)

# TPU defaults f32 matmuls to bf16 MXU passes; the geometry stack (Sim3
# RANSAC, umeyama, triangulation, BA linear algebra) is small-matrix f32
# math whose conditioning that destroys — e.g. cross-map Sim3 acceptance
# works on CPU but collapses on TPU under bf16 hypotheses.  Full-f32
# matmul precision costs nothing measurable here: every throughput-
# critical matmul (Hamming popcounts, binned BRIEF, one-hot patches)
# feeds the MXU with explicit bf16/int inputs and is unaffected.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
