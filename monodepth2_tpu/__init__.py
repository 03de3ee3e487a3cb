"""monodepth2_tpu — a TPU-native self-supervised monocular depth framework.

Built from scratch on JAX/XLA/Pallas/pjit with the capability surface of the
reference Julia implementation (pxl-th/Monodepth2.jl, see SURVEY.md): ResNet-18
encoder + multi-scale U-Net depth decoder + axis-angle pose decoder trained with
a fully differentiable view-synthesis loss (SSIM+L1 min-reprojection photometric
loss + edge-aware disparity smoothness) on unlabeled monocular video.

Layout (TPU-first design, not a port):
  nn/        functional layer library (params as pytrees; replaces Flux usage)
  ops/       differentiable geometry + loss core (reference src/utils.jl,
             src/training.jl) in pure jax.numpy, plus Pallas kernels for the
             warp hot loop
  models/    ResNet-18 stage encoder, DepthDecoder, PoseDecoder, Model
  data/      KITTI odometry / Depth10k triplet pipelines, DChain, async loader
  parallel/  device mesh + data-parallel sharding (jax.sharding / shard_map)
  training/  TrainState, jitted train step, checkpoint/resume, config, loop
  utils/     visualization, depth metrics (AbsRel etc.), profiling hooks
  serving.py AOT-exported StableHLO serving artifacts (weights baked in;
             loadable without model code — `cli.py export`)
"""

__version__ = "0.1.0"
