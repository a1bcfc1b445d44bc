"""pero_pretraining_tpu — TPU-native self-supervised pre-training for OCR text-line encoders.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of DCGM/pero-pretraining
(reference: /root/reference, "Self-supervised Pre-training of Text Recognizers",
ICDAR 2024, arXiv:2405.00420). The reference is a single-GPU PyTorch research
codebase; this framework is designed TPU-first:

- static-shape batches (masked reductions instead of boolean gathers),
- NHWC data layout, patchify as reshape+matmul (maps directly onto the MXU),
- functional state (VQ-EMA codebooks, BatchNorm stats) threaded through jitted
  train steps,
- SPMD data/tensor parallelism over a `jax.sharding.Mesh` with XLA collectives,
- Pallas kernels for hot ops (VQ nearest-neighbour assignment, flash attention).

Layout:
    models/    — model zoo (transformer backbones, VGG stacks, AE/VQ-VAE, heads)
    ops/       — TPU kernels & fused ops (attention, patchify/masking, VQ assign)
    losses/    — masked CE, VICReg, NT-Xent (all fixed-shape, fully vectorized)
    data/      — datasets, fixed-shape collation, prefetching device feed
    parallel/  — mesh construction and sharding rules
    training/  — generic trainer/tester, schedules, checkpointing
    pipelines/ — masked / joint-embedding / autoencoder task wiring + CLIs
    scripts/   — offline target generation & analysis tools
    utils/     — visualization and logging
"""

__version__ = "0.1.0"
