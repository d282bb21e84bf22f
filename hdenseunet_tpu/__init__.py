"""hdenseunet_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
xmengli/H-DenseUNet (TMI 2018 liver/tumor segmentation).

Brand-new design, not a port: pure functions + flat name-keyed parameter pytrees
replace the reference's vendored Keras 2.0.8 graph engine; `jit`/`pjit` over a named
device mesh replaces in-graph GPU tower replication (reference
Keras-2.0.8/keras/utils2/multi_gpu.py); static-shape batched sliding-window inference
replaces the per-window `sess.run` loop (reference lib/funcs.py:24-47).

Subpackages
-----------
core     typed config, the functional module engine, mesh/collectives helpers
models   layer kit + model zoo (DenseUNet-2D, DenseUNet-3D, H-DenseUNet, DilatedResNet)
ops      Pallas TPU kernels for hot ops (with pure-XLA fallbacks)
parallel data-parallel training utilities over jax.sharding.Mesh
weights  one-shot HDF5 (Keras) -> pytree weight converter
data     NIfTI IO, offline preprocessing, guided crop sampler, host prefetch
train    losses, optimizers (staged freezing), jitted train steps, checkpointing
infer    batched sliding-window volume inference + postprocessing
"""

__version__ = "0.1.0"
