"""vstar_tpu — TPU-native framework for SEAL-style guided visual search multimodal LLMs.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference system (penghao-wu/vstar): a dual-projector VQA LLM (LLaVA-style)
plus a Visual Search Model (VSM) whose ``[LOC]`` token drives an open-vocab
detection head and a SAM-style mask decoder, composed by a recursive
priority-queue-guided visual search policy.

Design: functional modules over parameter pytrees, static shapes everywhere,
pjit/shard_map over a `jax.sharding.Mesh` for parallelism, Pallas kernels for
the attention hot paths.
"""

__version__ = "0.1.0"
