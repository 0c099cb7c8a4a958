"""Shared helpers for the 7B benchmark scripts.

Tok: the package's deterministic stub tokenizer
(vstar_tpu/multimodal/stub_tokenizer.py) so full-scale models run
without real checkpoint vocab files; ids are stable across scripts so
throughput numbers stay comparable.
"""
from vstar_tpu.multimodal.stub_tokenizer import StubTokenizer as Tok  # noqa: F401


# Forced 3-step target-cue regime shared by every end-to-end benchmark
# (bench.py, coresident_bench, serve_seal_bench): confidence_high=2 >
# sigmoid of any logit disables accepts, negative cue thresholds pin the
# target-cue split path — the control-flow path real checkpoints take
# (they additionally accept early, which only shortens the search).
FORCED_SEARCH = dict(confidence_high=2.0, target_cue_threshold=-1.0,
                     target_cue_threshold_minimum=-1.0)


def sync_params(params):
    """Block until a param pytree is fully materialized on device.

    The axon relay's block_until_ready returns early; transfers are FIFO,
    so a scalar fetch of the LAST-created leaf syncs the whole init."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(params)[-1]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return params
