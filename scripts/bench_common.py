"""Shared helpers for the 7B benchmark scripts.

Tok: a deterministic zlib-hash word tokenizer so full-scale models run
without real checkpoint vocab files; ids are stable across scripts so
throughput numbers stay comparable.
"""
import zlib


class Tok:
    bos_token_id = 1
    eos_token_id = 2

    class _O:
        def __init__(s, i):
            s.input_ids = i

    def __call__(self, text, add_special_tokens=True):
        text = text.replace("</s>", " </s> ").replace("[LOC]", " [LOC] ")
        ids = [1] if add_special_tokens else []
        for w in text.split():
            ids.append(2 if w == "</s>" else 3 if w == "[LOC]"
                       else 4 + zlib.crc32(w.encode()) % 31000)
        return self._O(ids)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids if i > 3)


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
