"""Checkpoint I/O.

  * load_torch_dir — read an HF checkpoint directory (sharded
    pytorch_model-*.bin or *.safetensors) into a flat name->tensor dict for
    the importers in hf_import.py. The public reference checkpoints
    (craigwu/seal_vqa_7b, craigwu/seal_vsm_7b) use this format.
  * save_params / load_params — Orbax for the framework's own pytrees
    (sharded-array aware; replaces the reference's DeepSpeed engine
    checkpoints, VisualSearch/train.py:396-411).
"""

from __future__ import annotations

import os
from typing import Any, Dict




def load_torch_dir(path: str) -> Dict[str, Any]:
    """Flat state_dict from an HF checkpoint dir (bin shards, safetensors,
    or a single file)."""
    sd: Dict[str, Any] = {}
    entries = sorted(os.listdir(path))
    safes = [e for e in entries if e.endswith(".safetensors")]
    bins = [e for e in entries
            if e.endswith(".bin") and e.startswith("pytorch_model")]
    if safes:
        from safetensors import safe_open
        for fname in safes:
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
    elif bins:
        import torch
        for fname in bins:
            part = torch.load(os.path.join(path, fname),
                              map_location="cpu", weights_only=True)
            sd.update(part)
    else:
        raise FileNotFoundError(f"no checkpoint shards under {path}")
    return sd


def save_params(params, path: str):
    """Orbax checkpoint of a param pytree (handles sharded arrays).
    Overwrites an existing checkpoint at `path` — the trainers keep one
    rolling best checkpoint, like the reference's rmtree-then-save
    (VisualSearch/train.py:396-409)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like=None):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), like)
    return ckptr.restore(os.path.abspath(path))


def load_projector_adapter(params, adapter_path: str, which: str):
    """Attach a stage-1 pretrained projector adapter to a model pytree —
    the mm_projector.bin handoff between pretrain and finetune
    (LLaVA builder.py projector-only path / train_search.py:1012-1044).

    which: 'proj_image' (linear) or 'proj_object' (perceiver)."""
    assert which in ("proj_image", "proj_object"), which
    adapter = load_params(adapter_path, like=params[which])
    out = dict(params)
    out[which] = adapter
    return out
