"""Merge-and-export CLI — counterpart of
VisualSearch/merge_lora_weights_and_save_hf_model.py.

Loads an Orbax training checkpoint (train_vsm_main's ckpt_model/state),
merges LoRA adapters into the base decoder, and writes a torch-layout
safetensors checkpoint that both this framework (core/hf_import) and the
torch reference can load.

  python -m vstar_tpu.train.export_main \\
      --ckpt runs/vsm/ckpt_model/state --version <base seal_vsm dir> \\
      --save_path ./exported_vsm
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser("merge lora + export HF checkpoint")
    p.add_argument("--ckpt", required=True,
                   help="orbax train-state dir (ckpt_model/state)")
    p.add_argument("--version", required=True,
                   help="base HF checkpoint dir (for the template pytree)")
    p.add_argument("--save_path", required=True)
    p.add_argument("--lora_r", default=8, type=int)
    p.add_argument("--lora_alpha", default=16, type=int)
    args = p.parse_args(argv)

    from ..core.checkpoint import load_params, load_torch_dir
    from ..core.hf_config import vsm_config_for
    from ..core.hf_export import save_safetensors, vsm_state_dict
    from ..models.vsm import vsm_params_from_torch
    from ..train.lora import add_lora
    from ..train.vsm_train import VSMTrainState, make_vsm_optimizer

    cfg = vsm_config_for(args.version)
    params = vsm_params_from_torch(load_torch_dir(args.version), cfg,
                                   dtype=jnp.float32)
    if args.lora_r > 0:
        params["llama"] = add_lora(params["llama"], jax.random.PRNGKey(0),
                                   r=args.lora_r, alpha=args.lora_alpha)
    opt = make_vsm_optimizer()
    template = VSMTrainState(params, opt.init(params),
                             jnp.zeros((), jnp.int32))
    state = VSMTrainState(*load_params(args.ckpt, like=tuple(template)))

    sd = vsm_state_dict(state.params)  # merges LoRA inside llama export
    save_safetensors(sd, args.save_path)
    print(f"exported {len(sd)} tensors to {args.save_path}")


if __name__ == "__main__":
    main()
