"""Tensor/FSDP-sharded inference: the full VSM generate pipeline jitted
over the virtual mesh must equal single-device outputs — the multi-chip
serving path (a capability the reference lacks; its multi-GPU story is HF
device_map layering)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vstar_tpu.core.config import vsm_tiny
from vstar_tpu.core.mesh import DATA_AXIS, shard_params
from vstar_tpu.models.vsm import init_vsm_params, vsm_generate
from vstar_tpu.multimodal.constants import IMAGE_TOKEN_INDEX
from vstar_tpu.multimodal.splicing import build_layout

CFG = vsm_tiny()


def test_sharded_vsm_generate_matches_single_device(cpu_mesh):
    params = init_vsm_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.RandomState(0)
    B = 2
    clip = jnp.asarray(rng.randn(B, 28, 28, 3), jnp.float32)
    owl = jnp.asarray(rng.randn(B, 48, 48, 3), jnp.float32)
    ids = [1, IMAGE_TOKEN_INDEX, 9, 10, 11]
    lay = build_layout(ids, 32, n_long=CFG.image_tokens, n_short=0,
                       image_long=True)
    text = jnp.asarray(np.stack([lay.text_ids] * B))
    fi = jnp.asarray(np.stack([lay.feat_idx] * B))
    isf = jnp.asarray(np.stack([lay.is_feat] * B))
    lens = jnp.asarray([lay.length] * B, jnp.int32)

    def run(params, clip, owl, text, fi, isf, lens):
        return vsm_generate(params, CFG, clip, owl, text, fi, isf, lens,
                            loc_token_id=5, max_new_tokens=4, eos_id=2,
                            cache_len=64, compute_dtype=jnp.float32)

    base = jax.jit(run)(params, clip, owl, text, fi, isf, lens)

    sharded = shard_params(params, cpu_mesh)
    dsh = NamedSharding(cpu_mesh, P(DATA_AXIS))
    with cpu_mesh:
        out = jax.jit(run)(sharded,
                           jax.device_put(clip, dsh),
                           jax.device_put(owl, dsh),
                           jax.device_put(text, dsh),
                           jax.device_put(fi, dsh),
                           jax.device_put(isf, dsh),
                           jax.device_put(lens, dsh))
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(base.tokens))
    np.testing.assert_allclose(np.asarray(out.det_logits),
                               np.asarray(base.det_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.mask_logits),
                               np.asarray(base.mask_logits),
                               rtol=1e-4, atol=1e-3)
