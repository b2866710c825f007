"""Ring-attention sequence parallelism (parallel/ring_attention.py) on the
virtual CPU mesh, vs the single-device XLA attention oracle — forward and
gradients, incl. prefix-LM, right padding, and sliding windows."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from spatialvla_tpu.ops.flash_attention import _attention_reference
from spatialvla_tpu.parallel.ring_attention import ring_flash_attention

B, T, NQ, NKV, D = 2, 32, 4, 2, 8
SCALE = D**-0.5


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _qkv(seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, T, NQ, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, NKV, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, NKV, D).astype(np.float32))
    return q, k, v


CASES = [
    # (prefix_lens, valid_lens, window, causal)
    ("causal", np.array([0, 0]), np.array([T, T]), None, True),
    ("prefix_lm", np.array([10, 7]), np.array([T, T]), None, True),
    ("padded", np.array([9, 0]), np.array([T - 5, T - 11]), None, True),
    ("window", np.array([0, 0]), np.array([T, T]), 9, True),
    ("prefix_window_pad", np.array([6, 11]), np.array([T - 3, T]), 13, True),
    ("bidirectional", np.array([0, 0]), np.array([T, T - 7]), None, False),
]


@pytest.mark.parametrize("n_sp", [2, 4])
@pytest.mark.parametrize("name,prefix,valid,window,causal",
                         CASES, ids=[c[0] for c in CASES])
def test_ring_forward_matches_reference(n_sp, name, prefix, valid, window, causal):
    q, k, v = _qkv()
    prefix_l = jnp.asarray(prefix, jnp.int32)
    valid_l = jnp.asarray(valid, jnp.int32)
    want = _attention_reference(
        q, k, v, prefix_l, valid_l, jnp.zeros(B, jnp.int32),
        scale=SCALE, logit_softcap=50.0, window=window, causal=causal,
    )
    got = ring_flash_attention(
        q, k, v, prefix_l, valid_l, mesh=_mesh(n_sp), scale=SCALE,
        logit_softcap=50.0, window=window, causal=causal,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("name,prefix,valid,window,causal",
                         [CASES[1], CASES[3]], ids=[CASES[1][0], CASES[3][0]])
def test_ring_grads_match_reference(name, prefix, valid, window, causal):
    q, k, v = _qkv(seed=3)
    prefix_l = jnp.asarray(prefix, jnp.int32)
    valid_l = jnp.asarray(valid, jnp.int32)
    mesh = _mesh(4)
    rng = np.random.RandomState(7)
    co = jnp.asarray(rng.randn(B, T, NQ, D).astype(np.float32))

    def loss_ring(q, k, v):
        out = ring_flash_attention(
            q, k, v, prefix_l, valid_l, mesh=mesh, scale=SCALE,
            logit_softcap=50.0, window=window, causal=causal,
        )
        return jnp.sum(out * co)

    def loss_ref(q, k, v):
        out = _attention_reference(
            q, k, v, prefix_l, valid_l, jnp.zeros(B, jnp.int32),
            scale=SCALE, logit_softcap=50.0, window=window, causal=causal,
        )
        return jnp.sum(out * co)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, tag in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=f"d{tag}",
        )


def test_ring_under_jit_and_sharded_inputs():
    """jit + explicitly sharded operands: the path a train step would use."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh(4)
    q, k, v = _qkv(seed=5)
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    prefix_l = jnp.asarray([5, 0], jnp.int32)
    valid_l = jnp.asarray([T, T - 4], jnp.int32)

    f = jax.jit(
        lambda q, k, v: ring_flash_attention(
            q, k, v, prefix_l, valid_l, mesh=mesh, scale=SCALE,
            logit_softcap=50.0, causal=True,
        )
    )
    got = f(qd, kd, vd)
    want = _attention_reference(
        q, k, v, prefix_l, valid_l, jnp.zeros(B, jnp.int32),
        scale=SCALE, logit_softcap=50.0, window=None, causal=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_ring_via_mesh_config():
    """MeshConfig grows an optional sp axis; ring attention runs over it."""
    from spatialvla_tpu.parallel import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=1, fsdp=2, model=1, sp=4))
    assert mesh.shape["sp"] == 4
    q, k, v = _qkv(seed=9)
    prefix_l = jnp.asarray([4, 0], jnp.int32)
    valid_l = jnp.asarray([T, T], jnp.int32)
    got = ring_flash_attention(
        q, k, v, prefix_l, valid_l, mesh=mesh, scale=SCALE, causal=True,
    )
    want = _attention_reference(
        q, k, v, prefix_l, valid_l, jnp.zeros(B, jnp.int32),
        scale=SCALE, logit_softcap=None, window=None, causal=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
