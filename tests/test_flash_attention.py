"""Flash-attention kernel parity tests (interpret mode on CPU) against the
naive reference and against eioku_tpu.models.layers.mha."""
import numpy as np
import pytest

import jax.numpy as jnp

from eioku_tpu.ops.flash_attention import _reference_attention, flash_attention


def rand_qkv(b=2, h=2, sq=256, skv=256, d=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, sq if True else skv, d))
                             .astype(np.float32) * 0.3)
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((b, h, skv, d)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((b, h, skv, d)).astype(np.float32) * 0.3)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_kernel_matches_reference(causal):
    q, k, v = rand_qkv()
    ours = np.asarray(flash_attention(q, k, v, causal=causal, force_pallas=True))
    ref = np.asarray(_reference_attention(q, k, v,
                                          jnp.full((2,), 256, jnp.int32),
                                          causal, 64 ** -0.5))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_kernel_respects_lengths():
    q, k, v = rand_qkv(b=2)
    lengths = jnp.asarray([256, 130], jnp.int32)
    ours = np.asarray(flash_attention(q, k, v, lengths=lengths,
                                      force_pallas=True))
    ref = np.asarray(_reference_attention(q, k, v, lengths, False, 64 ** -0.5))
    np.testing.assert_allclose(ours, ref, atol=2e-5)
    # batch 1 must be unaffected by keys beyond 130
    k2 = k.at[1, :, 130:].set(999.0)
    v2 = v.at[1, :, 130:].set(-999.0)
    ours2 = np.asarray(flash_attention(q, k2, v2, lengths=lengths,
                                       force_pallas=True))
    np.testing.assert_allclose(ours, ours2, atol=2e-5)


def test_non_multiple_seq_padding():
    q, k, v = rand_qkv(sq=200, skv=200)
    out = flash_attention(q, k, v, lengths=jnp.full((2,), 200, jnp.int32),
                          force_pallas=True)
    assert out.shape == (2, 2, 200, 64)
    ref = _reference_attention(
        jnp.pad(q, ((0, 0), (0, 0), (0, 56), (0, 0))),
        jnp.pad(k, ((0, 0), (0, 0), (0, 56), (0, 0))),
        jnp.pad(v, ((0, 0), (0, 0), (0, 56), (0, 0))),
        jnp.full((2,), 200, jnp.int32), False, 64 ** -0.5)[:, :, :200]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_matches_layers_mha():
    """flash path equals the plain mha used by the transformer stacks."""
    from eioku_tpu.models.layers import mha
    b, s, n_heads, d = 2, 128, 4, 256
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32) * 0.2)
    naive = np.asarray(mha(q, k, v, n_heads))
    hd = d // n_heads
    qh = q.reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
    flash = flash_attention(qh, kh, vh, force_pallas=True)
    flash = np.asarray(flash.transpose(0, 2, 1, 3).reshape(b, s, d))
    np.testing.assert_allclose(flash, naive, atol=2e-5)
