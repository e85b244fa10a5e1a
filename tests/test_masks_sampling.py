"""Mask + sampling op tests (golden values from the reference semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from minimax_speech_tpu.ops import masks, sampling, interpolate


def test_subsequent_chunk_mask():
    m = np.asarray(masks.subsequent_chunk_mask(4, 2))
    expect = np.array([[1, 1, 0, 0],
                       [1, 1, 0, 0],
                       [1, 1, 1, 1],
                       [1, 1, 1, 1]], dtype=bool)
    np.testing.assert_array_equal(m, expect)


def test_chunk_mask_left_chunks():
    m = np.asarray(masks.subsequent_chunk_mask(6, 2, num_left_chunks=1))
    # row 4 (chunk 2) sees chunks 1..2 => cols 2..5
    assert not m[4, 0] and not m[4, 1] and m[4, 2] and m[4, 5]


def test_pad_mask():
    m = np.asarray(masks.make_non_pad_mask(jnp.array([3, 1]), 4))
    np.testing.assert_array_equal(m, [[1, 1, 1, 0], [1, 0, 0, 0]])


def test_nucleus_keeps_topk_topp():
    logp = jnp.log(jnp.array([0.6, 0.3, 0.05, 0.03, 0.02]))
    tokens = [int(sampling.nucleus_sample(jax.random.PRNGKey(i), logp,
                                          top_p=0.8, top_k=25))
              for i in range(50)]
    # exclusive-cumsum rule: token 0 (cum 0) and token 1 (cum 0.6) are kept;
    # token 2 has exclusive cum 0.9 >= 0.8 and is dropped.
    assert set(tokens) <= {0, 1}


def test_ras_fallback_triggers_on_repetition():
    logp = jnp.log(jnp.array([0.96, 0.01, 0.01, 0.01, 0.01]))
    recent = jnp.full((10,), 0, dtype=jnp.int32)  # token 0 repeated 10x
    hits = 0
    for i in range(100):
        tok = int(sampling.ras_sample(jax.random.PRNGKey(i), logp, recent))
        hits += tok != 0
    # fallback samples the full distribution, so non-0 tokens must appear
    assert hits > 0


def test_interpolate_nearest_matches_torch():
    import torch
    x = np.random.default_rng(0).standard_normal((1, 3, 7)).astype(np.float32)
    golden = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2.0, mode="nearest").numpy()
    ours = np.asarray(interpolate.interpolate_nearest(jnp.asarray(x), 2))
    np.testing.assert_array_equal(ours, golden)


def test_interpolate_linear_matches_torch():
    import torch
    x = np.random.default_rng(0).standard_normal((2, 4, 9)).astype(np.float32)
    golden = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=20, mode="linear").numpy()
    ours = np.asarray(interpolate.interpolate_linear(jnp.asarray(x), 20))
    np.testing.assert_allclose(ours, golden, atol=1e-6)


def test_ras_sample_batch_matches_vmapped_scalar():
    """ras_sample_batch (batch-level lax.cond around the expensive
    full-vocab fallback) must be BIT-IDENTICAL to vmapping ras_sample,
    on batches where no row, some rows, and all rows need the
    repetition fallback."""
    rng = np.random.default_rng(3)
    v, w, b = 64, 10, 4
    logits = jnp.asarray(rng.standard_normal((b, v)).astype(np.float32))
    logp = jax.nn.log_softmax(logits, axis=-1)

    top0 = np.asarray(jnp.argmax(logp, axis=-1))
    cases = {
        "none": np.full((b, w), -1, np.int32),
        "some": np.stack([np.full(w, top0[0], np.int32)]
                         + [np.full(w, -1, np.int32)] * (b - 1)),
        "all": np.stack([np.full(w, t, np.int32) for t in top0]),
    }
    for name, recent in cases.items():
        keys = jax.random.split(jax.random.PRNGKey(11), b)
        golden = jax.vmap(lambda kk, lp, rc: sampling.ras_sample(
            kk, lp, rc, 0.8, 25, w, 0.1))(keys, logp,
                                           jnp.asarray(recent))
        ours = sampling.ras_sample_batch(keys, logp, jnp.asarray(recent),
                                         0.8, 25, w, 0.1)
        np.testing.assert_array_equal(np.asarray(ours),
                                      np.asarray(golden), err_msg=name)
