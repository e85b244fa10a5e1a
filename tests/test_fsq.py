"""FSQ quantizer parity vs torch reference math."""
import numpy as np
import torch

import jax.numpy as jnp

from minimax_speech_tpu.ops import fsq


def torch_fsq_encode(h: np.ndarray) -> np.ndarray:
    x = torch.from_numpy(h).float()
    x = x.tanh() * 0.9990000128746033
    x = x.round() + 1
    powers = torch.pow(3.0, torch.arange(8, dtype=torch.float32))
    return torch.sum(x * powers, dim=-1).int().numpy()


def test_fsq_encode_parity(rng):
    h = rng.standard_normal((64, 8)).astype(np.float32) * 2.0
    golden = torch_fsq_encode(h)
    ours = np.asarray(fsq.fsq_encode(jnp.asarray(h)))
    np.testing.assert_array_equal(ours, golden)
    assert ours.min() >= 0 and ours.max() < fsq.CODEBOOK_SIZE


def test_fsq_digits_roundtrip(rng):
    codes = rng.integers(0, fsq.CODEBOOK_SIZE, size=(100,))
    digits = np.asarray(fsq.fsq_digits(jnp.asarray(codes)))
    powers = 3 ** np.arange(8)
    np.testing.assert_array_equal((digits * powers).sum(-1), codes)


def test_fsq_encode_decode_consistency(rng):
    h = rng.standard_normal((32, 8)).astype(np.float32) * 3.0
    codes = fsq.fsq_encode(jnp.asarray(h))
    centers = fsq.fsq_centers(codes)
    # centers must equal round(tanh-scaled h)
    expect = np.round(np.tanh(h) * fsq.FSQ_SCALE)
    np.testing.assert_array_equal(np.asarray(centers), expect)
