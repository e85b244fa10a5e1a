"""MAS scan-DP vs numpy reference DP (the Cython-kernel semantics)."""
import numpy as np

import jax.numpy as jnp

from minimax_speech_tpu.ops import monotonic_align as ma


def make_case(rng, b, tx, ty):
    value = rng.standard_normal((b, tx, ty)).astype(np.float32)
    mask = np.zeros((b, tx, ty), bool)
    x_lens = rng.integers(2, tx + 1, b)
    y_lens = rng.integers(tx, ty + 1, b)  # ty >= tx so a path exists
    for i in range(b):
        y_lens[i] = max(y_lens[i], x_lens[i])
        mask[i, : x_lens[i], : y_lens[i]] = True
    return value, mask


def test_maximum_path_matches_reference(rng):
    value, mask = make_case(rng, 4, 6, 12)
    golden = ma.maximum_path_numpy(value, mask)
    ours = np.asarray(ma.maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(ours, golden)


def test_path_properties(rng):
    value, mask = make_case(rng, 3, 5, 9)
    path = np.asarray(ma.maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for i in range(3):
        xl = int(mask[i, :, 0].sum())
        yl = int(mask[i, 0, :].sum())
        p = path[i, :xl, :yl]
        # exactly one text position per mel frame
        np.testing.assert_array_equal(p.sum(axis=0), 1.0)
        # monotonic, no skips
        xs = p.argmax(axis=0)
        assert (np.diff(xs) >= 0).all() and (np.diff(xs) <= 1).all()
        # starts at 0 and ends at the last text position
        assert xs[0] == 0 and xs[-1] == xl - 1
        # nothing outside the mask
        assert path[i, xl:, :].sum() == 0 and path[i, :, yl:].sum() == 0
