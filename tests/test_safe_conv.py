"""ops/safe_conv equivalence + gradient guards.

The safe formulations must compute exactly what the lax strided /
lhs-dilated convs compute (same multiply-add sets), for every geometry
the models use (DAC encoder/decoder rates 2,3,4,4,5 with k=2s;
HiFT up/down k=2s..; Matcha HiFi-GAN k/u pairs (16,8),(16,8),(4,2),(4,2)).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.ops import safe_conv


def _lax_strided(x, w, stride, padding, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[padding],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"))


def _lax_transpose(x, w, stride, padding, output_padding=0):
    k = w.shape[0]
    wf = jnp.flip(w, axis=0)
    return jax.lax.conv_general_dilated(
        x, wf, window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,), dimension_numbers=("NWC", "WOI", "NWC"))


STRIDED_GEOMS = [
    # (k, s, p0, p1, dil): DAC encoder blocks k=2s p=ceil(s/2)
    (4, 2, 1, 1, 1), (6, 3, 2, 2, 1), (8, 4, 2, 2, 1), (10, 5, 3, 3, 1),
    # HiFT source downsample k=2u
    (4, 2, 2, 2, 1), (6, 3, 2, 2, 1),
    # odd/asymmetric + dilation corners
    (7, 2, 3, 2, 1), (5, 3, 0, 4, 1), (7, 4, 3, 3, 3), (1, 2, 0, 0, 1),
]


@pytest.mark.parametrize("k,s,p0,p1,dil", STRIDED_GEOMS)
def test_strided_conv_matches_lax(k, s, p0, p1, dil):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 57, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, 5, 3)).astype(np.float32))
    ref = _lax_strided(x, w, s, (p0, p1), dil)
    got = safe_conv.strided_conv1d(x, w, s, (p0, p1), dil)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


TRANSPOSE_GEOMS = [
    # (k, s, p, op): DAC decoder rates (k=2s, p=ceil(s/2))
    (4, 2, 1, 0), (6, 3, 2, 0), (8, 4, 2, 0), (10, 5, 3, 0),
    # Matcha HiFi-GAN V1 ups (k, u, (k-u)//2)
    (16, 8, 4, 0), (4, 2, 1, 0),
    # output_padding corners
    (6, 3, 2, 1), (8, 4, 2, 3), (5, 2, 2, 1), (3, 2, 0, 0),
]


@pytest.mark.parametrize("k,s,p,op", TRANSPOSE_GEOMS)
def test_transpose_conv_matches_lax(k, s, p, op):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 19, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, 6, 4)).astype(np.float32))
    ref = _lax_transpose(x, w, s, p, op)
    got = safe_conv.transpose_conv1d(x, w, s, p, op)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_mixed_chain_grad_descends():
    """FD-vs-autodiff on a [down, up] x2 chain of safe convs — the exact
    composition whose lax formulation has a broken reverse pass on the
    tunneled TPU backend."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 48, 4)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 48, 4)).astype(np.float32))
    wd = rng.standard_normal((8, 4, 4)).astype(np.float32) * 0.2
    wu = rng.standard_normal((8, 4, 4)).astype(np.float32) * 0.2
    params = {"wd1": jnp.asarray(wd), "wu1": jnp.asarray(wu),
              "wd2": jnp.asarray(wd) * 0.7, "wu2": jnp.asarray(wu) * 0.7}

    def loss(p):
        h = safe_conv.strided_conv1d(x, p["wd1"], 4, (2, 2))
        h = safe_conv.transpose_conv1d(h, p["wu1"], 4, 2)
        h = safe_conv.strided_conv1d(h, p["wd2"], 4, (2, 2))
        h = safe_conv.transpose_conv1d(h, p["wu2"], 4, 2)
        return jnp.abs(h - t).mean() * 50.0

    lf = jax.jit(loss)
    l0 = float(lf(params))
    g = jax.jit(jax.grad(loss))(params)
    gn2 = float(sum(jnp.sum(jnp.square(v)) for v in jax.tree.leaves(g)))
    eps = 1e-4
    l1 = float(lf(jax.tree.map(lambda a, b: a - eps * b, params, g)))
    ratio = (l0 - l1) / (eps * gn2)
    assert ratio == pytest.approx(1.0, abs=0.2), ratio
