"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.kernels import flash_attention as fa


def _run(q, k, v, interpret=True, **kw):
    # interpret mode lets the Pallas kernel run on CPU for testing
    import functools
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    if interpret:
        def patched(*a, **kws):
            kws.setdefault("interpret", True)
            return orig(*a, **kws)
        pl.pallas_call = patched
    try:
        # bypass the jit wrapper so the monkeypatch takes effect
        return fa.flash_attention.__wrapped__(q, k, v, **kw)
    finally:
        pl.pallas_call = orig


@pytest.mark.parametrize("case", ["full", "causal", "chunk", "chunk_left"])
def test_flash_matches_reference(case, rng):
    b, h, t, d = 2, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    kv_len = jnp.array([256, 173])
    kw = dict(full={}, causal=dict(causal=True),
              chunk=dict(chunk=50),
              chunk_left=dict(chunk=50, left_chunks=2))[case]
    ours = _run(q, k, v, kv_len=kv_len, block_q=128, block_k=128, **kw)
    golden = fa.reference_attention(q, k, v, kv_len=kv_len, **kw)
    # compare only valid query rows (padded queries are undefined)
    for i in range(b):
        n = int(kv_len[i])
        np.testing.assert_allclose(np.asarray(ours)[i, :, :n],
                                   np.asarray(golden)[i, :, :n],
                                   atol=2e-5, rtol=1e-4)


def test_unet_flash_attention_matches_dense(rng):
    """UNet with use_flash_attention must match the dense-bias path
    (interpret mode on CPU)."""
    import dataclasses
    from jax.experimental import pallas as pl
    from minimax_speech_tpu.models.decoder_unet import (
        CausalConditionalDecoder, DecoderUNetConfig)

    cfg = DecoderUNetConfig(in_channels=32, out_channels=8, channels=(16,),
                            attention_head_dim=64, n_blocks=1,
                            num_mid_blocks=1, num_heads=2,
                            static_chunk_size=50)
    t = 128
    x = jnp.asarray(rng.standard_normal((1, t, 8)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((1, t, 8)), jnp.float32)
    mask = jnp.asarray((np.arange(t) < 100)[None].astype(np.float32))
    args = (x, mask, mu, jnp.array([0.4]), jnp.zeros((1, 8)),
            jnp.zeros((1, t, 8)))

    dense = CausalConditionalDecoder(cfg)
    params = dense.init(jax.random.PRNGKey(0), *args)
    golden = dense.apply(params, *args)

    from minimax_speech_tpu.kernels import splash

    for backend in ("splash", "pallas"):
        flash_cfg = dataclasses.replace(cfg, use_flash_attention=True,
                                        flash_backend=backend)
        flash_model = CausalConditionalDecoder(flash_cfg)
        orig = pl.pallas_call

        def patched(*a, **kw):
            kw.setdefault("interpret", True)
            return orig(*a, **kw)

        pl.pallas_call = patched
        splash._INTERPRET = True
        try:
            ours = flash_model.apply(params, *args)
        finally:
            pl.pallas_call = orig
            splash._INTERPRET = False
        # compare valid frames only
        np.testing.assert_allclose(np.asarray(ours)[0, :100],
                                   np.asarray(golden)[0, :100], atol=3e-5,
                                   err_msg=backend)


def test_unet_flash_auto_policy(rng):
    """use_flash_attention=None auto-selects flash exactly in the
    measured win region (streaming, T>=2048, bounded left window —
    scripts/bench_attention.py) and must match the dense path there."""
    import dataclasses
    from unittest import mock
    from jax.experimental import pallas as pl
    from minimax_speech_tpu.models.decoder_unet import (
        CausalConditionalDecoder, DecoderUNetConfig)

    cfg = DecoderUNetConfig(in_channels=32, out_channels=8, channels=(16,),
                            attention_head_dim=64, n_blocks=1,
                            num_mid_blocks=0, num_heads=2,
                            static_chunk_size=50, num_left_chunks=2,
                            use_flash_attention=None)
    t = 2048
    x = jnp.asarray(rng.standard_normal((1, t, 8)) * 0.3, jnp.float32)
    mu = jnp.asarray(rng.standard_normal((1, t, 8)) * 0.3, jnp.float32)
    mask = jnp.asarray((np.arange(t) < t - 40)[None].astype(np.float32))
    args = (x, mask, mu, jnp.array([0.4]), jnp.zeros((1, 8)),
            jnp.zeros((1, t, 8)))

    auto = CausalConditionalDecoder(cfg)
    params = auto.init(jax.random.PRNGKey(0), *args, streaming=False)

    from minimax_speech_tpu.kernels import splash

    calls = []
    orig_kernel = splash._kernel

    def counting_kernel(*a, **kw):
        calls.append(1)
        return orig_kernel(*a, **kw)

    splash._kernel.cache_clear()
    splash._INTERPRET = True
    try:
        with mock.patch.object(splash, "_kernel", counting_kernel):
            # one-shot (streaming=False): auto must stay on XLA
            _ = auto.apply(params, *args, streaming=False)
            assert not calls
            # long-form streaming window: auto must pick the flash kernel
            ours = auto.apply(params, *args, streaming=True)
            assert calls
    finally:
        splash._INTERPRET = False
    off = CausalConditionalDecoder(
        dataclasses.replace(cfg, use_flash_attention=False))
    golden = off.apply(params, *args, streaming=True)
    n = t - 40
    np.testing.assert_allclose(np.asarray(ours)[0, :n],
                               np.asarray(golden)[0, :n],
                               atol=5e-5, rtol=1e-4)


def test_unet_splash_training_grad_matches_dense(rng):
    """Long-form TRAINING attention: gradients through the splash
    backend must match the dense-bias XLA path (the fwd-only pallas
    kernel cannot serve training; splash ships fwd+bwd)."""
    import dataclasses
    from minimax_speech_tpu.kernels import splash
    from minimax_speech_tpu.models.decoder_unet import (
        CausalConditionalDecoder, DecoderUNetConfig)

    cfg = DecoderUNetConfig(in_channels=32, out_channels=8, channels=(16,),
                            attention_head_dim=64, n_blocks=1,
                            num_mid_blocks=0, num_heads=2,
                            static_chunk_size=50, num_left_chunks=2,
                            use_flash_attention=True,
                            flash_backend="splash")
    t = 256
    x = jnp.asarray(rng.standard_normal((1, t, 8)) * 0.3, jnp.float32)
    mu = jnp.asarray(rng.standard_normal((1, t, 8)) * 0.3, jnp.float32)
    mask = jnp.asarray((np.arange(t) < t - 40)[None].astype(np.float32))
    args = (mask, mu, jnp.array([0.4]), jnp.zeros((1, 8)),
            jnp.zeros((1, t, 8)))

    model = CausalConditionalDecoder(cfg)
    dense = CausalConditionalDecoder(
        dataclasses.replace(cfg, use_flash_attention=False))
    params = dense.init(jax.random.PRNGKey(0), x, *args, streaming=True)

    def loss(m):
        def f(xx):
            out = m.apply(params, xx, *args, streaming=True)
            return jnp.sum((out * mask[..., None]) ** 2)
        return f

    splash._INTERPRET = True
    try:
        g_ours = jax.grad(loss(model))(x)
        l_ours = loss(model)(x)
    finally:
        splash._INTERPRET = False
    g_ref = jax.grad(loss(dense))(x)
    l_ref = loss(dense)(x)
    np.testing.assert_allclose(float(l_ours), float(l_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               atol=5e-4, rtol=1e-3)


def test_splash_sharded_mesh_matches_single(rng):
    """Splash under shard_map on the 8-device mesh (dp=4 x tp=2) must
    match the unsharded kernel in forward AND gradient — this is the
    multi-chip LM training attention path (kernels/splash.py _MESH;
    VERDICT r4: auto mode previously turned splash off under any
    multi-device mesh)."""
    from minimax_speech_tpu.kernels import splash
    from minimax_speech_tpu.parallel import mesh as mesh_lib

    b, h, t, d = 8, 4, 128, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.2, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.2, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.2, jnp.float32)
    kv_len = jnp.asarray(np.array([128, 100, 64, 128, 90, 128, 77, 128]))

    def loss(qq, kk, vv):
        out = splash.splash_causal_attention(qq, kk, vv, kv_len)
        mask = (jnp.arange(t)[None, :] < kv_len[:, None]).astype(out.dtype)
        return jnp.sum((out * mask[:, None, :, None]) ** 2)

    splash._INTERPRET = True
    try:
        ref = splash.splash_causal_attention(q, k, v, kv_len)
        g_ref = jax.grad(loss)(q, k, v)
        splash.set_attention_mesh(mesh_lib.make_mesh(dp=4, tp=2))
        out = jax.jit(splash.splash_causal_attention,
                      static_argnames=())(q, k, v, kv_len)
        g_out = jax.jit(jax.grad(loss))(q, k, v)
    finally:
        splash.set_attention_mesh(None)
        splash._INTERPRET = False
    mask = np.asarray(jnp.arange(t)[None, :] < kv_len[:, None])
    m4 = mask[:, None, :, None]
    np.testing.assert_allclose(np.asarray(out) * m4, np.asarray(ref) * m4,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_lm_auto_splash_on_with_mesh(monkeypatch):
    """qwen2 auto mode: splash stays ON under a multi-device mesh once
    the harness registers it (and OFF when no mesh is registered)."""
    import dataclasses
    from minimax_speech_tpu.kernels import splash
    from minimax_speech_tpu.models import qwen2
    from minimax_speech_tpu.parallel import mesh as mesh_lib

    cfg = qwen2.Qwen2Config(flash_train=None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not qwen2._use_splash_train(cfg, 512)  # 8 devices, no mesh
    try:
        splash.set_attention_mesh(mesh_lib.make_mesh(dp=4, tp=2))
        assert qwen2._use_splash_train(cfg, 512)
        assert not qwen2._use_splash_train(cfg, 500)  # T % 128 != 0
    finally:
        splash.set_attention_mesh(None)
