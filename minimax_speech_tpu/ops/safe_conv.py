"""Strided / transposed 1-D convs with backend-safe gradients.

Why this exists (measured, round 4): on the tunneled TPU backend the
reverse-mode gradient of conv chains that mix window_strides>1 with
lhs_dilation>1 is MISCOMPILED. Evidence (see STATUS.md round-4 notes):

- CPU f32 gradient of the DAC gen loss == CPU f64 gradient
  (cos 1.00000) and is stable under 1e-6 param perturbation, so the
  true gradient is well-conditioned;
- the TPU gradient of the same loss had cosine ~0.5 against it with a
  2x smaller norm, and DAC training on the TPU *rose* in loss at
  warmup-sized learning rates while the identical run converged on CPU;
- isolation: chains of plain/dilated/weight-normed convs match CPU
  (cos >= 0.9997), but a 3-deep [stride-4 conv -> lhs-dilated conv]
  chain drops to cos 0.66, and on-TPU forward-mode (jvp) agrees with
  CPU while on-TPU reverse-mode (vjp) disagrees with BOTH by ~20%
  along the same direction — an autodiff inconsistency in the backend;
- reformulating stride as stride-1 conv + phase packing and transpose
  as stride-1 conv + subpixel reshape restores cos >= 0.9998.

The two functions here compute EXACTLY the same quantities as
lax.conv_general_dilated with window_strides / lhs_dilation (same
multiply-add sets per output, only the loop nest differs), expressed so
that every lax.conv in both forward and backward graphs has
window_strides=1 and lhs_dilation=1:

- strided_conv1d: pack the padded input into s phases
  (B, T', s*C) and convolve with a (ceil(k/s), s*C, F) packed kernel —
  identical FLOPs to the strided conv (modulo k/s rounding).
- transpose_conv1d: subpixel formulation — one stride-1 conv producing
  s output phases (B, T', s*F), then depth-to-time reshape; identical
  FLOPs to the fractionally-strided conv.

Both match the lax formulations bit-for-bit in the multiply-add sets;
tests/test_safe_conv.py checks value equality on every geometry the
models use and gradient-descent consistency of a mixed chain.
"""
from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

# Flip to use the lax strided/lhs-dilated formulations directly (e.g. to
# re-measure the backend bug); read once at import.
import os

SAFE_CONV = os.environ.get("MSTPU_SAFE_CONV", "1") not in ("", "0")


def strided_conv1d(x, w, stride: int, padding, dilation: int = 1):
    """conv_general_dilated(x, w, window_strides=(s,), padding=[p],
    rhs_dilation=(d,), dn=NWC/WIO/NWC) computed without strides.

    x: (B, T, C); w: (k, C, F); padding: (left, right).
    """
    p0, p1 = padding
    if stride == 1 or not SAFE_CONV:
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding=[(p0, p1)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))
    k, cin, cout = w.shape
    s = stride
    b, t, _ = x.shape
    keff = (k - 1) * dilation + 1
    t_out = (t + p0 + p1 - keff) // s + 1
    # pad, then right-pad to a multiple of s for the phase reshape
    xp = jnp.pad(x, ((0, 0), (p0, p1), (0, 0)))
    tpad = xp.shape[1]
    # packed kernel: tap q (at dilated offset q*dilation) lands in
    # phase (q*dilation) % s at packed displacement (q*dilation) // s
    q_off = np.arange(k) * dilation
    dd = q_off // s
    rr = q_off % s
    k2 = int(dd.max()) + 1
    # packed input index t' + dd must stay < ceil(tpad/s); ensure the
    # packed conv has enough rows for t' in [0, t_out)
    t2 = max(-(-tpad // s), t_out + k2 - 1)
    xp = jnp.pad(xp, ((0, 0), (0, t2 * s - tpad), (0, 0)))
    xp = xp.reshape(b, t2, s * cin)  # [t', r*?] -> index s*t' + r
    if dilation == 1:
        # tap q sits at (q // s, q % s): a plain zero-pad + reshape
        wp = jnp.pad(w, ((0, k2 * s - k), (0, 0), (0, 0)))
        wp = wp.reshape(k2, s, cin, cout)
    else:
        wp = jnp.zeros((k2, s, cin, cout), w.dtype)
        for q in range(k):
            wp = wp.at[int(dd[q]), int(rr[q])].set(w[q])
    wp = wp.reshape(k2, s * cin, cout)
    y = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y[:, :t_out]


def strided_conv2d(x, w, strides, padding):
    """2-D strided conv via stride-1 conv + subsampling slice.

    x: (B, H, W, C); w: (kh, kw, C, F); padding: ((ph, ph'), (pw, pw')).
    Discriminator stacks backprop generator gradients through their
    input-vjp, which for a strided conv is an lhs-dilated conv — the
    miscompiled op (module docstring). The slice form's input-vjp is a
    scatter + stride-1 conv vjp, both safe. Cost: sh*sw x the conv FLOPs
    (<= 3x for the discriminators' (3,1)/(1,2) strides, training-only).
    """
    sh, sw = strides
    if (sh == 1 and sw == 1) or not SAFE_CONV:
        return jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=list(padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, ::sh, ::sw]


def transpose_conv1d(x, w, stride: int, padding: int,
                     output_padding: int = 0):
    """Fractionally-strided conv without lhs_dilation (subpixel form).

    Matches conv_general_dilated(x, flip(w), window_strides=(1,),
    padding=[(k-1-p, k-1-p+op)], lhs_dilation=(s,), dn=NWC/WOI/NWC),
    i.e. torch ConvTranspose1d semantics with kernel w of shape
    (k, F, C) (k, out, in) and output length (T-1)*s - 2p + k + op.
    """
    k, cout, cin = w.shape
    s, p, op = stride, padding, output_padding
    if s == 1 or not SAFE_CONV:
        wf = jnp.flip(w, axis=0)
        return jax.lax.conv_general_dilated(
            x, wf, window_strides=(1,), padding=[(k - 1 - p, k - 1 - p + op)],
            lhs_dilation=(s,), dimension_numbers=("NWC", "WOI", "NWC"))
    b, t, _ = x.shape
    length = (t - 1) * s - 2 * p + k + op
    off = k - 1 - p
    # y[n] = sum_q wf[q] x[(n + q - off)/s] where s | (n + q - off);
    # wf[q] = w[k-1-q].  For n = s*t' + r the tap lands at input
    # displacement d = (r + q - off)/s.
    taps = []  # (q, r, d)
    for q in range(k):
        r = (off - q) % s
        d = (r + q - off) // s
        taps.append((q, r, d))
    dmin = min(d for _, _, d in taps)
    dmax = max(d for _, _, d in taps)
    k2 = dmax - dmin + 1
    t2 = -(-length // s)  # output rows needed
    # packed conv: y'[t'] reads xpad[t' + dd], dd in [0, k2); xpad must
    # cover t' + dd - (-dmin) ... pad left by -dmin, right to reach
    # t2 - 1 + dmax
    pad_l = -dmin
    pad_r = max(0, (t2 - 1) + dmax - (t - 1))
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    # the (q -> (d, r)) map is affine: q = (off - s + 1) + s*(d - ?) ...
    # concretely wp[d, :, r] = wf[base + s*(d - dmin) + (s - 1 - r)] with
    # wf = flip(w) and base = off - s + 1 + s*dmin, so the packing is a
    # zero-pad + reshape + phase flip (no scatters — they were a large
    # compile-time cost inside train graphs)
    wf = jnp.flip(w, axis=0)  # wf[q] = w[k-1-q], shape (k, cout, cin)
    base = off - s + 1 + s * dmin  # <= 0 by construction
    lo = -base
    hi = k2 * s - k - lo
    wpk = jnp.pad(wf, ((lo, hi), (0, 0), (0, 0)))  # (k2*s, cout, cin)
    wpk = wpk.reshape(k2, s, cout, cin)[:, ::-1]  # phase r = s-1-r'
    wp = jnp.transpose(wpk, (0, 3, 1, 2))  # (k2, cin, s, cout)
    wp = wp.reshape(k2, cin, s * cout)
    y = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"))  # (B, >=t2, s*cout)
    y = y[:, :t2].reshape(b, t2 * s, cout)
    return y[:, :length]


class Conv1dStrided(nn.Module):
    """Drop-in for nn.Conv(features, (k,), strides=(s,), padding="SAME")
    on stride-divisible lengths, built on the safe strided form."""
    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        in_ch = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, in_ch, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        t = x.shape[1]
        total = max((-(-t // s) - 1) * s + k - t, 0)
        lo = total // 2
        y = strided_conv1d(x, w, s, (lo, total - lo))
        return y + b


class ConvTranspose1dSafe(nn.Module):
    """Stride-s upsampling transpose conv (out = T*s for even s, k=2s),
    torch ConvTranspose1d semantics via the subpixel safe form."""
    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        in_ch = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, self.features, in_ch))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = (k - s) // 2
        y = transpose_conv1d(x, w, s, pad,
                             output_padding=(k - s) - 2 * pad)
        return y + b


class SlicedConv(nn.Module):
    """nn.Conv drop-in whose stride is realized by subsampling a
    stride-1 conv, keeping the input-vjp free of lhs-dilated convs
    (module docstring). Works for 1-D and 2-D; padding may be an int,
    "SAME" (computed for the strided geometry), or explicit pairs.
    Cost: prod(strides) x the conv FLOPs — used in encoders and
    discriminators where that is cheap relative to correctness."""
    features: int
    kernel_size: tuple
    strides: tuple = None
    padding: object = 0
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        ss = tuple(self.strides or (1,) * len(ks))
        if self.padding == "SAME":
            pads = []
            for i, (k, s) in enumerate(zip(ks, ss)):
                t = x.shape[1 + i]
                total = max((-(-t // s) - 1) * s + k - t, 0)
                pads.append((total // 2, total - total // 2))
        elif isinstance(self.padding, int):
            pads = [(self.padding, self.padding)] * len(ks)
        else:
            pads = [tuple(p) if isinstance(p, (tuple, list)) else (p, p)
                    for p in self.padding]
        # params live at THIS module's level with nn.Conv's names/shapes
        # so converters and checkpoints are unaffected by the swap
        in_ch = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       ks + (in_ch // self.feature_group_count,
                             self.features))
        dn = ("NWC", "WIO", "NWC") if len(ks) == 1 \
            else ("NHWC", "HWIO", "NHWC")
        run_strides = ss if not SAFE_CONV else (1,) * len(ks)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=run_strides, padding=pads,
            feature_group_count=self.feature_group_count,
            dimension_numbers=dn)
        if SAFE_CONV and any(s > 1 for s in ss):
            idx = (slice(None),) + tuple(slice(None, None, s) for s in ss)
            y = y[idx]
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y
