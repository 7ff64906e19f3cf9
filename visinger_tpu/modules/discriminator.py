"""Multi-period + scale discriminators (HiFi-GAN style).

Parity target: reference modules/discriminator.py and
MultiPeriodDiscriminator (models/visinger.py:138-158):
  - DiscriminatorP (period p): reflect-pad time to a multiple of p, fold
    1D -> 2D [B, T/p, p, 1], 5 weight-norm (5,1)-kernel stride-(3,1) convs
    with channels 32->128->512->1024->1024, then a (3,1) post conv; returns
    the flattened score plus 6 feature maps.
  - DiscriminatorS: 6 grouped strided 1-D convs (k 15/41/5) + post.
  - The ensemble is 1 x S + one P per period in (2, 3, 5, 7, 11).

Layout is channels-last; the period fold maps to NHWC so the (5,1) convs
run on the MXU.  ``use_spectral_norm`` switches the conv parameterization to
the stateless spectral norm in modules/common.py (reference default is
weight norm, config use_spectral_norm: false).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from visinger_tpu.modules.common import LRELU_SLOPE, Conv1d, Conv2dP


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Sequence[int] = (32, 128, 512, 1024)  # reference widths
    dtype: jnp.dtype = jnp.float32
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        """x: [B, T] waveform -> (score [B, N], fmaps list)."""
        b, t = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // p, p, 1).astype(self.dtype)  # NHWC
        sn = self.use_spectral_norm
        fmap = []
        for i, ch in enumerate(self.channels):
            x = Conv2dP(ch, self.kernel_size, self.stride, dtype=self.dtype,
                        weight_norm=not sn, spectral_norm=sn,
                        name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2dP(self.channels[-1], self.kernel_size, 1, dtype=self.dtype,
                    weight_norm=not sn, spectral_norm=sn, name="conv_4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2dP(1, 3, 1, dtype=self.dtype, weight_norm=not sn,
                    spectral_norm=sn, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    base: int = 16  # reference widths: 16/64/256/1024/1024/1024
    dtype: jnp.dtype = jnp.float32
    use_spectral_norm: bool = False
    grouped_impl: str = "native"  # see common.Conv1d.grouped_impl

    @nn.compact
    def __call__(self, x: jax.Array):
        """x: [B, T] waveform -> (score [B, N], fmaps list)."""
        b = x.shape[0]
        x = x[..., None].astype(self.dtype)  # [B, T, 1]
        m = self.base
        specs = [
            (m, 15, 1, 1),
            (4 * m, 41, 4, 4),
            (16 * m, 41, 4, 16),
            (64 * m, 41, 4, 64),
            (64 * m, 41, 4, min(256, 16 * m)),
            (64 * m, 5, 1, 1),
        ]
        sn = self.use_spectral_norm
        fmap = []
        for i, (ch, k, s, groups) in enumerate(specs):
            pad = 7 if k == 15 else (20 if k == 41 else 2)
            x = Conv1d(ch, k, stride=s, groups=groups, padding=pad,
                       weight_norm=not sn, spectral_norm=sn,
                       grouped_impl=self.grouped_impl,
                       dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(1, 3, weight_norm=not sn, spectral_norm=sn,
                   dtype=self.dtype, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    s_base: int = 16                                  # DiscriminatorS width
    p_channels: Sequence[int] = (32, 128, 512, 1024)  # DiscriminatorP widths
    dtype: jnp.dtype = jnp.float32
    use_spectral_norm: bool = False
    grouped_impl: str = "native"  # see common.Conv1d.grouped_impl
    # Run each sub-discriminator ONCE on concat([real, fake]) instead of
    # twice on batch-B inputs: convs are batch-parallel (no batch coupling
    # anywhere in the stacks), so the math is identical while the kernel
    # count halves and every conv runs at 2B — better MXU occupancy at the
    # reference's small batches.  Exactness-tested vs pair=False
    # (tests/test_modules.py); config key disc_pair_batch.
    pair_batch: bool = True

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        """Returns (real_scores, fake_scores, real_fmaps, fake_fmaps)."""
        discs = [DiscriminatorS(base=self.s_base, dtype=self.dtype,
                                use_spectral_norm=self.use_spectral_norm,
                                grouped_impl=self.grouped_impl,
                                name="disc_s")] + [
            DiscriminatorP(p, channels=tuple(self.p_channels),
                           dtype=self.dtype,
                           use_spectral_norm=self.use_spectral_norm,
                           name=f"disc_p{p}")
            for p in self.periods
        ]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        if self.pair_batch:
            b = y.shape[0]
            pair = jnp.concatenate([y, y_hat], 0)
            for d in discs:
                s, f = d(pair)
                y_d_rs.append(s[:b])
                y_d_gs.append(s[b:])
                fmap_rs.append([a[:b] for a in f])
                fmap_gs.append([a[b:] for a in f])
            return y_d_rs, y_d_gs, fmap_rs, fmap_gs
        for d in discs:
            sr, fr = d(y)
            sg, fg = d(y_hat)
            y_d_rs.append(sr)
            y_d_gs.append(sg)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
