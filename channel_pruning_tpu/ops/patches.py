"""Point-wise activation/patch gathering on device.

TPU-native replacement for the reference's per-batch Python loops that sample
conv responses at random spatial points (lib/net.py:368-532 extract_features)
and extract the corresponding k x k im2col input patches
(lib/net.py:534-684 extract_XY). Both become pure gathers inside the jitted
forward: only the small sampled matrices leave the device.

Row-order contract used throughout the framework: for a chunk of B images and
P points, rows are ordered (point-major) as row = p * B + b. X patches and Y
responses gathered with the same (points, chunk) therefore correspond
row-for-row, which is all the solvers need.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_channels_at_points(x: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample channel vectors at spatial points.

    x: (B, C, H, W); ys/xs: (P,) int32. Returns (P*B, C) with row = p*B + b
    (reference stores the (nPoints*batchsize, C) slab per batch,
    lib/net.py:509-516).
    """
    sub = x[:, :, ys, xs]                     # (B, C, P)
    return jnp.transpose(sub, (2, 0, 1)).reshape(-1, x.shape[1])


def gather_patches_at_points(x: jax.Array, ys: jax.Array, xs: jax.Array,
                             kernel: tuple[int, int], stride: tuple[int, int],
                             pad: tuple[int, int]) -> jax.Array:
    """Extract the k x k input patch feeding each sampled output point.

    x: (B, C, H, W) the conv's *input*; ys/xs: (P,) sampled *output*
    coordinates. Returns (P*B, C, kh, kw), row = p*B + b — the
    im2col-at-points contract of extract_XY (lib/net.py:564-632). Conv
    zero-padding (net.py:631-632) is realised by CLAMP + MASK instead of
    materialising a padded copy of x — padding an HBM-resident whole-set
    frontier (sampling/rolling.py) would double its footprint.
    """
    kh, kw = kernel
    sh, sw = stride
    ph, pw = pad
    H, W = x.shape[2], x.shape[3]
    h0 = ys * sh - ph                          # (P,) may be negative
    w0 = xs * sw - pw
    rows = h0[:, None] + jnp.arange(kh)[None, :]          # (P, kh)
    cols = w0[:, None] + jnp.arange(kw)[None, :]          # (P, kw)
    rmask = (rows >= 0) & (rows < H)
    cmask = (cols >= 0) & (cols < W)
    rc = jnp.clip(rows, 0, H - 1)
    cc = jnp.clip(cols, 0, W - 1)
    # advanced-index gather: (B, C, P, kh, kw)
    sub = x[:, :, rc[:, :, None], cc[:, None, :]]
    mask = (rmask[:, :, None] & cmask[:, None, :]).astype(x.dtype)  # (P,kh,kw)
    sub = sub * mask[None, None]
    return jnp.transpose(sub, (2, 0, 1, 3, 4)).reshape(
        -1, x.shape[1], kh, kw)


def conv_response_at_points(patches: jax.Array, W: jax.Array,
                            b: jax.Array | None = None) -> jax.Array:
    """Y[n, o] = <patches[n], W[o]> (+ b): one MXU matmul over the flattened
    patch dim. patches: (N, C, kh, kw), W: (O, C, kh, kw) -> (N, O)."""
    N = patches.shape[0]
    out = jnp.dot(patches.reshape(N, -1), W.reshape(W.shape[0], -1).T,
                  preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out
