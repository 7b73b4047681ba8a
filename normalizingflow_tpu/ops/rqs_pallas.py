"""Fused Pallas TPU kernel for the rational-quadratic spline transform.

The RQS transform (bijectors/rqs.py) is the VPU hot op of every spline flow:
per scalar input it runs two softmaxes, two cumulative sums, a bin search,
four gathers, and a rational-quadratic evaluation over (N, K) parameter
blocks. Under plain XLA each intermediate (normalized widths/heights, knot
prefix sums, padded derivatives) round-trips HBM; this kernel fuses the whole
pipeline into one VMEM-resident pass per (TILE_N, K) block:

  HBM reads:  x (N,), w/h (N, K), d (N, K-1)       -- the minimum possible
  HBM writes: y (N,), logdet (N,)

Gathers become one-hot multiply-reduce (VPU-friendly; no dynamic indexing),
the bin search is a sum of lane-wise comparisons, and tails are folded in
with `where` masks, so the kernel is branch-free.

Training gradients: `unconstrained_rqs_fused` is wrapped in jax.custom_vjp
-- the forward runs this kernel, the backward autodiffs the reference jnp
implementation (bijectors/rqs.py), so numerics of the VJP are identical to
the tested pure-JAX path.

Numerics match bijectors/rqs.py bit-for-bit in formula (same min-bin floors,
boundary-derivative pinning, stable inverse root) -- verified by
tests/test_rqs_pallas.py against the jnp implementation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..bijectors import rqs as rqs_ref

DEFAULT_MIN_BIN_WIDTH = rqs_ref.DEFAULT_MIN_BIN_WIDTH
DEFAULT_MIN_BIN_HEIGHT = rqs_ref.DEFAULT_MIN_BIN_HEIGHT
DEFAULT_MIN_DERIVATIVE = rqs_ref.DEFAULT_MIN_DERIVATIVE

TILE_N = 1024


def _rqs_kernel(x_ref, w_ref, h_ref, d_ref, y_ref, ld_ref, *, inverse,
                left, right, bottom, top, min_bw, min_bh, min_d):
    x = x_ref[:]              # (TILE,)
    w_raw = w_ref[:]          # (TILE, K)
    h_raw = h_ref[:]          # (TILE, K)
    d_raw = d_ref[:]          # (TILE, K-1)
    K = w_raw.shape[-1]

    # --- bin widths/heights: softmax + floor + affine onto the domain ------
    # prefix sums as a triangular-ones matmul: robustly supported by Mosaic
    # (lane-axis cumsum is not), and it rides the MXU.
    tri = jnp.triu(jnp.ones((K, K), x.dtype))

    def norm_bins(raw, min_size, lo, hi):
        m = jnp.max(raw, axis=-1, keepdims=True)
        e = jnp.exp(raw - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        sizes = (min_size + (1.0 - min_size * K) * probs) * (hi - lo)
        # HIGHEST precision: the MXU's default bf16 passes round the knot
        # positions enough to flip bin assignments (and NaN the log-det).
        cum = jnp.dot(
            sizes, tri, preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        ) + lo
        return cum, sizes                               # cum: right knots

    cumw, widths = norm_bins(w_raw, min_bw, left, right)
    cumh, heights = norm_bins(h_raw, min_bh, bottom, top)

    # --- derivatives: softplus + floor, boundary slots pinned to 1 ---------
    d_inner = min_d + jax.nn.softplus(d_raw)           # (TILE, K-1)

    # --- bin search: idx = #knots strictly left of x, in [0, K-1] ----------
    lo, hi = (bottom, top) if inverse else (left, right)
    inside = (x >= lo) & (x <= hi)
    xs = jnp.clip(x, lo, hi)
    cum_sel = cumh if inverse else cumw
    # right-knot array: bin k covers (knot_{k-1}, knot_k]; idx = sum(xs > knot_k)
    idx = jnp.sum(
        (xs[:, None] > cum_sel).astype(jnp.int32), axis=-1
    )
    idx = jnp.minimum(idx, K - 1)

    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], K), 1)
        == idx[:, None]
    )

    def gather(v):
        return jnp.sum(jnp.where(onehot, v, 0.0), axis=-1)

    in_w = gather(widths)
    in_h = gather(heights)
    in_cw = gather(cumw) - in_w     # left width-knot of the bin
    in_ch = gather(cumh) - in_h     # left height-knot of the bin
    in_delta = in_h / in_w
    # derivative at knot k: 1.0 at the boundaries (k=0 or k=K), inner else.
    # left knot of bin idx is knot idx; right knot is idx+1.
    def knot_deriv(k_idx):
        is_boundary = (k_idx == 0) | (k_idx == K)
        inner_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], K - 1), 1)
            == (k_idx - 1)[:, None]
        )
        inner = jnp.sum(jnp.where(inner_oh, d_inner, 0.0), axis=-1)
        return jnp.where(is_boundary, 1.0, inner)

    in_d = knot_deriv(idx)
    in_d1 = knot_deriv(idx + 1)

    s_pm = in_d + in_d1 - 2.0 * in_delta

    if inverse:
        dy = xs - in_ch
        a = dy * s_pm + in_h * (in_delta - in_d)
        b = in_h * in_d - dy * s_pm
        c = -in_delta * dy
        disc = b * b - 4.0 * a * c
        root = (2.0 * c) / (-b - jnp.sqrt(disc))
        y = root * in_w + in_cw
        t1m = root * (1.0 - root)
        den = in_delta + s_pm * t1m
        num = (in_delta * in_delta) * (
            in_d1 * root * root + 2.0 * in_delta * t1m
            + in_d * (1.0 - root) * (1.0 - root)
        )
        ld = -(jnp.log(num) - 2.0 * jnp.log(den))
    else:
        theta = (xs - in_cw) / in_w
        t1m = theta * (1.0 - theta)
        num_y = in_h * (in_delta * theta * theta + in_d * t1m)
        den = in_delta + s_pm * t1m
        y = in_ch + num_y / den
        num = (in_delta * in_delta) * (
            in_d1 * theta * theta + 2.0 * in_delta * t1m
            + in_d * (1.0 - theta) * (1.0 - theta)
        )
        ld = jnp.log(num) - 2.0 * jnp.log(den)

    y_ref[:] = jnp.where(inside, y, x)
    ld_ref[:] = jnp.where(inside, ld, 0.0)


def _pad_rows(a, n_pad):
    return jnp.pad(a, ((0, n_pad),) + ((0, 0),) * (a.ndim - 1))


@functools.partial(
    jax.jit,
    static_argnames=("inverse", "left", "right", "bottom", "top",
                     "interpret"),
)
def rqs_pallas_flat(x, w, h, d, *, inverse=False, left=-1.0, right=1.0,
                    bottom=-1.0, top=1.0, interpret=False):
    """Flat (N,) / (N, K) fused RQS. Returns (y, logdet)."""
    n = x.shape[0]
    n_pad = (-n) % TILE_N
    xp, wp, hp, dp = (
        _pad_rows(x, n_pad), _pad_rows(w, n_pad), _pad_rows(h, n_pad),
        _pad_rows(d, n_pad),
    )
    n_total = n + n_pad
    K = w.shape[-1]
    grid = (n_total // TILE_N,)
    kernel = functools.partial(
        _rqs_kernel, inverse=inverse, left=left, right=right,
        bottom=bottom, top=top, min_bw=DEFAULT_MIN_BIN_WIDTH,
        min_bh=DEFAULT_MIN_BIN_HEIGHT, min_d=DEFAULT_MIN_DERIVATIVE,
    )
    y, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N,), lambda i: (i,)),
            pl.BlockSpec((TILE_N, K), lambda i: (i, 0)),
            pl.BlockSpec((TILE_N, K), lambda i: (i, 0)),
            pl.BlockSpec((TILE_N, K - 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N,), lambda i: (i,)),
            pl.BlockSpec((TILE_N,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_total,), x.dtype),
            jax.ShapeDtypeStruct((n_total,), x.dtype),
        ],
        interpret=interpret,
    )(xp, wp, hp, dp)
    return y[:n], ld[:n]


def _ref_unconstrained(x, w, h, d, inverse, left, right, bottom, top):
    return rqs_ref.unconstrained_rqs(
        x, w, h, d, inverse=inverse, left=left, right=right, bottom=bottom,
        top=top,
    )


@functools.lru_cache(maxsize=None)
def _fused_elementwise(inverse, left, right, bottom, top, interpret):
    """custom_vmap-wrapped fused transform for ONE static spline config.

    The pallas_call's default vmap rule prepends a block-size-1 grid dim --
    illegal under the TPU (8, 128) tiling of our row blocks -- so vmap gets
    an explicit rule instead: broadcast any unbatched operand to the batch
    and recurse. The transform is elementwise over leading dims, so
    batching IS just 'stack the rows'. This replaces round-2's BatchTracer
    introspection in bijectors.rqs (VERDICT r2 item 8) and covers
    vmap-of-jit and nested-vmap callers too.

    Sits INSIDE the custom_vjp primal below: autodiff then never has to
    linearize through custom_vmap (which jax does not support); vmapped
    gradients batch the custom_vjp fwd/bwd, and the fwd re-enters this rule.
    """
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fused(x, w, h, d):
        K = w.shape[-1]
        y, ld = rqs_pallas_flat(
            x.reshape(-1), w.reshape(-1, K), h.reshape(-1, K),
            d.reshape(-1, K - 1), inverse=inverse, left=left, right=right,
            bottom=bottom, top=top, interpret=interpret,
        )
        return y.reshape(x.shape), ld.reshape(x.shape)

    @fused.def_vmap
    def _rule(axis_size, in_batched, x, w, h, d):  # noqa: ARG001
        ops = [
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip((x, w, h, d), in_batched)
        ]
        return fused(*ops), (True, True)

    return fused


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def unconstrained_rqs_fused(x, w, h, d, inverse=False, left=-1.0, right=1.0,
                            bottom=-1.0, top=1.0, interpret=False):
    """Drop-in fused version of bijectors.rqs.unconstrained_rqs.

    Accepts arbitrary leading batch shape; params (..., K)/(..., K-1).
    Forward runs the Pallas kernel; backward autodiffs the jnp reference.
    vmap-safe via _fused_elementwise's custom batching rule.
    """
    return _fused_elementwise(
        bool(inverse), float(left), float(right), float(bottom), float(top),
        bool(interpret),
    )(x, w, h, d)


def _fused_fwd(x, w, h, d, inverse, left, right, bottom, top, interpret):
    out = unconstrained_rqs_fused(
        x, w, h, d, inverse, left, right, bottom, top, interpret
    )
    return out, (x, w, h, d)


def _fused_bwd(inverse, left, right, bottom, top, interpret, residuals, g):
    x, w, h, d = residuals
    _, vjp = jax.vjp(
        lambda x, w, h, d: _ref_unconstrained(
            x, w, h, d, inverse, left, right, bottom, top
        ),
        x, w, h, d,
    )
    return vjp(g)


unconstrained_rqs_fused.defvjp(_fused_fwd, _fused_bwd)
