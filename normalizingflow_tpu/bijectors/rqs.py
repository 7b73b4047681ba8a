"""Monotone rational-quadratic spline (RQS) transforms, TPU-first.

Implements the spline math of Durkan et al. 2019 ("Neural Spline Flows") with
the exact normalization/flooring conventions of the reference implementation
(`/root/reference/nf/utils.py:27-152`, itself derived from bayesiains/nsf), but
re-designed for XLA/TPU:

  * no boolean fancy-indexing / masked scatter -- out-of-bound inputs are
    handled with a single `jnp.where` mask over the whole batch
    (reference: nf/utils.py:42-49 splits the batch with boolean masks);
  * `searchsorted` is a vectorized comparison-sum with a clamp instead of the
    reference's in-place `bin_locations[..., -1] += eps` mutation
    (nf/utils.py:20-25) -- same bin assignment at the right boundary, no side
    effects;
  * bin-parameter gathers are `take_along_axis` over a static last axis, which
    XLA lowers to efficient vector selects on TPU;
  * everything is shape-polymorphic over leading batch dims and jit/vmap/grad
    friendly (static shapes, no data-dependent control flow).

Numerics follow the reference exactly (nf/utils.py):
  widths  = softmax -> floor `min_bin_width`  (1e-3)        [utils.py:73-74]
  heights = softmax -> floor `min_bin_height` (1e-3)        [utils.py:84-85]
  derivs  = min_derivative + softplus(raw)    (1e-3)        [utils.py:82]
  boundary derivative raw value pinned to log(e^{1-min_d}-1) so the slope is
  exactly 1 at the tails                                    [utils.py:38-40]
  inverse via the stable quadratic root 2c / (-b - sqrt(disc)) [utils.py:120-124]
  log|det| = log(numerator) - 2*log(denominator)            [utils.py:134,151]

The asymmetric-domain variant ([in_l,in_r] -> [out_l,out_r]) of the reference's
`nf/utils_1.py:151-280` is covered by the general `left/right/bottom/top`
arguments here.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _normalize_bins(unnormalized, num_bins, min_size, lo, hi):
    """softmax-normalized bin sizes with a floor, mapped onto [lo, hi].

    Returns (cum_knots, sizes): knots has K+1 entries with endpoints pinned
    exactly to lo/hi, sizes = diff(knots).
    """
    probs = jax.nn.softmax(unnormalized, axis=-1)
    probs = min_size + (1.0 - min_size * num_bins) * probs
    cum = jnp.cumsum(probs, axis=-1)
    cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
    cum = (hi - lo) * cum + lo
    # Pin endpoints exactly (cumsum rounding can drift in fp32).
    cum = cum.at[..., 0].set(lo)
    cum = cum.at[..., -1].set(hi)
    sizes = cum[..., 1:] - cum[..., :-1]
    return cum, sizes


def _search_bins(knots, x):
    """Index of the bin containing x: sum(x >= knots) - 1, clamped to [0, K-1].

    Equivalent to the reference's searchsorted (nf/utils.py:20-25) including
    its right-boundary epsilon nudge: clamping sends x == right into the last
    bin without mutating the knot tensor.
    """
    idx = jnp.sum((x[..., None] >= knots).astype(jnp.int32), axis=-1) - 1
    return jnp.clip(idx, 0, knots.shape[-1] - 2)


def _gather(values, idx):
    """values[..., idx] along the last axis, one per batch element."""
    return jnp.take_along_axis(values, idx[..., None], axis=-1)[..., 0]


def rational_quadratic_spline(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    padded_derivatives,
    *,
    inverse=False,
    left=0.0,
    right=1.0,
    bottom=0.0,
    top=1.0,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
):
    """Core RQS transform on the in-domain region (no tails).

    Args:
      inputs: (...,) points, assumed inside [left, right] (forward) or
        [bottom, top] (inverse). Callers clamp before calling.
      unnormalized_widths / heights: (..., K) raw bin logits.
      padded_derivatives: (..., K+1) *post-softplus-floored* positive knot
        derivatives (callers apply `min_derivative + softplus` and boundary
        pinning; see `unconstrained_rqs`).

    Returns: (outputs, logabsdet), both shaped like `inputs`.
    """
    num_bins = unnormalized_widths.shape[-1]

    cumwidths, widths = _normalize_bins(
        unnormalized_widths, num_bins, min_bin_width, left, right
    )
    cumheights, heights = _normalize_bins(
        unnormalized_heights, num_bins, min_bin_height, bottom, top
    )
    derivatives = padded_derivatives

    bin_idx = _search_bins(cumheights if inverse else cumwidths, inputs)

    in_cumwidths = _gather(cumwidths, bin_idx)
    in_widths = _gather(widths, bin_idx)
    in_cumheights = _gather(cumheights, bin_idx)
    in_heights = _gather(heights, bin_idx)
    in_delta = in_heights / in_widths
    in_d = _gather(derivatives, bin_idx)          # derivative at left knot
    in_d1 = _gather(derivatives[..., 1:], bin_idx)  # derivative at right knot

    s_pm = in_d + in_d1 - 2.0 * in_delta  # recurring term

    if inverse:
        dy = inputs - in_cumheights
        a = dy * s_pm + in_heights * (in_delta - in_d)
        b = in_heights * in_d - dy * s_pm
        c = -in_delta * dy
        discriminant = b * b - 4.0 * a * c
        # Stable root: theta = 2c / (-b - sqrt(disc))   [nf/utils.py:123]
        root = (2.0 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * in_widths + in_cumwidths
        theta_1m = root * (1.0 - root)
        denominator = in_delta + s_pm * theta_1m
        derivative_numerator = (in_delta * in_delta) * (
            in_d1 * root * root
            + 2.0 * in_delta * theta_1m
            + in_d * (1.0 - root) * (1.0 - root)
        )
        logabsdet = jnp.log(derivative_numerator) - 2.0 * jnp.log(denominator)
        return outputs, -logabsdet

    theta = (inputs - in_cumwidths) / in_widths
    theta_1m = theta * (1.0 - theta)
    numerator = in_heights * (in_delta * theta * theta + in_d * theta_1m)
    denominator = in_delta + s_pm * theta_1m
    outputs = in_cumheights + numerator / denominator
    derivative_numerator = (in_delta * in_delta) * (
        in_d1 * theta * theta
        + 2.0 * in_delta * theta_1m
        + in_d * (1.0 - theta) * (1.0 - theta)
    )
    logabsdet = jnp.log(derivative_numerator) - 2.0 * jnp.log(denominator)
    return outputs, logabsdet


def unconstrained_rqs(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    *,
    inverse=False,
    left=None,
    right=None,
    bottom=None,
    top=None,
    tail_bound=1.0,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
):
    """RQS with identity linear tails outside the domain.

    Mirrors `unconstrained_RQS` of nf/utils.py:27-56 (symmetric tail_bound) and
    the asymmetric-bounds variant of nf/utils_1.py:151-210 (explicit
    left/right/bottom/top). Out-of-domain inputs pass through unchanged with
    log-det 0 (nf/utils.py:42-43), realised here with a single `where` mask
    instead of boolean scatter.

    Args:
      unnormalized_derivatives: (..., K-1) raw inner-knot derivative logits;
        the two boundary derivatives are pinned so the tail slope is exactly 1.
    """
    if left is None:
        left, right = -tail_bound, tail_bound
    if bottom is None:
        bottom, top = left, right

    dtype = inputs.dtype
    lo, hi = (bottom, top) if inverse else (left, right)
    inside = (inputs >= lo) & (inputs <= hi)

    # Pin boundary derivatives: raw value c such that min_d + softplus(c) = 1.
    constant = math.log(math.expm1(1.0 - min_derivative))
    pad_shape = unnormalized_derivatives.shape[:-1] + (1,)
    pad = jnp.full(pad_shape, constant, dtype=unnormalized_derivatives.dtype)
    padded_raw = jnp.concatenate([pad, unnormalized_derivatives, pad], axis=-1)
    derivatives = min_derivative + jax.nn.softplus(padded_raw)

    safe_inputs = jnp.clip(inputs, lo, hi)
    outputs_in, logdet_in = rational_quadratic_spline(
        safe_inputs,
        unnormalized_widths,
        unnormalized_heights,
        derivatives,
        inverse=inverse,
        left=left,
        right=right,
        bottom=bottom,
        top=top,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
    )
    outputs = jnp.where(inside, outputs_in, inputs)
    logabsdet = jnp.where(inside, logdet_in, jnp.zeros_like(logdet_in, dtype))
    return outputs, logabsdet


# ---------------------------------------------------------------------------
# Accelerated dispatch: on TPU, large spline evaluations route to the fused
# Pallas kernel (ops/rqs_pallas.py; ~6x faster than the XLA lowering of
# this file in isolated microbenches). Small/CPU calls and all gradients
# use the jnp path above. Toggle with `set_fused_rqs`.
#
# Gate calibration (r5, BENCH spline_flow A/B): in situ, inside a fused
# train step at physics shape (batch 1024 x 64 transformed scalars), the
# kernel is a 0.95x SLOWDOWN -- the custom_vjp backward is the jnp path
# either way and the pallas_call is an XLA fusion barrier, so the
# microbench win inverts exactly like the r3 accept-fusion episode. The
# gate therefore engages only at inference-scale flat batches (>= 128k
# elements, e.g. the chains*draws latent->data push), where the fused
# VMEM pipeline's HBM savings dominate.
_FUSED_ENABLED = True
_FUSED_MIN_ELEMENTS = 131072


def set_fused_rqs(enabled, min_elements=None):
    """Toggle the fused Pallas dispatch; optionally override the size gate.

    `min_elements=1` forces the kernel even for per-element-small callers
    (e.g. chain-vmapped HMC pullbacks, where the custom_vmap rule collapses
    the chain axis into kernel rows but this gate sees the per-element
    shape) -- used by bench.py's in-situ kernel A/B. Trace-time flags: jit
    caches capture the setting, so re-jit after toggling."""
    global _FUSED_ENABLED, _FUSED_MIN_ELEMENTS
    _FUSED_ENABLED = bool(enabled)
    if min_elements is not None:
        _FUSED_MIN_ELEMENTS = int(min_elements)


def apply_rqs(inputs, w, h, d, *, inverse=False, tail_bound=None, left=None,
              right=None, bottom=None, top=None):
    """unconstrained_rqs with automatic Pallas acceleration on TPU.

    Safe under vmap: the fused kernel carries a jax.custom_batching rule
    (ops/rqs_pallas._fused_elementwise) that collapses batch dims into
    rows, so no tracer introspection is needed here. Note the element-size
    gate below sees the PER-ELEMENT shape under vmap, so small vmapped
    elements keep the jnp path even when the total batched work is large --
    vmapped callers wanting the kernel should pass full batches as rows.
    """
    if tail_bound is not None:
        left, right = -tail_bound, tail_bound
        bottom, top = left, right
    if bottom is None:
        bottom, top = left, right
    n = 1
    for s in inputs.shape:
        n *= s
    if (
        _FUSED_ENABLED
        and n >= _FUSED_MIN_ELEMENTS
        and jax.default_backend() == "tpu"
    ):
        from ..ops.rqs_pallas import unconstrained_rqs_fused

        return unconstrained_rqs_fused(
            inputs, w, h, d, inverse, float(left), float(right),
            float(bottom), float(top), False,
        )
    return unconstrained_rqs(
        inputs, w, h, d, inverse=inverse, left=left, right=right,
        bottom=bottom, top=top,
    )


def split_spline_params(raw, num_bins):
    """Split a (..., 3K-1) conditioner output into (W, H, D) raw params.

    Matches `torch.split(out, K)` of nf/flows.py:184: first K are width
    logits, next K height logits, last K-1 inner derivative logits.
    """
    w = raw[..., :num_bins]
    h = raw[..., num_bins : 2 * num_bins]
    d = raw[..., 2 * num_bins :]
    return w, h, d
