"""Autoregressive bijectors: RQS spline AR ("NSF_AR") and affine AR ("MAF").

TPU-first restructure of the reference's autoregressive flows
(/root/reference/nf/flows.py:152-209, nf/flows_1.py:159-202). The reference
evaluates a separate conditioner MLP per dimension inside a Python `for` loop
in *both* directions -- O(dim) kernel launches per call. Here:

  * forward (density evaluation / training): all conditioner inputs are known
    up front, so every dimension's MLP runs in ONE batched einsum over stacked
    per-dim weights -- a single MXU contraction of shape
    (dim-1, batch, features) x (dim-1, features, hidden). The per-dim
    autoregressive masking is applied to the stacked weight rows, which keeps
    the math identical to the reference's ragged per-dim inputs (masked rows
    contribute exactly zero and receive zero gradient).
  * inverse (sampling): inherently sequential in dim; implemented as a single
    `lax.scan` over dimensions with one fused step body (compare
    nf/flows.py:193-209's per-dim Python loop).

Weight layout: the reference gives dim i its own MLP with input width 2i
(trig features of dims < i, nf/flows.py:166,183). We stack those into dense
(dim-1, F, hidden) tensors with F = 2*(dim-1) (periodic) or dim-1 (plain),
feature order [f(x_0)..f(x_{dim-2}), g(x_0)..g(x_{dim-2})], and zero-mask the
rows >= the autoregressive cutoff. Initialization scales each dim's weights by
its *effective* fan-in, matching torch.nn.Linear's default on the ragged
reference shapes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import Bijector
from .rqs import apply_rqs, split_spline_params, unconstrained_rqs


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -1.0, 1.0) * bound


# The TPU compiler fully unrolls statically-bounded loops with trip counts
# roughly in [130, 1500] (see CLAUDE.md): an AR inverse at dim 162 (Fe,
# 161-step scan) compiles for minutes and bloats the HLO. Keep every scan's
# trip count <= this by nesting (outer chunks x inner steps).
_SCAN_CHUNK = 128


def _chunked_index_scan(step, carry, dim, chunk=_SCAN_CHUNK):
    """Run `step(carry, i) -> (carry, None)` for i = 1..dim-1 with every
    lax.scan trip count <= chunk.

    For dim-1 > chunk the index range is padded to n_outer*c (c <= chunk) and
    scanned as a 2-level nest; padded steps run `step` with i clamped to
    dim-1 (idempotent for AR inverses: all inputs of dim-1 are already
    final) and their carry update is masked out, so results are identical to
    the flat scan.
    """
    n = dim - 1
    if n <= chunk:
        carry, _ = jax.lax.scan(step, carry, jnp.arange(1, dim))
        return carry
    n_outer = -(-n // chunk)
    c = -(-n // n_outer)
    pad = n_outer * c - n
    idx = jnp.concatenate(
        [jnp.arange(1, dim), jnp.full((pad,), dim, dtype=jnp.int32)]
    ).reshape(n_outer, c)

    def masked_step(carry, i):
        valid = i < dim
        new_carry, _ = step(carry, jnp.minimum(i, dim - 1))
        carry = jax.tree.map(
            lambda new, old: jnp.where(valid, new, old), new_carry, carry
        )
        return carry, None

    def outer(carry, idx_chunk):
        carry, _ = jax.lax.scan(masked_step, carry, idx_chunk)
        return carry, None

    carry, _ = jax.lax.scan(outer, carry, idx)
    return carry


class _MaskedStackedMLPs:
    """dim-1 independent 3-layer tanh MLPs with autoregressive input masking.

    MLP i (i = 1..dim-1) sees only the features of dims < i. All weights are
    stacked on a leading axis; `row_mask[i-1, f]` is 1 where feature f is
    visible to MLP i.
    """

    def __init__(self, dim, out_dim, hidden_dim, periodic):
        self.dim = dim
        self.out_dim = out_dim
        self.hidden = hidden_dim
        self.periodic = periodic
        self.n_base = dim - 1            # feature slots per trig branch
        self.n_feat = (2 if periodic else 1) * self.n_base
        self.n_mlps = dim - 1

    def feature_mask(self, cutoff):
        """(n_feat,) 0/1 mask of features visible below `cutoff` (traced ok)."""
        base = (jnp.arange(self.n_base) < cutoff).astype(jnp.float32)
        return jnp.concatenate([base, base]) if self.periodic else base

    def row_masks(self):
        """(n_mlps, n_feat) static mask matrix; row i-1 = mask for MLP i."""
        i = jnp.arange(1, self.dim)[:, None]
        base = (jnp.arange(self.n_base)[None, :] < i).astype(jnp.float32)
        return jnp.concatenate([base, base], axis=1) if self.periodic else base

    def init(self, key, dtype=jnp.float32):
        n, F, H, O = self.n_mlps, self.n_feat, self.hidden, self.out_dim
        ks = jax.random.split(key, 6)
        # Effective fan-in for MLP i is (2 if periodic else 1)*i.
        fan_in = jnp.arange(1, self.dim, dtype=dtype) * (2.0 if self.periodic else 1.0)
        bound1 = (1.0 / jnp.sqrt(fan_in))[:, None, None]
        w1 = _uniform(ks[0], (n, F, H), 1.0, dtype) * bound1
        b1 = _uniform(ks[1], (n, H), 1.0, dtype) * bound1[:, :, 0]
        bh = 1.0 / math.sqrt(H)
        w2 = _uniform(ks[2], (n, H, H), bh, dtype)
        b2 = _uniform(ks[3], (n, H), bh, dtype)
        w3 = _uniform(ks[4], (n, H, O), bh, dtype)
        b3 = _uniform(ks[5], (n, O), bh, dtype)
        return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3}

    def apply_all(self, params, feats):
        """Run all dim-1 MLPs at once: feats (B, F) -> (n_mlps, B, out)."""
        w1m = params["w1"] * self.row_masks()[:, :, None]
        h = jnp.tanh(
            jnp.einsum("bf,ifh->ibh", feats, w1m) + params["b1"][:, None, :]
        )
        h = jnp.tanh(
            jnp.einsum("ibh,ihg->ibg", h, params["w2"]) + params["b2"][:, None, :]
        )
        return (
            jnp.einsum("ibh,iho->ibo", h, params["w3"]) + params["b3"][:, None, :]
        )

    def apply_one(self, params, feats, i):
        """Run MLP `i` (traced index, 1..dim-1): feats (B, F) -> (B, out).

        feats must already be masked to dims < i by the caller.
        """
        idx = i - 1
        w1 = params["w1"][idx]
        h = jnp.tanh(feats @ w1 + params["b1"][idx])
        h = jnp.tanh(h @ params["w2"][idx] + params["b2"][idx])
        return h @ params["w3"][idx] + params["b3"][idx]


class SplineAR(Bijector):
    """Autoregressive rational-quadratic spline flow ("NSF_AR").

    Semantics follow /root/reference/nf/flows.py:152-209: dimension 0 is
    transformed by a learnable parameter vector `init_raw` (3K-1 entries,
    uniform(-1/2, 1/2) init, flows.py:164-170); dimension i >= 1 gets its
    spline parameters from an MLP on the periodic trig embedding
    [cos(pi*x_j/B), sin(pi*x_j/B)]_{j<i} of the preceding dims
    (flows.py:172-173). Raw parameters pass through softmax*2B / softplus in
    the layer (flows.py:185-187) and are then re-normalized inside the spline,
    reproducing the reference's double-normalization pipeline exactly.

    `periodic=False` reproduces the plain-embedding variant
    (nf/flows_1.py:395-465) which feeds raw x_{<i}. `input_bounds` /
    `output_bounds` enable the asymmetric-domain variant
    (nf/flows_1.py:265-333 + nf/utils_1.py:151-280): the spline maps
    [in_l, in_r] -> [out_l, out_r] with identity tails outside.
    """

    def __init__(self, dim, num_bins=32, tail_bound=3.0, hidden_dim=800,
                 periodic=True, input_bounds=None, output_bounds=None):
        self.dim = int(dim)
        self.num_bins = int(num_bins)
        self.tail_bound = float(tail_bound)
        if input_bounds is None:
            input_bounds = (-self.tail_bound, self.tail_bound)
        if output_bounds is None:
            output_bounds = tuple(input_bounds)
        self.input_bounds = (float(input_bounds[0]), float(input_bounds[1]))
        self.output_bounds = (float(output_bounds[0]), float(output_bounds[1]))
        self.width = (self.input_bounds[1] - self.input_bounds[0]) / 2.0
        self.height = (self.output_bounds[1] - self.output_bounds[0]) / 2.0
        self.hidden_dim = int(hidden_dim)
        self.periodic = bool(periodic)
        self.cond = _MaskedStackedMLPs(
            self.dim, 3 * self.num_bins - 1, self.hidden_dim, self.periodic
        )

    def init(self, key):
        k0, k1 = jax.random.split(key)
        params = {
            "init_raw": _uniform(k0, (3 * self.num_bins - 1,), 0.5),
        }
        if self.dim > 1:
            params["cond"] = self.cond.init(k1)
        return params

    # -- feature embedding -------------------------------------------------
    def _features(self, x):
        """(B, dim) -> (B, F) embedding of the first dim-1 coordinates."""
        base = x[:, : self.dim - 1]
        if not self.periodic:
            return base
        ang = jnp.pi * base / self.width
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1)

    def _prep_spline(self, raw):
        """Layer-level parameter pipeline of nf/flows.py:185-187."""
        w, h, d = split_spline_params(raw, self.num_bins)
        w = 2.0 * self.width * jax.nn.softmax(w, axis=-1)
        h = 2.0 * self.height * jax.nn.softmax(h, axis=-1)
        d = jax.nn.softplus(d)
        return w, h, d

    # -- forward: fully parallel over dims ---------------------------------
    def forward(self, params, x):
        B = x.shape[0]
        raw0 = jnp.broadcast_to(
            params["init_raw"], (1, B, 3 * self.num_bins - 1)
        )
        if self.dim > 1:
            raw_rest = self.cond.apply_all(params["cond"], self._features(x))
            raw = jnp.concatenate([raw0, raw_rest], axis=0)  # (D, B, 3K-1)
        else:
            raw = raw0
        raw = jnp.swapaxes(raw, 0, 1)  # (B, D, 3K-1)
        w, h, d = self._prep_spline(raw)
        z, ld = apply_rqs(
            x, w, h, d, inverse=False,
            left=self.input_bounds[0], right=self.input_bounds[1],
            bottom=self.output_bounds[0], top=self.output_bounds[1],
        )
        return z, jnp.sum(ld, axis=1)

    # -- inverse: lax.scan over dims ---------------------------------------
    def inverse(self, params, z):
        B = z.shape[0]

        # Dim 0: learnable parameter vector, no conditioner.
        raw0 = jnp.broadcast_to(params["init_raw"], (B, 3 * self.num_bins - 1))
        w, h, d = self._prep_spline(raw0)
        x0, ld0 = unconstrained_rqs(
            z[:, 0], w, h, d, inverse=True,
            left=self.input_bounds[0], right=self.input_bounds[1],
            bottom=self.output_bounds[0], top=self.output_bounds[1],
        )
        x_init = jnp.zeros_like(z).at[:, 0].set(x0)
        if self.dim == 1:
            return x_init, ld0

        def step(carry, i):
            x_partial, log_det = carry
            feats = self._features(x_partial) * self.cond.feature_mask(i)
            raw = self.cond.apply_one(params["cond"], feats, i)
            w, h, d = self._prep_spline(raw)
            zi = jax.lax.dynamic_index_in_dim(z, i, axis=1, keepdims=False)
            xi, ld = unconstrained_rqs(
                zi, w, h, d, inverse=True,
                left=self.input_bounds[0], right=self.input_bounds[1],
                bottom=self.output_bounds[0], top=self.output_bounds[1],
            )
            x_partial = x_partial.at[:, i].set(xi)
            return (x_partial, log_det + ld), None

        x, log_det = _chunked_index_scan(step, (x_init, ld0), self.dim)
        return x, log_det

    def __repr__(self):
        return (f"SplineAR(dim={self.dim}, K={self.num_bins}, "
                f"B={self.tail_bound}, hidden={self.hidden_dim}, "
                f"periodic={self.periodic})")


class MaskedAffineAR(Bijector):
    """Masked autoregressive affine flow ("MAF").

    Semantics follow /root/reference/nf/flows_1.py:159-202: dim 0 uses a
    learnable (mu, alpha) pair (uniform(-sqrt(1/2), sqrt(1/2)) init); dim i>=1
    computes (mu, alpha) = MLP_i(x_{<i}) on *raw* (non-periodic) inputs.
    Forward: z_i = (x_i - mu_i) * exp(-alpha_i), then the output is flipped
    along the dim axis (flows_1.py:188); log_det = -sum_i alpha_i. Inverse
    un-flips first, then runs sequentially.
    """

    def __init__(self, dim, hidden_dim=8):
        self.dim = int(dim)
        self.hidden_dim = int(hidden_dim)
        self.cond = _MaskedStackedMLPs(self.dim, 2, self.hidden_dim, False)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        params = {"init_param": _uniform(k0, (2,), math.sqrt(0.5))}
        if self.dim > 1:
            params["cond"] = self.cond.init(k1)
        return params

    def forward(self, params, x):
        B = x.shape[0]
        out0 = jnp.broadcast_to(params["init_param"], (1, B, 2))
        if self.dim > 1:
            rest = self.cond.apply_all(params["cond"], x[:, : self.dim - 1])
            out = jnp.concatenate([out0, rest], axis=0)  # (D, B, 2)
        else:
            out = out0
        mu = jnp.swapaxes(out[..., 0], 0, 1)     # (B, D)
        alpha = jnp.swapaxes(out[..., 1], 0, 1)  # (B, D)
        z = (x - mu) * jnp.exp(-alpha)
        log_det = -jnp.sum(alpha, axis=1)
        return jnp.flip(z, axis=1), log_det

    def inverse(self, params, z):
        B = z.shape[0]
        z = jnp.flip(z, axis=1)

        mu0, alpha0 = params["init_param"][0], params["init_param"][1]
        x0 = mu0 + jnp.exp(alpha0) * z[:, 0]
        ld0 = jnp.full((B,), alpha0, dtype=z.dtype)
        x_init = jnp.zeros_like(z).at[:, 0].set(x0)
        if self.dim == 1:
            return x_init, ld0

        def step(carry, i):
            x_partial, log_det = carry
            feats = x_partial[:, : self.dim - 1] * self.cond.feature_mask(i)
            out = self.cond.apply_one(params["cond"], feats, i)
            mu, alpha = out[:, 0], out[:, 1]
            zi = jax.lax.dynamic_index_in_dim(z, i, axis=1, keepdims=False)
            xi = mu + jnp.exp(alpha) * zi
            x_partial = x_partial.at[:, i].set(xi)
            return (x_partial, log_det + alpha), None

        x, log_det = _chunked_index_scan(step, (x_init, ld0), self.dim)
        return x, log_det

    def __repr__(self):
        return f"MaskedAffineAR(dim={self.dim}, hidden={self.hidden_dim})"
