"""Coupling-layer bijectors: affine (RealNVP) and rational-quadratic spline.

Both directions of a coupling layer are fully parallel over batch and dim, so
on TPU every conditioner evaluation is one large GEMM on the MXU -- no
sequential structure anywhere (contrast the reference's autoregressive flows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Bijector
from .mlp import mlp_apply, mlp_init
from .rqs import apply_rqs, split_spline_params


class AffineCoupling(Bijector):
    """RealNVP-style double affine coupling layer.

    Reimplements the exact two-sub-step structure of the reference's RealNVP
    (/root/reference/nf/flows.py:38-76): split x into (lower, upper) halves;
    first the lower half conditions an affine map of the upper half
    (upper' = t1(lower) + upper * exp(s1(lower))), then the transformed upper
    half conditions the lower half. log-det = sum(s1) + sum(s2). The inverse
    is closed form, undoing the sub-steps in reverse order.

    Four independent 3-layer tanh MLPs (t1, s1, t2, s2), as in the reference.

    `s_cap` (default None = reference-exact) soft-clamps the log-scale,
    s -> s_cap * tanh(s / s_cap), the FrEIA/Glow-style stabilization for
    DEEP wide stacks: Polymer_rnvp's 10x4000 at dim 2048 diverges within
    the first 2000 Adam steps without it (Adam's per-parameter step
    normalization moves a 4000-wide conditioner's output by O(fan_in * lr)
    per step, so exp(s) overflows f32 long before the prior term can push
    back; observed r5, loss ~1e31). Near-identity for |s| << s_cap, so
    shallow configs are numerically unaffected even when enabled.

    `zero_init` starts every conditioner's output layer at zero, making
    the whole layer the identity map at init (Glow practice; see
    mlp.mlp_init) -- with torch-default init the 2048-dim 10-layer stack
    overflows f32 before training can correct it. Default False =
    reference-exact init.
    """

    def __init__(self, dim, hidden_dim=800, s_cap=None, zero_init=False):
        self.dim = int(dim)
        self.half = self.dim // 2
        self.hidden_dim = int(hidden_dim)
        self.s_cap = None if s_cap is None else float(s_cap)
        self.zero_init = bool(zero_init)

    def _s(self, raw):
        if self.s_cap is None:
            return raw
        return self.s_cap * jnp.tanh(raw / self.s_cap)

    def init(self, key):
        ks = jax.random.split(key, 4)
        h = self.half
        other = self.dim - self.half
        z = self.zero_init
        return {
            "t1": mlp_init(ks[0], h, other, self.hidden_dim, zero_last=z),
            "s1": mlp_init(ks[1], h, other, self.hidden_dim, zero_last=z),
            "t2": mlp_init(ks[2], other, h, self.hidden_dim, zero_last=z),
            "s2": mlp_init(ks[3], other, h, self.hidden_dim, zero_last=z),
        }

    def forward(self, params, x):
        lower, upper = x[:, : self.half], x[:, self.half :]
        t1 = mlp_apply(params["t1"], lower)
        s1 = self._s(mlp_apply(params["s1"], lower))
        upper = t1 + upper * jnp.exp(s1)
        t2 = mlp_apply(params["t2"], upper)
        s2 = self._s(mlp_apply(params["s2"], upper))
        lower = t2 + lower * jnp.exp(s2)
        z = jnp.concatenate([lower, upper], axis=1)
        log_det = jnp.sum(s1, axis=1) + jnp.sum(s2, axis=1)
        return z, log_det

    def inverse(self, params, z):
        lower, upper = z[:, : self.half], z[:, self.half :]
        t2 = mlp_apply(params["t2"], upper)
        s2 = self._s(mlp_apply(params["s2"], upper))
        lower = (lower - t2) * jnp.exp(-s2)
        t1 = mlp_apply(params["t1"], lower)
        s1 = self._s(mlp_apply(params["s1"], lower))
        upper = (upper - t1) * jnp.exp(-s1)
        x = jnp.concatenate([lower, upper], axis=1)
        log_det = -jnp.sum(s1, axis=1) - jnp.sum(s2, axis=1)
        return x, log_det

    def __repr__(self):
        return f"AffineCoupling(dim={self.dim}, hidden={self.hidden_dim})"


class SplineCoupling(Bijector):
    """RQS coupling layer over particle coordinates ("NSF_CL").

    Reimplements the reference's NSF_CL (/root/reference/nf/flows.py:210-253):
    input is a flattened (batch, size*space_dim) particle configuration,
    viewed as (batch, size, space_dim). The coordinate axes listed in `mask`
    condition the remaining axes: one conditioner MLP `psi` maps the masked
    coordinates (size*|mask| features) to all 3K-1 spline parameters for each
    of the size*(space_dim-|mask|) transformed scalars, which then go through
    a monotone RQS with tail bound B.

    Parameter pipeline matches the reference exactly, including its redundant
    double normalization: the layer applies softmax*2B to widths/heights and
    softplus to derivatives (nf/flows.py:233-235) and `unconstrained_rqs`
    normalizes again (nf/utils.py:73-91).
    """

    def __init__(self, size, space_dim=3, num_bins=32, tail_bound=3.0,
                 hidden_dim=800, mask=(0,)):
        self.size = int(size)
        self.space_dim = int(space_dim)
        self.num_bins = int(num_bins)
        self.tail_bound = float(tail_bound)
        self.hidden_dim = int(hidden_dim)
        self.mask = tuple(int(m) for m in mask)
        self.unmasked = tuple(a for a in range(self.space_dim) if a not in self.mask)
        self.n_cond = self.size * len(self.mask)
        self.n_trans = self.size * len(self.unmasked)

    def init(self, key):
        out = (3 * self.num_bins - 1) * self.n_trans
        return {"psi": mlp_init(key, self.n_cond, out, self.hidden_dim)}

    def _spline_params(self, params, cond):
        K = self.num_bins
        raw = mlp_apply(params["psi"], cond)
        raw = raw.reshape(cond.shape[0], self.n_trans, 3 * K - 1)
        w, h, d = split_spline_params(raw, K)
        w = 2.0 * self.tail_bound * jax.nn.softmax(w, axis=-1)
        h = 2.0 * self.tail_bound * jax.nn.softmax(h, axis=-1)
        d = jax.nn.softplus(d)
        return w, h, d

    def _split(self, x):
        x = x.reshape(-1, self.size, self.space_dim)
        cond = x[:, :, self.mask].reshape(x.shape[0], -1)
        trans = x[:, :, self.unmasked].reshape(x.shape[0], -1)
        return cond, trans

    def _join(self, cond, trans):
        b = cond.shape[0]
        cond = cond.reshape(b, self.size, len(self.mask))
        trans = trans.reshape(b, self.size, len(self.unmasked))
        # Deliberate divergence from the reference: nf/flows.py:239 concatenates
        # the [masked, unmasked] blocks along the coordinate axis without
        # restoring the original order, so inverse(forward(x)) != x whenever
        # `mask` is not a prefix of (0..space_dim-1) (e.g. mask=[1]): the
        # inverse then conditions on *transformed* coordinates. We scatter each
        # block back to its original coordinate position, making the layer a
        # true bijection for every mask.
        out = jnp.empty((b, self.size, self.space_dim), dtype=cond.dtype)
        out = out.at[:, :, list(self.mask)].set(cond)
        out = out.at[:, :, list(self.unmasked)].set(trans)
        return out.reshape(b, -1)

    def _apply(self, params, x, inverse):
        cond, trans = self._split(x)
        w, h, d = self._spline_params(params, cond)
        out, ld = apply_rqs(
            trans, w, h, d, inverse=inverse, tail_bound=self.tail_bound
        )
        log_det = jnp.sum(ld, axis=1)
        return self._join(cond, out), log_det

    def forward(self, params, x):
        return self._apply(params, x, inverse=False)

    def inverse(self, params, y):
        return self._apply(params, y, inverse=True)

    def __repr__(self):
        return (f"SplineCoupling(size={self.size}, space_dim={self.space_dim}, "
                f"K={self.num_bins}, B={self.tail_bound}, mask={self.mask})")
