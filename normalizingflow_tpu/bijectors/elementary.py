"""Elementary bijectors: Planar, Radial, ActNorm, invertible PLU linear.

JAX re-designs of /root/reference/nf/flows_1.py:21-262 with the reference's
known bugs fixed (documented per class).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import Bijector


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -1.0, 1.0) * bound


class Planar(Bijector):
    """Planar flow z = x + u * h(w.x + b)  [Rezende & Mohamed 2015].

    Follows /root/reference/nf/flows_1.py:21-63: tanh/leaky_relu/elu
    nonlinearities; under tanh, u is reparameterized as
    u + (softplus(w.u) - w.u - 1) * w / |w|^2 to guarantee invertibility;
    log-det = log|1 + h'(lin) w.u_hat| with the reference's 1e-4 floor.

    Like the reference, there is no algebraic inverse; `inverse` raises at
    trace time. Use within VI (reverse-KL) objectives, which only need
    `forward` -- or see `NormalizingFlow.sample` with `Invert`.
    """

    def __init__(self, dim, nonlinearity="tanh"):
        if nonlinearity not in ("tanh", "leaky_relu", "elu"):
            raise NotImplementedError(
                f"Non-linearity {nonlinearity!r} is not supported."
            )
        self.dim = int(dim)
        self.nonlinearity = nonlinearity

    def init(self, key):
        kw, ku, kb = jax.random.split(key, 3)
        bound = math.sqrt(1.0 / self.dim)
        return {
            "w": _uniform(kw, (self.dim,), bound),
            "u": _uniform(ku, (self.dim,), bound),
            "b": _uniform(kb, (1,), bound),
        }

    def _h(self, x):
        if self.nonlinearity == "tanh":
            return jnp.tanh(x)
        if self.nonlinearity == "leaky_relu":
            return jax.nn.leaky_relu(x, negative_slope=0.01)
        return jax.nn.elu(x)

    def _h_prime(self, x):
        if self.nonlinearity == "tanh":
            return 1.0 - jnp.tanh(x) ** 2
        if self.nonlinearity == "leaky_relu":
            return jnp.where(x > 0, 1.0, 0.01)
        return jnp.where(x > 0, 1.0, jnp.exp(x))

    def forward(self, params, x):
        w, u, b = params["w"], params["u"], params["b"]
        if self.nonlinearity == "tanh":
            wu = w @ u
            scal = jax.nn.softplus(wu) - wu - 1.0
            u_hat = u + scal * w / jnp.sum(w * w)
        else:
            u_hat = u
        lin = x @ w[:, None] + b  # (B, 1)
        z = x + u_hat * self._h(lin)
        phi = self._h_prime(lin) * w  # (B, dim)
        log_det = jnp.log(jnp.abs(1.0 + phi @ u_hat) + 1e-4)
        return z, log_det

    def inverse(self, params, y):
        raise NotImplementedError("Planar flow has no algebraic inverse.")


class Radial(Bijector):
    """Radial flow z = x + beta_hat * h(alpha, r) * (x - x0).

    h(alpha, r) = 1 / (alpha + r), r = |x - x0|,
    beta_hat = -alpha + softplus(beta) (guarantees invertibility).

    Divergences from /root/reference/nf/flows_1.py:66-97 (documented bugs):
      * r is per-sample |x - x0|_2; the reference computes a single scalar
        norm over the whole batch (flows_1.py:90).
      * `reset_parameters` works (the reference's is missing `self` and
        references an undefined `self.z0`, flows_1.py:80-83).
      * an exact inverse is provided: |y - x0| = R gives the quadratic
        r^2 + (alpha + beta_hat - R) r - alpha R = 0 in r, whose positive
        root recovers x = x0 + (y - x0) / (1 + beta_hat/(alpha + r)).
        (The reference has no inverse at all.)
    """

    def __init__(self, dim):
        self.dim = int(dim)

    def init(self, key):
        k0, k1, k2 = jax.random.split(key, 3)
        bound = math.sqrt(1.0 / self.dim)
        return {
            "x0": _uniform(k0, (self.dim,), bound),
            "log_alpha": _uniform(k1, (1,), bound),
            "beta": _uniform(k2, (1,), bound),
        }

    @staticmethod
    def _transformed(params):
        alpha = jnp.exp(params["log_alpha"][0])
        beta_hat = -alpha + jax.nn.softplus(params["beta"][0])
        return alpha, beta_hat

    def forward(self, params, x):
        alpha, beta = self._transformed(params)
        diff = x - params["x0"]
        r = jnp.linalg.norm(diff, axis=-1)  # (B,)
        h = 1.0 / (alpha + r)
        z = x + (beta * h)[:, None] * diff
        n = x.shape[-1]
        # d/dr [r * (1 + beta*h)] = 1 + beta*h - beta*r/(alpha+r)^2
        log_det = (n - 1) * jnp.log(1.0 + beta * h) + jnp.log(
            1.0 + beta * h - beta * r / (alpha + r) ** 2
        )
        return z, log_det

    def inverse(self, params, y):
        alpha, beta = self._transformed(params)
        diff = y - params["x0"]
        R = jnp.linalg.norm(diff, axis=-1)
        # r^2 + (alpha + beta - R) r - alpha R = 0, positive root.
        bq = alpha + beta - R
        r = 0.5 * (-bq + jnp.sqrt(bq * bq + 4.0 * alpha * R))
        scale = 1.0 / (1.0 + beta / (alpha + r))
        x = params["x0"] + scale[:, None] * diff
        h = 1.0 / (alpha + r)
        n = y.shape[-1]
        log_det = (n - 1) * jnp.log(1.0 + beta * h) + jnp.log(
            1.0 + beta * h - beta * r / (alpha + r) ** 2
        )
        return x, -log_det


class ActNorm(Bijector):
    """Per-dim affine z = x * exp(log_sigma) + mu  [Kingma & Dhariwal 2018].

    Matches /root/reference/nf/flows_1.py:205-225 including its
    data-independent zero init. log-det is the same for every sample:
    sum(log_sigma) broadcast to (batch,).
    """

    def __init__(self, dim):
        self.dim = int(dim)

    def init(self, key):
        del key
        return {
            "mu": jnp.zeros(self.dim),
            "log_sigma": jnp.zeros(self.dim),
        }

    def forward(self, params, x):
        z = x * jnp.exp(params["log_sigma"]) + params["mu"]
        ld = jnp.sum(params["log_sigma"])
        return z, jnp.full(x.shape[:1], ld, dtype=x.dtype)

    def inverse(self, params, y):
        x = (y - params["mu"]) * jnp.exp(-params["log_sigma"])
        ld = -jnp.sum(params["log_sigma"])
        return x, jnp.full(y.shape[:1], ld, dtype=y.dtype)


class InvertibleLinear(Bijector):
    """Invertible dense mixing via PLU parameterization ("1x1 convolution").

    Matches /root/reference/nf/flows_1.py:228-262: W = P @ L @ (U + diag(S))
    with P a fixed permutation from a QR-initialized rotation, L unit lower
    triangular and U strictly upper triangular learnable, S the learnable
    diagonal. log-det = sum(log|S|).

    Divergence (bug fix): the reference caches W_inv on the first inverse call
    and never invalidates it after optimizer steps (flows_1.py:253-259). Here
    the inverse uses two triangular solves against the *current* parameters --
    no cache, no stale state, and better conditioned than forming W^-1.
    """

    def __init__(self, dim):
        self.dim = int(dim)

    def init(self, key):
        a = jax.random.normal(key, (self.dim, self.dim))
        w, _ = jnp.linalg.qr(a)
        p, l, u = jax.scipy.linalg.lu(w)
        return {
            "P": p,  # fixed; excluded from training via stop_gradient below
            "L": l,
            "S": jnp.diag(u),
            "U": jnp.triu(u, k=1),
        }

    def _w(self, params):
        eye = jnp.eye(self.dim, dtype=params["L"].dtype)
        L = jnp.tril(params["L"], k=-1) + eye
        U = jnp.triu(params["U"], k=1) + jnp.diag(params["S"])
        return jax.lax.stop_gradient(params["P"]), L, U

    def forward(self, params, x):
        P, L, U = self._w(params)
        z = x @ P @ L @ U
        ld = jnp.sum(jnp.log(jnp.abs(params["S"])))
        return z, jnp.full(x.shape[:1], ld, dtype=x.dtype)

    def inverse(self, params, y):
        P, L, U = self._w(params)
        # x = y U^-1 L^-1 P^T via triangular solves on the transposed systems.
        a = jax.scipy.linalg.solve_triangular(U.T, y.T, lower=True)
        b = jax.scipy.linalg.solve_triangular(L.T, a, lower=False)
        x = (P @ b).T
        ld = -jnp.sum(jnp.log(jnp.abs(params["S"])))
        return x, jnp.full(y.shape[:1], ld, dtype=y.dtype)
