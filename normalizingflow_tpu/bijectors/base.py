"""Functional bijector protocol and composition.

TPU-first redesign of the reference's duck-typed `nn.Module` flow layers
(`/root/reference/nf/models.py:5-40`): a bijector here is a *static* Python
object (hashable configuration) whose learnable state lives in an explicit
params pytree. All three methods are pure functions, so they compose freely
with jit / grad / vmap / shard_map:

    params = bij.init(key)
    y, log_det = bij.forward(params, x)     # x -> y,  per-sample log|dy/dx|
    x, log_det = bij.inverse(params, y)     # y -> x,  per-sample log|dx/dy|

Shapes: x is (batch, dim); log_det is (batch,).

`Chain` composes heterogeneous bijectors (params = tuple of pytrees) and
accumulates log-determinants exactly like the reference's
`NormalizingFlowModel.forward/inverse` loop (nf/models.py:13-29). For deep
homogeneous stacks use `Repeat`, which stacks the per-layer params on a
leading axis and runs a `lax.scan` -- one compiled layer body regardless of
depth (compile time and code size O(1) in the number of layers, unlike the
unrolled Python loop of the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Bijector:
    """Abstract invertible transform. Subclasses are immutable/static."""

    def init(self, key):
        raise NotImplementedError

    def forward(self, params, x):
        raise NotImplementedError

    def inverse(self, params, y):
        raise NotImplementedError


class Chain(Bijector):
    """Composition of bijectors applied left-to-right in `forward`.

    forward: x -> b_n(...b_1(x)); inverse applies the reversed stack,
    mirroring nf/models.py:13-29.
    """

    def __init__(self, bijectors):
        self.bijectors = tuple(bijectors)

    def init(self, key):
        keys = jax.random.split(key, max(len(self.bijectors), 1))
        return tuple(b.init(k) for b, k in zip(self.bijectors, keys))

    def forward(self, params, x):
        log_det = jnp.zeros(x.shape[0], dtype=x.dtype)
        for b, p in zip(self.bijectors, params):
            x, ld = b.forward(p, x)
            log_det = log_det + ld
        return x, log_det

    def inverse(self, params, y):
        log_det = jnp.zeros(y.shape[0], dtype=y.dtype)
        for b, p in zip(reversed(self.bijectors), reversed(params)):
            y, ld = b.inverse(p, y)
            log_det = log_det + ld
        return y, log_det

    def __repr__(self):
        return f"Chain({list(self.bijectors)!r})"


class Repeat(Bijector):
    """`n` copies of one bijector with independent params, run under lax.scan.

    Params are the per-layer pytrees stacked on a leading axis. Semantically
    identical to Chain([bij] * n) but compiles a single layer body.
    """

    def __init__(self, bijector, n):
        self.bijector = bijector
        self.n = int(n)

    def init(self, key):
        keys = jax.random.split(key, self.n)
        per_layer = [self.bijector.init(k) for k in keys]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

    def forward(self, params, x):
        def body(carry, layer_params):
            y, ld = self.bijector.forward(layer_params, carry)
            return y, ld
        y, lds = jax.lax.scan(body, x, params)
        return y, jnp.sum(lds, axis=0)

    def inverse(self, params, y):
        def body(carry, layer_params):
            x, ld = self.bijector.inverse(layer_params, carry)
            return x, ld
        x, lds = jax.lax.scan(body, y, params, reverse=True)
        return x, jnp.sum(lds, axis=0)

    def __repr__(self):
        return f"Repeat({self.bijector!r}, n={self.n})"


class Invert(Bijector):
    """Swap forward and inverse of a bijector."""

    def __init__(self, bijector):
        self.bijector = bijector

    def init(self, key):
        return self.bijector.init(key)

    def forward(self, params, x):
        return self.bijector.inverse(params, x)

    def inverse(self, params, y):
        return self.bijector.forward(params, y)
