"""Massive Gaussian free field on a periodic 2-D lattice.

Surrogate for the reference's polymer field-theory datasets: the reference
trains RealNVP on externally produced 2x32x32 SCFT field configurations
(/root/reference/applications/examples/polymer.py:8-24) that are not shipped
with it. A multi-channel massive GFF is the Gaussian (RPA) limit of such a
field theory, is *exactly* sampleable, and has an *exactly normalized*
log-density -- so the polymer pipeline can be validated end-to-end with
calibrated held-out-logp comparisons instead of opaque data files.

Action (per channel c, periodic boundary conditions):

    S_c[w] = 1/2 sum_x [ sum_mu (w(x+mu) - w(x))^2 + m_c^2 w(x)^2 ]

The precision operator diagonalizes in the Fourier basis with eigenvalues

    lambda_c(k) = 4 sin^2(pi k1/L) + 4 sin^2(pi k2/L) + m_c^2,

giving exact sampling (color white noise by 1/sqrt(lambda) in k-space, one
batched FFT -- XLA lowers it to a single fused kernel) and the exact
normalizer log Z_c = -1/2 sum_k log(lambda_c(k) / 2pi).

log_prob / potential are evaluated as *local* quadratic forms (roll-shifted
sums, one fused VPU kernel under jit, no FFT on the training path).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import Target


def gff_action(w, mass):
    """Action of a single (L, L) field at scalar mass (periodic BCs)."""
    grad2 = (jnp.roll(w, -1, axis=0) - w) ** 2 + (jnp.roll(w, -1, axis=1) - w) ** 2
    return 0.5 * jnp.sum(grad2 + (mass * mass) * w * w)


class GaussianField(Target):
    """Multi-channel massive GFF; x is (batch, channels*L*L) flattened.

    Exact `sample` and exactly *normalized* `log_prob` (unlike most targets
    here, the normalizer is known in closed form).
    """

    def __init__(self, L=32, channels=2, mass=(0.5, 1.0)):
        self.L = int(L)
        self.channels = int(channels)
        if isinstance(mass, (int, float)):
            mass = [float(mass)] * self.channels
        if len(mass) != self.channels:
            raise ValueError(
                f"need {self.channels} masses, got {len(mass)}"
            )
        self.mass = tuple(float(m) for m in mass)
        self.dim = self.channels * self.L * self.L

        k = jnp.arange(self.L)
        s2 = 4.0 * jnp.sin(jnp.pi * k / self.L) ** 2
        lap = s2[:, None] + s2[None, :]  # (L, L) lattice Laplacian spectrum
        # (channels, L, L) precision eigenvalues, f64 under x64 for the tests
        self.eigenvalues = jnp.stack(
            [lap + m * m for m in self.mass]
        )
        # log p = -S + 1/2 sum_k log lambda_k - (dim/2) log 2pi
        self.log_norm = float(
            0.5 * jnp.sum(jnp.log(self.eigenvalues))
            - 0.5 * self.dim * math.log(2.0 * math.pi)
        )

    def _fields(self, x):
        return x.reshape(-1, self.channels, self.L, self.L)

    def potential(self, x):
        w = self._fields(x)

        def one(cfg):
            return sum(
                gff_action(cfg[c], self.mass[c])
                for c in range(self.channels)
            )

        return jax.vmap(one)(w)

    def log_prob(self, x):
        return -self.potential(x) + self.log_norm

    def sample(self, key, nsamples, flatten=True):
        # jnp.fft is UNIMPLEMENTED on the axon TPU backend (r4 campaign:
        # "TPU backend error (Unimplemented)" from fft2). Exact GFF sampling
        # is data generation, not a training hot path, so pin the FFT
        # coloring to the host CPU backend; downstream consumers transfer
        # the result wherever they need it.
        #
        # HOST-ONLY: this method must be called eagerly. Under a jit trace
        # (e.g. if GaussianField were wired as a training data_source,
        # which train/fused.py traces inside its chunk) default_device is a
        # no-op and the fft2 would be staged for the TPU and fail -- fail
        # loudly here instead (ADVICE r4 #1).
        if isinstance(key, jax.core.Tracer):
            raise RuntimeError(
                "GaussianField.sample is host-only (CPU-pinned FFT) and "
                "cannot be traced under jit; pre-generate fields eagerly "
                "(apps.polymer data) and train from the dataset."
            )
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            xi = jax.random.normal(
                jax.device_put(key, cpu),
                (int(nsamples), self.channels, self.L, self.L),
            )
            spectrum = jnp.fft.fft2(xi, norm="ortho")
            w = jnp.fft.ifft2(
                spectrum / jax.device_put(jnp.sqrt(self.eigenvalues), cpu),
                norm="ortho",
            ).real
        return w.reshape(int(nsamples), -1) if flatten else w
