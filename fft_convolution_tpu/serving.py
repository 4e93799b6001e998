"""Low-latency serving mode: the Pallas fused-kernel convolver.

Deployment-shaped wrapper over :mod:`ops.pallas_engine` — one fused kernel
dispatch per audio block (vs the multi-op XLA graph of the jnp engine),
VMEM-resident working set.  The trade-offs against :class:`api.FFTConvolver`:

* ``process`` takes exactly one full block (the real-time callback shape);
* the ring must stay full (``active == seg_count``): ``update`` therefore
  requires the new IR to pad to the same segment count (it rebuilds the
  doubled-IR tables — a fixed-shape jitted program, RT-safe);
* the working set must fit VMEM (:func:`ops.pallas_engine.fits_vmem`).

For arbitrary-length or batch streaming use the jnp engines; this class is
the per-block latency path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .models import uniform
from .ops import pallas_engine


@functools.lru_cache(maxsize=None)
def _jit_step(cfg: uniform.UniformConfig, interpret: bool):
    return jax.jit(
        functools.partial(pallas_engine.block_step, cfg, interpret=interpret)
    )


@functools.lru_cache(maxsize=None)
def _jit_rebuild_ir(cfg: uniform.UniformConfig):
    """One fixed-shape program: padded IR -> doubled re/im spectrum tables."""
    from .ops.fft import ir_to_spectra

    def rebuild(padded):
        spec = ir_to_spectra(padded, cfg.block_size, cfg.seg_count)
        ir_re, ir_im = spec[:, 0], spec[:, 1]
        return (
            jnp.concatenate([ir_re, ir_re], axis=0),
            jnp.concatenate([ir_im, ir_im], axis=0),
        )

    return jax.jit(rebuild)


class PallasFFTConvolver:
    """Fused-kernel uniform convolver for single-block real-time serving."""

    def __init__(self, response, block_size: int, max_response_length: int,
                 interpret: bool | None = None):
        response = np.asarray(response, np.float32)
        self.cfg = uniform.make_config(block_size, max_response_length)
        if not pallas_engine.fits_vmem(self.cfg):
            raise ValueError(
                "working set exceeds the VMEM budget; use FFTConvolver or "
                "TwoStageFFTConvolver for IRs this long"
            )
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self._interpret = interpret
        _, state = uniform.init(response, block_size, max_response_length)
        self.consts, self.state = pallas_engine.from_uniform(self.cfg, state)

    def update(self, response) -> None:
        """RT-safe IR swap: rebuild the doubled-IR tables (fixed shapes,
        precompiled) and zero the pending overlap, mirroring
        ``src/fft_convolver.rs:174-213``.  Requires the full segment count
        (``active == seg_count`` is the kernel precondition), i.e. the new
        IR occupies the same length budget as the original."""
        response = np.asarray(response, np.float32)
        if response.shape[0] > self.cfg.ir_len:
            raise ValueError("New impulse response is longer than initialized length")
        padded = np.zeros(self.cfg.seg_count * self.cfg.block_size, np.float32)
        padded[: response.shape[0]] = response
        ir2_re, ir2_im = _jit_rebuild_ir(self.cfg)(jnp.asarray(padded))
        self.consts = self.consts._replace(ir2_re=ir2_re, ir2_im=ir2_im)
        self.state = self.state._replace(
            overlap=jnp.zeros_like(self.state.overlap)
        )

    def reset(self) -> None:
        self.state = pallas_engine.PallasFDLState(
            seg_re=jnp.zeros_like(self.state.seg_re),
            seg_im=jnp.zeros_like(self.state.seg_im),
            overlap=jnp.zeros_like(self.state.overlap),
            current=jnp.zeros_like(self.state.current),
        )

    def process(self, input) -> np.ndarray:
        x = np.asarray(input, np.float32)
        if x.shape[0] != self.cfg.block_size:
            raise ValueError(
                f"PallasFFTConvolver.process takes exactly one "
                f"{self.cfg.block_size}-sample block (got {x.shape[0]}); "
                "use FFTConvolver for arbitrary lengths"
            )
        step = _jit_step(self.cfg, self._interpret)
        self.state, y = step(self.consts, self.state, jnp.asarray(x))
        return np.asarray(y)

    def snapshot(self):
        return self.state

    def restore(self, snap) -> None:
        self.state = snap

    def clone(self) -> "PallasFFTConvolver":
        other = object.__new__(PallasFFTConvolver)
        other.cfg = self.cfg
        other.consts = self.consts
        other.state = self.state
        other._interpret = self._interpret
        return other
