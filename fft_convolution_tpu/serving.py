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
def _jit_step(cfg: uniform.UniformConfig, interpret: bool,
              packed: bool = False):
    step = (pallas_engine.block_step_packed if packed
            else pallas_engine.block_step)
    return jax.jit(functools.partial(step, cfg, interpret=interpret))


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


class PallasTwoStageConvolver:
    """Fused-kernel two-stage convolver for single-block real-time serving.

    Head and tail0 share one input-spectra ring inside one Pallas kernel
    per block (``ops/pallas_two_stage.py``); the big-tail convolution runs
    as the jnp uniform engine on the block that completes a period, inside
    the same jitted step (``lax.cond``), mirroring the reference schedule
    (``src/fft_convolver.rs:427-494``).

    Requires the IR to reach past one tail block (``max_response_length >
    tail_block``) — otherwise use :class:`PallasFFTConvolver` — and a
    power-of-two ``block_size``.
    """

    def __init__(self, response, block_size: int, max_response_length: int,
                 interpret: bool | None = None):
        from .models import two_stage
        from .ops import pallas_two_stage

        cfg, state = two_stage.init(response, block_size, max_response_length)
        if cfg.tail0 is None:
            raise ValueError(
                "IR shorter than one tail block: use PallasFFTConvolver"
            )
        if not pallas_two_stage.fits_vmem(
            cfg.head.seg_count, cfg.head_block, cfg.period
        ):
            raise ValueError(
                "fused head+tail0 working set exceeds the VMEM budget; use "
                "TwoStageFFTConvolver for head rings this large"
            )
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self._interpret = interpret
        self.cfg = cfg
        b = cfg.head_block
        p = cfg.period
        n = cfg.head.seg_count
        assert n == p, "head ring must span exactly one tail period"

        # tail0's IR spectra padded to the shared ring's row count (its
        # trailing rows are zero => contribute nothing, like active < N)
        t0_spec = state.tail0.segments_ir
        if t0_spec.shape[0] < n:
            t0_spec = jnp.concatenate([
                t0_spec,
                jnp.zeros((n - t0_spec.shape[0], 2, b), jnp.float32),
            ])
        self.consts = pallas_two_stage.build_consts(
            state.head.segments_ir, t0_spec[:n], b
        )
        self.fstate = pallas_two_stage.FusedHeadState(
            seg_re=jnp.zeros((n, b), jnp.float32),
            seg_im=jnp.zeros((n, b), jnp.float32),
            head_overlap=jnp.zeros((1, b), jnp.float32),
            t0_overlap=jnp.zeros((1, b), jnp.float32),
            current=jnp.zeros((1,), jnp.int32),
        )
        self.tail_state = state.tail          # uniform engine at TB (may be empty)
        self._has_tail = cfg.tail is not None
        self.buffers = {
            "tail_output0": jnp.zeros((p, b), jnp.float32),
            "precalc0": jnp.zeros((p, b), jnp.float32),
            "tail_output": jnp.zeros((p, b), jnp.float32),
            "precalc": jnp.zeros((p, b), jnp.float32),
            "tail_input": jnp.zeros((p, b), jnp.float32),
        }
        self.row = 0  # host shadow of the intra-period position

    def _step_fn(self):
        from .models import uniform
        from .ops import pallas_two_stage

        cfg = self.cfg
        n = cfg.head.seg_count
        b = cfg.head_block
        p = cfg.period
        interpret = self._interpret
        consts = self.consts
        has_tail = self._has_tail

        @jax.jit
        def step(fstate, tail_state, bufs, row, x):
            fstate, y, out0 = pallas_two_stage.block_step(
                n, b, consts, fstate, x, row,
                bufs["precalc0"], bufs["precalc"], interpret=interpret,
            )
            tail_output0 = jax.lax.dynamic_update_slice(
                bufs["tail_output0"], out0[None], (row, 0)
            )
            tail_input = jax.lax.dynamic_update_slice(
                bufs["tail_input"], x[None], (row, 0)
            )
            period_end = row == p - 1

            precalc0, tail_output0 = jax.lax.cond(
                period_end, lambda a, o: (o, a), lambda a, o: (a, o),
                bufs["precalc0"], tail_output0,
            )
            if has_tail:
                def run_tail(op):
                    t_state, t_out, _t_pre, t_in = op
                    t_state2, big = uniform.process_block(
                        cfg.tail, t_state, t_in.reshape(-1)
                    )
                    return t_state2, big.reshape(p, b), t_out

                tail_state2, tail_output, precalc = jax.lax.cond(
                    period_end, run_tail,
                    lambda op: (op[0], op[1], op[2]),
                    (tail_state, bufs["tail_output"], bufs["precalc"], tail_input),
                )
            else:
                tail_state2 = tail_state
                tail_output, precalc = bufs["tail_output"], bufs["precalc"]

            new_bufs = {
                "tail_output0": tail_output0,
                "precalc0": precalc0,
                "tail_output": tail_output,
                "precalc": precalc,
                "tail_input": tail_input,
            }
            return fstate, tail_state2, new_bufs, y

        return step

    def process(self, input) -> np.ndarray:
        x = np.asarray(input, np.float32)
        if x.shape[0] != self.cfg.head_block:
            raise ValueError(
                f"PallasTwoStageConvolver.process takes exactly one "
                f"{self.cfg.head_block}-sample block"
            )
        if not hasattr(self, "_step"):
            self._step = self._step_fn()
        self.fstate, self.tail_state, self.buffers, y = self._step(
            self.fstate, self.tail_state, self.buffers,
            jnp.asarray(self.row, jnp.int32), jnp.asarray(x),
        )
        self.row = (self.row + 1) % self.cfg.period
        return np.asarray(y)

    def update(self, response) -> None:
        raise NotImplementedError(
            "update is unimplemented upstream (src/fft_convolver.rs:408-410)"
        )

    def reset(self) -> None:
        self.fstate = jax.tree.map(jnp.zeros_like, self.fstate)
        from .models import uniform as _u

        self.tail_state = _u.reset(self.tail_state)
        self.buffers = {k: jnp.zeros_like(v) for k, v in self.buffers.items()}
        self.row = 0

    def snapshot(self):
        return (self.fstate, self.tail_state,
                dict(self.buffers), self.row)

    def restore(self, snap) -> None:
        self.fstate, self.tail_state, bufs, self.row = snap
        self.buffers = dict(bufs)

    def clone(self) -> "PallasTwoStageConvolver":
        """Value-semantics copy (the `Convolution: Clone` parity surface,
        ``src/lib.rs:5``) — state arrays are immutable, so shallow refs are
        safe; the mutable dict and host counter are copied."""
        other = object.__new__(PallasTwoStageConvolver)
        other.cfg = self.cfg
        other.consts = self.consts
        other.fstate = self.fstate
        other.tail_state = self.tail_state
        other._has_tail = self._has_tail
        other._interpret = self._interpret
        other.buffers = dict(self.buffers)
        other.row = self.row
        return other


class PallasStreamingConvolver:
    """Grid-streaming fused-kernel convolver for LONG-IR batch serving.

    Unlike :class:`PallasFFTConvolver` (whole working set VMEM-resident,
    ~10 s IR ceiling at B=128), this engine keeps only the input ring in
    VMEM and streams the IR tables from HBM chunk by chunk inside one
    ``pallas_call`` covering the whole input batch
    (:mod:`ops.pallas_stream`), so a 30 s IR serves with flat per-block
    cost.  ``process`` takes block-aligned input (any multiple of
    ``block_size``).  ``seg_count`` pads to the chunk multiple — equivalent
    to a reference convolver with a padded ``max_response_length``
    (``src/fft_convolver.rs:111-118``).
    """

    # Padded segment count at/above which the grid-streaming kernel's
    # packed-bf16 IR tables beat f32 under storage="auto".  The kernel
    # streams the whole table from HBM every block, so packing halves the
    # dominant traffic; interleaved same-window A/Bs (f32/packed
    # alternating within one window — the methodology that killed the
    # r03-vs-r04 cross-run disagreement) show packed winning the median
    # at EVERY measured N (2048, 4096, 7680, 11264 segments:
    # benchmarks/exp_packed_interleaved, results/r05), so the crossover
    # is 0: auto always packs the streamed table.  Kept as an attribute
    # so deployments that must keep exact-f32 tables can raise it (or
    # pass storage="float32").
    PACKED_MIN_SEGS = 0

    def __init__(self, response, block_size: int, max_response_length: int,
                 chunk: int = 512, interpret: bool | None = None,
                 storage: str = "float32"):
        from .ops import pallas_stream

        if storage not in ("float32", "bf16_packed", "auto"):
            raise ValueError(
                "storage must be 'float32', 'bf16_packed', or 'auto'"
            )
        response = np.asarray(response, np.float32)
        if max_response_length < response.shape[0]:
            raise ValueError(
                "max_response_length must be at least the length of the "
                "initial impulse response"
            )
        cfg0 = uniform.make_config(block_size, max_response_length)
        self._chunk = min(chunk, cfg0.seg_count)
        n = pallas_stream.padded_seg_count(cfg0.seg_count, self._chunk)
        if not pallas_stream.fits_vmem(n, cfg0.block_size, self._chunk):
            raise ValueError(
                "ring exceeds the VMEM budget even with streamed IR tables; "
                "use TwoStageFFTConvolver for IRs this long"
            )
        self.cfg = uniform.make_config(block_size, n * cfg0.block_size)
        assert self.cfg.seg_count == n
        if storage == "auto":
            storage = ("bf16_packed" if n >= self.PACKED_MIN_SEGS
                       else "float32")
        self._packed = storage == "bf16_packed"
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self._interpret = interpret
        self._declared_max = max_response_length
        _, ustate = uniform.init(response, block_size, n * cfg0.block_size)
        build = (pallas_stream.build_consts_packed if self._packed
                 else pallas_stream.build_consts)
        self.consts = build(ustate.segments_ir, n, self.cfg.block_size)
        self.state = pallas_stream.zero_state(n, self.cfg.block_size)
        self._runs: dict = {}

    def _run(self, t: int):
        run = self._runs.get(t)
        if run is None:
            from .ops import pallas_stream

            run = jax.jit(functools.partial(
                pallas_stream.stream, self.cfg,
                chunk=self._chunk, interpret=self._interpret,
            ))
            self._runs[t] = run
        return run

    def process(self, input) -> np.ndarray:
        x = np.asarray(input, np.float32)
        b = self.cfg.block_size
        if x.shape[0] % b:
            raise ValueError(
                f"PallasStreamingConvolver.process takes block-aligned input "
                f"(multiples of {b} samples, got {x.shape[0]})"
            )
        if x.shape[0] == 0:
            return x
        t = x.shape[0] // b
        self.state, y = self._run(t)(
            self.consts, self.state, jnp.asarray(x.reshape(t, b))
        )
        return np.asarray(y).reshape(-1)

    def update(self, response) -> None:
        """RT-safe IR swap: rebuild the reversed tables (fixed shapes), zero
        the pending overlap, keep the ring history
        (``src/fft_convolver.rs:174-213``; full-ring kernel precondition, so
        the new IR occupies the same padded segment budget)."""
        from .ops import pallas_stream

        response = np.asarray(response, np.float32)
        if response.shape[0] > self._declared_max:
            raise ValueError("New impulse response is longer than initialized length")
        padded = np.zeros(self.cfg.seg_count * self.cfg.block_size, np.float32)
        padded[: response.shape[0]] = response
        ir2_re, ir2_im = _jit_rebuild_ir(self.cfg)(jnp.asarray(padded))
        n = self.cfg.seg_count
        # _jit_rebuild_ir returns doubled planes; un-double and reverse
        spec = jnp.stack([ir2_re[:n], ir2_im[:n]], axis=1)
        build = (pallas_stream.build_consts_packed if self._packed
                 else pallas_stream.build_consts)
        self.consts = build(spec, n, self.cfg.block_size)
        self.state = self.state._replace(
            overlap=jnp.zeros_like(self.state.overlap)
        )

    def reset(self) -> None:
        from .ops import pallas_stream

        self.state = pallas_stream.zero_state(
            self.cfg.seg_count, self.cfg.block_size
        )

    def snapshot(self):
        return self.state

    def restore(self, snap) -> None:
        self.state = snap

    def clone(self) -> "PallasStreamingConvolver":
        other = object.__new__(PallasStreamingConvolver)
        other.cfg = self.cfg
        other.consts = self.consts
        other.state = self.state
        other._chunk = self._chunk
        other._interpret = self._interpret
        other._declared_max = self._declared_max
        other._packed = self._packed
        other._runs = {}
        return other


@functools.lru_cache(maxsize=None)
def _jit_xfade_step(cfg: uniform.UniformConfig, cf_cfg, interpret: bool):
    from .models import crossfade
    from .ops import pallas_crossfade

    @jax.jit
    def step(consts, state, cf, x):
        state2, ya, yb = pallas_crossfade.block_step(
            cfg, consts, state, x, interpret=interpret
        )
        cf2, y = crossfade.mix_block(cf_cfg, cf, ya, yb)
        return state2, cf2, y

    return step


class PallasCrossfadeConvolver:
    """Morph-while-serving: the fused A/B kernel + sample-accurate
    crossfader, one device dispatch per block.

    The serving-path counterpart of
    :class:`~fft_convolution_tpu.api_crossfade.CrossfadeConvolver`
    (``src/crossfade_convolver.rs:3-105``): both engines run every block
    and the equal-power crossfader mixes per sample, but the two engines
    share ONE input ring and ONE forward DFT inside a single Pallas kernel
    (:mod:`ops.pallas_crossfade`) — the marginal cost over plain
    :class:`PallasFFTConvolver` serving is one extra spectral MAC +
    inverse DFT, not a second engine.

    ``update`` is the RT-safe morph trigger: rebuilds the INACTIVE
    engine's IR tables (fixed-shape jitted program) and fades toward it;
    an update that lands mid-fade parks in the single pending-response
    slot (``src/crossfade_convolver.rs:51-64``).

    VMEM ceiling: ring + TWO doubled IR tables resident — about 60% of
    :class:`PallasFFTConvolver`'s IR capacity.  For longer IRs compose
    ``CrossfadeConvolver(PallasFFTConvolver(...))`` (same semantics,
    three dispatches per block) or use the jnp engines.
    """

    def __init__(self, response, block_size: int, max_response_length: int,
                 crossfade_samples: int, interpret: bool | None = None,
                 mixer: str = "raised_cosine"):
        from .models import crossfade
        from .ops import pallas_crossfade

        response = np.asarray(response, np.float32)
        self.cfg = uniform.make_config(block_size, max_response_length)
        if not pallas_crossfade.fits_vmem(self.cfg):
            raise ValueError(
                "A/B working set exceeds the VMEM budget; compose "
                "CrossfadeConvolver(PallasFFTConvolver(...)) or use the "
                "jnp engines for IRs this long"
            )
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self._interpret = interpret
        _, state = uniform.init(response, block_size, max_response_length)
        self.consts, self.state = pallas_crossfade.from_uniform(
            self.cfg, state, state
        )
        # hold covers the (shared-ring) pipeline fill, reference formula
        # hold = min(max_buffer_size, max_response_length) with the
        # serving path's one-block buffer (src/crossfade_convolver.rs:28-41)
        self.cf_cfg = crossfade.CrossfaderConfig(
            fading_samples=crossfade_samples,
            hold_samples=min(self.cfg.block_size, max_response_length),
            mixer=mixer,
        )
        self.cf_state = crossfade.new_state(self.cf_cfg)
        self.stored_response = np.zeros(max_response_length, np.float32)
        self.response_pending = False

    def is_crossfading(self) -> bool:
        return bool(self.cf_state.approaching)

    def _swap(self, response) -> None:
        """Update the INACTIVE engine's tables + fade toward it
        (``src/crossfade_convolver.rs:94-105``); the inactive overlap is
        zeroed like ``FFTConvolver::update`` (``src/fft_convolver.rs:185``).
        The shared ring (input history) is untouched — exactly the
        click-free property the reference update preserves."""
        from .models import crossfade

        response = np.asarray(response, np.float32)
        if response.shape[0] > self.cfg.ir_len:
            raise ValueError(
                "New impulse response is longer than initialized length"
            )
        padded = np.zeros(self.cfg.seg_count * self.cfg.block_size,
                          np.float32)
        padded[: response.shape[0]] = response
        ir2_re, ir2_im = _jit_rebuild_ir(self.cfg)(jnp.asarray(padded))
        if int(self.cf_state.target) == crossfade.TARGET_A:
            self.consts = self.consts._replace(b2_re=ir2_re, b2_im=ir2_im)
            self.state = self.state._replace(
                overlap_b=jnp.zeros_like(self.state.overlap_b)
            )
            target = crossfade.TARGET_B
        else:
            self.consts = self.consts._replace(a2_re=ir2_re, a2_im=ir2_im)
            self.state = self.state._replace(
                overlap_a=jnp.zeros_like(self.state.overlap_a)
            )
            target = crossfade.TARGET_A
        self.cf_state = crossfade.fade_into(self.cf_cfg, self.cf_state,
                                            target)

    def update(self, response) -> None:
        """(``src/crossfade_convolver.rs:51-64``) — single pending slot;
        updates while fading overwrite the stored response."""
        if not self.is_crossfading():
            self._swap(response)
            self.response_pending = False
            return
        response = np.asarray(response, np.float32)
        if response.shape[0] > self.stored_response.shape[0]:
            raise ValueError("response longer than stored-response capacity")
        self.stored_response[: response.shape[0]] = response
        self.stored_response[response.shape[0]:] = 0.0
        self.response_pending = True

    def process(self, input) -> np.ndarray:
        """One block in, one mixed block out
        (``src/crossfade_convolver.rs:66-78``): apply a pending swap at
        block top, run the fused A/B kernel, mix per sample."""
        if not self.is_crossfading() and self.response_pending:
            self._swap(self.stored_response)
            self.response_pending = False
        x = np.asarray(input, np.float32)
        if x.shape[0] != self.cfg.block_size:
            raise ValueError(
                f"PallasCrossfadeConvolver.process takes exactly one "
                f"{self.cfg.block_size}-sample block"
            )
        step = _jit_xfade_step(self.cfg, self.cf_cfg, self._interpret)
        self.state, self.cf_state, y = step(
            self.consts, self.state, self.cf_state, jnp.asarray(x)
        )
        return np.asarray(y)

    def reset(self) -> None:
        """``todo!()`` upstream (``src/crossfade_convolver.rs:80-82``) —
        surface matched; :meth:`reset_extension` is the implemented
        extension."""
        raise NotImplementedError(
            "CrossfadeConvolver.reset is unimplemented upstream "
            "(src/crossfade_convolver.rs:80-82); reset_extension() is the "
            "documented extension"
        )

    def reset_extension(self) -> None:
        """EXTENSION (clearly marked — NOT reference surface)."""
        from .models import crossfade
        from .ops import pallas_crossfade

        self.state = pallas_crossfade.zero_state(
            self.cfg.seg_count, self.cfg.block_size
        )
        self.cf_state = crossfade.new_state(self.cf_cfg)
        self.stored_response[:] = 0.0
        self.response_pending = False

    def snapshot(self):
        return (self.consts, self.state, self.cf_state,
                self.stored_response.copy(), self.response_pending)

    def restore(self, snap) -> None:
        (self.consts, self.state, self.cf_state,
         stored, self.response_pending) = snap
        self.stored_response = stored.copy()

    def clone(self) -> "PallasCrossfadeConvolver":
        other = object.__new__(PallasCrossfadeConvolver)
        other.cfg = self.cfg
        other.cf_cfg = self.cf_cfg
        other.consts = self.consts
        other.state = self.state
        other.cf_state = self.cf_state
        other.stored_response = self.stored_response.copy()
        other.response_pending = self.response_pending
        other._interpret = self._interpret
        return other


class PallasFFTConvolver:
    """Fused-kernel uniform convolver for single-block real-time serving.

    ``storage="bf16_packed"`` stores the input-spectra ring and the IR
    table as plane-packed bf16 words (ops/packing.py): the per-block step
    is DMA-bound at large segment counts, so this halves its HBM floor.
    The current block's direct term stays f32-exact (the kernel's
    stale-row correction uses the fresh spectrum); the N-1 history terms
    carry bf16 rounding (~1e-3 relative on the convolution tail).
    Opt-in for latency/throughput serving; default f32 keeps the 1e-5
    reference parity."""

    def __init__(self, response, block_size: int, max_response_length: int,
                 interpret: bool | None = None, storage: str = "float32"):
        response = np.asarray(response, np.float32)
        self.cfg = uniform.make_config(block_size, max_response_length)
        if storage not in ("float32", "bf16_packed", "auto"):
            raise ValueError(
                "storage must be 'float32', 'bf16_packed', or 'auto'"
            )
        if storage == "auto":
            # measured policy (benchmarks/exp_packed_crossover): the f32
            # step is FASTER wherever it fits VMEM (the unpack's VPU issue
            # outweighs the halved DMA at in-VMEM segment counts); packing
            # earns its keep by fitting ~2x the IR, so auto = f32 when it
            # fits, packed when only packed fits
            storage = ("float32" if pallas_engine.fits_vmem(self.cfg)
                       else "bf16_packed")
        self._packed = storage == "bf16_packed"
        fits = (pallas_engine.fits_vmem_packed if self._packed
                else pallas_engine.fits_vmem)
        if not fits(self.cfg):
            raise ValueError(
                "working set exceeds the VMEM budget; use FFTConvolver or "
                "TwoStageFFTConvolver for IRs this long"
            )
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self._interpret = interpret
        _, state = uniform.init(response, block_size, max_response_length)
        build = (pallas_engine.from_uniform_packed if self._packed
                 else pallas_engine.from_uniform)
        self.consts, self.state = build(self.cfg, state)

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
        if self._packed:
            from .ops.packing import pack_c32

            self.consts = self.consts._replace(
                ir2_w=jax.jit(pack_c32)(ir2_re, ir2_im)
            )
        else:
            self.consts = self.consts._replace(ir2_re=ir2_re, ir2_im=ir2_im)
        self.state = self.state._replace(
            overlap=jnp.zeros_like(self.state.overlap)
        )

    def reset(self) -> None:
        self.state = jax.tree.map(jnp.zeros_like, self.state)

    def process(self, input) -> np.ndarray:
        x = np.asarray(input, np.float32)
        if x.shape[0] != self.cfg.block_size:
            raise ValueError(
                f"PallasFFTConvolver.process takes exactly one "
                f"{self.cfg.block_size}-sample block (got {x.shape[0]}); "
                "use FFTConvolver for arbitrary lengths"
            )
        step = _jit_step(self.cfg, self._interpret, self._packed)
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
        other._packed = self._packed
        return other
