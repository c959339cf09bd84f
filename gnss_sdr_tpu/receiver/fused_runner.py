"""Receiver-side driver for the fused whole-block tracking kernel.

Bridges the Receiver's exact per-channel ledger (ChannelState: uint32
carrier/chip accumulators, block-relative offsets) to the pallas fused
kernel's [C, 128] f32 column state (ops/pallas/track_block_fused.py) and
back, once per sample block:

  host ChannelState --anchor--> [C,128] matrix + offsets + chip phases
       -> jit( slice_windows + build_replicas + track_block_fused )
       -> EpochTelemetry + re-absorbed ChannelState

Re-anchoring each block keeps the cross-block bookkeeping exact (u32)
while the in-block loop runs in f32 on-core — the fused kernel's design
contract. Shipped-path performance numbers live in the round's
BENCH_r{N}.json (canonical) and the ROADMAP.md round-5 ledger; the
scanned XLA path the kernel replaces measured 1.9x realtime on the
same chip.

Lifecycle corners handled here, not in the kernel:

  * late handoffs: a channel whose offset leaves no room for T full
    epochs in the buffer is deferred one block (its state passes
    through untouched; after rebase it fits). The XLA path instead
    runs partial epochs — one block of extra cold-start latency is the
    cost of the fused path's static shape.
  * offset walk: with a fixed T epochs per block, a channel's offset
    moves by its accumulated drift each block. If it falls below the
    el_pad preroll margin the channel skips forward one code period
    (code phase is periodic, so only that single epoch is lost).
The kernel carries the scanned path's full feature set: carrier
aiding, power/Costas lock modes, and sub-sample code interpolation are
forwarded as kernel statics (see ops/pallas/track_block_fused.py).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..config import TrackConfig
from ..models.constellation import SignalSpec
from ..ops.pallas import track_block_fused as fused
from . import tracking as trk

_U32 = 4294967296.0
N_DRIFT = 5


class _SpanHandle(tuple):
    """(led, ys, extra, n_blocks) for the pipelined span API — device
    arrays from an asynchronously dispatched span program."""

    __slots__ = ()

    def __new__(cls, led, ys, extra, n_blocks):
        return tuple.__new__(cls, (led, ys, extra, n_blocks))

    led = property(lambda s: s[0])
    ys = property(lambda s: s[1])
    extra = property(lambda s: s[2])
    n_blocks = property(lambda s: s[3])


@functools.partial(jax.jit, static_argnames=("nominal_rate",))
def _apply_handoffs(led, channels, carr_freqs, offsets, *,
                    nominal_rate):
    """Device-side start_channel for up to 8 handoff slots (-1 = empty):
    one-hot row masks instead of scatter (the axon backend has no
    scatter)."""
    active, offset, epochs, ci, cf, fc = led
    c = active.shape[0]
    row = jnp.arange(c, dtype=jnp.int32)
    for h in range(channels.shape[0]):
        m = row == channels[h]                        # [-1 matches none]
        mf = m.astype(jnp.float32)
        active = jnp.where(m, 1.0, active)
        offset = jnp.where(m, offsets[h], offset)
        epochs = jnp.where(m, 0, epochs)
        ci = jnp.where(m, 0, ci)
        cf = jnp.where(m, 0.0, cf)
        new_fc = jnp.stack([
            jnp.full((c,), carr_freqs[h], jnp.float32),
            jnp.zeros((c,), jnp.float32),
            jnp.zeros((c,), jnp.float32),
            jnp.full((c,), jnp.float32(nominal_rate)),
            jnp.zeros((c,), jnp.float32),
            jnp.zeros((c,), jnp.float32),
            jnp.ones((c,), jnp.float32),   # handoff lock-EMA grace
        ], axis=1)
        fc = jnp.where(mf[:, None] > 0.5, new_fc, fc)
    return (active, offset, epochs, ci, cf, fc)
N_TELEM_COLS = 17   # used telemetry columns (kernel docstring)
# the mxu kernel adds cols 17-20 (held NCO rates + ledger increments
# per superstep — the slim2 wire's ledger-replay anchors)
N_TELEM_COLS_MXU = 21


class FusedTracker:
    """Per-receiver instance wrapping the jitted fused block step.

    ``layout`` selects the window feed / correlation formulation:
      * "mxu" (the accelerator default via TrackConfig.fused_layout
        "auto") — direct-DMA supersteps whose E/P/L correlation runs
        as ONE block-diagonal bf16 MXU contraction per held-rate
        superstep (track_block_fused_mxu; see its docstring for the
        NCO-decimation semantics). Fastest by ~1.5-2x over "direct".
      * "direct" — per-channel double-buffered in-kernel DMA straight
        from the shared stream, exact per-epoch NCO semantics
        (track_block_fused_direct). Requires t_epochs % (2K) == 0 for
        some K (fused.choose_k).
      * "seg" — per-channel HBM segments via gather_segments +
        track_block_fused_seg (no XLA window materialization).
      * "windows" — the original [T, C, WP] streamed layout
        (slice_windows + track_block_fused), kept for A/B benching.
    direct/seg/windows produce identical telemetry/state
    (tests/test_fused_kernel.py::TestLayoutParity); mxu matches to
    bf16 tolerance with exact bookkeeping
    (tests/test_mxu_kernel.py).

    ``wire`` selects the run_blocks telemetry download format: "f32"
    (bit-exact), "slim" (~4.5x fewer bytes), or "slim2" (mxu only,
    ~13x: 5 B/epoch/channel with host-side ledger replay).

    The span API (submit_span / collect_span / absorb_led /
    apply_handoffs_device) lets the steady-state receiver chain spans
    on device and download telemetry from a collector thread
    (Receiver.run(span_pipeline=True)).
    """

    def __init__(self, params: trk.TrackParams, cfg: TrackConfig,
                 spec: SignalSpec, fs_hz: float, codes_sampled,
                 t_epochs: int, buf_len: int, layout: str = "direct",
                 mesh=None, wire: str = "f32",
                 shared_fetch: bool = False):
        if cfg.lock_mode not in ("power", "costas"):
            raise ValueError(
                f"correlator='fused': unknown lock_mode {cfg.lock_mode!r}")
        if layout not in ("mxu", "direct", "seg", "windows"):
            raise ValueError(f"unknown fused layout {layout!r}")
        if wire not in ("f32", "slim", "slim2"):
            raise ValueError(f"unknown telemetry wire {wire!r}")
        # diagnostic-column stride for the slim wire: the largest
        # divisor of t_epochs <= 8 (5 ms cadence at 1 ms epochs)
        self.wire_stride = next(
            s for s in (8, 5, 4, 2, 1) if t_epochs % s == 0)
        # mxu superstep cap: 8 epochs (NCO >= 125 Hz) for the power
        # detector; 2 for costas — its lock EMA is PHASE-sensitive and
        # an adversarial initial carrier phase can push the EMA below
        # threshold during the held-rate latency, freezing the loop
        # before the first correction lands (observed at K=5,
        # tests/test_mxu_kernel.py::TestMxuTracking::test_costas_mode)
        mxu_k_max = 2 if cfg.lock_mode == "costas" else 8
        if (layout == "mxu"
                and fused.choose_k(t_epochs, k_max=mxu_k_max) is None):
            layout = "direct"       # odd t_epochs: no superstep pairing
        if layout == "direct" and fused.choose_k(t_epochs) is None:
            layout = "seg"          # odd t_epochs: no superstep pairing
        if wire == "slim2" and layout != "mxu":
            # slim2's exact host-side ledger reconstruction rides the
            # mxu kernel's held-rate columns (17/18); other layouts
            # change rates per epoch
            wire = "slim"
        self.wire = wire
        self.params = params
        self.spec = spec
        self.fs = fs_hz
        self.n0 = params.samples_per_code_nominal
        self.t_epochs = t_epochs
        self.layout = layout
        # seg windows carry up to 127+127 extra lanes of alignment
        # residue (rem_c0 + rem_t), hence the +256; direct adds the
        # dynamic superstep residue rem_j on top (+384); mxu widens the
        # replica bank by 2*el_shift rows, growing the preroll
        extra = {"mxu": 384 + 2 * params.el_shift, "direct": 384,
                 "seg": 256, "windows": 0}[layout]
        self.wp = ((params.window + extra + 63 + 127) // 128) * 128
        # replica rows: mxu correlates against the FULL shift range
        # (drift variants + E/L lags) in one MXU contraction; the other
        # layouts store prompt drift variants only
        self.n_rows = (fused.mxu_rows(N_DRIFT, params.el_shift)
                       if layout == "mxu" else N_DRIFT)
        self.half = (self.n_rows - 1) // 2
        self.el_pad = params.el_shift + self.half
        self.codes_sampled = jnp.asarray(codes_sampled)
        if layout in ("direct", "mxu"):
            self.k_epochs = fused.choose_k(
                t_epochs, k_max=mxu_k_max if layout == "mxu" else 16)
            # worst DMA read end: a_c + off_last + span
            #   <= off + (T-1)*n0 + wp - el_pad  (fused_runner math)
            self.max_offset = (buf_len - (t_epochs - 1) * self.n0
                               - self.wp + self.el_pad - 1)
        elif layout == "seg":
            self.l_seg = fused.seg_length(t_epochs, self.n0, self.wp)
            # gather reads [a_c, a_c + l_seg); a_c <= off - el_pad
            self.max_offset = buf_len - self.l_seg + self.el_pad - 1
        else:
            # last offset that still fits T+1 nominal epochs + window
            self.max_offset = buf_len - (t_epochs * self.n0 + self.wp)
        if self.max_offset <= self.el_pad + self.n0:
            if layout == "seg":
                need = self.l_seg + self.n0 + 1 - self.el_pad
            elif layout in ("direct", "mxu"):
                need = (t_epochs - 1) * self.n0 + self.wp + self.n0
            else:
                need = t_epochs * self.n0 + self.wp + self.n0
            raise ValueError(
                f"buffer too short for fused tracking "
                f"(layout={layout!r}): len={buf_len}, need > {need}")
        if (layout in ("seg", "direct", "mxu")
                and self.n0 <= self.el_pad + self.half + 128):
            # the kernel's lane_shift guard would only fire inside the
            # first jitted run_block; fail at construction instead
            raise ValueError(
                f"n0={self.n0} too small for the {layout} fused layout "
                f"(need > {self.el_pad + self.half + 128}); use "
                "layout='windows'")
        p1, p2, d1, d2 = fused.loop_filter_consts(cfg)
        # carrier aiding / Costas lock / code interpolation are kernel
        # statics (parity with the scanned path, receiver/tracking.py)
        self.aiding_scale = (float(params.aiding_scale)
                             if cfg.carrier_aiding else 0.0)
        self.if_freq = float(params.if_freq_hz)
        step_fn = {"mxu": _fused_block_step_mxu,
                   "direct": _fused_block_step_direct,
                   "seg": _fused_block_step_seg,
                   "windows": _fused_block_step}[layout]
        self._step = functools.partial(
            step_fn,
            t_epochs=t_epochs, n0=self.n0, wp=self.wp,
            el_pad=self.el_pad, el_shift=params.el_shift,
            fs=fs_hz, code_len=float(spec.code_length_chips),
            lock_threshold=cfg.lock_threshold,
            max_lost=cfg.max_lost_epochs,
            pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
            aiding_scale=self.aiding_scale, if_freq=self.if_freq,
            lock_mode=cfg.lock_mode,
            costas_thr=cfg.costas_lock_threshold,
            interp=cfg.interp_code,
        )
        if layout == "seg":
            self._step = functools.partial(self._step, l_seg=self.l_seg)
        elif layout in ("direct", "mxu"):
            self._step = functools.partial(self._step,
                                           k_epochs=self.k_epochs)
        if layout == "mxu":
            # shared-fetch window feed (opt-in): one HBM fetch per
            # superstep + per-channel VMEM copies (kernel docstring).
            # The cap bounds the per-channel DMA-start spread the
            # shared slot covers (~1 code period + walk/drift margin;
            # channels beyond it defer a block — unreachable in steady
            # state, where post-walk offsets live in
            # [el_pad, el_pad + n0)). Measured at 32 ch / 2.046 MHz
            # (tools/mxu_ablate_probe.py): pure window DMA drops
            # 0.73 -> 0.10 ms/signal-s, but the whole kernel is
            # unchanged — the per-channel HBM DMA is already hidden
            # under compute by the double buffering, so this is OFF by
            # default; it pays when HBM pressure matters (capture-rate
            # streams, co-tenant kernels). Unavailable under a mesh:
            # the [C+1] starts vector does not channel-shard.
            self.spread_cap = 0
            if shared_fetch and mesh is None:
                self.spread_cap = ((self.n0 + 512 + 127) // 128) * 128
            self._step = functools.partial(self._step,
                                           n_rows=self.n_rows,
                                           spread_cap=self.spread_cap)
        else:
            self.spread_cap = 0
        if mesh is not None:
            # channel-shard the kernel over the mesh: each device runs
            # the pallas step on its own channel rows (zero collectives)
            from .. import parallel as par_mod

            n_ch_axis = dict(zip(mesh.axis_names, mesh.devices.shape)
                             ).get(par_mod.CHANNEL_AXIS, 1)
            if cfg.n_channels % n_ch_axis:
                raise ValueError(
                    f"n_channels={cfg.n_channels} not divisible by the "
                    f"mesh channel axis ({n_ch_axis})")
            self._step = par_mod.shard_fused_step(mesh, self._step)
        self.mesh = mesh
        self._scan_fn = None      # built lazily by run_blocks
        # optional extra computation fused into the span program:
        # span_extra(stream_re, stream_im) -> pytree runs INSIDE the
        # run_blocks jit (e.g. the paced acquisition search — zero
        # extra host round trips); its device_get result lands in
        # last_span_extra after each run_blocks call
        self.span_extra = None
        self.last_span_extra = None

    # ------------------------------------------------------------------
    def run_block(self, state: trk.ChannelState, block_re, block_im,
                  codes_rows) -> tuple[trk.ChannelState,
                                       trk.EpochTelemetry]:
        """One fused block: T epochs for every eligible channel."""
        c = int(state.active.shape[0])
        active0 = np.asarray(state.active)
        offset0 = np.asarray(state.offset).astype(np.int64).copy()
        epochs0 = np.asarray(state.epochs).astype(np.int64)
        cp0 = (np.asarray(state.chip_int).astype(np.float64)
               + np.asarray(state.chip_frac_u32).astype(np.float64)
               / _U32)

        # offset-walk wrap: skip one code period when below the preroll
        low = active0 & (offset0 < self.el_pad)
        offset0[low] += self.n0
        # the skipped period still advances SIGNAL time: count it in
        # the epoch base, or every later epoch's 20 ms bit-grid phase
        # (nav bit sync) and anchor-relative transmit time (PVT — one
        # code period = ~300 km of pseudorange) are off by one period
        epochs0 = epochs0 + low.astype(np.int64)
        # defer channels that cannot fit T epochs this block
        eligible = active0 & (offset0 <= self.max_offset)

        mat = np.zeros((c, fused.N_FIELDS), np.float32)
        mat[:, 0] = np.asarray(state.carr_freq)
        mat[:, 1] = np.asarray(state.carr_acc).astype(np.float64) / _U32
        mat[:, 2] = np.asarray(state.carr_err)
        rate = np.asarray(state.code_rate).astype(np.float32)
        mat[:, 3] = np.where(rate > 0, rate,
                             np.float32(self.spec.code_rate_hz))
        mat[:, 5] = np.asarray(state.code_err)
        mat[:, 6] = np.asarray(state.lost_count)
        mat[:, 7] = eligible.astype(np.float32)
        mat[:, 11] = np.asarray(state.lock_ema)
        # replica rounding residual: the kernel's in-block replica
        # select must know how far the block-start replica sits from
        # the true ledger phase (see kernel state col 10). With carrier
        # aiding the kernel steps chips at the EFFECTIVE rate, so the
        # anchor must use the same rate — and in the kernel's EXACT f32
        # arithmetic: an f64 host rate the f32 kernel cannot represent
        # puts frac0 in a different sample-equivalence class whenever
        # the ledger sits near a sample boundary, and a mis-anchored
        # replica at a block seam is a permanent half-chip offset the
        # DLL re-absorbs into a runaway (observed: prompt collapse
        # after ~100 epochs with aiding on)
        rate_eff = mat[:, 3].astype(np.float32)
        if self.aiding_scale:
            rate_eff = rate_eff + (
                mat[:, 0] - np.float32(self.if_freq)
            ) * np.float32(self.aiding_scale)
        dc0 = (rate_eff / np.float32(self.fs)).astype(np.float32)
        # anchor and frac0 from ONE floor — build_replicas consumes the
        # anchor verbatim, so host and device can never disagree about
        # which sample class the block-start replica sits in (see
        # build_replicas docstring for the failure mode)
        s_anchor = np.floor(cp0.astype(np.float32) / dc0)
        frac0 = cp0.astype(np.float32) - s_anchor.astype(np.float32) * dc0
        mat[:, 10] = frac0

        anchor = np.mod(s_anchor, self.n0).astype(np.int32)
        # offsets/anchor ride spare state columns (12/13) so the whole
        # per-block host->device side is ONE array upload, and the two
        # result downloads batch into ONE device_get round trip — each
        # separate transfer costs a full sync quantum on a remote
        # device transport (~30 ms on the tunneled session backend)
        step_args = ()
        if self.layout in ("seg", "direct", "mxu"):
            # 128-aligned gather/DMA starts; the residue rem_c0 rides
            # col 9 (as el_pad + rem_c0 = off - a_c, the kernel's mask
            # base) and shifts the replica anchor (build_replicas
            # lane_shift)
            a_c = ((offset0 - self.el_pad) // 128) * 128
            a_c = np.where(eligible, np.maximum(a_c, 0), 0)
            if self.spread_cap:
                # shared-fetch guard: base anchors to the HIGHEST
                # eligible start (so base + span_u never over-reads the
                # buffer); channels spread further than the cap below
                # it defer one block (kernel contract,
                # track_block_fused_mxu docstring)
                mx = int(a_c[eligible].max()) if eligible.any() else 0
                base = max(0, mx - self.spread_cap)
                eligible = eligible & (a_c >= base)
                a_c = np.where(eligible, a_c, base)
                mat[:, 7] = eligible.astype(np.float32)
                step_args = (jnp.asarray(np.append(a_c, base)
                                         .astype(np.int32)),)
            mat[:, 9] = np.where(eligible, offset0 - a_c,
                                 self.el_pad).astype(np.float32)
            mat[:, 12] = a_c.astype(np.float32)
        else:
            mat[:, 12] = np.where(eligible, offset0, 0).astype(np.float32)
        mat[:, 13] = anchor.astype(np.float32)
        telem_m, mat_out = jax.device_get(self._step(
            jnp.asarray(block_re), jnp.asarray(block_im),
            codes_rows, jnp.asarray(mat), *step_args,
        ))

        # ---- absorb kernel state back into the exact ledger ----------
        el = eligible
        cp_out = np.mod(cp0 + mat_out[:, 4].astype(np.float64),
                        float(self.spec.code_length_chips))
        chip_int = np.asarray(state.chip_int).copy()
        chip_frac = np.asarray(state.chip_frac_u32).copy()
        chip_int[el] = np.floor(cp_out[el]).astype(np.int32)
        chip_frac[el] = np.minimum(
            (cp_out[el] - np.floor(cp_out[el])) * _U32, _U32 - 1.0
        ).astype(np.uint32)
        processed = telem_m[:, :, 16] > 0.5           # [T, C]
        n_proc = processed.sum(axis=0).astype(np.int64)

        def merge(old, new, cast=None):
            out = np.asarray(old).copy()
            out[el] = new[el] if cast is None else new[el].astype(cast)
            return out

        # numpy-backed state between fused blocks: the host re-anchors
        # every block anyway, so round-tripping 13 small arrays through
        # the device per block is pure transfer overhead
        new_state = state._replace(
            active=merge(state.active, mat_out[:, 7] > 0.5),
            offset=merge(
                offset0.astype(np.int32),
                (offset0 + self.t_epochs * self.n0
                 + mat_out[:, 8]).astype(np.int64), np.int32),
            epochs=merge(state.epochs, epochs0 + n_proc, np.int32),
            lost_count=merge(state.lost_count, mat_out[:, 6], np.int32),
            carr_freq=merge(state.carr_freq, mat_out[:, 0]),
            carr_acc=merge(
                state.carr_acc,
                np.mod(mat_out[:, 1].astype(np.float64), 1.0) * _U32,
                np.uint32),
            carr_err=merge(state.carr_err, mat_out[:, 2]),
            code_rate=merge(state.code_rate, mat_out[:, 3]),
            chip_int=chip_int.astype(np.int32),
            chip_frac_u32=chip_frac.astype(np.uint32),
            code_err=merge(state.code_err, mat_out[:, 5]),
            lock_ema=merge(state.lock_ema, mat_out[:, 11]),
        )

        telem = self._telem_from(telem_m, offset0, epochs0, cp0)
        return new_state, telem

    # ------------------------------------------------------------------
    def _telem_from(self, telem_m, offset0, epochs0, cp0
                    ) -> trk.EpochTelemetry:
        """EpochTelemetry [T, C] from one block's kernel telemetry and
        the block-entry ledger snapshot (offsets post-walk, epoch
        counts, chip phases)."""
        processed = telem_m[:, :, 16] > 0.5           # [T, C]
        t_idx = np.arange(self.t_epochs, dtype=np.int64)[:, None]
        start_offset = offset0[None, :].astype(np.int64) \
            + t_idx * self.n0 + telem_m[:, :, 13].astype(np.int64)
        epoch_index = epochs0[None, :].astype(np.int64) \
            + np.cumsum(processed, axis=0) - processed
        chip_phase = np.mod(cp0[None, :] + telem_m[:, :, 14],
                            float(self.spec.code_length_chips))
        # numpy-backed telemetry: the [T, C, 128] matrix was downloaded
        # once; wrapping fields back into device arrays would cost
        # 17 re-uploads per block and 17 re-downloads in the host-side
        # telemetry/nav consumers (ruinous over a remote device
        # transport) for zero benefit — every consumer is numpy
        return trk.EpochTelemetry(
            processed=processed,
            i_e=telem_m[:, :, 0],
            q_e=telem_m[:, :, 1],
            i_p=telem_m[:, :, 2],
            q_p=telem_m[:, :, 3],
            i_l=telem_m[:, :, 4],
            q_l=telem_m[:, :, 5],
            power=telem_m[:, :, 6],
            locked=telem_m[:, :, 7] > 0.5,
            lost_event=telem_m[:, :, 15] > 0.5,
            pll_err=telem_m[:, :, 8],
            dll_err=telem_m[:, :, 9],
            carr_freq=telem_m[:, :, 10],
            code_rate=telem_m[:, :, 11],
            start_offset=start_offset.astype(np.int32),
            epoch_index=epoch_index.astype(np.int32),
            chip_phase=chip_phase.astype(np.float32),
        )

    # ------------------------------------------------------------------
    def _pack_wire(self, telem_m):
        """Device-side slim wire pack of one block's [T, C, >=17] f32
        telemetry: per-epoch prompt I/Q (bf16), packed lifecycle flags
        (int8), drift (int16) and chip_res (f32, pseudorange-critical);
        E/L correlators, loop errors and NCO rates at superstep stride
        (diagnostics — their consumers are plots and block-scale
        estimators). ~4.5x fewer bytes than the full f32 wire; the
        steady-state e2e path is download-bound over a remote device
        transport (VERDICT round-3 weak #3)."""
        s = self.wire_stride
        iq_p = telem_m[:, :, 2:4].astype(jnp.bfloat16)
        flags = (telem_m[:, :, 16] + 2.0 * telem_m[:, :, 7]
                 + 4.0 * telem_m[:, :, 15]).astype(jnp.int8)
        drift = telem_m[:, :, 13].astype(jnp.int16)
        cp = telem_m[:, :, 14]
        sub = telem_m[::s]
        sub_el = jnp.concatenate(
            [sub[:, :, 0:2], sub[:, :, 4:6]], axis=2).astype(jnp.bfloat16)
        sub_errs = sub[:, :, 8:10].astype(jnp.bfloat16)
        sub_rates = sub[:, :, 10:12]
        return (iq_p, flags, drift, cp, sub_el, sub_errs, sub_rates)

    def _telem_from_wire(self, wire_b, offset0, epochs0, cp0
                         ) -> trk.EpochTelemetry:
        """EpochTelemetry from one block's slim wire (numpy): exact for
        everything the nav/observables path consumes (prompt signs,
        flags, epoch timing, chip phase); E/L, loop errors and rates
        are superstep-stride samples repeated across their superstep
        (documented slim-wire semantics)."""
        iq_p, flags, drift, cp, sub_el, sub_errs, sub_rates = wire_b
        t = self.t_epochs
        s = self.wire_stride

        def rep(a):
            return np.repeat(np.asarray(a, np.float32), s, axis=0)[:t]

        i_p = iq_p[:, :, 0].astype(np.float32)
        q_p = iq_p[:, :, 1].astype(np.float32)
        fl = flags.astype(np.int32)
        processed = (fl & 1) > 0
        locked = (fl & 2) > 0
        lost_event = (fl & 4) > 0
        t_idx = np.arange(t, dtype=np.int64)[:, None]
        start_offset = offset0[None, :].astype(np.int64) \
            + t_idx * self.n0 + drift.astype(np.int64)
        epoch_index = epochs0[None, :].astype(np.int64) \
            + np.cumsum(processed, axis=0) - processed
        chip_phase = np.mod(cp0[None, :] + cp,
                            float(self.spec.code_length_chips))
        return trk.EpochTelemetry(
            processed=processed,
            i_e=rep(sub_el[:, :, 0]), q_e=rep(sub_el[:, :, 1]),
            i_p=i_p, q_p=q_p,
            i_l=rep(sub_el[:, :, 2]), q_l=rep(sub_el[:, :, 3]),
            power=i_p * i_p + q_p * q_p,
            locked=locked, lost_event=lost_event,
            pll_err=rep(sub_errs[:, :, 0]),
            dll_err=rep(sub_errs[:, :, 1]),
            carr_freq=rep(sub_rates[:, :, 0]),
            code_rate=rep(sub_rates[:, :, 1]),
            start_offset=start_offset.astype(np.int32),
            epoch_index=epoch_index.astype(np.int32),
            chip_phase=chip_phase.astype(np.float32),
        )

    # ------------------------------------------------------------------
    def _pack_wire2(self, telem_m):
        """slim2: the mxu-exact wire. Per epoch only prompt I/Q (bf16)
        and packed flags (int8) cross the wire — 5 bytes/epoch/channel.
        The per-epoch chip/drift ledger is NOT shipped: it is pure f32
        arithmetic in the superstep's held NCO rates (kernel cols
        17/18, one f32 pair per superstep), which the host replays
        bit-exactly (_telem_from_wire2). E/L correlators and loop
        errors ride at 2K stride (diagnostics). ~8.7x fewer bytes than
        the f32 wire."""
        k = self.k_epochs
        iq_p = telem_m[:, :, 2:4].astype(jnp.bfloat16)
        flags = (telem_m[:, :, 16] + 2.0 * telem_m[:, :, 7]
                 + 4.0 * telem_m[:, :, 15]).astype(jnp.int8)
        held = telem_m[::k, :, 17:21]                  # [U, C, 4] f32
        sub = telem_m[::2 * k]
        sub_el = jnp.concatenate(
            [sub[:, :, 0:2], sub[:, :, 4:6]], axis=2).astype(jnp.bfloat16)
        sub_errs = sub[:, :, 8:10].astype(jnp.bfloat16)
        return (iq_p, flags, held, sub_el, sub_errs)

    def _telem_from_wire2(self, wire_b, offset0, epochs0, cp0
                          ) -> trk.EpochTelemetry:
        """EpochTelemetry from one block's slim2 wire: the chip/drift
        ledger (chip_phase, start_offset) reconstructs EXACTLY —
        np.float32 replays the kernel's own held-rate arithmetic
        (chip_e = chip0 + e*d_chip in-superstep; chip0 += n_act*d_chip
        at boundaries, n_act from the processed flags). Prompt I/Q is
        bf16; E/L, loop errors and NCO-rate traces repeat their
        superstep samples (documented slim-wire semantics)."""
        iq_p, flags, held, sub_el, sub_errs = wire_b
        t = self.t_epochs
        k = self.k_epochs
        u_count = t // k
        c = iq_p.shape[1]
        s2 = 2 * k

        i_p = iq_p[:, :, 0].astype(np.float32)
        q_p = iq_p[:, :, 1].astype(np.float32)
        fl = flags.astype(np.int32)
        processed = (fl & 1) > 0
        locked = (fl & 2) > 0
        lost_event = (fl & 4) > 0

        # replay the kernel's held-rate ledger from ITS OWN per-epoch
        # increments (cols 19/20, constant within a superstep), in f64:
        # drift is integer arithmetic (exact); chip accumulates one
        # f32-vs-f64 rounding per superstep, bounded by ~1e-5 chips
        # (~3 mm of pseudorange) over a block
        cf_held = held[:, :, 0]                        # [U, C] f32
        cr_held = held[:, :, 1]
        d_chip = held[:, :, 2].astype(np.float64)
        d_drift = held[:, :, 3].astype(np.float64)
        n_act = processed.reshape(u_count, k, c).sum(1).astype(
            np.float64)
        ef = np.arange(k, dtype=np.float64)[None, :, None]  # [1, K, 1]
        # superstep-start values via cumsum (sequential adds — the same
        # f64 sequence as the accumulation loop it replaces; the loop
        # measured ~4 ms/signal-s of host time at 100 supersteps/block)
        inc_c = n_act * d_chip                         # [U, C]
        inc_d = n_act * d_drift
        chip0 = np.zeros((u_count, c), np.float64)
        drift0 = np.zeros((u_count, c), np.float64)
        np.cumsum(inc_c[:-1], axis=0, out=chip0[1:])
        np.cumsum(inc_d[:-1], axis=0, out=drift0[1:])
        chip_e = (chip0[:, None, :] + ef * d_chip[:, None, :]
                  ).reshape(t, c)
        drift_e = (drift0[:, None, :] + ef * d_drift[:, None, :]
                   ).reshape(t, c)

        def rep(a, s):
            return np.repeat(np.asarray(a, np.float32), s, axis=0)[:t]

        t_idx = np.arange(t, dtype=np.int64)[:, None]
        start_offset = offset0[None, :].astype(np.int64) \
            + t_idx * self.n0 + drift_e.astype(np.int64)
        epoch_index = epochs0[None, :].astype(np.int64) \
            + np.cumsum(processed, axis=0) - processed
        chip_phase = np.mod(
            cp0[None, :] + np.where(processed, chip_e, 0.0),
            float(self.spec.code_length_chips))
        return trk.EpochTelemetry(
            processed=processed,
            i_e=rep(sub_el[:, :, 0], s2), q_e=rep(sub_el[:, :, 1], s2),
            i_p=i_p, q_p=q_p,
            i_l=rep(sub_el[:, :, 2], s2), q_l=rep(sub_el[:, :, 3], s2),
            power=i_p * i_p + q_p * q_p,
            locked=locked, lost_event=lost_event,
            pll_err=rep(sub_errs[:, :, 0], s2),
            dll_err=rep(sub_errs[:, :, 1], s2),
            carr_freq=rep(cf_held, k),
            code_rate=rep(cr_held, k),
            start_offset=start_offset.astype(np.int32),
            epoch_index=epoch_index.astype(np.int32),
            chip_phase=chip_phase.astype(np.float32),
        )

    # ------------------------------------------------------------------
    # Multi-block device-resident scan: the per-block re-anchor runs
    # IN-GRAPH, so the host syncs ONCE per n_blocks blocks.
    # ------------------------------------------------------------------
    def run_blocks(self, state: trk.ChannelState, stream_re, stream_im,
                   codes_rows, n_blocks: int, extra_args=()
                   ) -> tuple[trk.ChannelState, list[trk.EpochTelemetry]]:
        """Process ``n_blocks`` consecutive blocks in ONE device program.

        ``stream_re``/``stream_im`` cover ``[history | n_blocks *
        block]`` samples (history = the single-block window's history).
        The cross-block ledger lives ON DEVICE inside a lax.scan —
        chip phase as (int32 chips, f32 frac) so per-block rounding
        stays ~2^-22 chips instead of compounding at the f32 ulp of the
        full phase — and the exact u32 host ledger re-absorbs once at
        the end. Telemetry for all blocks downloads in ONE device_get.

        Block b's telemetry offsets are relative to window b (global
        start advances by one block per b); the returned state's
        offsets are already rebased past the whole span (the caller
        must NOT rebase again).
        """
        handle = self.submit_span(state, stream_re, stream_im,
                                  codes_rows, n_blocks,
                                  extra_args=extra_args)
        # ONE device_get for telemetry + search output + ledger: each
        # separate fetch is a full sync round trip on a remote device
        # transport (~25 ms on the tunneled session link — at 8 s spans
        # a second fetch alone costs ~3 ms/signal-s of e2e budget)
        ys, extra, led = jax.device_get(
            (handle.ys, handle.extra, handle.led))
        telems, extra = self.collect_span(handle, fetched=(ys, extra))
        self.last_span_extra = extra
        return self.absorb_led(state, led), telems

    # ------------------------------------------------------------------
    # Pipelined span API: submit_span dispatches asynchronously and the
    # cross-span ledger can CHAIN ON DEVICE (pass handle.led as the
    # next submit's state) — the host only downloads telemetry
    # (collect_span) and absorbs the ledger when it actually needs it
    # (absorb_led). This is what lets the steady-state receiver overlap
    # span b's download/nav with span b+1's compute.
    # ------------------------------------------------------------------
    def _led_from_state(self, state: trk.ChannelState):
        rate = np.asarray(state.code_rate).astype(np.float32)
        fcols = np.stack([
            np.asarray(state.carr_freq, dtype=np.float32),
            (np.asarray(state.carr_acc).astype(np.float64)
             / _U32).astype(np.float32),
            np.asarray(state.carr_err, dtype=np.float32),
            np.where(rate > 0, rate, np.float32(self.spec.code_rate_hz)),
            np.asarray(state.code_err, dtype=np.float32),
            np.asarray(state.lost_count, dtype=np.float32),
            np.asarray(state.lock_ema, dtype=np.float32),
        ], axis=1)                                     # [C, 7]
        # ONE batched device_put (a per-leaf put is 6 separate
        # transfers on the wire; the tunnel charges per transfer)
        return jax.device_put((
            np.asarray(state.active).astype(np.float32),
            np.asarray(state.offset).astype(np.int32),
            np.asarray(state.epochs).astype(np.int32),
            np.asarray(state.chip_int).astype(np.int32),
            (np.asarray(state.chip_frac_u32)
             .astype(np.float64) / _U32).astype(np.float32),
            fcols,
        ))

    def submit_span(self, led_or_state, stream_re, stream_im,
                    codes_rows, n_blocks: int, extra_args=()):
        """Dispatch one span asynchronously. ``led_or_state`` is a host
        ChannelState OR a previous handle's ``led`` (device tuple — the
        zero-sync chaining path). Returns a handle with device arrays
        (led, ys, extra)."""
        if self.layout not in ("direct", "mxu"):
            raise ValueError(
                "run_blocks requires layout='direct' or 'mxu'")
        if self._scan_fn is None:
            self._scan_fn = self._make_scan()
        # ChannelState is a NamedTuple — distinguish it from the plain
        # 6-tuple device ledger by its _fields
        led0 = (self._led_from_state(led_or_state)
                if hasattr(led_or_state, "_fields")
                else led_or_state)
        led_f, ys, extra = self._scan_fn(
            jnp.asarray(stream_re), jnp.asarray(stream_im),
            codes_rows, led0, n_blocks, extra_args)
        return _SpanHandle(led=led_f, ys=ys, extra=extra,
                           n_blocks=n_blocks)

    def collect_span(self, handle, fetched=None):
        """Download one span's telemetry (+ in-span search output) and
        build the per-block EpochTelemetry list. Does NOT touch the
        ledger (stays on device for chaining). ``fetched`` supplies
        (ys, extra) already downloaded by the caller (run_blocks
        batches them with the ledger into one round trip)."""
        ys, extra = (fetched if fetched is not None
                     else jax.device_get((handle.ys, handle.extra)))
        extra = extra if self.span_extra is not None else None
        telems_m, aux_off, aux_ep, aux_ci, aux_cf = ys
        telems = []
        for b in range(handle.n_blocks):
            cp0 = aux_ci[b].astype(np.float64) + aux_cf[b]
            if self.wire == "slim2":
                telems.append(self._telem_from_wire2(
                    tuple(w[b] for w in telems_m),
                    aux_off[b].astype(np.int64),
                    aux_ep[b].astype(np.int64), cp0))
            elif self.wire == "slim":
                telems.append(self._telem_from_wire(
                    tuple(w[b] for w in telems_m),
                    aux_off[b].astype(np.int64),
                    aux_ep[b].astype(np.int64), cp0))
            else:
                telems.append(self._telem_from(
                    telems_m[b], aux_off[b].astype(np.int64),
                    aux_ep[b].astype(np.int64), cp0))
        return telems, extra

    def absorb_led(self, state: trk.ChannelState, led
                   ) -> trk.ChannelState:
        """Download a device ledger and fold it back into the exact
        host ChannelState (the end-of-pipeline / checkpoint sync)."""
        active_f, offset_f, epochs_f, ci_f, cf_f, fc_f = \
            jax.device_get(led)
        return state._replace(
            active=active_f > 0.5,
            offset=offset_f.astype(np.int32),
            epochs=epochs_f.astype(np.int32),
            lost_count=fc_f[:, 5].astype(np.int32),
            carr_freq=fc_f[:, 0].astype(np.float32),
            carr_acc=np.minimum(
                fc_f[:, 1].astype(np.float64) * _U32, _U32 - 1.0
            ).astype(np.uint32),
            carr_err=fc_f[:, 2].astype(np.float32),
            code_rate=fc_f[:, 3].astype(np.float32),
            chip_int=ci_f.astype(np.int32),
            chip_frac_u32=np.minimum(
                cf_f.astype(np.float64) * _U32, _U32 - 1.0
            ).astype(np.uint32),
            code_err=fc_f[:, 4].astype(np.float32),
            lock_ema=fc_f[:, 6].astype(np.float32),
        )

    def apply_handoffs_device(self, led, channels, carr_freqs, offsets):
        """Start up to len(channels) channels IN the device ledger (the
        pipelined path's start_channel — the next span chains off the
        result without a host sync). Mirrors trk.start_channel's field
        init; the caller updates codes_rows/prn bookkeeping host-side."""
        ch = np.full(8, -1, np.int32)
        fr = np.zeros(8, np.float32)
        off = np.zeros(8, np.int32)
        n = min(len(channels), 8)
        ch[:n] = channels[:n]
        fr[:n] = carr_freqs[:n]
        off[:n] = offsets[:n]
        return _apply_handoffs(
            led, jnp.asarray(ch), jnp.asarray(fr), jnp.asarray(off),
            nominal_rate=float(self.spec.code_rate_hz))

    def _make_scan(self):
        """jitted (stream, codes, ledger, n_blocks) -> (ledger', ys):
        the in-graph mirror of run_block's host re-anchor + absorb."""
        n0 = self.n0
        n0_f = np.float32(n0)
        el_pad = self.el_pad
        block_len = self.t_epochs * n0
        max_off = self.max_offset
        code_len_i = int(self.spec.code_length_chips)
        fs_f = np.float32(self.fs)
        aid = np.float32(self.aiding_scale)
        iff = np.float32(self.if_freq)
        step = self._step
        spread_cap = self.spread_cap
        pack = {"slim": self._pack_wire, "slim2": self._pack_wire2,
                "f32": None}[self.wire]
        # slim2 only reads diagnostics at superstep-start epochs: the
        # lean telemetry mode skips the 21-column scatter for the rest
        # (measured 1.3 ms/signal-s of VPU time in the full mode)
        step_kw = ({"telem_mode": "lean"}
                   if self.wire == "slim2" and self.layout == "mxu"
                   else {})
        span_extra = self.span_extra

        @functools.partial(jax.jit, static_argnames=("n_blocks",))
        def scan_fn(stream_re, stream_im, codes_rows, led0, n_blocks,
                    extra_args=()):
            def body(led, b):
                active, offset, epochs, ci, cf, fc = led
                act = active > 0.5
                # offset-walk wrap + eligibility (run_block's rules)
                low = jnp.logical_and(act, offset < el_pad)
                offset_w = jnp.where(low, offset + n0, offset)
                # count the skipped code period in the epoch base
                # (run_block's commentary: bit-grid + pseudorange)
                epochs = epochs + low.astype(jnp.int32)
                eligible = jnp.logical_and(act, offset_w <= max_off)
                # block-start anchor in the kernel's EXACT f32
                # arithmetic (see run_block's frac0 commentary)
                rate = fc[:, 3]
                rate_eff = rate + (fc[:, 0] - iff) * aid
                dc0 = rate_eff / fs_f
                cp0 = ci.astype(jnp.float32) + cf
                s_anchor = jnp.floor(cp0 / dc0)
                frac0 = cp0 - s_anchor * dc0
                anchor = s_anchor - jnp.floor(s_anchor / n0_f) * n0_f
                # absolute DMA starts for block b (outside the f32
                # state columns: they can exceed 2^24 on long streams)
                off_abs = offset_w + b * block_len
                a_abs = jnp.where(
                    eligible,
                    jnp.maximum(((off_abs - el_pad) >> 7) << 7, 0), 0)
                if spread_cap:
                    # shared-fetch guard (see run_block's commentary)
                    mx = jnp.max(jnp.where(eligible, a_abs, 0))
                    sh_base = jnp.maximum(mx - spread_cap, 0)
                    eligible = jnp.logical_and(eligible,
                                               a_abs >= sh_base)
                    a_abs = jnp.where(eligible, a_abs, sh_base)
                    starts_arg = jnp.concatenate(
                        [a_abs, sh_base[None]]).astype(jnp.int32)
                else:
                    starts_arg = a_abs
                col9 = jnp.where(eligible,
                                 (off_abs - a_abs).astype(jnp.float32),
                                 jnp.float32(el_pad))
                zero = jnp.zeros_like(rate)
                cols = jnp.stack([
                    fc[:, 0], fc[:, 1], fc[:, 2], rate, zero, fc[:, 4],
                    fc[:, 5], eligible.astype(jnp.float32), zero, col9,
                    frac0, fc[:, 6], zero, anchor], axis=1)
                mat = jnp.pad(cols, ((0, 0), (0, fused.N_FIELDS - 14)))
                telem_m, mat_out = step(stream_re, stream_im,
                                        codes_rows, mat, starts_arg,
                                        **step_kw)
                # ---- in-graph absorb (run_block's numpy, in jnp) ----
                delta = mat_out[:, 4]
                s = cf + delta                  # |cf|<1, |delta|<~4:
                k = jnp.floor(s)                # f32-exact carry split
                cf_n = jnp.where(eligible, s - k, cf)
                ci_raw = ci + k.astype(jnp.int32)
                ci_wrap = jnp.where(
                    ci_raw < 0, ci_raw + code_len_i,
                    jnp.where(ci_raw >= code_len_i,
                              ci_raw - code_len_i, ci_raw))
                ci_n = jnp.where(eligible, ci_wrap, ci)
                processed = telem_m[:, :, 16] > 0.5
                n_proc = processed.astype(jnp.int32).sum(axis=0)
                epochs_n = jnp.where(eligible, epochs + n_proc, epochs)
                # rebase folded in: eligible offsets advance by
                # T*n0 + drift then rebase by -block_len (= T*n0)
                offset_n = jnp.where(
                    eligible, offset_w + mat_out[:, 8].astype(jnp.int32),
                    offset_w - block_len)
                active_n = jnp.where(eligible, mat_out[:, 7] > 0.5, act)
                fc_n = jnp.where(eligible[:, None], jnp.stack([
                    mat_out[:, 0],
                    mat_out[:, 1] - jnp.floor(mat_out[:, 1]),
                    mat_out[:, 2], mat_out[:, 3], mat_out[:, 5],
                    mat_out[:, 6], mat_out[:, 11]], axis=1), fc)
                led_n = (active_n.astype(jnp.float32), offset_n,
                         epochs_n, ci_n, cf_n, fc_n)
                telem_out = (pack(telem_m) if pack is not None
                             else telem_m)
                return led_n, (telem_out, offset_w, epochs, ci, cf)
            led_f, ys = jax.lax.scan(body, led0,
                                     jnp.arange(n_blocks, dtype=jnp.int32))
            extra = (span_extra(stream_re, stream_im, *extra_args)
                     if span_extra is not None else ())
            return led_f, ys, extra
        return scan_fn


@functools.partial(
    jax.jit,
    static_argnames=("t_epochs", "n0", "wp", "el_pad", "el_shift", "fs",
                     "code_len", "lock_threshold", "max_lost",
                     "pll_c1", "pll_c2", "dll_c1", "dll_c2",
                     "aiding_scale", "if_freq", "lock_mode",
                     "costas_thr", "interp"),
)
def _fused_block_step(block_re, block_im,
                      codes_rows, state_mat, *, t_epochs, n0, wp, el_pad,
                      el_shift, fs, code_len, lock_threshold, max_lost,
                      pll_c1, pll_c2, dll_c1, dll_c2,
                      aiding_scale=0.0, if_freq=0.0, lock_mode="power",
                      costas_thr=0.4, interp=False):
    # offsets/anchor arrive in spare state columns 12/13 (exact in f32:
    # both < 2^24) — one upload instead of three per block
    offsets = state_mat[:, 12].astype(jnp.int32)
    anchor = state_mat[:, 13].astype(jnp.int32)
    wre, wim = fused.slice_windows(block_re, block_im, offsets,
                                   t_epochs, n0, wp, el_pad)
    # the sample anchor comes precomputed from the host, floor-
    # consistent with the frac0 state column (fused_runner.run_block)
    reps = fused.build_replicas(codes_rows, None, None, el_shift,
                                n0, wp, n_drift=N_DRIFT, anchor=anchor)
    telem, st = fused.track_block_fused(
        wre, wim, reps, state_mat, n0=n0, fs=fs, code_len=code_len,
        lock_threshold=lock_threshold, max_lost=max_lost,
        pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1, dll_c2=dll_c2,
        el_shift=el_shift,
        aiding_scale=aiding_scale, if_freq=if_freq, lock_mode=lock_mode,
        costas_thr=costas_thr, interp=interp,
        interpret=jax.default_backend() == "cpu",
    )
    # only the first N_TELEM_COLS of the 128-lane telemetry rows carry
    # data; slicing ON DEVICE cuts the host download ~7.5x per block
    # (material over a remote device transport)
    return telem[:, :, :N_TELEM_COLS], st


@functools.partial(
    jax.jit,
    static_argnames=("t_epochs", "n0", "wp", "el_pad", "el_shift", "fs",
                     "code_len", "lock_threshold", "max_lost",
                     "pll_c1", "pll_c2", "dll_c1", "dll_c2",
                     "aiding_scale", "if_freq", "lock_mode",
                     "costas_thr", "interp", "l_seg"),
)
def _fused_block_step_seg(block_re, block_im,
                          codes_rows, state_mat, *, t_epochs, n0, wp,
                          el_pad, el_shift, fs, code_len,
                          lock_threshold, max_lost,
                          pll_c1, pll_c2, dll_c1, dll_c2,
                          aiding_scale=0.0, if_freq=0.0,
                          lock_mode="power", costas_thr=0.4,
                          interp=False, l_seg=0):
    """SEG-layout block step: per-channel segment gather (one DMA per
    channel) + in-kernel window DMAs replace the [T, C, WP] window
    materialization of _fused_block_step — the XLA pre-steps measured
    ~8.5 us/epoch on a v5e (2/3 of the whole tracking path) and this
    layout removes them entirely (ROADMAP round-2 perf pass)."""
    interpret = jax.default_backend() == "cpu"
    starts = state_mat[:, 12].astype(jnp.int32)        # a_c, 128-aligned
    anchor = state_mat[:, 13].astype(jnp.int32)
    rem_c0 = (state_mat[:, 9] - jnp.float32(el_pad)).astype(jnp.int32)
    seg_re, seg_im = fused.gather_segments(
        block_re, block_im, starts, l_seg, interpret=interpret)
    reps = fused.build_replicas(codes_rows, None, None, el_shift,
                                n0, wp, n_drift=N_DRIFT, anchor=anchor,
                                lane_shift=rem_c0)
    telem, st = fused.track_block_fused_seg(
        seg_re, seg_im, reps, state_mat, t_epochs=t_epochs, n0=n0,
        wp=wp, fs=fs, code_len=code_len,
        lock_threshold=lock_threshold, max_lost=max_lost,
        pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1, dll_c2=dll_c2,
        el_shift=el_shift,
        aiding_scale=aiding_scale, if_freq=if_freq, lock_mode=lock_mode,
        costas_thr=costas_thr, interp=interp,
        interpret=interpret,
    )
    return telem[:, :, :N_TELEM_COLS], st


@functools.partial(
    jax.jit,
    static_argnames=("t_epochs", "n0", "wp", "el_pad", "el_shift", "fs",
                     "code_len", "lock_threshold", "max_lost",
                     "pll_c1", "pll_c2", "dll_c1", "dll_c2",
                     "aiding_scale", "if_freq", "lock_mode",
                     "costas_thr", "interp", "k_epochs"),
)
def _fused_block_step_direct(block_re, block_im,
                             codes_rows, state_mat, starts=None, *,
                             t_epochs, n0, wp,
                             el_pad, el_shift, fs, code_len,
                             lock_threshold, max_lost,
                             pll_c1, pll_c2, dll_c1, dll_c2,
                             aiding_scale=0.0, if_freq=0.0,
                             lock_mode="power", costas_thr=0.4,
                             interp=False, k_epochs=1):
    """DIRECT-layout block step: the kernel DMAs each channel's windows
    straight from the shared stream (double-buffered K-epoch
    supersteps) — no gather_segments materialization, ~3x less HBM
    traffic than the seg layout and the fetch overlaps compute
    (ops/pallas/track_block_fused.py::track_block_fused_direct).

    ``starts`` ([C] int32, optional) overrides the a_c DMA starts in
    state col 12 — the multi-block scan runner passes absolute stream
    positions that can exceed the f32-exact integer range (2^24) the
    state columns are limited to."""
    interpret = jax.default_backend() == "cpu"
    if starts is None:
        starts = state_mat[:, 12].astype(jnp.int32)    # a_c, 128-aligned
    anchor = state_mat[:, 13].astype(jnp.int32)
    rem_c0 = (state_mat[:, 9] - jnp.float32(el_pad)).astype(jnp.int32)
    reps = fused.build_replicas(codes_rows, None, None, el_shift,
                                n0, wp, n_drift=N_DRIFT, anchor=anchor,
                                lane_shift=rem_c0)
    telem, st = fused.track_block_fused_direct(
        block_re, block_im, starts, reps, state_mat,
        t_epochs=t_epochs, k_epochs=k_epochs, n0=n0, wp=wp, fs=fs,
        code_len=code_len,
        lock_threshold=lock_threshold, max_lost=max_lost,
        pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1, dll_c2=dll_c2,
        el_shift=el_shift,
        aiding_scale=aiding_scale, if_freq=if_freq, lock_mode=lock_mode,
        costas_thr=costas_thr, interp=interp,
        interpret=interpret,
    )
    return telem[:, :, :N_TELEM_COLS], st


@functools.partial(
    jax.jit,
    static_argnames=("t_epochs", "n0", "wp", "el_pad", "el_shift", "fs",
                     "code_len", "lock_threshold", "max_lost",
                     "pll_c1", "pll_c2", "dll_c1", "dll_c2",
                     "aiding_scale", "if_freq", "lock_mode",
                     "costas_thr", "interp", "k_epochs", "n_rows",
                     "telem_mode", "spread_cap"),
)
def _fused_block_step_mxu(block_re, block_im,
                          codes_rows, state_mat, starts=None, *,
                          t_epochs, n0, wp,
                          el_pad, el_shift, fs, code_len,
                          lock_threshold, max_lost,
                          pll_c1, pll_c2, dll_c1, dll_c2,
                          aiding_scale=0.0, if_freq=0.0,
                          lock_mode="power", costas_thr=0.4,
                          interp=False, k_epochs=1, n_rows=7,
                          telem_mode="full", spread_cap=0):
    """MXU-layout block step: same direct-DMA structure, but the E/P/L
    correlation of each K-epoch superstep runs as ONE block-diagonal
    bf16 MXU contraction (track_block_fused_mxu). The replica bank
    carries ALL ``n_rows = n_drift + 2*el_shift`` integer shifts the
    drift select and the E/L lags can address — variant selection
    happens on correlation OUTPUTS, and early/late are bank rows
    instead of in-kernel rolls (both exact: correlation is linear in
    the replica)."""
    interpret = jax.default_backend() == "cpu"
    if starts is None:
        if spread_cap:
            raise ValueError(
                "shared-fetch mxu needs explicit [C+1] starts")
        starts = state_mat[:, 12].astype(jnp.int32)    # a_c, 128-aligned
    anchor = state_mat[:, 13].astype(jnp.int32)
    rem_c0 = (state_mat[:, 9] - jnp.float32(el_pad)).astype(jnp.int32)
    reps = fused.build_replicas(codes_rows, None, None, el_shift,
                                n0, wp, n_drift=n_rows, anchor=anchor,
                                lane_shift=rem_c0)
    telem, st = fused.track_block_fused_mxu(
        block_re, block_im, starts, reps.astype(jnp.bfloat16),
        state_mat,
        t_epochs=t_epochs, k_epochs=k_epochs, n0=n0, wp=wp, fs=fs,
        code_len=code_len,
        lock_threshold=lock_threshold, max_lost=max_lost,
        pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1, dll_c2=dll_c2,
        el_shift=el_shift,
        aiding_scale=aiding_scale, if_freq=if_freq, lock_mode=lock_mode,
        costas_thr=costas_thr, interp=interp,
        interpret=interpret, telem_mode=telem_mode,
        spread_cap=spread_cap,
    )
    return telem[:, :, :N_TELEM_COLS_MXU], st
