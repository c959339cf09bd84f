"""Fused whole-block tracking kernel: ONE pallas_call per sample block.

The XLA tracking path runs a lax.scan whose per-epoch body is dozens of
small ops — on real TPU hardware this measures ~0.5 ms/epoch for 32
channels (latency-bound, chip mostly idle). This kernel folds the
entire block — T sequential epochs x C channels of carrier wipeoff,
E/P/L correlation, discriminators, and loop-filter updates — into one
kernel launch: the TPU grid executes epochs sequentially on-core while
loop state lives in VMEM scratch, eliminating all intra-block dispatch.

Mosaic-friendly design (constraints verified on the axon backend):
NO dynamic VMEM indexing anywhere, all ops vectorized over the whole
channel batch:

  * per-epoch windows arrive as grid-indexed [1, C, WP] blocks,
    pre-sliced in XLA at nominal epoch spacing;
  * E/P/L replicas are precomputed per block in XLA as
    [C, n_drift * 3, WP] integer-shift variants; the kernel selects the
    variant matching each channel's accumulated window drift with
    vector masks (drift stays within +/-(n_drift-1)/2 samples per
    block for any realistic code-rate deviation; the host re-anchors
    replicas and drift every block from the exact u32 ledger);
  * state lives in a [C, 128] f32 VMEM scratch, read as [C, 1] static
    column slices, written as one masked full-array store;
  * arctan is a polynomial (no Mosaic atan lowering).

In-block phase accumulation is f32 (the receiver's exact u32 ledger
re-anchors at block boundaries). Full feature set of the scanned XLA
path (receiver/tracking.py): carrier aiding (``aiding_scale`` /
``if_freq`` statics — the effective code rate follows the carrier
Doppler), Costas-EMA lock mode (``lock_mode='costas'``, EMA in state
col 11), and sub-sample code interpolation (``interp=True`` blends the
two adjacent integer-shift replica variants by the fractional-sample
remainder — the sample-domain analogue of the slice correlator's
chip-domain interpolation, same quantization-bias suppression).

State columns: 0 carr_freq 1 carr_phase(cyc) 2 carr_err 3 code_rate
4 chip_res(chips, residual vs block-start replica) 5 code_err
6 lost_count 7 active 8 drift(samples) 9 window_offset(samples,
shared-stream mode only: the channel's epoch start within the shared
double-length window) 10 frac0(chips, block-start replica rounding
residual — the in-kernel replica select subtracts it so the replica
follows the chip ledger in integer samples) 11 lock_ema (costas mode)

Telemetry columns: 0 i_e 1 q_e 2 i_p 3 q_p 4 i_l 5 q_l 6 power
7 locked 8 pll_err 9 dll_err 10 carr_freq 11 code_rate 12 n_t 13 drift
14 chip_res at epoch start 15 lost_event 16 processed
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_FIELDS = 128
TWO_PI = 6.283185307179586


def _atan_poly(x):
    """Branchless arctan (Abramowitz-Stegun 4.4.49 polynomial, max
    error ~1e-5 rad) — Mosaic has no atan lowering."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-20), ax)
    t = z * z
    p = z * (0.9998660 + t * (-0.3302995 + t * (0.1801410
             + t * (-0.0851330 + 0.0208351 * t))))
    r = jnp.where(inv, jnp.float32(np.pi / 2) - p, p)
    return jnp.where(x < 0.0, -r, r)


def _epoch_core(
    state,         # [C, 128] f32 VALUE (not a ref)
    wre,           # [C, WP] or [1, WP] epoch window, real
    wim,           # imag
    reps_ref,      # [C, n_drift, WP] PROMPT replica drift variants
    start_lane,    # [C, 1] f32 epoch-start lane within the window
    rem_i,         # traced int lanes the replica must roll RIGHT, or None
    lane,          # [1, WP] f32 iota
    *,
    n_drift: int,
    wp: int,
    fs: float,
    code_len: float,
    lock_threshold: float,
    max_lost: int,
    pll_c1: float,
    pll_c2: float,
    dll_c1: float,
    dll_c2: float,
    el_shift: int,
    aiding_scale: float,
    if_freq: float,
    lock_mode: str,
    costas_thr: float,
    interp: bool,
    ablate: str,
    n0: int,
):
    """ONE tracking epoch for the whole channel batch: carrier wipeoff,
    replica select, E/P/L correlation, discriminators, loop filters.

    Pure value -> value so every kernel mode (per-epoch grid, resident,
    seg DMA, direct multi-epoch superstep) shares the exact same math.
    Returns ``(new_state [C,128], telem_row [C,128], n_t_f [C,1])``.
    """
    half = (n_drift - 1) // 2

    def col(k):
        return state[:, k:k + 1]                       # [C, 1]

    carr_freq = col(0)
    carr_phase = col(1)
    carr_err = col(2)
    code_rate = col(3)
    chip_res = col(4)
    code_err = col(5)
    lost = col(6)
    active = col(7)
    drift = col(8)
    woff = col(9)          # resident/seg: shared-window channel offset
    frac0 = col(10)        # chips: block-start replica quantization
                           # residual, cp0 - floor(cp0/dc0)*dc0
    lock_ema = col(11)     # costas lock-mode EMA

    fs_f = jnp.float32(fs)
    if aiding_scale != 0.0:
        # carrier-aided effective code rate: Doppler scales the chip
        # rate by code_rate/carrier (parity with the scanned path)
        code_rate_eff = code_rate + (
            carr_freq - jnp.float32(if_freq)
        ) * jnp.float32(aiding_scale)
    else:
        code_rate_eff = code_rate
    dc = code_rate_eff / fs_f                          # [C, 1]
    n_t_f = jnp.round(fs_f * jnp.float32(code_len) / code_rate_eff)

    in_epoch = jnp.logical_and(lane >= start_lane,
                               lane < start_lane + n_t_f)
    mask = in_epoch.astype(jnp.float32)

    # carrier wipeoff; phase referenced to the epoch start lane.
    # theta(l) = 2pi * (phi0 + step*l), phi0 = carr_phase - drift*step.
    step = carr_freq / fs_f                            # [C, 1] cycles/sample
    phi0 = carr_phase - start_lane * step
    if "notrig" in ablate:       # profiling hook: skip carrier trig
        cth = mask + phi0
        sth = mask * jnp.float32(1e-6)
    elif wp % 128 == 0:
        # Outer-product factorization: l = 128*q + r, so
        # e^{j theta} = A[q] * B[r] with A = e^{j 2pi (phi0 + 128 step q)},
        # B = e^{j 2pi step r}. Exact trig only on 2*128 anchor points per
        # channel instead of wp samples (the kernel is transcendental-
        # bound); mod-1 range reduction at the anchors also keeps the
        # arguments small (the naive ramp reaches ~1e3 cycles, costing
        # f32 ulps).
        #
        # The product is assembled PER LANE-TILE (a static loop over q
        # concatenating [C, 128] blocks) rather than as a
        # [C, w128, 128] tensor reshaped to [C, wp]: that reshape is a
        # (channel, q) transpose relayout Mosaic lowers to sublane
        # shuffles — measured ~0.7 us/epoch per trig component on a
        # v5e (tools/direct_ablate_probe.py), the single largest cost
        # in the kernel. Lane-dim concatenation of tile-width blocks is
        # layout-preserving.
        w128 = wp // 128
        q128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
            jnp.float32
        )
        th_a = phi0 + (step * jnp.float32(128.0)) * q128   # [C, 128]
        th_a = (th_a - jnp.floor(th_a)) * jnp.float32(TWO_PI)
        th_b = step * q128                                  # [C, 128]
        th_b = (th_b - jnp.floor(th_b)) * jnp.float32(TWO_PI)
        a_c = jnp.cos(th_a)
        a_s = jnp.sin(th_a)
        b_c = jnp.cos(th_b)
        b_s = jnp.sin(th_b)
        cth_parts, sth_parts = [], []
        for qi in range(w128):
            ac = a_c[:, qi:qi + 1]
            as_ = a_s[:, qi:qi + 1]
            cth_parts.append(ac * b_c - as_ * b_s)
            sth_parts.append(as_ * b_c + ac * b_s)
        cth = jnp.concatenate(cth_parts, axis=1)
        sth = jnp.concatenate(sth_parts, axis=1)
    else:
        theta = (phi0 + lane * step) * jnp.float32(TWO_PI)
        cth = jnp.cos(theta)
        sth = jnp.sin(theta)
    re_w = (wre * cth + wim * sth) * mask
    im_w = (wim * cth - wre * sth) * mask

    # replica variant select. The replica must FOLLOW the code-phase
    # ledger inside the block (the XLA path re-rounds the replica from
    # the ledger every epoch): with a per-block replica only, the DLL
    # would measure a misalignment it cannot correct, integrate it into
    # code_rate, and the re-anchor would absorb the fictitious motion —
    # a positive-feedback runaway (observed: prompt power collapse
    # after ~1-2 s). The variant index tracks the accumulated code
    # residual in integer samples: shift = drift - floor((chip_res +
    # frac0) / dc) — FLOOR, matching the floor-quantized replica
    # convention in build_replicas; the DLL handles the sub-sample
    # remainder exactly as in the scanned path. Only PROMPT variants are stored; early/late
    # are exact +/-el_shift sample shifts of the prompt, realized as
    # static circular rolls — the masked window zeroes every wrapped
    # term (the epoch body sits >= el_shift lanes from the window
    # ends), so the roll equals the true shifted replica.
    q = (chip_res + frac0) / dc
    q_floor = jnp.floor(q)
    shift = drift - q_floor
    prompt = jnp.zeros((drift.shape[0], wp), jnp.float32)
    if "nosel" in ablate:        # profiling hook: skip variant select
        prompt = reps_ref[:, half, :] + shift * jnp.float32(1e-9)
    elif interp:
        # sub-sample interpolation: the ideal replica delay is
        # floor(q) + f samples; blend the floor variant with the
        # one-sample-later variant (index shift - 1) by f
        f_sub = q - q_floor                            # [C, 1] in [0, 1)
        for d in range(n_drift):
            sel_d = (shift == jnp.float32(d - half)).astype(jnp.float32)
            sel_m = (shift == jnp.float32(d - half + 1)).astype(
                jnp.float32)
            w_d = (1.0 - f_sub) * sel_d + f_sub * sel_m
            prompt = prompt + w_d * reps_ref[:, d, :]
    else:
        for d in range(n_drift):
            sel_d = (shift == jnp.float32(d - half)).astype(jnp.float32)
            prompt = prompt + sel_d * reps_ref[:, d, :]
    if rem_i is not None:
        # unaligned window start: the replica was anchored for a window
        # starting at the nominal epoch lane, the slice starts rem
        # lanes earlier — shift the replica right to match (wrapped
        # head lanes are masked; the epoch body starts past them)
        prompt = pltpu.roll(prompt, rem_i, 1)
    if "noroll" in ablate:       # profiling hook: skip E/L rolls
        early = prompt
        late = prompt
    else:
        early = pltpu.roll(prompt, wp - el_shift, 1)  # early[l] = prompt[l+el]
        late = pltpu.roll(prompt, el_shift, 1)        # late[l]  = prompt[l-el]

    if "noel" in ablate:         # profiling hook: prompt-only correlation
        i_p = jnp.sum(re_w * prompt, axis=1, keepdims=True)
        q_p = jnp.sum(im_w * prompt, axis=1, keepdims=True)
        i_e = i_p * jnp.float32(1.0000001)
        q_e = q_p * jnp.float32(1.0000001)
        i_l = i_p * jnp.float32(0.9999999)
        q_l = q_p * jnp.float32(0.9999999)
    else:
        i_e = jnp.sum(re_w * early, axis=1, keepdims=True)
        q_e = jnp.sum(im_w * early, axis=1, keepdims=True)
        i_p = jnp.sum(re_w * prompt, axis=1, keepdims=True)
        q_p = jnp.sum(im_w * prompt, axis=1, keepdims=True)
        i_l = jnp.sum(re_w * late, axis=1, keepdims=True)
        q_l = jnp.sum(im_w * late, axis=1, keepdims=True)

    power = i_p * i_p + q_p * q_p
    if lock_mode == "costas":
        # normalized (I^2-Q^2)/(I^2+Q^2) EMA (parity with the scanned
        # path, receiver/tracking.py lock_mode='costas')
        nbd = i_p * i_p - q_p * q_p
        metric = nbd / jnp.maximum(power, 1e-12)
        alpha = jnp.float32(0.1)
        new_lock_ema = jnp.where(
            active > 0.5,
            (1.0 - alpha) * lock_ema + alpha * metric, lock_ema)
        locked = new_lock_ema > jnp.float32(costas_thr)
    else:
        new_lock_ema = lock_ema
        locked = power > jnp.float32(lock_threshold)

    safe_ip = jnp.where(jnp.abs(i_p) < 1e-12, 1e-12, i_p)
    pll_err = _atan_poly(q_p / safe_ip) * jnp.float32(1.0 / TWO_PI)
    carr_nco = pll_err * jnp.float32(pll_c1) + (
        pll_err - carr_err
    ) * jnp.float32(pll_c2)
    pow_e = jnp.sqrt(i_e * i_e + q_e * q_e)
    pow_l = jnp.sqrt(i_l * i_l + q_l * q_l)
    el_sum = pow_e + pow_l
    dll_err = jnp.where(
        el_sum > 0.0, (pow_e - pow_l) / jnp.maximum(el_sum, 1e-12), 0.0
    )
    code_nco = dll_err * jnp.float32(dll_c1) + (
        dll_err - code_err
    ) * jnp.float32(dll_c2)

    act = active > 0.5
    upd = jnp.logical_and(act, locked)
    new_carr_freq = jnp.where(upd, carr_freq + carr_nco, carr_freq)
    new_carr_err = jnp.where(upd, pll_err, carr_err)
    new_code_rate = jnp.where(upd, code_rate + code_nco, code_rate)
    new_code_err = jnp.where(upd, dll_err, code_err)
    new_lost = jnp.where(act, jnp.where(locked, 0.0, lost + 1.0), lost)
    died = new_lost >= jnp.float32(max_lost)
    new_active = jnp.where(died, 0.0, active)

    adv_cyc = carr_freq / fs_f * n_t_f
    ncp = carr_phase + adv_cyc
    new_carr_phase = ncp - jnp.floor(ncp)
    new_chip_res = chip_res + dc * n_t_f - jnp.float32(code_len)
    new_drift = drift + n_t_f - jnp.float32(n0)

    def sel(new, old):
        return jnp.where(act, new, old)

    fid = jax.lax.broadcasted_iota(jnp.int32, (1, N_FIELDS), 1)

    def scatter(pairs):
        out = jnp.zeros((active.shape[0], N_FIELDS), jnp.float32)
        for k, v in pairs:
            out = out + (fid == k).astype(jnp.float32) * v
        return out

    new_state = scatter([
        (0, sel(new_carr_freq, carr_freq)),
        (1, sel(new_carr_phase, carr_phase)),
        (2, sel(new_carr_err, carr_err)),
        (3, sel(new_code_rate, code_rate)),
        (4, sel(new_chip_res, chip_res)),
        (5, sel(new_code_err, code_err)),
        (6, sel(new_lost, lost)),
        (7, new_active),
        (8, sel(new_drift, drift)),
        (9, woff),
        (10, frac0),
        (11, jnp.where(died, 0.0, new_lock_ema)),
    ])

    wr = jnp.where(act, 1.0, 0.0)
    if "notelem" in ablate:      # profiling hook: minimal telemetry
        telem_row = scatter([(0, i_p * wr)])
        return new_state, telem_row, n_t_f
    telem_row = scatter([
        (0, i_e * wr), (1, q_e * wr), (2, i_p * wr), (3, q_p * wr),
        (4, i_l * wr), (5, q_l * wr), (6, power * wr),
        (7, jnp.where(upd, 1.0, 0.0)), (8, pll_err * wr),
        (9, dll_err * wr), (10, sel(new_carr_freq, carr_freq)),
        (11, sel(new_code_rate, code_rate)), (12, n_t_f), (13, drift),
        (14, chip_res * wr),
        (15, jnp.where(jnp.logical_and(died, act), 1.0, 0.0)),
        (16, wr),
    ])
    return new_state, telem_row, n_t_f


def _kernel(
    win_re_ref,    # [1, C, WP] grid-indexed; [C, L] resident; [C, Lseg]
    win_im_ref,    # HBM segment array in seg mode
    reps_ref,      # [C, n_drift, WP] PROMPT replica drift variants
    state_in_ref,  # [C, 128]
    telem_ref,     # [1, C, 128] out, grid-indexed
    state_out_ref,  # [C, 128] out
    state,         # [C, 128] f32 VMEM scratch
    *dma_scratch,  # seg mode: (win_re_s, win_im_s, sem2) VMEM + DMA sems
    n_drift: int,
    wp: int,
    n0: int,
    fs: float,
    code_len: float,
    lock_threshold: float,
    max_lost: int,
    pll_c1: float,
    pll_c2: float,
    dll_c1: float,
    dll_c2: float,
    el_shift: int = 1,
    resident: bool = False,
    seg: bool = False,
    aiding_scale: float = 0.0,
    if_freq: float = 0.0,
    lock_mode: str = "power",
    costas_thr: float = 0.4,
    interp: bool = False,
    ablate: str = "",
):
    t = pl.program_id(0)
    n_epochs = pl.num_programs(0)
    half = (n_drift - 1) // 2

    @pl.when(t == 0)
    def _():
        state[:] = state_in_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1).astype(
        jnp.float32
    )
    st = state[:, :]

    def col(k):
        return st[:, k:k + 1]                          # [C, 1]

    drift = col(8)

    # windows; valid epoch lanes are [start_lane, start_lane + n_t)
    if seg:
        # SEG layout: per-channel offsets were pre-baked into the
        # [C, Lseg] segment array by gather_segments (one DMA-speed
        # copy per channel per block), so every channel's epoch-t
        # window lives at the SAME 128-aligned lane start
        # T128 = floor(t*n0/128)*128 — ONE strided 2-D DMA fetches all
        # C narrow windows per epoch into VMEM scratch. The remainder
        # rem = t*n0 - T128 is channel-independent; it shifts the mask
        # (start_lane) and rolls the selected prompt, exactly like the
        # unaligned-resident path. The per-channel alignment residue
        # rem_c0 = off_c - a_c - el_pad rides state col 9 (as
        # el_pad + rem_c0) and the replica anchor (build_replicas
        # lane_shift), so the kernel body is untouched.
        raw = t * n0
        if n0 % 128 == 0:
            start = pl.multiple_of(raw, 128)
            rem_i = None
        else:
            start = pl.multiple_of((raw // 128) * 128, 128)
            rem_i = raw - (raw // 128) * 128
        win_re_s, win_im_s, sem2 = dma_scratch
        cp1 = pltpu.make_async_copy(
            win_re_ref.at[:, pl.ds(start, wp)], win_re_s, sem2.at[0])
        cp2 = pltpu.make_async_copy(
            win_im_ref.at[:, pl.ds(start, wp)], win_im_s, sem2.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        wre = win_re_s[:, :]                       # [C, WP]
        wim = win_im_s[:, :]
        start_lane = col(9) + drift                # col9 = el_pad+rem_c0
        if rem_i is not None:
            start_lane = start_lane + jnp.float32(rem_i)
    elif resident:
        # ONE shared sample stream in VMEM: all channel offsets lie
        # within one code period, so a double-length window starting at
        # lane t * n0 covers every channel's epoch-t window. Per-channel
        # alignment is pure state: the window-offset column (state[9])
        # shifts the mask and the carrier phase reference; the replicas
        # are pre-anchored per channel (build_replicas_shared).
        # Eliminates the C-fold window duplication of the streamed
        # layout entirely.
        #
        # VMEM slice starts must be 128-aligned. When n0 % 128 == 0 the
        # natural start t * n0 is provably aligned; otherwise slice at
        # the aligned floor and carry the remainder rem = t*n0 - start
        # into the lane bookkeeping: the epoch mask/phase reference
        # shift by rem, and the pre-anchored replica (built for a
        # window starting exactly at t*n0) is dynamically rolled right
        # by rem lanes below. The roll's wrapped head lanes [0, rem)
        # are always masked (epoch body starts at lane
        # rem + window_offset >= rem + el_pad).
        if n0 % 128 == 0:
            start = pl.multiple_of(t * n0, 128)
            rem_i = None
        else:
            raw = t * n0
            start = pl.multiple_of((raw // 128) * 128, 128)
            rem_i = raw - (raw // 128) * 128
        wre = win_re_ref[0:1, pl.ds(start, wp)]    # [1, WP] shared
        wim = win_im_ref[0:1, pl.ds(start, wp)]
        start_lane = col(9) + drift
        if rem_i is not None:
            start_lane = start_lane + jnp.float32(rem_i)
    else:
        # windows are sliced el_pad = el_shift + half lanes EARLY
        # (slice_windows el_pad arg) so the epoch body always sits
        # >= el_shift lanes from the window edges — required for the
        # rolled early/late replicas to be exact
        rem_i = None
        wre = win_re_ref[0]
        wim = win_im_ref[0]
        start_lane = drift + jnp.float32(el_shift + half)
    new_state, telem_row, _ = _epoch_core(
        st, wre, wim, reps_ref, start_lane, rem_i, lane,
        n_drift=n_drift, wp=wp, fs=fs, code_len=code_len,
        lock_threshold=lock_threshold, max_lost=max_lost,
        pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1, dll_c2=dll_c2,
        el_shift=el_shift, aiding_scale=aiding_scale, if_freq=if_freq,
        lock_mode=lock_mode, costas_thr=costas_thr, interp=interp,
        ablate=ablate, n0=n0,
    )
    state[:] = new_state
    telem_ref[0] = telem_row

    @pl.when(t == n_epochs - 1)
    def _():
        state_out_ref[:] = state[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n0", "fs", "code_len", "lock_threshold", "max_lost",
        "pll_c1", "pll_c2", "dll_c1", "dll_c2", "el_shift", "interpret",
        "aiding_scale", "if_freq", "lock_mode", "costas_thr", "interp",
        "ablate",
    ),
)
def track_block_fused(
    windows_re: jax.Array,   # [T, C, WP] nominal-spaced epoch windows
    windows_im: jax.Array,   # [T, C, WP]
    replicas: jax.Array,     # [C, n_drift, WP] prompt drift variants
    state_in: jax.Array,     # [C, 128] f32
    *,
    n0: int,
    fs: float,
    code_len: float = 1023.0,
    lock_threshold: float = 15.0,
    max_lost: int = 20,
    pll_c1: float = 0.0,
    pll_c2: float = 0.0,
    dll_c1: float = 0.0,
    dll_c2: float = 0.0,
    el_shift: int = 1,
    interpret: bool = False,
    aiding_scale: float = 0.0,
    if_freq: float = 0.0,
    lock_mode: str = "power",
    costas_thr: float = 0.4,
    interp: bool = False,
    ablate: str = "",
):
    """Run T sequential tracking epochs in one kernel launch.

    Returns (telemetry [T, C, 128], state_out [C, 128]).
    ``ablate`` is a profiling-only hook: a comma-joined set of stage
    names ("notrig,nosel,noroll,noel,notelem") that stub out kernel
    stages so their cost can be measured by difference; production
    callers leave it empty.
    """
    t_epochs, c_channels, wp = windows_re.shape
    n_drift = replicas.shape[1]

    return pl.pallas_call(
        functools.partial(
            _kernel,
            n_drift=n_drift, wp=wp, n0=n0, fs=fs, code_len=code_len,
            lock_threshold=lock_threshold, max_lost=max_lost,
            pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1, dll_c2=dll_c2,
            el_shift=el_shift, aiding_scale=aiding_scale,
            if_freq=if_freq, lock_mode=lock_mode, costas_thr=costas_thr,
            interp=interp, ablate=ablate,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_epochs, c_channels, N_FIELDS),
                                 jnp.float32),
            jax.ShapeDtypeStruct((c_channels, N_FIELDS), jnp.float32),
        ),
        grid=(t_epochs,),
        in_specs=[
            pl.BlockSpec((1, c_channels, wp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_channels, wp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c_channels, N_FIELDS), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((c_channels, N_FIELDS), jnp.float32),
        ],
        interpret=interpret,
    )(windows_re, windows_im, replicas, state_in)


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_epochs", "n0", "wp", "fs", "code_len", "lock_threshold",
        "max_lost", "pll_c1", "pll_c2", "dll_c1", "dll_c2", "el_shift",
        "interpret", "aiding_scale", "if_freq", "lock_mode",
        "costas_thr", "interp",
    ),
)
def track_block_fused_seg(
    seg_re: jax.Array,       # [C, Lseg] from gather_segments
    seg_im: jax.Array,       # [C, Lseg]
    replicas: jax.Array,     # [C, n_drift, WP] (build_replicas w/
    state_in: jax.Array,     # lane_shift)   [C, 128] f32; col 9 =
    *,                       # el_pad + rem_c0
    t_epochs: int,
    n0: int,
    wp: int,
    fs: float,
    code_len: float = 1023.0,
    lock_threshold: float = 15.0,
    max_lost: int = 20,
    pll_c1: float = 0.0,
    pll_c2: float = 0.0,
    dll_c1: float = 0.0,
    dll_c2: float = 0.0,
    el_shift: int = 1,
    interpret: bool = False,
    aiding_scale: float = 0.0,
    if_freq: float = 0.0,
    lock_mode: str = "power",
    costas_thr: float = 0.4,
    interp: bool = False,
):
    """SEG-layout fused tracking: T epochs, ONE kernel launch, windows
    DMA'd in-kernel from per-channel HBM segments.

    Eliminates the [T, C, WP] window materialization that dominates the
    streamed layout (measured 8.5 us/epoch of XLA pre-step time vs
    ~0.1 us/epoch for the in-kernel strided DMA + rem roll on a v5e):
    gather_segments bakes each channel's block-relative offset into a
    [C, Lseg] array at DMA speed; thereafter every channel's epoch-t
    window starts at the SAME aligned lane, so one 2-D copy per epoch
    feeds the whole channel batch. Requires Lseg >= the last window's
    end: floor((T-1)*n0/128)*128 + wp. Returns (telemetry [T, C, 128],
    state_out [C, 128]) identical to track_block_fused.
    """
    c_channels = state_in.shape[0]
    n_drift = replicas.shape[1]

    return pl.pallas_call(
        functools.partial(
            _kernel,
            n_drift=n_drift, wp=wp, n0=n0, fs=fs, code_len=code_len,
            lock_threshold=lock_threshold, max_lost=max_lost,
            pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1, dll_c2=dll_c2,
            el_shift=el_shift, seg=True, aiding_scale=aiding_scale,
            if_freq=if_freq, lock_mode=lock_mode, costas_thr=costas_thr,
            interp=interp,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_epochs, c_channels, N_FIELDS),
                                 jnp.float32),
            jax.ShapeDtypeStruct((c_channels, N_FIELDS), jnp.float32),
        ),
        grid=(t_epochs,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c_channels, N_FIELDS), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((c_channels, N_FIELDS), jnp.float32),
            pltpu.VMEM((c_channels, wp), jnp.float32),
            pltpu.VMEM((c_channels, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(seg_re, seg_im, replicas, state_in)


def seg_length(t_epochs: int, n0: int, wp: int) -> int:
    """Lseg for track_block_fused_seg: last window end, 128-padded."""
    last = ((t_epochs - 1) * n0 // 128) * 128 + wp
    return ((last + 127) // 128) * 128


# ---------------------------------------------------------------------------
# DIRECT layout: per-channel double-buffered DMA straight from the shared
# stream — no per-channel segment materialization (gather_segments) at all.
# ---------------------------------------------------------------------------

def choose_k(t_epochs: int, k_max: int = 16) -> int | None:
    """Largest superstep size K <= k_max with t_epochs % (2K) == 0.

    The direct kernel pairs supersteps (two per grid step) so the
    double-buffer slot index is STATIC — Mosaic rejects dynamically
    indexed VMEM scratch/semaphores (measured: remote-compile failure
    on the axon backend for the dynamic-slot variant, tools/dma_probe).
    """
    for k in range(min(k_max, t_epochs // 2), 0, -1):
        if t_epochs % (2 * k) == 0:
            return k
    return None


def direct_span(k_epochs: int, n0: int, wp: int) -> int:
    """Per-channel DMA span for one K-epoch superstep (lane count)."""
    return ((k_epochs - 1) * n0 // 128) * 128 + wp


def _direct_kernel(
    starts_ref,     # [C] int32 scalar-prefetch: 128-aligned a_c
    stream_re_ref,  # [1, L] shared sample stream (ANY/HBM)
    stream_im_ref,
    reps_ref,       # [C, n_drift, WP] (build_replicas w/ lane_shift)
    state_in_ref,   # [C, 128]
    telem_ref,      # [2K, C, 128] out block, grid-indexed
    state_out_ref,  # [C, 128] out
    state,          # [C, 128] f32 VMEM scratch
    w0r, w0i,       # [C, 1, span] VMEM window slots (double buffer;
    w1r, w1i,       # the middle unit dim makes the per-channel DMA
                    # destination .at[c] a [1, span] block — Mosaic
                    # rejects row slices of a 2-D [C, span] scratch)
    sems,           # DMA sems [2 slots, 2 components]
    *,
    c_channels: int,
    k_epochs: int,
    n_drift: int,
    wp: int,
    span: int,
    n0: int,
    fs: float,
    code_len: float,
    lock_threshold: float,
    max_lost: int,
    pll_c1: float,
    pll_c2: float,
    dll_c1: float,
    dll_c2: float,
    el_shift: int,
    aiding_scale: float,
    if_freq: float,
    lock_mode: str,
    costas_thr: float,
    interp: bool,
    ablate: str,
):
    """Two K-epoch supersteps per grid step, per-channel double-buffered
    window DMA straight from the shared stream.

    Superstep j covers epochs [jK, (j+1)K); its per-channel copy starts
    at a_c + floor(jK n0 / 128)*128 (128-aligned: a sum of the host's
    aligned a_c and an aligned step). Within the buffer, epoch e's
    window is a STATIC slice at floor(e n0 / 128)*128; the three
    alignment residues (rem_c0 from a_c — carried in state col 9 and
    the replica lane_shift — plus the static rem_e and the dynamic
    rem_j) shift the epoch mask and roll the replica, exactly the seg
    kernel's mechanism. All slot/semaphore indices are static (Mosaic
    constraint); the C copies of a slot share one semaphore per
    component and are drained by C waits of equal amounts.
    """
    u = pl.program_id(0)
    n_u = pl.num_programs(0)
    kk = k_epochs * n0

    def copies(j, wr, wi, slot):
        off = (j * kk // 128) * 128
        cps = []
        for c in range(c_channels):
            a = pl.multiple_of(starts_ref[c] + off, 128)
            # integer dim-0 index (not a 0:1 slice): a sub-32-bit HBM
            # memref tiles its second-minor dim (bf16: (2, 128)) and a
            # size-1 dim-0 slice violates that tiling; indexing
            # eliminates the dim instead (works for f32 too)
            cps.append(pltpu.make_async_copy(
                stream_re_ref.at[0, pl.ds(a, span)], wr.at[c, 0],
                sems.at[slot, 0]))
            cps.append(pltpu.make_async_copy(
                stream_im_ref.at[0, pl.ds(a, span)], wi.at[c, 0],
                sems.at[slot, 1]))
        return cps

    def issue(j, wr, wi, slot):
        for cp in copies(j, wr, wi, slot):
            cp.start()

    def drain(j, wr, wi, slot):
        for cp in copies(j, wr, wi, slot):
            cp.wait()

    @pl.when(u == 0)
    def _():
        state[:] = state_in_ref[:]
        issue(0, w0r, w0i, 0)

    j0 = 2 * u
    j1 = 2 * u + 1
    issue(j1, w1r, w1i, 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1).astype(
        jnp.float32)

    def run_k(st, j, wr, wi, telem_base):
        rem_j = j * kk - (j * kk // 128) * 128          # dynamic [0,128)
        for e in range(k_epochs):
            a_e = (e * n0 // 128) * 128                 # static
            rem_e = e * n0 - a_e                        # static
            wre = wr[:, 0, a_e:a_e + wp]
            wim = wi[:, 0, a_e:a_e + wp]
            rem_i = rem_e + rem_j
            start_lane = (st[:, 9:10] + st[:, 8:9]
                          + jnp.float32(rem_e)
                          + rem_j.astype(jnp.float32))
            st, telem_row, _ = _epoch_core(
                st, wre, wim, reps_ref, start_lane, rem_i, lane,
                n_drift=n_drift, wp=wp, fs=fs, code_len=code_len,
                lock_threshold=lock_threshold, max_lost=max_lost,
                pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1,
                dll_c2=dll_c2, el_shift=el_shift,
                aiding_scale=aiding_scale, if_freq=if_freq,
                lock_mode=lock_mode, costas_thr=costas_thr,
                interp=interp, ablate=ablate, n0=n0,
            )
            telem_ref[telem_base + e] = telem_row
        return st

    drain(j0, w0r, w0i, 0)
    st = run_k(state[:, :], j0, w0r, w0i, 0)

    @pl.when(u + 1 < n_u)
    def _():
        issue(j0 + 2, w0r, w0i, 0)

    drain(j1, w1r, w1i, 1)
    st = run_k(st, j1, w1r, w1i, k_epochs)
    state[:] = st

    @pl.when(u == n_u - 1)
    def _():
        state_out_ref[:] = st


def mxu_sel_constant(c_channels: int, k_epochs: int) -> jax.Array:
    """[C, 2K*C, 2K] bf16 block-diagonal extraction masks for the mxu
    kernel's stage-2 selection matmuls: sel[c, q*C + c', t] = 1 iff
    c' == c and q == (2t if t < K else 2(t-K)+1) — the permutation
    that lands re epochs in rows [0, K) and im epochs in [K, 2K).
    Built in XLA (const-folded into a literal) and passed as a kernel
    input; building it in-kernel cost ~3 VPU ops per channel per
    superstep."""
    qk = 2 * k_epochs
    i_idx = np.arange(qk * c_channels)[None, :, None]
    t_idx = np.arange(qk)[None, None, :]
    c_idx = np.arange(c_channels)[:, None, None]
    row_q = i_idx // c_channels
    row_c = i_idx % c_channels
    tgt_q = np.where(t_idx < k_epochs, 2 * t_idx,
                     2 * (t_idx - k_epochs) + 1)
    sel = np.logical_and(row_q == tgt_q, row_c == c_idx)
    return jnp.asarray(sel.astype(np.float32), jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_epochs", "k_epochs", "n0", "wp", "fs", "code_len",
        "lock_threshold", "max_lost", "pll_c1", "pll_c2", "dll_c1",
        "dll_c2", "el_shift", "interpret", "aiding_scale", "if_freq",
        "lock_mode", "costas_thr", "interp", "ablate",
    ),
)
def track_block_fused_direct(
    stream_re: jax.Array,    # [L] ONE shared sample stream
    stream_im: jax.Array,    # [L]
    starts: jax.Array,       # [C] int32 128-aligned per-channel a_c
    replicas: jax.Array,     # [C, n_drift, WP] (build_replicas w/
    state_in: jax.Array,     # lane_shift=rem_c0)   [C, 128] f32
    *,
    t_epochs: int,
    k_epochs: int,
    n0: int,
    wp: int,                 # >= n0 + el_pad + 3*127 + drift margin
    fs: float,
    code_len: float = 1023.0,
    lock_threshold: float = 15.0,
    max_lost: int = 20,
    pll_c1: float = 0.0,
    pll_c2: float = 0.0,
    dll_c1: float = 0.0,
    dll_c2: float = 0.0,
    el_shift: int = 1,
    interpret: bool = False,
    aiding_scale: float = 0.0,
    if_freq: float = 0.0,
    lock_mode: str = "power",
    costas_thr: float = 0.4,
    interp: bool = False,
    ablate: str = "",
):
    """DIRECT-layout fused tracking: T epochs, ONE kernel launch,
    per-channel windows DMA'd straight from the shared stream with a
    double-buffered K-epoch superstep pipeline.

    Removes BOTH costs of the seg layout: the up-front per-channel
    segment materialization (gather_segments — measured 2.5 ms/signal-s
    of pure HBM duplication on a v5e) and the unoverlapped per-epoch
    window fetch (the seg kernel idles for the full HBM latency every
    grid step). HBM read traffic drops ~3x (one read per consumed
    sample per channel, no segment writeback) and the fetch of
    superstep j+1 overlaps the compute of superstep j. Requires
    ``t_epochs % (2 * k_epochs) == 0`` (see choose_k) and the same
    state columns as the seg layout (col 9 = el_pad + rem_c0, col 12 =
    a_c consumed by the caller, col 13 = anchor). Returns
    (telemetry [T, C, 128], state_out [C, 128]) identical to
    track_block_fused.
    """
    c_channels = state_in.shape[0]
    n_drift = replicas.shape[1]
    if t_epochs % (2 * k_epochs):
        raise ValueError(
            f"t_epochs={t_epochs} not divisible by 2*k_epochs="
            f"{2 * k_epochs}")
    n_u = t_epochs // (2 * k_epochs)
    span = direct_span(k_epochs, n0, wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_u,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2 * k_epochs, c_channels, N_FIELDS),
                         lambda u, s: (u, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((c_channels, N_FIELDS), jnp.float32),
            pltpu.VMEM((c_channels, 1, span), jnp.float32),
            pltpu.VMEM((c_channels, 1, span), jnp.float32),
            pltpu.VMEM((c_channels, 1, span), jnp.float32),
            pltpu.VMEM((c_channels, 1, span), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _direct_kernel,
            c_channels=c_channels, k_epochs=k_epochs, n_drift=n_drift,
            wp=wp, span=span, n0=n0, fs=fs, code_len=code_len,
            lock_threshold=lock_threshold, max_lost=max_lost,
            pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1, dll_c2=dll_c2,
            el_shift=el_shift, aiding_scale=aiding_scale,
            if_freq=if_freq, lock_mode=lock_mode, costas_thr=costas_thr,
            interp=interp, ablate=ablate,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_epochs, c_channels, N_FIELDS),
                                 jnp.float32),
            jax.ShapeDtypeStruct((c_channels, N_FIELDS), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, stream_re.reshape(1, -1), stream_im.reshape(1, -1),
      replicas, state_in)


# ---------------------------------------------------------------------------
# MXU layout: K-epoch supersteps with held NCO rates; the E/P/L
# correlation for all drift variants runs as ONE block-diagonal bf16
# MXU contraction per superstep (f32 accumulation).
# ---------------------------------------------------------------------------

def mxu_rows(n_drift: int, el_shift: int) -> int:
    """Replica-bank rows for the MXU layout: every integer shift the
    drift select AND the early/late lags can address —
    ``n_drift + 2 * el_shift`` consecutive shifts (correlating against
    all of them up front replaces the in-kernel variant select + rolls;
    selection happens on the [C, R] correlation OUTPUTS instead).
    Padded up to 8 rows when that fits: 8-row blocks make the stage-2
    diagonal extraction slices sublane-aligned (the extra rows are
    extra usable drift range; the +14% bank MACs ride the MXU free)."""
    rows = n_drift + 2 * el_shift
    return 8 if rows <= 8 else rows


def _mxu_run_k(
    st,             # [C, 128] f32 state VALUE at superstep start
    j,              # traced superstep index (for rem_j)
    wre_slot,       # [C, 1, span] VMEM window slot (real)
    wim_slot,
    reps_ref,       # [C, R, WP] bf16 replica bank (R = mxu_rows)
    sel_ref,        # [C, 2K*C, 2K] bf16 extraction masks (constant)
    telem_ref,      # [2K, C, 128] out block
    w_scr,          # [2K, C, WP] bf16 im2col scratch
    corr_scr,       # [C, 2K, R] f32 per-channel correlation scratch
    telem_base,     # 0 or k_epochs (two supersteps per grid step)
    lane,           # [1, WP] f32 iota
    *,
    k_epochs: int,
    wp: int,
    n0: int,
    fs: float,
    code_len: float,
    lock_threshold: float,
    max_lost: int,
    pll_c1: float,
    pll_c2: float,
    dll_c1: float,
    dll_c2: float,
    el_shift: int,
    aiding_scale: float,
    if_freq: float,
    lock_mode: str,
    costas_thr: float,
    interp: bool,
    ablate: str = "",
    telem_mode: str = "full",
    pin: bool = False,
):
    """One K-epoch superstep, MXU formulation.

    Semantics vs the per-epoch kernel (_epoch_core): NCO rates are HELD
    at their superstep-start values for the carrier mix, replica select,
    mask and ledger advance of all K epochs; discriminators and loop
    filters still run per epoch (on the batched correlations), and the
    filtered rates take effect at the next superstep boundary. This is
    the standard discriminator-rate/NCO-rate decimation structure: with
    K <= 8 (NCO updates >= 125 Hz against <= 25 Hz loop bandwidths) the
    loop dynamics are unchanged to first order, and it is what makes
    the epoch batch correlate as ONE MXU contraction — the serial
    dependency epoch->epoch otherwise forces the VPU path. Bank row
    mapping: prompt for drift-select s = row (R-1)//2 + s; early/late
    are rows -/+ el_shift from prompt (correlation against a shifted
    replica == shifted row, build_replicas docstring).
    """
    c_channels = st.shape[0]
    r_rows = reps_ref.shape[1]
    half_r = (r_rows - 1) // 2
    kk = k_epochs * n0
    fs_f = jnp.float32(fs)

    def col(k):
        return st[:, k:k + 1]

    carr_freq = col(0)
    carr_phase = col(1)
    carr_err0 = col(2)
    code_rate = col(3)
    chip_res0 = col(4)
    code_err0 = col(5)
    lost0 = col(6)
    active0 = col(7)
    drift0 = col(8)
    woff = col(9)
    frac0 = col(10)
    lock_ema0 = col(11)

    if aiding_scale != 0.0:
        rate_eff = code_rate + (
            carr_freq - jnp.float32(if_freq)) * jnp.float32(aiding_scale)
    else:
        rate_eff = code_rate
    dc = rate_eff / fs_f
    n_t_f = jnp.round(fs_f * jnp.float32(code_len) / rate_eff)
    step = carr_freq / fs_f
    adv = step * n_t_f                      # carrier cycles per epoch
    d_drift = n_t_f - jnp.float32(n0)       # drift advance per epoch
    d_chip = dc * n_t_f - jnp.float32(code_len)
    rem_j = j * kk - (j * kk // 128) * 128  # dynamic span residue
    rem_j_f = rem_j.astype(jnp.float32)

    # ---- stage 1: mix + mask + bf16 im2col (VPU) --------------------
    w128 = wp // 128
    qk = 2 * k_epochs
    if "dmaonly" in ablate:      # profiling hook: window DMA cost only
        fid0 = jax.lax.broadcasted_iota(jnp.int32, (1, N_FIELDS), 1)
        probe = (wre_slot[:, 0, :1] + wim_slot[:, 0, :1]
                 ).astype(jnp.float32)
        row0 = (fid0 == 0).astype(jnp.float32) * probe
        for e in range(k_epochs):
            telem_ref[telem_base + e] = row0
        return st + 1e-20 * row0
    q128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
        jnp.float32)
    if "nomix" not in ablate:
        # the B factor of the carrier outer product depends only on
        # the HELD rate — hoist its trig and the [C, wp] tilings out
        # of the epoch loop (superstep-constant), as is the 0/1
        # expansion matmul constant for the A factor
        th_b = step * q128
        th_b = (th_b - jnp.floor(th_b)) * jnp.float32(TWO_PI)
        b_c = jnp.cos(th_b)
        b_s = jnp.sin(th_b)
        tb_c = pltpu.repeat(b_c, w128, 1)                 # [C, wp]
        tb_s = pltpu.repeat(b_s, w128, 1)
        exp_q = jax.lax.broadcasted_iota(jnp.int32, (w128, wp), 0)
        exp_l = jax.lax.broadcasted_iota(jnp.int32, (w128, wp), 1)
        e_mat = (jax.lax.shift_right_logical(exp_l, 7)
                 == exp_q).astype(jnp.float32)
    for e in range(k_epochs):
        a_e = (e * n0 // 128) * 128
        rem_e = e * n0 - a_e
        ef = jnp.float32(e)
        drift_e = drift0 + ef * d_drift
        # alignment: the slice starts rem_i = rem_e + rem_j lanes
        # before the nominal epoch lane. The per-epoch kernels roll
        # the SELECTED replica right by rem_i; here the bank is
        # correlated wholesale, so the WINDOW rolls left instead (the
        # wrapped tail lanes are already masked to zero). Mixing and
        # masking happen BEFORE the roll in the slice's own lane frame
        # (sl includes rem_i), so the roll moves bf16 — half the bytes
        # of rolling the f32 inputs.
        rem_i = rem_e + rem_j
        sl = woff + drift_e + jnp.float32(rem_e) + rem_j_f
        # phase referenced to the epoch body start (lane sl):
        # theta(l) = 2pi*(phi0 + l*step), phi0 = phase_e - sl*step
        phi0 = carr_phase + ef * adv - sl * step
        if "nomix" in ablate:    # profiling hook: skip the carrier mix
            wre = wre_slot[:, 0, a_e:a_e + wp]
            wim = wim_slot[:, 0, a_e:a_e + wp]
            in_ep = jnp.logical_and(lane >= sl, lane < sl + n_t_f)
            mask = in_ep.astype(jnp.float32)
            m_re = wre * mask + phi0 * jnp.float32(1e-20)
            m_im = wim * mask
            lshift = jnp.where(rem_i == 0, 0, wp - rem_i)
            w_scr[2 * e] = pltpu.roll(m_re, lshift, 1).astype(
                jnp.bfloat16)
            w_scr[2 * e + 1] = pltpu.roll(m_im, lshift, 1).astype(
                jnp.bfloat16)
            continue
        # A-factor angles on a [1, w128] iota (NOT the [1, 128] B-
        # factor iota: long-epoch signals — Galileo E1B's 4 ms codes —
        # have w128 > 128 anchor groups per window)
        q_w = jax.lax.broadcasted_iota(
            jnp.int32, (1, w128), 1).astype(jnp.float32)
        th_a = phi0 + (step * jnp.float32(128.0)) * q_w
        th_a = (th_a - jnp.floor(th_a)) * jnp.float32(TWO_PI)
        a_c = jnp.cos(th_a)
        a_s = jnp.sin(th_a)
        # assemble the outer product A[q]*B[r] over lane l = 128q + r
        # with a handful of whole-row ops instead of a w128-step
        # concat loop (the loop was ~120 small [C, 128] ops per
        # epoch): pltpu.repeat TILES b to lane l % 128 (hoisted above
        # — B is superstep-constant); a constant 0/1 expansion matmul
        # lifts a to lane l // 128 (E[q, l] = (l//128 == q),
        # const-folded; tiny-K MXU work).
        ra_c = jnp.dot(a_c, e_mat,
                       preferred_element_type=jnp.float32)
        ra_s = jnp.dot(a_s, e_mat,
                       preferred_element_type=jnp.float32)
        cth = ra_c * tb_c - ra_s * tb_s
        sth = ra_s * tb_c + ra_c * tb_s
        wre = wre_slot[:, 0, a_e:a_e + wp]
        wim = wim_slot[:, 0, a_e:a_e + wp]
        in_ep = jnp.logical_and(lane >= sl, lane < sl + n_t_f)
        mask = in_ep.astype(jnp.float32)
        m_re = (wre * cth + wim * sth) * mask
        m_im = (wim * cth - wre * sth) * mask
        if "noroll" in ablate:   # profiling hook: skip alignment rolls
            w_scr[2 * e] = m_re.astype(jnp.bfloat16)
            w_scr[2 * e + 1] = m_im.astype(jnp.bfloat16)
            continue
        # f32 rolls: Mosaic's dynamic rotate has no bf16 lowering
        # ("Rotate with non-32-bit data" — found on-chip)
        lshift = jnp.where(rem_i == 0, 0, wp - rem_i)
        w_scr[2 * e] = pltpu.roll(m_re, lshift, 1).astype(jnp.bfloat16)
        w_scr[2 * e + 1] = pltpu.roll(m_im, lshift, 1).astype(
            jnp.bfloat16)

    if "nosmall" in ablate:          # profiling hook: stages 1+2 only
        w_flat0 = w_scr[:].reshape(qk * c_channels, wp)
        big0 = jax.lax.dot_general(
            reps_ref[:].reshape(c_channels * r_rows, wp), w_flat0,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        fid0 = jax.lax.broadcasted_iota(jnp.int32, (1, N_FIELDS), 1)
        probe = jnp.sum(big0[:c_channels, :1].reshape(c_channels, 1),
                        axis=1, keepdims=True)
        row0 = (fid0 == 0).astype(jnp.float32) * probe
        for e in range(k_epochs):
            telem_ref[telem_base + e] = row0
        return st + 1e-20 * row0

    # ---- stage 2: ONE block-diagonal MXU contraction ----------------
    # big[c*R + r, q*C + c'] = <replica row (c, r), mixed window (q, c')>
    # — C^2-fold block structure; only the c == c' diagonal blocks are
    # meaningful, and a per-channel selection matmul (bf16, tiny K)
    # extracts them without any strided lane addressing. MAC waste is
    # C-fold but the MXU runs it at ~peak (tools/mxu_probe2.py: the
    # whole stage measures ~1 us/epoch for 32 channels vs 5.8 us for
    # the VPU select+roll+reduce formulation it replaces).
    w_flat = w_scr[:].reshape(qk * c_channels, wp)
    big = jax.lax.dot_general(
        reps_ref[:].reshape(c_channels * r_rows, wp), w_flat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # [C*R, 2K*C]
    # selection constants: one bf16 matmul per channel extracts the
    # diagonal block, PERMUTED so the re epochs land in rows [0, K) and
    # the im epochs in rows [K, 2K) — stage 3 then reads its re/im
    # cubes as contiguous middle-dim slices (no strided addressing).
    # The [C, 2K*C, 2K] mask stack arrives as a kernel INPUT
    # (mxu_sel_constant, const-folded by XLA): the round-4 in-kernel
    # iota builds cost ~3 VPU ops per channel per superstep — a third
    # of the extraction's measured 0.6 ms/signal-s.
    for c in range(c_channels):
        blk = big[c * r_rows:(c + 1) * r_rows, :]  # [R, 2K*C]
        # [2K, R] = sel_c^T . blk^T via dot_general contraction (0, 1)
        corr_scr[c] = jax.lax.dot_general(
            sel_ref[c], blk,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---- stage 3: discriminators vectorized over the K epochs -------
    # Everything except the loop-filter/lock chain is history-free
    # (held rates make drift/chip/select deterministic), so the picks,
    # power, atan and E-L discriminators run ONCE on [C, K(, R)]
    # arrays; only ~20 [C, 1]-scale ops per epoch remain sequential.
    # (The per-epoch formulation measured 1.6 ms/signal-s of tiny-op
    # overhead — half the kernel — tools/mxu_ablate_probe.py.)
    if "stopsel" in ablate:     # profiling hook: stages 1+2+extraction
        fid0 = jax.lax.broadcasted_iota(jnp.int32, (1, N_FIELDS), 1)
        probe = jnp.sum(corr_scr[:, 0, :1], axis=1, keepdims=True)
        row0 = (fid0 == 0).astype(jnp.float32) * probe
        for e in range(k_epochs):
            telem_ref[telem_base + e] = row0
        return st + 1e-20 * row0

    corr_re = corr_scr[:, 0:k_epochs, :]      # [C, K, R]
    corr_im = corr_scr[:, k_epochs:qk, :]
    ef_all = jax.lax.broadcasted_iota(
        jnp.int32, (1, k_epochs), 1).astype(jnp.float32)
    drift_all = drift0 + ef_all * d_drift     # [C, K]
    chip_all = chip_res0 + ef_all * d_chip
    qq_all = (chip_all + frac0) / dc
    qf_all = jnp.floor(qq_all)
    shift_all = drift_all - qf_all
    idx_p_all = jnp.float32(half_r) + shift_all
    r3 = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, r_rows), 2).astype(jnp.float32)

    def pick(corr3, idx):
        m = (r3 == idx[:, :, None]).astype(jnp.float32)
        return jnp.sum(corr3 * m, axis=2)     # [C, K]

    if interp:
        f_sub_all = qq_all - qf_all

        def pick_b(corr3, idx):
            return ((1.0 - f_sub_all) * pick(corr3, idx)
                    + f_sub_all * pick(corr3, idx - 1.0))
    else:
        pick_b = pick
    el_f = jnp.float32(el_shift)
    i_p_all = pick_b(corr_re, idx_p_all)      # [C, K]
    q_p_all = pick_b(corr_im, idx_p_all)
    i_e_all = pick_b(corr_re, idx_p_all - el_f)
    q_e_all = pick_b(corr_im, idx_p_all - el_f)
    i_l_all = pick_b(corr_re, idx_p_all + el_f)
    q_l_all = pick_b(corr_im, idx_p_all + el_f)

    if "stop3" in ablate:    # profiling hook: through the E/P/L picks
        fid0 = jax.lax.broadcasted_iota(jnp.int32, (1, N_FIELDS), 1)
        probe = (jnp.sum(i_p_all + q_p_all + i_e_all + q_e_all
                         + i_l_all + q_l_all, axis=1, keepdims=True))
        row0 = (fid0 == 0).astype(jnp.float32) * probe
        for e in range(k_epochs):
            telem_ref[telem_base + e] = row0
        return st + 1e-20 * row0

    power_all = i_p_all * i_p_all + q_p_all * q_p_all
    safe_ip = jnp.where(jnp.abs(i_p_all) < 1e-12, 1e-12, i_p_all)
    pll_err_all = _atan_poly(q_p_all / safe_ip) \
        * jnp.float32(1.0 / TWO_PI)
    pow_e_all = jnp.sqrt(i_e_all * i_e_all + q_e_all * q_e_all)
    pow_l_all = jnp.sqrt(i_l_all * i_l_all + q_l_all * q_l_all)
    el_sum = pow_e_all + pow_l_all
    dll_err_all = jnp.where(
        el_sum > 0.0,
        (pow_e_all - pow_l_all) / jnp.maximum(el_sum, 1e-12), 0.0)
    # pin ONE materialization of the discriminator block: the lean and
    # full telemetry wires consume these through different downstream
    # ops, and XLA's excess-precision contraction can round the two
    # COMPILATIONS an ulp apart in the fused producers — the slim2
    # exact-ledger claim (tests/test_wire2.py) needs both wires' state
    # to evolve bit-identically. Mosaic has no optimization_barrier
    # lowering (and no consumer-dependent contraction either), so the
    # pin applies only in interpret mode, where the claim is tested.
    if pin:
        (i_p_all, q_p_all, i_e_all, q_e_all, i_l_all, q_l_all,
         power_all, pll_err_all, dll_err_all) = \
            jax.lax.optimization_barrier(
                (i_p_all, q_p_all, i_e_all, q_e_all, i_l_all, q_l_all,
                 power_all, pll_err_all, dll_err_all))
    if lock_mode == "costas":
        metric_all = (i_p_all * i_p_all - q_p_all * q_p_all) \
            / jnp.maximum(power_all, 1e-12)
    else:
        locked_all = power_all > jnp.float32(lock_threshold)

    fid = jax.lax.broadcasted_iota(jnp.int32, (1, N_FIELDS), 1)

    def scatter(pairs):
        out = jnp.zeros((c_channels, N_FIELDS), jnp.float32)
        for k, v in pairs:
            out = out + (fid == k).astype(jnp.float32) * v
        return out

    # ---- stage 4: lifecycle / loop-filter chain ---------------------
    # Power-lock mode with the lean wire takes the closed form: locked
    # is history-free there, so the lost counter is "epochs since the
    # last locked epoch" (seeded lost0 before the first), death is its
    # first crossing of max_lost, activity is the epoch prefix bounded
    # by the death epoch, and the loop-filter memory at each epoch is
    # the discriminator of the last UPDATE epoch before it. That turns
    # the K x ~25 sequential [C, 1] ops (measured ~0.8 ms/signal-s of
    # Mosaic per-op overhead, tools/mxu_ablate_probe.py) into a
    # handful of whole-[C, K]/[C, K, K] ops, and the K per-epoch
    # telemetry scatters into ONE [K, C, 128] slab write (lean) or K
    # scatters fed from the vectorized values (full — both wires MUST
    # run the identical chain ops at identical shapes, or the
    # compiler's excess-precision contraction choices diverge by an
    # ulp and break the slim2 bit-exact-ledger claim). Costas lock
    # keeps the sequential chain (its EMA is genuinely recurrent).
    vector_chain = (lock_mode != "costas" and "notelem" not in ablate)
    if vector_chain:
        kf = k_epochs
        act0_b = active0 > 0.5                          # [C, 1]
        e_row = jax.lax.broadcasted_iota(jnp.int32, (1, kf), 1)
        e_f = e_row.astype(jnp.float32)
        j3 = jax.lax.broadcasted_iota(jnp.int32, (1, kf, kf), 2)
        e3 = jax.lax.broadcasted_iota(jnp.int32, (1, kf, kf), 1)
        lk3 = locked_all[:, None, :]                    # [C, 1, K]
        # last locked epoch index <= e (or -1): lo_e closed form
        last_lk = jnp.max(
            jnp.where(jnp.logical_and(j3 <= e3, lk3), j3, -1), axis=2)
        lo_all = jnp.where(
            last_lk >= 0, (e_row - last_lk).astype(jnp.float32),
            lost0 + e_f + 1.0)                          # [C, K]
        death = lo_all >= jnp.float32(max_lost)
        d_idx = jnp.min(jnp.where(death, e_row, kf), axis=1,
                        keepdims=True)                  # [C, 1]
        act_all = jnp.logical_and(act0_b, e_row <= d_idx)
        upd_all = jnp.logical_and(act_all, locked_all)
        wr_all = act_all.astype(jnp.float32)
        upd_f = upd_all.astype(jnp.float32)
        emit_lost = jnp.logical_and(act0_b, e_row == d_idx).astype(
            jnp.float32)
        n_act = jnp.sum(wr_all, axis=1, keepdims=True)
        # loop-filter memory at the START of epoch e = discriminator
        # of the last update epoch STRICTLY before e (ce0/de0 if none)
        upd3 = upd_all[:, None, :]
        last_u = jnp.max(
            jnp.where(jnp.logical_and(j3 < e3, upd3), j3, -1), axis=2)
        oh_u = (j3 == last_u[:, :, None]).astype(jnp.float32)
        ce_all = jnp.where(
            last_u >= 0, jnp.sum(oh_u * pll_err_all[:, None, :],
                                 axis=2), carr_err0)
        de_all = jnp.where(
            last_u >= 0, jnp.sum(oh_u * dll_err_all[:, None, :],
                                 axis=2), code_err0)
        carr_nco_all = pll_err_all * jnp.float32(pll_c1) + (
            pll_err_all - ce_all) * jnp.float32(pll_c2)
        code_nco_all = dll_err_all * jnp.float32(dll_c1) + (
            dll_err_all - de_all) * jnp.float32(dll_c2)
        # pin one materialization of the NCO values (same rationale as
        # the discriminator-block pin above; the rate sums below are
        # plain where + add/sum given pinned inputs)
        if pin:
            carr_nco_all, code_nco_all = jax.lax.optimization_barrier(
                (carr_nco_all, code_nco_all))
        # final rates as ONE masked sum per accumulator (replacing the
        # round-4 2K-step sequential left-fold, ~4K tiny [C, 1] ops
        # per superstep). Both telemetry modes run this identical
        # expression, so the slim2 wire's lean-vs-full bit-exactness
        # contract (tests/test_wire2.py) is preserved: the contract is
        # mode-agreement, not any particular f32 summation order — the
        # host ledger replay consumes the kernel's OWN shipped
        # increments (cols 19/20), never a recomputed rate.
        upd_nco_c = upd_f * carr_nco_all               # [C, K]
        upd_nco_d = upd_f * code_nco_all
        cf_f = carr_freq + jnp.sum(upd_nco_c, axis=1, keepdims=True)
        cr_f = code_rate + jnp.sum(upd_nco_d, axis=1, keepdims=True)
        if pin:
            cf_f, cr_f = jax.lax.optimization_barrier((cf_f, cr_f))
        u_last = jnp.max(jnp.where(upd_all, e_row, -1), axis=1,
                         keepdims=True)                 # [C, 1]
        oh_k = (e_row == u_last).astype(jnp.float32)
        ce_f = jnp.where(u_last >= 0,
                         jnp.sum(oh_k * pll_err_all, axis=1,
                                 keepdims=True), carr_err0)
        de_f = jnp.where(u_last >= 0,
                         jnp.sum(oh_k * dll_err_all, axis=1,
                                 keepdims=True), code_err0)
        # lost counter freezes at its death-epoch value
        oh_lo = (e_row == jnp.minimum(d_idx, kf - 1)).astype(
            jnp.float32)
        lo_f = jnp.where(act0_b,
                         jnp.sum(oh_lo * lo_all, axis=1,
                                 keepdims=True), lost0)
        ac_f = jnp.where(jnp.logical_and(act0_b, d_idx < kf),
                         jnp.zeros_like(active0), active0)
        # power mode leaves the EMA untouched but zeroes it on any
        # died epoch (inactive channels with lost0 >= max_lost hit
        # this every epoch — sequential parity)
        died_any = jnp.logical_or(
            jnp.logical_and(act0_b, d_idx < kf),
            jnp.logical_and(jnp.logical_not(act0_b),
                            lost0 >= jnp.float32(max_lost)))
        le_f = jnp.where(died_any, jnp.zeros_like(lock_ema0),
                         lock_ema0)

        if telem_mode == "lean":
            # ---- stage 5: one [K, C, 128] telemetry slab ------------
            # [C, K] -> [K, C] via identity contraction: Mosaic has no
            # minormost transpose, but the MXU contracts the C axis
            # against eye(C) at ~zero cost. bf16 rounding in the
            # product is at/below the slim2 wire's own bf16
            # quantization (and exact for the small-integer flags).
            eye_c = (jax.lax.broadcasted_iota(
                jnp.int32, (c_channels, c_channels), 0)
                == jax.lax.broadcasted_iota(
                    jnp.int32, (c_channels, c_channels), 1)
            ).astype(jnp.float32)

            def tr(x):
                return jax.lax.dot_general(
                    x, eye_c,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[:, :, None]

            flags_all = wr_all + 2.0 * upd_f + 4.0 * emit_lost
            fid3 = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, N_FIELDS), 2)
            slab = ((fid3 == 2).astype(jnp.float32)
                    * tr(i_p_all * wr_all)
                    + (fid3 == 3).astype(jnp.float32)
                    * tr(q_p_all * wr_all)
                    + (fid3 == 16).astype(jnp.float32) * tr(flags_all))
            # superstep-start diagnostics ride epoch row 0 (slim2
            # reads them only there); 17-20 are the held rates + the
            # kernel's own ledger increments (see the sequential
            # branch's comment). The E/L + loop-error columns are read
            # at 2K stride only (_pack_wire2's sub = telem[::2k]), so
            # the odd superstep of each grid step (telem_base != 0, a
            # python static) skips their 6-column scatter entirely.
            wr0 = wr_all[:, 0:1]
            row0_pairs = [
                (17, carr_freq), (18, code_rate),
                (19, d_chip), (20, d_drift),
            ]
            if telem_base == 0:
                row0_pairs = [
                    (0, i_e_all[:, 0:1] * wr0),
                    (1, q_e_all[:, 0:1] * wr0),
                    (4, i_l_all[:, 0:1] * wr0),
                    (5, q_l_all[:, 0:1] * wr0),
                    (8, pll_err_all[:, 0:1] * wr0),
                    (9, dll_err_all[:, 0:1] * wr0),
                ] + row0_pairs
            row0 = scatter(row0_pairs)
            k_col = jax.lax.broadcasted_iota(jnp.int32, (kf, 1, 1), 0)
            slab = slab + (k_col == 0).astype(jnp.float32) * row0[None]
            telem_ref[telem_base:telem_base + kf] = slab
        else:
            # full wire: per-epoch rows, every diagnostic column, fed
            # from the vectorized values (cold-start consumers read
            # every column; this path runs on the single-block API).
            # Per-epoch post-update rate traces (cols 10/11) come from
            # a closed-form masked prefix sum over the update deltas.
            cf_steps_all = carr_freq + jnp.sum(
                jnp.where(j3 <= e3, upd_nco_c[:, None, :], 0.0), axis=2)
            cr_steps_all = code_rate + jnp.sum(
                jnp.where(j3 <= e3, upd_nco_d[:, None, :], 0.0), axis=2)
            for e in range(kf):
                wr_e = wr_all[:, e:e + 1]
                telem_ref[telem_base + e] = scatter([
                    (0, i_e_all[:, e:e + 1] * wr_e),
                    (1, q_e_all[:, e:e + 1] * wr_e),
                    (2, i_p_all[:, e:e + 1] * wr_e),
                    (3, q_p_all[:, e:e + 1] * wr_e),
                    (4, i_l_all[:, e:e + 1] * wr_e),
                    (5, q_l_all[:, e:e + 1] * wr_e),
                    (6, power_all[:, e:e + 1] * wr_e),
                    (7, upd_f[:, e:e + 1]),
                    (8, pll_err_all[:, e:e + 1] * wr_e),
                    (9, dll_err_all[:, e:e + 1] * wr_e),
                    (10, cf_steps_all[:, e:e + 1]),
                    (11, cr_steps_all[:, e:e + 1]),
                    (12, n_t_f), (13, drift_all[:, e:e + 1]),
                    (14, chip_all[:, e:e + 1] * wr_e),
                    (15, emit_lost[:, e:e + 1]),
                    (16, wr_e),
                    (17, carr_freq), (18, code_rate),
                    (19, d_chip), (20, d_drift),
                ])

        ncp = carr_phase + n_act * adv
        new_carr_phase = ncp - jnp.floor(ncp)
        return scatter([
            (0, cf_f), (1, new_carr_phase), (2, ce_f), (3, cr_f),
            (4, chip_res0 + n_act * d_chip), (5, de_f), (6, lo_f),
            (7, ac_f), (8, drift0 + n_act * d_drift), (9, woff),
            (10, frac0), (11, le_f),
        ])

    cf_f, ce_f = carr_freq, carr_err0
    cr_f, de_f = code_rate, code_err0
    lo_f, ac_f, le_f = lost0, active0, lock_ema0
    n_act = jnp.zeros_like(carr_freq)

    for e in range(k_epochs):
        drift_e = drift_all[:, e:e + 1]
        chip_res_e = chip_all[:, e:e + 1]
        i_p = i_p_all[:, e:e + 1]
        q_p = q_p_all[:, e:e + 1]
        i_e = i_e_all[:, e:e + 1]
        q_e = q_e_all[:, e:e + 1]
        i_l = i_l_all[:, e:e + 1]
        q_l = q_l_all[:, e:e + 1]
        power = power_all[:, e:e + 1]
        pll_err = pll_err_all[:, e:e + 1]
        dll_err = dll_err_all[:, e:e + 1]
        if lock_mode == "costas":
            alpha = jnp.float32(0.1)
            new_le = jnp.where(
                ac_f > 0.5,
                (1.0 - alpha) * le_f + alpha * metric_all[:, e:e + 1],
                le_f)
            locked = new_le > jnp.float32(costas_thr)
        else:
            new_le = le_f
            locked = locked_all[:, e:e + 1]
        carr_nco = pll_err * jnp.float32(pll_c1) + (
            pll_err - ce_f) * jnp.float32(pll_c2)
        code_nco = dll_err * jnp.float32(dll_c1) + (
            dll_err - de_f) * jnp.float32(dll_c2)

        act_e = ac_f > 0.5
        upd = jnp.logical_and(act_e, locked)
        new_cf = jnp.where(upd, cf_f + carr_nco, cf_f)
        new_ce = jnp.where(upd, pll_err, ce_f)
        new_cr = jnp.where(upd, cr_f + code_nco, cr_f)
        new_de = jnp.where(upd, dll_err, de_f)
        new_lo = jnp.where(act_e,
                           jnp.where(locked, 0.0, lo_f + 1.0), lo_f)
        died = new_lo >= jnp.float32(max_lost)
        new_ac = jnp.where(died, 0.0, ac_f)
        wr = jnp.where(act_e, 1.0, 0.0)
        n_act = n_act + wr

        if "notelem" in ablate:      # profiling hook: minimal telemetry
            telem_ref[telem_base + e] = scatter([(2, i_p * wr)])
        else:
            # per-epoch essentials (the slim2 wire's full per-epoch
            # set: prompt I/Q + lifecycle flags). In lean mode the
            # three flags pre-combine into col 16 (the wire's packed
            # encoding: processed | locked<<1 | lost<<2) — two fewer
            # scatter columns per epoch.
            flags_combo = (wr + 2.0 * jnp.where(upd, 1.0, 0.0)
                           + 4.0 * jnp.where(
                               jnp.logical_and(died, act_e), 1.0, 0.0))
            if telem_mode == "lean":
                pairs = [(2, i_p * wr), (3, q_p * wr),
                         (16, flags_combo)]
            else:
                pairs = [
                    (2, i_p * wr), (3, q_p * wr),
                    (7, jnp.where(upd, 1.0, 0.0)),
                    (15, jnp.where(jnp.logical_and(died, act_e),
                                   1.0, 0.0)),
                    (16, wr),
                ]
            # 17-20: the superstep's HELD NCO rates and the KERNEL'S
            # OWN per-epoch ledger increments — constant within a
            # superstep, they let the slim2 wire replay the chip/drift
            # ledger on the host (drift integer-exact; chip to ~1e-5
            # chips) with no per-epoch f32 columns on the wire. The
            # increments ship directly because recomputing them from
            # the rates is NOT bit-stable: the compiler strength-
            # reduces the constant-divisor rate/fs division to a
            # multiply-by-reciprocal the host cannot replicate.
            stride_pairs = [
                (0, i_e * wr), (1, q_e * wr),
                (4, i_l * wr), (5, q_l * wr),
                (8, pll_err * wr), (9, dll_err * wr),
                (17, carr_freq), (18, code_rate),
                (19, d_chip), (20, d_drift),
            ]
            full_pairs = [
                (6, power * wr),
                (10, jnp.where(act_e, new_cf, cf_f)),
                (11, jnp.where(act_e, new_cr, cr_f)),
                (12, n_t_f), (13, drift_e), (14, chip_res_e * wr),
            ]
            if telem_mode == "lean":
                # slim2 scan path: the wire reads diagnostics only at
                # superstep-start epochs — the 21-column scatter
                # measured 1.3 ms/signal-s; this writes 5 columns per
                # epoch + 10 once per superstep
                if e == 0:
                    pairs = pairs + stride_pairs
            else:
                pairs = pairs + stride_pairs + full_pairs
            telem_ref[telem_base + e] = scatter(pairs)
        cf_f, ce_f, cr_f, de_f = new_cf, new_ce, new_cr, new_de
        lo_f, le_f = new_lo, jnp.where(died, 0.0, new_le)
        ac_f = new_ac

    # ---- superstep writeback (held-rate ledger advance) -------------
    ncp = carr_phase + n_act * adv
    new_carr_phase = ncp - jnp.floor(ncp)
    return scatter([
        (0, cf_f), (1, new_carr_phase), (2, ce_f), (3, cr_f),
        (4, chip_res0 + n_act * d_chip), (5, de_f), (6, lo_f),
        (7, ac_f), (8, drift0 + n_act * d_drift), (9, woff),
        (10, frac0), (11, le_f),
    ])


def _mxu_kernel(
    starts_ref,     # [C] int32 scalar-prefetch: 128-aligned a_c
    stream_re_ref,  # [1, L] shared sample stream (ANY/HBM)
    stream_im_ref,
    reps_ref,       # [C, R, WP] bf16 replica bank
    sel_ref,        # [C, 2K*C, 2K] bf16 extraction masks (constant)
    state_in_ref,   # [C, 128]
    telem_ref,      # [2K, C, 128] out block, grid-indexed
    state_out_ref,  # [C, 128] out
    state,          # [C, 128] f32 VMEM scratch
    w0r, w0i,       # [C, 1, span] window slots (double buffer)
    w1r, w1i,
    w_scr,          # [2K, C, WP] bf16 im2col scratch
    corr_scr,       # [C, 2K, R] f32 correlation scratch
    sems,           # DMA sems [2 slots, 2 components]
    *,
    c_channels: int,
    k_epochs: int,
    wp: int,
    span: int,
    n0: int,
    fs: float,
    code_len: float,
    lock_threshold: float,
    max_lost: int,
    pll_c1: float,
    pll_c2: float,
    dll_c1: float,
    dll_c2: float,
    el_shift: int,
    aiding_scale: float,
    if_freq: float,
    lock_mode: str,
    costas_thr: float,
    interp: bool,
    ablate: str = "",
    telem_mode: str = "full",
    pin: bool = False,
):
    """Direct-DMA double-buffered superstep pipeline (same structure as
    _direct_kernel) driving the MXU correlation superstep."""
    u = pl.program_id(0)
    n_u = pl.num_programs(0)
    kk = k_epochs * n0

    def copies(j, wr, wi, slot):
        off = (j * kk // 128) * 128
        cps = []
        for c in range(c_channels):
            a = pl.multiple_of(starts_ref[c] + off, 128)
            # integer dim-0 index (not a 0:1 slice): a sub-32-bit HBM
            # memref tiles its second-minor dim (bf16: (2, 128)) and a
            # size-1 dim-0 slice violates that tiling; indexing
            # eliminates the dim instead (works for f32 too)
            cps.append(pltpu.make_async_copy(
                stream_re_ref.at[0, pl.ds(a, span)], wr.at[c, 0],
                sems.at[slot, 0]))
            cps.append(pltpu.make_async_copy(
                stream_im_ref.at[0, pl.ds(a, span)], wi.at[c, 0],
                sems.at[slot, 1]))
        return cps

    def issue(j, wr, wi, slot):
        for cp in copies(j, wr, wi, slot):
            cp.start()

    def drain(j, wr, wi, slot):
        for cp in copies(j, wr, wi, slot):
            cp.wait()

    @pl.when(u == 0)
    def _():
        state[:] = state_in_ref[:]
        issue(0, w0r, w0i, 0)

    j0 = 2 * u
    j1 = 2 * u + 1
    issue(j1, w1r, w1i, 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1).astype(
        jnp.float32)

    def run(st, j, wr, wi, base):
        return _mxu_run_k(
            st, j, wr, wi, reps_ref, sel_ref, telem_ref, w_scr,
            corr_scr, base,
            lane, k_epochs=k_epochs, wp=wp, n0=n0, fs=fs,
            code_len=code_len, lock_threshold=lock_threshold,
            max_lost=max_lost, pll_c1=pll_c1, pll_c2=pll_c2,
            dll_c1=dll_c1, dll_c2=dll_c2, el_shift=el_shift,
            aiding_scale=aiding_scale, if_freq=if_freq,
            lock_mode=lock_mode, costas_thr=costas_thr, interp=interp,
            ablate=ablate, telem_mode=telem_mode, pin=pin)

    drain(j0, w0r, w0i, 0)
    st = run(state[:, :], j0, w0r, w0i, 0)

    @pl.when(u + 1 < n_u)
    def _():
        issue(j0 + 2, w0r, w0i, 0)

    drain(j1, w1r, w1i, 1)
    st = run(st, j1, w1r, w1i, k_epochs)
    state[:] = st

    @pl.when(u == n_u - 1)
    def _():
        state_out_ref[:] = st


def _mxu_kernel_shared(
    starts_ref,     # [C+1] int32: per-channel a_c, [C] = base
    stream_re_ref,  # [1, L] shared sample stream (ANY/HBM)
    stream_im_ref,
    reps_ref,       # [C, R, WP] bf16 replica bank
    sel_ref,        # [C, 2K*C, 2K] bf16 extraction masks (constant)
    state_in_ref,   # [C, 128]
    telem_ref,      # [2K, C, 128] out block, grid-indexed
    state_out_ref,  # [C, 128] out
    state,          # [C, 128] f32 VMEM scratch
    w0r, w0i,       # [C, 1, span] window slots (double buffer)
    w1r, w1i,
    w_scr,          # [2K, C, WP] bf16 im2col scratch
    corr_scr,       # [C, 2K, R] f32 correlation scratch
    shar, shai,     # [1, span_u] shared superstep slots (A: even j)
    shbr, shbi,     # (B: odd j)
    sems,           # local-copy sems [2 slots, 2 components]
    sh_sems,        # shared-fetch sems [2 slots, 2 components]
    *,
    c_channels: int,
    k_epochs: int,
    wp: int,
    span: int,
    span_u: int,
    n0: int,
    fs: float,
    code_len: float,
    lock_threshold: float,
    max_lost: int,
    pll_c1: float,
    pll_c2: float,
    dll_c1: float,
    dll_c2: float,
    el_shift: int,
    aiding_scale: float,
    if_freq: float,
    lock_mode: str,
    costas_thr: float,
    interp: bool,
    ablate: str = "",
    telem_mode: str = "full",
    pin: bool = False,
):
    """Shared-fetch superstep pipeline: ONE [1, span_u] HBM fetch per
    superstep feeds all channels (the per-channel variant re-reads
    ~C-fold overlapping slices of the SAME stream from HBM — measured
    0.73 ms/signal-s of pure DMA at 32 channels, tools/
    mxu_ablate_probe.py dmaonly). Per-channel windows then come from
    VMEM-local copies at offset dc = starts[c] - base (constant across
    supersteps — the caller guarantees 0 <= dc <= span_u - span and
    base + span_u <= len(stream), see track_block_fused_mxu).

    Three-stage pipeline per grid step: compute(j) overlaps the local
    copies of j+1 and the (tiny) shared fetch of j+2.
    """
    u = pl.program_id(0)
    n_u = pl.num_programs(0)
    kk = k_epochs * n0
    base = pl.multiple_of(starts_ref[c_channels], 128)

    def fetch(j, sr, si, slot):
        off = (j * kk // 128) * 128
        a = pl.multiple_of(base + off, 128)
        return [
            pltpu.make_async_copy(
                stream_re_ref.at[0, pl.ds(a, span_u)], sr.at[0],
                sh_sems.at[slot, 0]),
            pltpu.make_async_copy(
                stream_im_ref.at[0, pl.ds(a, span_u)], si.at[0],
                sh_sems.at[slot, 1]),
        ]

    def locals_(wr, wi, slot, sr, si):
        # source offsets are j-independent: window j of channel c sits
        # at starts[c] + off_j = (base + off_j) + dc in the stream, and
        # the slot for superstep j starts at base + off_j
        cps = []
        for c in range(c_channels):
            dc = pl.multiple_of(starts_ref[c] - base, 128)
            cps.append(pltpu.make_async_copy(
                sr.at[0, pl.ds(dc, span)], wr.at[c, 0],
                sems.at[slot, 0]))
            cps.append(pltpu.make_async_copy(
                si.at[0, pl.ds(dc, span)], wi.at[c, 0],
                sems.at[slot, 1]))
        return cps

    def start(cps):
        for cp in cps:
            cp.start()

    def wait(cps):
        for cp in cps:
            cp.wait()

    @pl.when(u == 0)
    def _():
        state[:] = state_in_ref[:]
        start(fetch(0, shar, shai, 0))
        wait(fetch(0, shar, shai, 0))
        start(locals_(w0r, w0i, 0, shar, shai))
        start(fetch(1, shbr, shbi, 1))

    j0 = 2 * u
    j1 = 2 * u + 1

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1).astype(
        jnp.float32)

    def run(st, j, wr, wi, tb):
        return _mxu_run_k(
            st, j, wr, wi, reps_ref, sel_ref, telem_ref, w_scr,
            corr_scr, tb,
            lane, k_epochs=k_epochs, wp=wp, n0=n0, fs=fs,
            code_len=code_len, lock_threshold=lock_threshold,
            max_lost=max_lost, pll_c1=pll_c1, pll_c2=pll_c2,
            dll_c1=dll_c1, dll_c2=dll_c2, el_shift=el_shift,
            aiding_scale=aiding_scale, if_freq=if_freq,
            lock_mode=lock_mode, costas_thr=costas_thr, interp=interp,
            ablate=ablate, telem_mode=telem_mode, pin=pin)

    # windows j0 ready; shared data j1 ready; locals j1 overlap run j0
    wait(locals_(w0r, w0i, 0, shar, shai))
    wait(fetch(j1, shbr, shbi, 1))
    start(locals_(w1r, w1i, 1, shbr, shbi))

    @pl.when(u + 1 < n_u)
    def _():
        start(fetch(j0 + 2, shar, shai, 0))   # A free: locals drained

    st = run(state[:, :], j0, w0r, w0i, 0)

    wait(locals_(w1r, w1i, 1, shbr, shbi))

    @pl.when(u + 1 < n_u)
    def _():
        wait(fetch(j0 + 2, shar, shai, 0))
        start(locals_(w0r, w0i, 0, shar, shai))   # w0 free: run j0 done
        start(fetch(j1 + 2, shbr, shbi, 1))       # B free: locals drained

    st = run(st, j1, w1r, w1i, k_epochs)
    state[:] = st

    @pl.when(u == n_u - 1)
    def _():
        state_out_ref[:] = st



@functools.partial(
    jax.jit,
    static_argnames=(
        "t_epochs", "k_epochs", "n0", "wp", "fs", "code_len",
        "lock_threshold", "max_lost", "pll_c1", "pll_c2", "dll_c1",
        "dll_c2", "el_shift", "interpret", "aiding_scale", "if_freq",
        "lock_mode", "costas_thr", "interp", "ablate", "telem_mode",
        "spread_cap",
    ),
)
def track_block_fused_mxu(
    stream_re: jax.Array,    # [L] ONE shared sample stream
    stream_im: jax.Array,    # [L]
    starts: jax.Array,       # [C] int32 128-aligned per-channel a_c
    replicas: jax.Array,     # [C, R, WP] bank (build_replicas with
    state_in: jax.Array,     # n_drift=mxu_rows)   [C, 128] f32
    *,
    t_epochs: int,
    k_epochs: int,
    n0: int,
    wp: int,
    fs: float,
    code_len: float = 1023.0,
    lock_threshold: float = 15.0,
    max_lost: int = 20,
    pll_c1: float = 0.0,
    pll_c2: float = 0.0,
    dll_c1: float = 0.0,
    dll_c2: float = 0.0,
    el_shift: int = 1,
    interpret: bool = False,
    aiding_scale: float = 0.0,
    if_freq: float = 0.0,
    lock_mode: str = "power",
    costas_thr: float = 0.4,
    interp: bool = False,
    ablate: str = "",
    telem_mode: str = "full",
    spread_cap: int = 0,
):
    """MXU-layout fused tracking: T epochs, ONE kernel launch, the
    E/P/L correlation of each K-epoch superstep as ONE block-diagonal
    bf16 MXU contraction with f32 accumulation (see _mxu_run_k for the
    held-rate superstep semantics and tools/mxu_probe2.py for the
    formulation study). Same DMA structure, state columns and telemetry
    contract as track_block_fused_direct; requires wp % 128 == 0 and
    t_epochs % (2 * k_epochs) == 0.

    ``spread_cap > 0`` selects the SHARED-FETCH pipeline
    (_mxu_kernel_shared): ``starts`` is then [C + 1] with
    starts[C] = base, and the caller guarantees, for every channel,
    0 <= starts[c] - base <= spread_cap (128-multiples) and
    base + span + spread_cap <= len(stream) (anchor base to
    max(starts) - spread_cap and the existing per-channel buffer bound
    implies it). Cuts per-superstep HBM traffic ~C-fold."""
    c_channels = state_in.shape[0]
    if wp % 128:
        raise ValueError(f"mxu layout requires wp % 128 == 0, got {wp}")
    if t_epochs % (2 * k_epochs):
        raise ValueError(
            f"t_epochs={t_epochs} not divisible by 2*k_epochs="
            f"{2 * k_epochs}")
    n_u = t_epochs // (2 * k_epochs)
    span = direct_span(k_epochs, n0, wp)
    r_rows = replicas.shape[1]

    scratch = [
        pltpu.VMEM((c_channels, N_FIELDS), jnp.float32),
        pltpu.VMEM((c_channels, 1, span), stream_re.dtype),
        pltpu.VMEM((c_channels, 1, span), stream_re.dtype),
        pltpu.VMEM((c_channels, 1, span), stream_re.dtype),
        pltpu.VMEM((c_channels, 1, span), stream_re.dtype),
        pltpu.VMEM((2 * k_epochs, c_channels, wp), jnp.bfloat16),
        pltpu.VMEM((c_channels, 2 * k_epochs, r_rows), jnp.float32),
    ]
    kw = dict(
        c_channels=c_channels, k_epochs=k_epochs, wp=wp, span=span,
        n0=n0, fs=fs, code_len=code_len,
        lock_threshold=lock_threshold, max_lost=max_lost,
        pll_c1=pll_c1, pll_c2=pll_c2, dll_c1=dll_c1, dll_c2=dll_c2,
        el_shift=el_shift, aiding_scale=aiding_scale,
        if_freq=if_freq, lock_mode=lock_mode, costas_thr=costas_thr,
        interp=interp, ablate=ablate, telem_mode=telem_mode,
        pin=interpret,
    )
    if spread_cap > 0:
        if spread_cap % 128:
            raise ValueError(f"spread_cap must be a 128-multiple, got "
                             f"{spread_cap}")
        if starts.shape[0] != c_channels + 1:
            raise ValueError(
                "shared-fetch mxu expects starts [C + 1] (last = base)")
        span_u = span + spread_cap
        kernel = functools.partial(_mxu_kernel_shared, span_u=span_u,
                                   **kw)
        scratch += [
            pltpu.VMEM((1, span_u), stream_re.dtype),
            pltpu.VMEM((1, span_u), stream_re.dtype),
            pltpu.VMEM((1, span_u), stream_re.dtype),
            pltpu.VMEM((1, span_u), stream_re.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    else:
        kernel = functools.partial(_mxu_kernel, **kw)
        scratch += [pltpu.SemaphoreType.DMA((2, 2))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_u,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2 * k_epochs, c_channels, N_FIELDS),
                         lambda u, s: (u, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_epochs, c_channels, N_FIELDS),
                                 jnp.float32),
            jax.ShapeDtypeStruct((c_channels, N_FIELDS), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, stream_re.reshape(1, -1), stream_im.reshape(1, -1),
      replicas, mxu_sel_constant(c_channels, k_epochs), state_in)


def gather_segments(block_re, block_im, starts, l_seg: int, *,
                    interpret: bool = False):
    """Per-channel segment gather: ([C, Lseg], [C, Lseg]) copies of one
    IQ stream at per-channel 128-aligned ``starts`` — ONE DMA per
    channel per component, grid over channels.

    This is the whole per-channel window-duplication cost of the seg
    tracking layout, paid once per block at DMA bandwidth instead of
    through XLA window materialization. Caller guarantees
    ``starts[c] % 128 == 0`` and ``starts[c] + l_seg <= len(block)``.
    """
    c = starts.shape[0]
    bre = block_re.reshape(1, -1)
    bim = block_im.reshape(1, -1)

    def kern(starts_ref, sre_ref, sim_ref, ore_ref, oim_ref, sems):
        ci = pl.program_id(0)
        a = pl.multiple_of(starts_ref[ci], 128)
        cp1 = pltpu.make_async_copy(sre_ref.at[0, pl.ds(a, l_seg)],
                                    ore_ref.at[0, 0], sems.at[0])
        cp2 = pltpu.make_async_copy(sim_ref.at[0, pl.ds(a, l_seg)],
                                    oim_ref.at[0, 0], sems.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

    gre, gim = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, l_seg), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, l_seg), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, 1, l_seg), jnp.float32),
            jax.ShapeDtypeStruct((c, 1, l_seg), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(starts, bre, bim)
    return gre.reshape(c, l_seg), gim.reshape(c, l_seg)


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_epochs", "k_epochs", "n0", "wp", "fs", "code_len",
        "lock_threshold", "max_lost",
        "pll_c1", "pll_c2", "dll_c1", "dll_c2", "el_shift", "interpret",
        "aiding_scale", "if_freq", "lock_mode", "costas_thr", "interp",
    ),
)
def track_block_fused_resident(
    block_re: jax.Array,     # [L] ONE shared sample stream, all channels
    block_im: jax.Array,     # [L]; L >= t_epochs * n0 + wp
    replicas: jax.Array,     # [C, n_drift, WP] from build_replicas_shared
    state_in: jax.Array,     # [C, 128] f32; col 9 = channel offset
    *,
    t_epochs: int,
    k_epochs: int = 128,     # epochs per pallas launch (VMEM bound)
    n0: int,
    wp: int,                 # >= 2*n0 + margin (+128 if n0 % 128), mult of 128
    fs: float,
    code_len: float = 1023.0,
    lock_threshold: float = 15.0,
    max_lost: int = 20,
    pll_c1: float = 0.0,
    pll_c2: float = 0.0,
    dll_c1: float = 0.0,
    dll_c2: float = 0.0,
    el_shift: int = 1,
    interpret: bool = False,
    aiding_scale: float = 0.0,
    if_freq: float = 0.0,
    lock_mode: str = "power",
    costas_thr: float = 0.4,
    interp: bool = False,
):
    """Shared-stream fused tracking: ONE copy of the IQ stream serves
    every channel.

    All channel offsets lie within one code period, so a double-length
    window (wp >= 2 * n0 + margin) starting at lane t * n0 covers every
    channel's epoch-t window; per-channel alignment is the state's
    window-offset column (9) plus per-channel replica anchoring
    (build_replicas_shared). Eliminates the C-fold window duplication
    that dominates the streamed layout's HBM traffic.

    Works for ANY ``n0``: when ``n0 % 128 == 0`` the in-kernel lane
    slice start t*n0 is provably aligned; otherwise the kernel slices
    at the 128-aligned floor and carries the remainder into the lane
    bookkeeping plus a dynamic replica roll (size ``wp`` with an extra
    +128 of margin in that case — see the wp requirement above).
    A lax.scan chunks the block into ``k_epochs``-epoch launches so the
    per-launch VMEM footprint stays bounded; tracking state carries
    through the scan. Returns (telemetry [T, C, 128],
    state_out [C, 128]) identical to track_block_fused.
    """
    c_channels = state_in.shape[0]
    k = min(k_epochs, t_epochs)
    while t_epochs % k:
        k -= 1
    n_chunks = t_epochs // k
    chunk_len = k * n0 + wp

    call = pl.pallas_call(
        functools.partial(
            _kernel,
            n_drift=replicas.shape[1], wp=wp, n0=n0, fs=fs,
            code_len=code_len, lock_threshold=lock_threshold,
            max_lost=max_lost, pll_c1=pll_c1, pll_c2=pll_c2,
            dll_c1=dll_c1, dll_c2=dll_c2, el_shift=el_shift,
            resident=True, aiding_scale=aiding_scale, if_freq=if_freq,
            lock_mode=lock_mode, costas_thr=costas_thr, interp=interp,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, c_channels, N_FIELDS), jnp.float32),
            jax.ShapeDtypeStruct((c_channels, N_FIELDS), jnp.float32),
        ),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c_channels, N_FIELDS), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((c_channels, N_FIELDS), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the double-length shared window doubles the kernel's
            # [C, wp] stack temporaries past the 16 MB default scope
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    bre2 = block_re.reshape(1, -1)
    bim2 = block_im.reshape(1, -1)

    def body(st, i):
        start = i * (k * n0)
        cre = jax.lax.dynamic_slice(bre2, (0, start), (1, chunk_len))
        cim = jax.lax.dynamic_slice(bim2, (0, start), (1, chunk_len))
        telem, st = call(cre, cim, replicas, st)
        return st, telem

    state_out, telems = jax.lax.scan(
        body, state_in, jnp.arange(n_chunks, dtype=jnp.int32))
    return telems.reshape(t_epochs, c_channels, N_FIELDS), state_out


def build_replicas_shared(codes4x, chip_phase, chips_per_sample,
                          offsets, el_shift: int, n0: int, wp: int,
                          n_drift: int = 5):
    """[C, n_drift, WP] PROMPT replica rows for the shared-stream
    path: each channel's replica is pre-shifted so that window lane
    ``offsets[c]`` (the channel's epoch start within the shared
    double-length window) lines up with its code phase.

    ``codes4x``: [C, >= 3 * n0 + wp + 2 * (el_shift + half)] sampled
    nominal-rate code (tiled >= 4 code periods); ``chip_phase``: [C]
    chips at the channel's epoch start; ``offsets``: [C] int samples
    in [0, n0).
    """
    half = (n_drift - 1) // 2
    margin = half + el_shift
    seg_len = wp + 2 * margin
    out = []
    for c in range(codes4x.shape[0]):          # static unroll over C
        # FLOOR, not round: sampled signals/tables are floor-quantized
        # (code[floor(phase)]), so phases within one sample of code are
        # an equivalence class starting at the floor boundary; a round
        # anchor is half-a-sample inconsistent with the in-kernel
        # floor-based shift and walks the DLL off the peak
        s_f = chip_phase[c] / chips_per_sample[c]
        s_i = jnp.floor(s_f).astype(jnp.int32)
        n0_i = jnp.int32(n0)
        s_i = jnp.where(s_i >= n0_i, s_i - n0_i, s_i)
        s_i = jnp.where(s_i < 0, s_i + n0_i, s_i)
        # replica[l] must be code[s_i + (l - off)]: start s_i - off,
        # wrapped positive by one period
        base = s_i - offsets[c] + n0_i
        seg = jax.lax.dynamic_slice(
            codes4x[c], (base + n0_i - margin,), (seg_len,))
        rows = []
        for kk in range(n_drift):
            rel = margin - (kk - half)
            rows.append(jax.lax.slice(seg, (rel,), (rel + wp,)))
        out.append(jnp.stack(rows))
    return jnp.stack(out)


def slice_windows(block_re, block_im, offsets, t_epochs: int, n0: int,
                  wp: int, el_pad: int = 0):
    """XLA pre-step: [T, C, WP] windows at nominal epoch spacing from
    each channel's current offset (drift margin lives INSIDE wp).
    ``el_pad`` (= el_shift + (n_drift - 1) // 2) prerolls each window so
    the epoch body stays clear of the edges; requires
    ``min(offsets) >= el_pad``.

    One dynamic slice per channel, then STATIC strided reshapes build
    the T overlapping windows — a vmapped per-epoch dynamic_slice
    lowers to a serialized gather-equivalent on the axon backend
    (measured ~3.7 us per slice, which dominated the whole fused path);
    this formulation is pure reshape/concat after C slices.

    Requires ``len(block) >= max(offsets) + (t_epochs + 1) * n0``.
    """
    extra = wp - n0
    if extra > n0:
        raise ValueError(f"wp={wp} > 2*n0={2 * n0} unsupported")
    need = (t_epochs + 1) * n0

    def windows(seg):                         # [need] -> [T, WP]
        head = seg[: t_epochs * n0].reshape(t_epochs, n0)
        tail = seg[n0: (t_epochs + 1) * n0].reshape(t_epochs, n0)
        return jnp.concatenate([head, tail[:, :extra]], axis=1)

    outs_re, outs_im = [], []
    for c in range(offsets.shape[0]):         # static unroll over C
        s = offsets[c] - el_pad
        outs_re.append(windows(jax.lax.dynamic_slice(
            block_re, (s,), (need,))))
        outs_im.append(windows(jax.lax.dynamic_slice(
            block_im, (s,), (need,))))
    return jnp.stack(outs_re, axis=1), jnp.stack(outs_im, axis=1)


def build_replicas(codes3x, chip_phase, chips_per_sample, el_shift: int,
                   n0: int, wp: int, n_drift: int = 9, anchor=None,
                   lane_shift=None):
    """XLA pre-step: [C, n_drift, WP] PROMPT replica rows at integer
    drift shifts around each channel's current code phase (early/late
    come from in-kernel rolls of the selected prompt row).

    ``codes3x``: [C, >= 2*n0 + wp - el_shift] sampled nominal-rate
    code (tiled); ``chip_phase``: [C] chips at the channel's offset.

    ``anchor`` ([C] int32, optional) supplies the sample anchor
    s_i = floor(chip_phase / chips_per_sample) precomputed by the
    caller. The anchor MUST be floor-consistent with the frac0 state
    column the kernel selects variants against: computing the same
    f32 division in two places (host numpy for frac0, XLA here) can
    disagree by one ulp exactly at a sample boundary, anchoring the
    replica one sample away from where frac0 says it is — a whole-block
    misalignment the in-kernel select cannot correct, which the DLL
    then integrates into a runaway (observed with carrier aiding, whose
    effective-rate arithmetic widens the divergence window).

    One dynamic slice per channel (only the code phase is dynamic);
    the n_drift x 3 variant rows are static sub-slices of that segment
    — vmapped dynamic_slice serializes on the axon backend.

    ``lane_shift`` ([C] int32 in [0, 128), optional) shifts each
    channel's replica RIGHT by that many window lanes — the seg
    layout's per-channel 128-alignment residue rem_c0 (the kernel's
    state col 9 carries the matching mask shift). Requires n0 large
    enough that the shifted slice start stays >= 0 (n0 > el_pad +
    half + 128, true for every GNSS signal at >= 1 sample/chip).
    """
    half = (n_drift - 1) // 2
    el_pad = el_shift + half           # window preroll (see kernel)
    # even n_drift (the mxu layout's 8-row padded bank): rows extend
    # one shift PAST the symmetric range; pad the segment so every
    # row's static slice start stays >= 0
    pad0 = max(0, (n_drift - 1) - 2 * half)
    seg_len = wp + 2 * half + pad0
    # worst-case slice end over anchors in [0, n0): a short table makes
    # dynamic_slice CLAMP silently and the replica comes out misaligned
    # by up to the shortfall — a whole-block tracking collapse
    need = 2 * n0 + wp - el_shift
    if codes3x.shape[-1] < need:
        raise ValueError(
            f"codes3x rows too short for build_replicas: have "
            f"{codes3x.shape[-1]}, need >= {need} "
            f"(= 2*n0 + wp - el_shift; see make_sampled_code_table)")
    if lane_shift is not None and n0 <= el_pad + half + 128:
        raise ValueError(
            f"n0={n0} too small for lane_shift (need > "
            f"{el_pad + half + 128})")
    out = []
    for c in range(codes3x.shape[0]):          # static unroll over C
        # FLOOR, not round: sampled signals/tables are floor-quantized
        # (code[floor(phase)]), so phases within one sample of code are
        # an equivalence class starting at the floor boundary; a round
        # anchor is half-a-sample inconsistent with the in-kernel
        # floor-based shift and walks the DLL off the peak
        if anchor is None:
            s_f = chip_phase[c] / chips_per_sample[c]
            s_i = jnp.floor(s_f).astype(jnp.int32)
        else:
            s_i = anchor[c]
        n0_i = jnp.int32(n0)
        s_i = jnp.where(s_i >= n0_i, s_i - n0_i, s_i)
        s_i = jnp.where(s_i < 0, s_i + n0_i, s_i)
        # prompt_row_d[l] = code[s_i + l - el_pad - (d - half)]: the
        # epoch-start lane el_pad maps to chip phase s_i; drift d means
        # the epoch starts d samples LATE in the window, so the replica
        # shifts back by d
        base_start = s_i + n0_i - el_pad - half - pad0
        if lane_shift is not None:
            base_start = base_start - lane_shift[c]
        seg = jax.lax.dynamic_slice(
            codes3x[c], (base_start,), (seg_len,))
        rows = []
        for d in range(n_drift):
            rel = 2 * half - d + pad0
            rows.append(jax.lax.slice(seg, (rel,), (rel + wp,)))
        out.append(jnp.stack(rows))
    return jnp.stack(out)


def loop_filter_consts(cfg, code_period_ms: int = 1):
    """(pll_c1, pll_c2, dll_c1, dll_c2) from a TrackConfig."""
    from ...receiver.tracking import _loop_filter_taus

    dt = cfg.integration_s * code_period_ms
    p1, p2 = _loop_filter_taus(cfg.pll_bandwidth_hz, cfg.pll_damping,
                               cfg.pll_gain)
    d1, d2 = _loop_filter_taus(cfg.dll_bandwidth_hz, cfg.dll_damping,
                               cfg.dll_gain)
    return dt / p1, p2 / p1, dt / d1, d2 / d1
