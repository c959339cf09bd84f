"""Pallas TPU kernel: fused E/P/L correlator.

The tracking hot loop (SURVEY.md section 3.3) as one fused kernel per
channel: uint32 NCO phase ramp -> sin/cos carrier wipeoff -> chip-index
ramp -> code gather -> three masked dot products — no [C, W]
intermediates ever leave VMEM, where the XLA path materializes the
wiped window and three replicas in HBM between fusions.

Grid: one program per channel. Per-channel windows arrive as [1, W]
VMEM blocks; per-channel loop-state scalars ride in SMEM; the code
table row sits whole in VMEM (4-32 KB).

Uses the single-gather shift formulation (see
ops/correlator.epl_correlate_one_shift): E/L replicas are static slices
of one extended chip ramp.

Validated against the XLA path in interpreter mode on CPU
(tests/test_pallas.py); ``interpret`` defaults to True off-TPU so the
same entry point runs everywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..correlator import EplSums

_TWO_PI = 6.283185307179586
_INV_U32 = 1.0 / 4294967296.0


def _kernel(
    # SMEM per-channel scalars (prefetched, [C] each)
    n_valid_ref, carr_acc_ref, carr_step_ref,
    chip_int_ref, chip_frac_ref, cps_ref,
    # VMEM blocks
    re_ref,      # [1, W]
    im_ref,      # [1, W]
    code_ref,    # [1, L*os]
    out_ref,     # [1, 6]
    *,
    shift: int,
    oversample: int,
    n_code: int,
    interp: bool,
):
    c = pl.program_id(0)
    w = re_ref.shape[1]

    n_valid = n_valid_ref[c]
    carr_acc = carr_acc_ref[c]
    carr_step = carr_step_ref[c]
    chip_int = chip_int_ref[c]
    chip_frac = chip_frac_ref[c]
    cps = cps_ref[c]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    # ---- carrier wipeoff (exact u32 NCO)
    phase = carr_acc + lane.astype(jnp.uint32) * carr_step
    theta = phase.astype(jnp.float32) * jnp.float32(_TWO_PI * _INV_U32)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    re = re_ref[:]
    im = im_ref[:]
    mask = (lane < n_valid).astype(jnp.float32)
    wre = (re * cos_t + im * sin_t) * mask
    wim = (im * cos_t - re * sin_t) * mask

    # ---- chip-index ramp over [-shift, W+shift) and one gather
    j = jax.lax.broadcasted_iota(jnp.int32, (1, w + 2 * shift), 1) - shift
    cp = chip_frac + j.astype(jnp.float32) * cps
    x = cp * jnp.float32(oversample)
    base = jnp.floor(x)
    idx = jnp.mod(chip_int * oversample + base.astype(jnp.int32), n_code)
    chips = jnp.take_along_axis(code_ref[:], idx, axis=1)
    if interp:
        frac = x - base
        nxt = jnp.take_along_axis(
            code_ref[:], jnp.mod(idx + 1, n_code), axis=1
        )
        chips = chips + frac * (nxt - chips)

    prompt = chips[:, shift:shift + w]
    early = chips[:, 2 * shift:2 * shift + w]
    late = chips[:, 0:w]

    out_ref[0, 0] = jnp.sum(wre * early)
    out_ref[0, 1] = jnp.sum(wim * early)
    out_ref[0, 2] = jnp.sum(wre * prompt)
    out_ref[0, 3] = jnp.sum(wim * prompt)
    out_ref[0, 4] = jnp.sum(wre * late)
    out_ref[0, 5] = jnp.sum(wim * late)


@functools.partial(
    jax.jit,
    static_argnames=("shift", "oversample", "interp", "interpret"),
)
def epl_correlate_pallas(
    re: jax.Array,             # [C, W] f32
    im: jax.Array,             # [C, W] f32
    n_valid: jax.Array,        # [C] i32
    carr_acc: jax.Array,       # [C] u32
    carr_step: jax.Array,      # [C] u32
    chip_int: jax.Array,       # [C] i32
    chip_frac: jax.Array,      # [C] f32
    chips_per_sample: jax.Array,  # [C] f32
    codes: jax.Array,          # [C, L*os] f32
    *,
    shift: int,
    oversample: int = 1,
    interp: bool = False,
    interpret: bool = False,
) -> EplSums:
    """Batched fused correlator; returns EplSums of [C] arrays."""
    n_ch, w = re.shape
    n_code = codes.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_ch,),
        in_specs=[
            pl.BlockSpec((1, w), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_code), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 6), lambda c, *_: (c, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, shift=shift, oversample=oversample, n_code=n_code,
            interp=interp,
        ),
        out_shape=jax.ShapeDtypeStruct((n_ch, 6), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        n_valid.astype(jnp.int32),
        carr_acc.astype(jnp.uint32),
        carr_step.astype(jnp.uint32),
        chip_int.astype(jnp.int32),
        chip_frac.astype(jnp.float32),
        chips_per_sample.astype(jnp.float32),
        re, im, codes,
    )
    return EplSums(
        i_e=out[:, 0], q_e=out[:, 1],
        i_p=out[:, 2], q_p=out[:, 3],
        i_l=out[:, 4], q_l=out[:, 5],
    )
