"""Pallas TPU kernel: VMEM-resident dual-rank order-statistic select
fused with binarize + freq-spread (the whole post-response frontend).

Round-3 verdict, next item 1: the plane-major frontend spent 2.7 ms of
its 5.4 ms in the radix-select quantile because every bisection level
re-streamed the 98 MB key tensor from HBM (11 levels), and another
1.0 ms re-reading the planes for binarize+spread.  This kernel removes
every re-read: one grid program per (utterance, plane) holds the
[T, F] response plane in VMEM (~3 MB at the bench shape), builds the
monotone uint32 order keys in a VMEM scratch, runs the ENTIRE
dual-rank bisection over the resident keys, and immediately binarizes
both polarities against the selected statistics and applies the
frequency dilation -- planes cross the HBM bus exactly once, and the
flat feature map [T, 2F] streams straight out.

Input layout: the plane-major [4, B*T, F] stack the stacked response
kernel writes (``ops.frontend_pallas.edge_response_planes_stacked_
pallas``) -- every (plane, utterance) block is one contiguous 3 MB
DMA for both producer and consumer.  Layouts measured and rejected at
the bench shape: [T, 4F] planes-in-lanes strides the per-plane DMA 4x
(+1.3 ms); one per-utterance program over all four planes serializes
the selects behind a single block (+1.0 ms); four separate input
arrays re-fetch all four blocks per (utterance, plane) program
(+0.7 ms).

Selection identity (bit-parity with ``frontend.planes
.plane_order_statistics`` and the NumPy oracle): the bisection runs in
VALUE space rather than prefix space -- carry the partial key ``v``
and a halving ``step`` (2^31, 2^30, ...); at each level set the bit
iff ``#(key < v + step) < rank+1``.  ``v + step`` equals the prefix
form's candidate bound ``((prefix<<1)+1) << shift`` exactly, and never
overflows uint32, so all 32 levels descend into the same digit as the
4-bit-digit XLA path and the 3-bit Pallas counting path -- any digit
schedule selects the same element (see planes.py) -- while costing
only 2 compares + 2 accumulates per element per level and ZERO dynamic
shifts.  Masked cells hold key 0xFFFFFFFF and are never counted (every
bound is <= 2^32 - step), which matches the absolute-rank counting
argument in ``ops.radix_pallas``.

Binarize compares canonicalized keys: raw key order separates
-0.0 (0x7FFFFFFF) < +0.0 (0x80000000) while the layered path's float
compares treat them as equal, so a +/-0.0 threshold (real under heavy
ties) would flip zero cells if compared as raw keys; mapping the -0.0
key to the +0.0 key in BOTH operands makes uint32 order coincide with
float order everywhere (zero is the only difference; no NaNs here),
reproducing ``binarize_spread_flat``'s compares bit-for-bit.  Freq
dilation is the lane-shift OR of ``ops.binspread_pallas``; time
dilation runs in-kernel too (the whole utterance is resident, so the
row shifts are local and the [B, T, D] XLA epilogue pass disappears),
with the final row mask re-applied after it exactly as the layered
path's ``& row_valid``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SIGN = 0x80000000
_MASKED = 0xFFFFFFFF


def _kernel(planes_ref, need_ref, valid_ref,
            flat_ref, key_ref, keys_ref,
            *, rf: int, rt: int, f: int, t: int, db: int):
    bi = pl.program_id(0)
    pi = pl.program_id(1)

    plane = planes_ref[0, 0]                       # [T, F] f32
    bits = jax.lax.bitcast_convert_type(plane, jnp.uint32)
    keys = jnp.where(
        bits >= jnp.uint32(_SIGN), ~bits, bits | jnp.uint32(_SIGN)
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    rv = rows < valid_ref[bi, 0]                   # [T, 1]
    keys_ref[...] = jnp.where(rv, keys, jnp.uint32(_MASKED))

    need_hi = need_ref[bi, 0]
    need_lo = need_ref[bi, 1]

    if db == 1:
        def level(_, carry):
            v_hi, v_lo, step = carry
            b_hi = v_hi + step
            b_lo = v_lo + step
            ks = keys_ref[...]
            c_hi = jnp.sum((ks < b_hi).astype(jnp.int32))
            c_lo = jnp.sum((ks < b_lo).astype(jnp.int32))
            v_hi = jnp.where(c_hi < need_hi, b_hi, v_hi)
            v_lo = jnp.where(c_lo < need_lo, b_lo, v_lo)
            return v_hi, v_lo, step >> jnp.uint32(1)

        v_hi, v_lo, _ = jax.lax.fori_loop(
            0, 32, level,
            (jnp.uint32(0), jnp.uint32(0), jnp.uint32(_SIGN)),
        )
    else:                       # db == 2: 16 levels x 3 cumulative bounds
        def level2(_, carry):
            v_hi, v_lo, sub = carry
            ks = keys_ref[...]

            def digit(v, need):
                c1 = jnp.sum((ks < v + sub).astype(jnp.int32))
                c2 = jnp.sum((ks < v + 2 * sub).astype(jnp.int32))
                c3 = jnp.sum((ks < v + 3 * sub).astype(jnp.int32))
                d = (
                    (c1 < need).astype(jnp.uint32)
                    + (c2 < need).astype(jnp.uint32)
                    + (c3 < need).astype(jnp.uint32)
                )
                return v + d * sub

            v_hi = digit(v_hi, need_hi)
            v_lo = digit(v_lo, need_lo)
            return v_hi, v_lo, sub >> jnp.uint32(2)

        v_hi, v_lo, _ = jax.lax.fori_loop(
            0, 16, level2,
            (jnp.uint32(0), jnp.uint32(0), jnp.uint32(1 << 30)),
        )
    key_ref[bi, pi, 0] = v_hi
    key_ref[bi, pi, 1] = v_lo

    def canon(k):
        return jnp.where(
            k == jnp.uint32(_SIGN - 1), jnp.uint32(_SIGN), k
        )

    cks = canon(keys_ref[...])
    pos = ((cks > canon(v_hi)) & rv).astype(jnp.uint8)
    neg = ((cks < canon(v_lo)) & rv).astype(jnp.uint8)

    def dil_freq(x):
        out = x
        for s in range(1, rf + 1):
            z = jnp.zeros((t, s), jnp.uint8)
            out = (
                out
                | jnp.concatenate([z, x[:, : f - s]], 1)
                | jnp.concatenate([x[:, s:], z], 1)
            )
        return out

    if rf:
        pos = dil_freq(pos)
        neg = dil_freq(neg)
    both = jnp.concatenate([pos, neg], 1)          # [T, 2F]
    if rt:
        # time dilation is utterance-local too (the whole [T, 2F] tile
        # is resident), so the XLA epilogue pass it used to need
        # disappears; rectangle dilation is separable, so
        # freq-then-time equals the classic time-then-freq exactly
        out = both
        for s in range(1, rt + 1):
            z = jnp.zeros((s, 2 * f), jnp.uint8)
            out = (
                out
                | jnp.concatenate([z, both[: t - s, :]], 0)
                | jnp.concatenate([both[s:, :], z], 0)
            )
        # dilation smears True into rows >= valid; re-mask as the
        # layered path's final `& row_valid` does
        both = jnp.where(rv, out, jnp.uint8(0))
    flat_ref[0] = both                             # [T, 2F]


def _kernel_allplanes(planes_ref, need_ref, valid_ref,
                      flat_ref, key_ref, keys_ref,
                      *, rf: int, rt: int, f: int, t: int, p: int):
    """All-planes-per-program variant (round 5): one grid program per
    UTTERANCE holds every response plane resident and runs the 2*p
    bisection chains interleaved.

    Why: the dual-rank bisection is bound by its serial dependency --
    each level's count must reduce to a scalar before the next bound
    exists, so the per-plane kernel pays 32 full reduction latencies
    per (utterance, plane) back to back (measured: a dependency-free
    count pass runs ~40x faster than the chained bisection achieves).
    With p planes per program the 2*p independent chains issue their
    counts together each level, overlapping the reduction latency ~p
    times.  Counts, compares, and epilogue are bit-identical to the
    per-plane kernel (same order within each chain)."""
    bi = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    rv = rows < valid_ref[bi, 0]                   # [T, 1]
    for pi in range(p):
        plane = planes_ref[pi, 0]                  # [T, F] f32
        bits = jax.lax.bitcast_convert_type(plane, jnp.uint32)
        keys = jnp.where(
            bits >= jnp.uint32(_SIGN), ~bits, bits | jnp.uint32(_SIGN)
        )
        keys_ref[pi] = jnp.where(rv, keys, jnp.uint32(_MASKED))

    need_hi = need_ref[bi, 0]
    need_lo = need_ref[bi, 1]

    def level(_, carry):
        vhs, vls, step = carry
        nh, nl = [], []
        for pi in range(p):
            ks = keys_ref[pi]
            b_hi = vhs[pi] + step
            b_lo = vls[pi] + step
            c_hi = jnp.sum((ks < b_hi).astype(jnp.int32))
            c_lo = jnp.sum((ks < b_lo).astype(jnp.int32))
            nh.append(jnp.where(c_hi < need_hi, b_hi, vhs[pi]))
            nl.append(jnp.where(c_lo < need_lo, b_lo, vls[pi]))
        return tuple(nh), tuple(nl), step >> jnp.uint32(1)

    zero = jnp.uint32(0)
    vhs, vls, _ = jax.lax.fori_loop(
        0, 32, level,
        (tuple(zero for _ in range(p)), tuple(zero for _ in range(p)),
         jnp.uint32(_SIGN)),
    )

    def canon(k):
        return jnp.where(
            k == jnp.uint32(_SIGN - 1), jnp.uint32(_SIGN), k
        )

    def dil_freq(x):
        out = x
        for s in range(1, rf + 1):
            z = jnp.zeros((t, s), jnp.uint8)
            out = (
                out
                | jnp.concatenate([z, x[:, : f - s]], 1)
                | jnp.concatenate([x[:, s:], z], 1)
            )
        return out

    cols = []
    for pi in range(p):
        key_ref[bi, pi, 0] = vhs[pi]
        key_ref[bi, pi, 1] = vls[pi]
        cks = canon(keys_ref[pi])
        pos = ((cks > canon(vhs[pi])) & rv).astype(jnp.uint8)
        neg = ((cks < canon(vls[pi])) & rv).astype(jnp.uint8)
        if rf:
            pos = dil_freq(pos)
            neg = dil_freq(neg)
        cols.append(pos)
        cols.append(neg)
    both = jnp.concatenate(cols, 1)                # [T, 2pF]
    if rt:
        out = both
        for s in range(1, rt + 1):
            z = jnp.zeros((s, 2 * p * f), jnp.uint8)
            out = (
                out
                | jnp.concatenate([z, both[: t - s, :]], 0)
                | jnp.concatenate([both[s:, :], z], 0)
            )
        both = jnp.where(rv, out, jnp.uint8(0))
    flat_ref[0] = both                             # [T, 2pF]


# All p planes resident at once: cap the per-plane cell count so the
# plane blocks + key scratch + epilogue stay inside the ~100 MB VMEM
# window (the per-plane kernel's cap is 2x this).
_ALLPLANES_MAX_CELLS = 786_432


@functools.partial(
    jax.jit,
    static_argnames=("spread_freq", "spread_time", "digit_bits",
                     "interpret"),
)
def select_binspread_pallas(
    planes: jnp.ndarray,        # [P, B, T, F] f32 response planes
    need: jnp.ndarray,          # [B, 2] int32: rank+1 for (k, n-1-k)
    valid_frames: jnp.ndarray,  # [B] int32
    spread_freq: int,
    spread_time: int = 0,
    digit_bits: int = 1,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused select + binarize + freq-spread over response planes.

    ``planes`` is the plane-major stack the stacked response kernel
    emits ([4, B*T, F] viewed as [4, B, T, F]; each (plane, utterance)
    block contiguous -- both sides DMA whole 3 MB blocks).  Returns
    ``(flat, keys)``: ``flat`` [B, T, 2P*F] uint8 is the channel-major
    flat map (channel 2i = plane i > os_k, channel 2i+1 = plane i <
    os_{n-1-k}, freq- and (if ``spread_time``) time-dilated, rows >=
    valid False) and ``keys`` [B, P, 2] uint32 holds the selected
    order keys (``ops.edges.key_to_float`` recovers the float
    statistics).  Constraints: T % 128 == 0, F % 128 == 0.

    ``digit_bits`` picks the bisection schedule (1 -> 32 levels x 1
    cumulative bound per rank, 2 -> 16 levels x 3); both select the
    bit-identical element (digit-schedule invariance).  1 is the
    default and measured faster (1.95 vs 2.17 ms at the bench shape):
    the VPU predicate+accumulate count (2 vs 3 per resolved bit pair)
    binds, not the once-per-level VMEM re-read the wider digit halves.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p, b, t, f = planes.shape
    need = need.astype(jnp.int32)
    if t % 128 or f % 128:
        raise ValueError(f"T={t} and F={f} must be multiples of 128")
    vf = valid_frames.astype(jnp.int32).reshape(b, 1)
    if digit_bits == 1 and t * f <= _ALLPLANES_MAX_CELLS:
        # production path: all planes per program, bisection chains
        # interleaved (see _kernel_allplanes)
        flat, keys = pl.pallas_call(
            functools.partial(_kernel_allplanes, rf=spread_freq,
                              rt=spread_time, f=f, t=t, p=p),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((p, 1, t, f), lambda bi: (0, bi, 0, 0)),
                pl.BlockSpec((b, 2), lambda bi: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b, 1), lambda bi: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, t, 2 * p * f), lambda bi: (bi, 0, 0)),
                pl.BlockSpec((b, p, 2), lambda bi: (0, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, t, 2 * p * f), jnp.uint8),
                jax.ShapeDtypeStruct((b, p, 2), jnp.uint32),
            ],
            scratch_shapes=[pltpu.VMEM((p, t, f), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=int(p * b * t * f * (32 * 4 + 8 + 4 * spread_freq)),
                bytes_accessed=int(
                    p * b * t * f * 4 + b * t * 2 * p * f
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(planes, need, vf)
        return flat, keys
    flat, keys = pl.pallas_call(
        functools.partial(_kernel, rf=spread_freq, rt=spread_time,
                          f=f, t=t, db=digit_bits),
        grid=(b, p),
        in_specs=[
            pl.BlockSpec((1, 1, t, f), lambda bi, pi: (pi, bi, 0, 0)),
            pl.BlockSpec((b, 2), lambda bi, pi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1), lambda bi, pi: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, 2 * f), lambda bi, pi: (bi, 0, pi)),
            # whole-array SMEM block: every program writes its own
            # [bi, pi] row (the full-array block is the one SMEM
            # layout the TPU lowering accepts)
            pl.BlockSpec((b, p, 2), lambda bi, pi: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, 2 * p * f), jnp.uint8),
            jax.ShapeDtypeStruct((b, p, 2), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((t, f), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            # 4 double-buffered plane blocks + key scratch + epilogue
            # temporaries exceed the default 16 MB scoped-vmem cap at
            # the bench shape (T=3072, F=256 -> ~30 MB); the chip has
            # 128 MB VMEM (probed >= 120 usable) -- raise the cap and
            # let planes._SELBIN_MAX_CELLS gate admissible shapes
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # 32 levels x 2 ranks x (compare + accumulate) + epilogue
            flops=int(p * b * t * f * (32 * 4 + 8 + 4 * spread_freq)),
            bytes_accessed=int(p * b * t * f * 4 + b * t * 2 * p * f),
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes, need, vf)
    return flat, keys
