"""Tracing / profiling / roofline accounting (SURVEY.md section 5).

Three tiers:

* xprof integration -- ``profile_trace`` / ``named_scope`` wrap
  ``jax.profiler`` so pipeline stages show up named in traces;
* **op-level cost models** -- ``CostModel`` computes FLOPs and HBM
  bytes for the framework's hot ops from their shapes (the numbers the
  Pallas kernels declare via ``pl.CostEstimate`` and that
  ``roofline_report`` checks measured times against);
* **roofline checks** -- given a measured seconds-per-call,
  ``roofline_report`` returns the compute-bound and memory-bound
  lower bounds and which resource binds (BASELINE.json:5
  "speed-of-light per chip"; used by ``bench_dtw.py`` and the bench
  notes in ``docs/PERFORMANCE.md``).
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

# One v5e-class chip (defaults; override per call for other parts).
PEAK_BF16_FLOPS = 197e12     # MXU, bf16 multiply-accumulate
PEAK_F32_FLOPS = 49e12       # MXU f32 (HIGHEST precision passes)
# exact-f32 emulation (Precision.HIGHEST) runs ~6 bf16 MXU passes
PEAK_F32_HIGHEST_FLOPS = PEAK_BF16_FLOPS / 6.0
# VPU: 8 sublanes x 128 lanes x ~4 issue slots x ~0.94 GHz (v5e-class)
PEAK_VPU_OPS = 3.9e12
HBM_BYTES_PER_S = 819e9
# VMEM -> VPU load bandwidth, MEASURED on this chip by the
# dependency-free count-pass probe (bench_selbin_levels.py int32 row:
# 32 sweeps over a resident [3072, 256] i32 plane).  The exact
# order-statistic select re-reads its resident keys once per bisection
# level, so this -- not ALU issue -- is its binding resource.
VMEM_BYTES_PER_S = 2.6e12


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture an xprof trace into ``log_dir`` (no-op if None)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def named_scope(name: str):
    """Name a region for xprof (usable as decorator or context)."""
    return jax.named_scope(name)


@dataclasses.dataclass(frozen=True)
class OpCost:
    """Hardware-independent cost of one op invocation."""

    flops: float          # multiply-accumulates x2
    hbm_bytes: float      # compulsory HBM traffic (reads + writes)

    def __add__(self, other: "OpCost") -> "OpCost":
        return OpCost(self.flops + other.flops,
                      self.hbm_bytes + other.hbm_bytes)


class CostModel:
    """Shape -> (FLOPs, bytes) for the framework's hot ops.

    These are *compulsory* costs (ideal fusion, each operand touched
    once); measured time over the roofline bound is the optimization
    headroom.
    """

    @staticmethod
    def direct_scores(b, t, k, length, d, bytes_per_el=2) -> OpCost:
        """Direct sliding correlation (conv / correlation_pallas)."""
        flops = 2.0 * b * t * k * length * d
        bytes_ = (b * t * d + k * length * d) * bytes_per_el + b * t * k * 4
        return OpCost(flops, bytes_)

    @staticmethod
    def fft_scores(b, t, k, length, d, nfft, bytes_per_el=2) -> OpCost:
        """Overlap-save frequency-domain scoring (detect.fft_scorer)."""
        bins = nfft // 2 + 1
        hop = nfft - length + 1
        nblk = -(-(t - length + 1) // hop)
        m = b * nblk
        flops = (
            2.0 * m * nfft * 2 * bins * d      # forward DFT GEMM
            + 2.0 * bins * 2 * m * 2 * d * k   # per-bin complex GEMM
            + 2.0 * hop * 2 * bins * m * k     # inverse DFT GEMM
        )
        bytes_ = (
            b * t * d * bytes_per_el           # features in
            + bins * 2 * d * k * bytes_per_el  # spectra bank stream
            + b * t * k * 4                    # scores out
        )
        return OpCost(flops, bytes_)

    @staticmethod
    def frontend(b, samples, frame_length, hop_length, nfft,
                 n_mels=0) -> OpCost:
        """Fused DFT[+mel]+log+edge frontend per batch."""
        t = max(1 + (samples - frame_length) // hop_length, 0)
        bins = nfft // 2 + 1
        flops = 2.0 * b * t * frame_length * 2 * bins
        if n_mels:
            flops += 2.0 * b * t * bins * n_mels
        f_out = (n_mels - 1) if n_mels else nfft // 2
        bytes_ = b * (samples * 4 + t * f_out * 8 * 4)
        return OpCost(flops, bytes_)

    @staticmethod
    def frontend_fused_roofline(
        b, samples, frame_length, hop_length, nfft, n_mels=0,
        spread_time=1, spread_freq=1,
    ) -> dict:
        """Three-resource roofline of the production two-kernel
        plane-major frontend (stacked response kernel + resident
        select+binspread kernel, frontend.planes hot path).

        The binding resources are heterogeneous, so a single
        (flops, bytes) OpCost under one peak misrepresents it:

        * MXU: the DFT GEMM at exact-f32 (HIGHEST ~ 6 bf16 passes);
        * VPU: the dual-rank order-statistic bisection -- an EXACT
          f32 select costs 32 levels x 2 ranks x (compare +
          accumulate) per response cell (the information-theoretic
          shape of rank selection by counting; no digit schedule does
          better, planes.py), plus key build, binarize, and the
          dilation shifts;
        * HBM: wav in, response planes written ONCE and read ONCE
          (the selection threshold depends on every response, so the
          planes must round-trip HBM or be recomputed -- one
          round-trip is the compulsory minimum), flat map out.

        Returns the per-resource seconds, the binding bound, and its
        name; ``roofline_frac`` for the frontend row is
        bound_s / measured_s.
        """
        t = max(1 + (samples - frame_length) // hop_length, 0)
        fl_pad = -(-frame_length // 128) * 128
        f_out = (n_mels - 1) if n_mels else nfft // 2
        # DFT GEMM column count: non-mel covers exactly f_out lanes
        # (the Nyquist column rides a VPU dot); mel needs all bins
        gemm_cols = (nfft // 2 + 1) if n_mels else f_out
        cells = 4.0 * b * t * f_out          # response-plane cells
        mxu = 2.0 * b * t * fl_pad * 2 * gemm_cols
        if n_mels:
            mxu += 2.0 * b * t * (nfft // 2 + 1) * n_mels
        # per cell: key build ~4; select 32 levels x 2 ranks x 2 ops;
        # binarize ~4; dilation 3 ops per shift step on both output
        # channels
        vpu = cells * (
            4 + 32 * 2 * 2 + 4 + 3.0 * 2 * (spread_time + spread_freq)
        )
        # VMEM load stream of the resident select: every bisection
        # level re-reads the resident u32 keys (both ranks share one
        # load); plus the key build/binarize/dilation passes.  This is
        # the select's MEASURED binding resource (round 5): the 16-bit
        # key split that would halve it crashes this toolchain's
        # Mosaic compiler (bench_selbin_levels.py int16/int8 rows).
        vmem = cells * 4.0 * (32 + 6)
        hbm = b * (
            samples * 4.0              # waveform in
            + t * frame_length * 8.0   # frames write + read (XLA stage)
            + 4 * t * f_out * 8.0      # planes write + read (once each)
            + t * f_out * 8.0          # flat u8 map out
        )
        t_mxu = mxu / PEAK_F32_HIGHEST_FLOPS
        t_vpu = vpu / PEAK_VPU_OPS
        t_vmem = vmem / VMEM_BYTES_PER_S
        t_hbm = hbm / HBM_BYTES_PER_S
        bound = max(t_mxu, t_vpu, t_vmem, t_hbm)
        name = {
            t_mxu: "mxu", t_vpu: "vpu", t_vmem: "vmem", t_hbm: "memory"
        }[bound]
        return {
            "mxu_s": t_mxu,
            "vpu_s": t_vpu,
            "vmem_s": t_vmem,
            "memory_s": t_hbm,
            "bound": name,
            "roofline_s": bound,
        }

    @staticmethod
    def dtw(n_pairs, length, m, band, lanes=None) -> OpCost:
        """Banded wavefront DTW over the skewed cost stream."""
        lanes = lanes if lanes is not None else length
        k_diag = length + m - 1
        # DP min/add work ~ 5 VPU ops per lane-cell; count as "flops"
        flops = 5.0 * n_pairs * k_diag * lanes
        bytes_ = n_pairs * (k_diag * lanes * 4 + 4)
        return OpCost(flops, bytes_)


def roofline_report(
    cost: OpCost,
    measured_s: float,
    peak_flops: float = PEAK_BF16_FLOPS,
    hbm_bytes_per_s: float = HBM_BYTES_PER_S,
) -> dict:
    """Compare a measured time against the compute/memory rooflines.

    Returns the two lower bounds, which one binds, and the fraction of
    the binding roofline achieved (1.0 = speed of light).
    """
    t_compute = cost.flops / peak_flops
    t_memory = cost.hbm_bytes / hbm_bytes_per_s
    bound = "compute" if t_compute >= t_memory else "memory"
    t_bound = max(t_compute, t_memory)
    return {
        "compute_s": t_compute,
        "memory_s": t_memory,
        "bound": bound,
        "roofline_s": t_bound,
        "roofline_frac": (t_bound / measured_s) if measured_s > 0 else 0.0,
        "measured_s": measured_s,
    }
