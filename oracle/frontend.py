"""Signal front end: waveform -> binary oriented-edge feature maps.

Algorithm (SURVEY.md section 1 row L1, section 3.4 -- [HIGH]-confidence
reconstruction of the reference's ``edge_signal_proc``-style front end;
the reference mount was empty, see SURVEY.md section 0):

    preemphasis -> framing -> Hamming window -> DFT -> log magnitude
    -> 8 oriented edge responses (4 orientations x 2 polarities)
    -> per-channel quantile threshold -> binarize -> binary spreading

Everything is float32.  The DFT is expressed as a GEMM (frames @ DFT
matrix) rather than an FFT so the TPU implementation -- where the GEMM
form is MXU-native (cf. /root/repo/PAPERS.md:5, MelT) -- computes the
*same arithmetic* and feature-map parity is a matter of summation
order only.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_LOG_EPS = np.float32(1e-6)


@dataclasses.dataclass(frozen=True)
class FrontendParams:
    """Every front-end magic number, named (SURVEY.md section 5, config row)."""

    sample_rate: int = 16000
    frame_length: int = 400        # 25 ms at 16 kHz
    hop_length: int = 160          # 10 ms at 16 kHz
    nfft: int = 512
    preemphasis: float = 0.95
    use_mel: bool = False          # BASELINE.json:5 names log-mel a variant
    n_mels: int = 64
    edge_quantile: float = 0.98    # keep top 2% of responses per channel
    spread_time: int = 1           # dilation radius (frames)
    spread_freq: int = 1           # dilation radius (bins)

    @property
    def num_bins(self) -> int:
        return self.n_mels if self.use_mel else self.nfft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        return 1 + (num_samples - self.frame_length) // self.hop_length


NUM_EDGE_CHANNELS = 8  # 4 orientations x 2 polarities


def preemphasize(x: np.ndarray, alpha: float) -> np.ndarray:
    """y[0] = x[0]; y[t] = x[t] - alpha * x[t-1]."""
    x = np.asarray(x, dtype=np.float32)
    y = np.empty_like(x)
    y[0] = x[0]
    y[1:] = x[1:] - np.float32(alpha) * x[:-1]
    return y


def frame_signal(x: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """[S] -> [T, frame_length] with T = 1 + (S - frame_length)//hop."""
    num_frames = 1 + (len(x) - frame_length) // hop_length
    if num_frames <= 0:
        raise ValueError(f"signal too short: {len(x)} < {frame_length}")
    idx = np.arange(frame_length)[None, :] + hop_length * np.arange(num_frames)[:, None]
    return np.ascontiguousarray(x[idx], dtype=np.float32)


def hamming_window(n: int) -> np.ndarray:
    """Symmetric Hamming, float32: 0.54 - 0.46 cos(2 pi k / (n-1))."""
    k = np.arange(n, dtype=np.float32)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))).astype(np.float32)


def dft_matrices(frame_length: int, nfft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis as GEMM operands: ([frame, bins] cos, [frame, bins] -sin).

    real[k] = sum_n x[n] cos(2 pi n k / nfft)
    imag[k] = -sum_n x[n] sin(2 pi n k / nfft)
    for k = 0..nfft//2 -- identical to np.fft.rfft of the zero-padded frame.
    """
    n = np.arange(frame_length, dtype=np.float64)[:, None]
    k = np.arange(nfft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / nfft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def stft_log_magnitude(x: np.ndarray, p: FrontendParams) -> np.ndarray:
    """waveform [S] -> log-magnitude spectrogram [T, nfft//2+1], float32."""
    y = preemphasize(x, p.preemphasis)
    frames = frame_signal(y, p.frame_length, p.hop_length)
    frames = frames * hamming_window(p.frame_length)[None, :]
    cos_m, sin_m = dft_matrices(p.frame_length, p.nfft)
    re = frames @ cos_m
    im = frames @ sin_m
    power = re * re + im * im
    return (0.5 * np.log(power + _LOG_EPS)).astype(np.float32)


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sample_rate: int, nfft: int, n_mels: int) -> np.ndarray:
    """HTK-style triangular filters, [nfft//2+1, n_mels], float32."""
    nyq = sample_rate / 2.0
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(nyq), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bins = np.floor((nfft + 1) * hz_pts / sample_rate).astype(np.int64)
    fb = np.zeros((nfft // 2 + 1, n_mels), dtype=np.float32)
    for m in range(n_mels):
        lo, ctr, hi = bins[m], bins[m + 1], bins[m + 2]
        for b in range(lo, ctr):
            if ctr > lo:
                fb[b, m] = (b - lo) / (ctr - lo)
        for b in range(ctr, hi):
            if hi > ctr:
                fb[b, m] = (hi - b) / (hi - ctr)
    return fb


def log_mel(x: np.ndarray, p: FrontendParams) -> np.ndarray:
    """waveform [S] -> log-mel spectrogram [T, n_mels], float32."""
    y = preemphasize(x, p.preemphasis)
    frames = frame_signal(y, p.frame_length, p.hop_length)
    frames = frames * hamming_window(p.frame_length)[None, :]
    cos_m, sin_m = dft_matrices(p.frame_length, p.nfft)
    re = frames @ cos_m
    im = frames @ sin_m
    power = re * re + im * im
    fb = mel_filterbank(p.sample_rate, p.nfft, p.n_mels)
    return np.log(power @ fb + _LOG_EPS).astype(np.float32)


def spectrogram(x: np.ndarray, p: FrontendParams) -> np.ndarray:
    """Dispatch: log-mel or log-magnitude per ``p.use_mel``."""
    return log_mel(x, p) if p.use_mel else stft_log_magnitude(x, p)


def edge_responses(spec: np.ndarray) -> np.ndarray:
    """[T, F] log-spectrogram -> [T-1, F-1, 8] oriented edge responses.

    Orientations (finite differences), all cropped to the common
    [T-1, F-1] grid; channel 2*o is the positive polarity (+d), channel
    2*o+1 the negative polarity (-d):

      o=0 time:      d = S[t+1, f  ] - S[t, f]
      o=1 freq:      d = S[t,   f+1] - S[t, f]
      o=2 diagonal:  d = S[t+1, f+1] - S[t, f]
      o=3 anti-diag: d = S[t+1, f  ] - S[t, f+1]
    """
    spec = np.asarray(spec, dtype=np.float32)
    d_time = (spec[1:, :] - spec[:-1, :])[:, :-1]
    d_freq = (spec[:, 1:] - spec[:, :-1])[:-1, :]
    d_diag = spec[1:, 1:] - spec[:-1, :-1]
    d_anti = spec[1:, :-1] - spec[:-1, 1:]
    out = np.empty(d_time.shape + (NUM_EDGE_CHANNELS,), dtype=np.float32)
    for o, d in enumerate((d_time, d_freq, d_diag, d_anti)):
        out[..., 2 * o] = d
        out[..., 2 * o + 1] = -d
    return out


def quantile_threshold(responses: np.ndarray, quantile: float) -> np.ndarray:
    """Per-channel exact order-statistic threshold.

    For each channel c, tau_c = sorted(r_c)[k] with k = floor(q * N)
    (clamped to N-1).  Using the exact k-th order statistic -- an
    element of the array, not an interpolated value -- means the TPU
    implementation produces the *identical* threshold given identical
    responses (no interpolation-arithmetic divergence).
    Returns [num_channels] float32.
    """
    t, f, c = responses.shape
    flat = responses.reshape(t * f, c)
    n = flat.shape[0]
    # k in float32 on every implementation (CPU and TPU) so the index
    # itself cannot diverge by rounding width.
    k = min(n - 1, int(np.floor(np.float32(quantile) * np.float32(n))))
    part = np.partition(flat, k, axis=0)
    return part[k, :].astype(np.float32)


def binary_edge_map(responses: np.ndarray, quantile: float) -> np.ndarray:
    """responses [T', F', 8] -> strict-threshold binary map (bool)."""
    tau = quantile_threshold(responses, quantile)
    return responses > tau[None, None, :]


def spread_binary(binary: np.ndarray, spread_time: int, spread_freq: int) -> np.ndarray:
    """Binary dilation with a (2*rt+1) x (2*rf+1) rectangle, zero-padded.

    Per-channel independent; robustness to small misalignment
    (SURVEY.md section 2a "Edge spreading").
    """
    if spread_time == 0 and spread_freq == 0:
        return binary.astype(bool)
    t, f, c = binary.shape
    padded = np.zeros((t + 2 * spread_time, f + 2 * spread_freq, c), dtype=bool)
    padded[spread_time : spread_time + t, spread_freq : spread_freq + f] = binary
    out = np.zeros_like(binary, dtype=bool)
    for dt in range(2 * spread_time + 1):
        for df in range(2 * spread_freq + 1):
            out |= padded[dt : dt + t, df : df + f]
    return out


def frontend(x: np.ndarray, p: FrontendParams) -> np.ndarray:
    """waveform [S] -> spread binary edge map [T-1, F-1, 8] (bool)."""
    spec = spectrogram(x, p)
    resp = edge_responses(spec)
    binary = binary_edge_map(resp, p.edge_quantile)
    return spread_binary(binary, p.spread_time, p.spread_freq)
