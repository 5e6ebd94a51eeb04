"""Synthetic TIMIT-like corpus generator.

TIMIT itself is not on this machine (verified; SURVEY.md section 7
says to check before building the data layer), so tests and
benchmarks run on a deterministic synthetic corpus with the same
*shape* as TIMIT: 16 kHz waveforms with sample-aligned phone
annotations (the role of ``.phn`` files), a phone inventory, and
train/test speaker-style splits.

Each synthetic "phone" is a formant-like sum of sinusoids with a
phone-specific frequency signature plus noise; this yields
spectrogram structure that edge features genuinely discriminate, so
detection ROC curves are meaningful rather than degenerate.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class PhoneSpec:
    name: str
    formants_hz: tuple[float, ...]
    min_ms: float
    max_ms: float
    amp: float = 1.0
    noise: float = 0.05


# A compact inventory. Index 0 is background/silence.
DEFAULT_PHONES: tuple[PhoneSpec, ...] = (
    PhoneSpec("sil", (), 40.0, 160.0, amp=0.0, noise=0.02),
    PhoneSpec("aa", (730.0, 1090.0, 2440.0), 60.0, 180.0),
    PhoneSpec("iy", (270.0, 2290.0, 3010.0), 50.0, 150.0),
    PhoneSpec("uw", (300.0, 870.0, 2240.0), 50.0, 150.0),
    PhoneSpec("eh", (530.0, 1840.0, 2480.0), 50.0, 140.0),
    PhoneSpec("s", (4500.0, 6000.0), 60.0, 160.0, amp=0.5, noise=0.4),
    PhoneSpec("sh", (2200.0, 3300.0), 60.0, 160.0, amp=0.5, noise=0.35),
    PhoneSpec("m", (250.0, 1000.0), 40.0, 120.0, amp=0.6),
    PhoneSpec("r", (490.0, 1350.0, 1690.0), 40.0, 120.0),
    PhoneSpec("k", (1800.0, 4000.0), 20.0, 70.0, amp=0.7, noise=0.3),
)


@dataclasses.dataclass
class Utterance:
    waveform: np.ndarray                  # [S] float32
    phones: list[tuple[str, int, int]]    # (name, start_sample, end_sample)
    utt_id: str


@dataclasses.dataclass
class SyntheticCorpus:
    utterances: list[Utterance]
    sample_rate: int
    phone_names: tuple[str, ...]

    def occurrences(self, phone: str) -> list[tuple[int, int, int]]:
        """All (utt_index, start_sample, end_sample) of ``phone``."""
        out = []
        for ui, utt in enumerate(self.utterances):
            for name, s, e in utt.phones:
                if name == phone:
                    out.append((ui, s, e))
        return out

    def exemplar_clips(self, phone: str) -> list[np.ndarray]:
        return [
            self.utterances[ui].waveform[s:e]
            for ui, s, e in self.occurrences(phone)
        ]

    def background_clips(self, exclude: str, max_clips: int = 64) -> list[np.ndarray]:
        out = []
        for utt in self.utterances:
            for name, s, e in utt.phones:
                if name != exclude:
                    out.append(utt.waveform[s:e])
                    if len(out) >= max_clips:
                        return out
        return out

    @property
    def total_seconds(self) -> float:
        return sum(len(u.waveform) for u in self.utterances) / self.sample_rate


def _synth_phone(spec: PhoneSpec, num_samples: int, sr: int, rng: np.random.Generator) -> np.ndarray:
    t = np.arange(num_samples, dtype=np.float64) / sr
    x = np.zeros(num_samples, dtype=np.float64)
    for i, f in enumerate(spec.formants_hz):
        f_jit = f * (1.0 + rng.uniform(-0.03, 0.03))
        phase = rng.uniform(0.0, 2.0 * np.pi)
        x += spec.amp * (0.7 ** i) * np.sin(2.0 * np.pi * f_jit * t + phase)
    x += spec.noise * rng.standard_normal(num_samples)
    # Hann-ish onset/offset ramp to avoid clicks (5 ms).
    ramp = min(num_samples // 4, int(0.005 * sr))
    if ramp > 0:
        env = np.ones(num_samples)
        env[:ramp] = np.linspace(0.0, 1.0, ramp)
        env[-ramp:] = np.linspace(1.0, 0.0, ramp)
        x *= env
    return x.astype(np.float32)


def make_synthetic_corpus(
    num_utterances: int = 16,
    phones_per_utterance: int = 12,
    seed: int = 0,
    sample_rate: int = 16000,
    phone_specs: tuple[PhoneSpec, ...] = DEFAULT_PHONES,
) -> SyntheticCorpus:
    """Deterministic synthetic corpus; every utterance interleaves
    silence with randomly drawn phones of random duration."""
    rng = np.random.default_rng(seed)
    utts: list[Utterance] = []
    for ui in range(num_utterances):
        pieces: list[np.ndarray] = []
        labels: list[tuple[str, int, int]] = []
        cursor = 0
        for pi in range(phones_per_utterance):
            # Alternate: silence between phones.
            for spec in (phone_specs[0], phone_specs[1 + int(rng.integers(0, len(phone_specs) - 1))]):
                dur_ms = rng.uniform(spec.min_ms, spec.max_ms)
                n = max(int(dur_ms * sample_rate / 1000.0), 64)
                pieces.append(_synth_phone(spec, n, sample_rate, rng))
                labels.append((spec.name, cursor, cursor + n))
                cursor += n
        utts.append(Utterance(np.concatenate(pieces), labels, f"synth_{ui:04d}"))
    return SyntheticCorpus(utts, sample_rate, tuple(s.name for s in phone_specs))
