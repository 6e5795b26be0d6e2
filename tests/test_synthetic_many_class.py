"""Many-class synthetic fixture: the full-GLips 500-word scale.

The few-class generator laws break past ~8 classes (audio pitch
120·1.5^class exceeds Nyquist at class 12; lip brightness 40·class
saturates uint8; stripe period 2+class exceeds the 44-px frame), so
``num_classes > 8`` switches to two-axis grid codes
(data/synthetic.py ``_synth_waveform_many`` + the lip branch). These tests
pin the grid code's separability and the sid contract at scale.
"""

import numpy as np

from multimodal_lipread_tpu.data.glips import SEQ_ID_RE, scan_glips
from multimodal_lipread_tpu.data.synthetic import (
    _synth_lip_sequence,
    _synth_waveform,
    make_synthetic_glips,
)


def _dominant_freqs(wave, top=2):
    """Frequencies of the two strongest rfft peaks (Hz at 16 kHz)."""
    spec = np.abs(np.fft.rfft(wave))
    spec[:20] = 0  # ignore DC/envelope leakage
    idx = np.argsort(spec)[-top * 40 :]
    # collapse near-adjacent bins to peak centers
    freqs = np.fft.rfftfreq(len(wave), 1 / 16000.0)
    peaks = []
    for i in sorted(idx, key=lambda i: -spec[i]):
        f = freqs[i]
        if all(abs(f - p) > 50 for p in peaks):
            peaks.append(f)
        if len(peaks) == top:
            break
    return sorted(peaks)


def test_many_class_waveforms_are_tone_separable():
    rng = np.random.default_rng(0)
    n = 500
    # two clips of the same class share their tone pair; different classes
    # (adjacent in the grid) differ in at least one tone
    for ci in (0, 123, 499):
        f_a = _dominant_freqs(_synth_waveform(rng, ci, n))
        f_b = _dominant_freqs(_synth_waveform(rng, ci, n))
        assert np.allclose(f_a, f_b, rtol=0.03), (ci, f_a, f_b)
    f_0 = _dominant_freqs(_synth_waveform(rng, 0, n))
    f_1 = _dominant_freqs(_synth_waveform(rng, 1, n))  # adjacent high-band tone
    assert max(abs(a - b) for a, b in zip(f_0, f_1)) > 50, (f_0, f_1)
    # everything below Nyquist with margin
    assert all(f < 7800 for f in f_0 + f_1)


def test_many_class_waveform_amplitude_and_dtype():
    rng = np.random.default_rng(1)
    w = _synth_waveform(rng, 499, 500)
    assert w.dtype == np.float32 and np.isfinite(w).all()
    assert 1000 < np.abs(w).max() < 32768  # int16 WAV range, non-degenerate


def test_many_class_lips_carry_brightness_and_stripe_axes():
    rng = np.random.default_rng(2)
    n = 500
    k = int(np.ceil(np.sqrt(n)))
    seq_lo = _synth_lip_sequence(rng, 0, n)  # brightness level 0
    # highest REACHABLE brightness level for n=500, k=23 is i=21 (class
    # indices stop at 499 = 21*23 + 16); 21*23 = 483 keeps the label in range
    seq_hi = _synth_lip_sequence(rng, 21 * k, n)  # brightness level 21
    assert seq_lo.shape == (29, 44, 44, 3) and seq_lo.dtype == np.uint8
    assert seq_hi.mean() - seq_lo.mean() > 100  # brightness axis separates
    # stripe axis: same brightness level, different period → different
    # row-autocorrelation structure
    seq_p2 = _synth_lip_sequence(rng, 0, n)  # period 2
    seq_p9 = _synth_lip_sequence(rng, 7, n)  # period 9
    prof2 = seq_p2.astype(np.float32).mean(axis=(0, 2, 3))
    prof9 = seq_p9.astype(np.float32).mean(axis=(0, 2, 3))
    # period-2 stripes alternate every other row; period-9 don't
    alt2 = np.abs(np.diff(prof2)).mean()
    alt9 = np.abs(np.diff(prof9)).mean()
    assert alt2 > 2 * alt9, (alt2, alt9)


def test_large_corpus_sids_stay_well_formed(tmp_path):
    """>10k clips must keep the reference's 4-digit sid contract
    (reference regex: audio_cues/data_utils/dataset.py:82)."""
    words = [f"wort{i:03d}" for i in range(12)]
    root = make_synthetic_glips(
        str(tmp_path / "G"), words=words, clips_per_split=3,
        with_lip_regions=False, with_cues=True,
    )
    index = scan_glips(root)
    assert len(index.classes) == 12
    assert len(index.entries) == 12 * 3 * 3
    for e in index.entries:
        assert SEQ_ID_RE.fullmatch(e.sequence_id), e.sequence_id
