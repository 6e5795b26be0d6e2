"""Synthetic mini-GLips fixture generator.

Creates a tiny, fully-aligned GLips-shaped dataset tree so that every
pipeline (audio / video / fusion / cues) can be exercised without the real
dataset — the test-suite equivalent the reference lacks (SURVEY.md §4).

Layout produced (matches the reference's data contract, SURVEY.md §1):

- ``<root>/lipread_files/<word>/<split>/<word>_NNNN-NNNN.wav`` (16 kHz PCM16)
- ``<root>_lip_regions/lipread_files/<word>/<split>/<word>_NNNN-NNNN.npy``
  of shape (29, 44, 44, 3) uint8
- ``<cue_root>/Descriptions_{Emotion,Environment}/lipreading_analysis_results_{mode}_{word}_{split}.json``
  each a list of ``{"word", "sequence_id", "description"}`` records

Signals are class-conditional (per-class harmonic stacks for audio, per-class
brightness/texture for video, per-class phrasing for cues) so that models can
actually fit the fixture — used by the end-to-end training tests.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

from multimodal_lipread_tpu.data.audio_io import SAMPLE_RATE, TARGET_SAMPLES, write_wav
from multimodal_lipread_tpu.data.glips import SPLITS, lip_regions_root

DEFAULT_WORDS = ("abend", "bereits", "cirka", "dabei")

_EMOTION_TEMPLATES = (
    "The speaker appears {adj} while articulating, with {feat} lip movement.",
    "A {adj} expression dominates; the mouth shows {feat} motion.",
    "Facial cues suggest a {adj} mood and {feat} articulation.",
)
_ENV_TEMPLATES = (
    "The speaker stands before a {adj} backdrop with {feat} lighting.",
    "An indoor scene with {adj} walls and {feat} illumination.",
    "The background looks {adj}; lighting is {feat}.",
)
_ADJ = ("calm", "tense", "neutral", "animated", "focused", "relaxed", "bright", "plain")
_FEAT = ("subtle", "pronounced", "rapid", "slow", "rhythmic", "steady", "soft", "sharp")


def _synth_waveform(
    rng: np.random.Generator, class_idx: int, num_classes: int, hardness: float = 0.0
) -> np.ndarray:
    """Class-separable waveform: harmonic stack at a class-specific pitch.

    ``hardness`` ∈ [0, 1] shrinks the inter-class pitch ratio, adds per-clip
    pitch jitter wide enough to overlap neighbouring classes, randomizes the
    harmonic timbre per clip (speaker-style nuisance), and raises the noise
    floor — calibrated so strong audio models land well below 100% but
    above the weaker modalities (BASELINE.md ordering).

    Beyond 8 classes the single-pitch law ``120·ratio^class`` exceeds
    Nyquist, so many-class corpora (e.g. the full 500-word GLips scale)
    switch to a two-tone grid code (``_synth_waveform_many``); the ≤8-class
    path below is byte-identical to the round-2 fixture (same rng stream)."""
    if num_classes > 8:
        return _synth_waveform_many(rng, class_idx, num_classes, hardness)
    t = np.arange(TARGET_SAMPLES, dtype=np.float32) / SAMPLE_RATE
    # irreducible per-clip signal confusion: with prob 0.35·h the PITCH
    # comes from a uniformly drawn class while the label stays true — a
    # scale-independent Bayes-error cap (noise alone cannot stop a CNN at
    # 800 clips/class). Accuracy cap ≈ 1 − q + q/4 (e.g. h=0.55 → ~86%).
    # hardness == 0 reproduces the round-2 fixture bit-for-bit (same rng
    # stream, same additive jitter law) — the easy fixture the e2e tests'
    # small budgets are tuned to
    if hardness > 0 and rng.uniform() < 0.35 * hardness:
        class_idx = int(rng.integers(num_classes))
    ratio = 1.5 - 0.32 * hardness
    f0 = 120.0 * (ratio**class_idx) + rng.uniform(-5, 5)
    if hardness > 0:
        f0 *= 1.0 + rng.normal(0.0, 0.11 * hardness)  # pitch jitter overlap
    wave = np.zeros_like(t)
    for h in range(1, 4):
        amp = 0.5**h
        if hardness > 0:
            amp *= 1.0 + hardness * rng.uniform(-0.8, 0.8)  # timbre nuisance
        wave += amp * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
    noise = 0.05 + 0.55 * hardness
    wave += noise * rng.standard_normal(TARGET_SAMPLES).astype(np.float32)
    envelope = np.minimum(1.0, 10 * t) * np.minimum(1.0, 10 * (t[-1] - t))
    return (wave * envelope * 8000.0).astype(np.float32)


def _synth_waveform_many(
    rng: np.random.Generator, class_idx: int, num_classes: int, hardness: float = 0.0
) -> np.ndarray:
    """Many-class waveform: class encoded as a TWO-tone grid pair.

    ``class_idx`` maps to ``(i, j)`` on a k×k grid (k = ceil(sqrt(n))); tone
    i comes from a geometric grid in a low band (110–900 Hz), tone j from a
    fully disjoint high band (1.2–7 kHz) — adjacent grid tones sit ~8–10%
    apart for k ≈ 23 (500 classes), resolvable by the 80-bin log-mel
    frontend where a single 500-level pitch grid would not be. Pure tones
    (no harmonics): a 2nd harmonic of the high band would alias past
    Nyquist, and low-band harmonics would collide with high-band
    fundamentals. ``hardness`` mirrors the few-class law: signal-confusion
    draws, relative pitch jitter, amplitude nuisance, and noise floor."""
    t = np.arange(TARGET_SAMPLES, dtype=np.float32) / SAMPLE_RATE
    if hardness > 0 and rng.uniform() < 0.35 * hardness:
        class_idx = int(rng.integers(num_classes))
    k = int(np.ceil(np.sqrt(num_classes)))
    i, j = class_idx // k, class_idx % k
    span = max(k - 1, 1)
    f_lo = 110.0 * (900.0 / 110.0) ** (i / span)
    f_hi = 1200.0 * (7000.0 / 1200.0) ** (j / span)
    jitter = 0.003 + 0.05 * hardness  # relative: stays below grid spacing at h=0
    wave = np.zeros_like(t)
    for f0 in (f_lo, f_hi):
        f0 = f0 * (1.0 + rng.normal(0.0, jitter))
        amp = 0.5
        if hardness > 0:
            amp *= 1.0 + hardness * rng.uniform(-0.8, 0.8)
        wave += amp * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
    noise = 0.05 + 0.55 * hardness
    wave += noise * rng.standard_normal(TARGET_SAMPLES).astype(np.float32)
    envelope = np.minimum(1.0, 10 * t) * np.minimum(1.0, 10 * (t[-1] - t))
    return (wave * envelope * 8000.0).astype(np.float32)


def _synth_lip_sequence(
    rng: np.random.Generator, class_idx: int, num_classes: int = 4, hardness: float = 0.0
) -> np.ndarray:
    """(29, 44, 44, 3) uint8 with class-conditional brightness + stripe texture.

    ``hardness`` shrinks the class brightness/stripe separation, adds a
    per-clip global brightness/contrast nuisance (speaker/lighting style),
    and raises pixel noise — video is deliberately the weakest modality at
    high hardness, mirroring the reference's accuracy ordering (audio 90% /
    video 45.5%, BASELINE.md)."""
    # irreducible per-clip signal confusion (see _synth_waveform): with
    # prob 0.5·h the whole visual signature (brightness + stripe period)
    # comes from a uniformly drawn class. Cap ≈ 1 − q + q/4 (h=0.8 → ~70%);
    # video is deliberately the hardest modality (BASELINE.md: 45.5%).
    # hardness == 0 reproduces the round-2 fixture bit-for-bit
    if hardness > 0 and rng.uniform() < 0.5 * hardness:
        class_idx = int(rng.integers(num_classes))
    if num_classes > 8:
        # many-class grid code (see _synth_waveform_many): brightness level
        # i on a k-level grid and stripe period j+2 (≤ k+1 ≪ 44 px) — the
        # few-class laws below saturate uint8 / exceed the frame past ~8
        k = int(np.ceil(np.sqrt(num_classes)))
        i, j = class_idx // k, class_idx % k
        base = 30.0 + (185.0 / max(k - 1, 1)) * i
        if hardness > 0:
            base = base + hardness * rng.uniform(-45, 45)
        noise_amp = 30 + 150 * hardness
        frames = rng.integers(0, max(1, int(noise_amp)), size=(29, 44, 44, 3), dtype=np.int64)
        yy = np.arange(44)[None, :, None, None]
        stripe_amp = 60.0 * (1.0 - 0.8 * hardness)
        phase = int(rng.integers(0, 2 + j)) if hardness > 0 else 0
        stripes = (((yy + phase) // (2 + j)) % 2) * stripe_amp
        contrast = 1.0 + hardness * rng.uniform(-0.3, 0.3) if hardness > 0 else 1.0
        return np.clip((base + frames + stripes) * contrast, 0, 255).astype(np.uint8)
    sep = 40.0 * (1.0 - 0.85 * hardness)
    base = 40 + sep * class_idx
    if hardness > 0:
        base = base + hardness * rng.uniform(-45, 45)  # lighting nuisance
    noise_amp = 30 + 150 * hardness
    frames = rng.integers(0, max(1, int(noise_amp)), size=(29, 44, 44, 3), dtype=np.int64)
    yy = np.arange(44)[None, :, None, None]
    stripe_amp = 60.0 * (1.0 - 0.8 * hardness)
    # random phase: the stripe PATTERN, not its absolute position, carries class
    phase = int(rng.integers(0, 2 + class_idx)) if hardness > 0 else 0
    stripes = (((yy + phase) // (2 + class_idx)) % 2) * stripe_amp
    contrast = 1.0 + hardness * rng.uniform(-0.3, 0.3) if hardness > 0 else 1.0
    seq = np.clip((base + frames + stripes) * contrast, 0, 255).astype(np.uint8)
    return seq


# --- compositional cue style -------------------------------------------------
# Marker vocabularies DISJOINT from _ADJ/_FEAT and from each other, so a
# bag-of-words reader can attribute each marker unambiguously.
_MOOD = ("wistful", "jubilant", "stoic", "agitated", "serene", "brooding",
         "playful", "solemn")
_ARTIC = ("clipped", "drawled", "staccato", "flowing", "mumbled", "crisp",
          "halting", "emphatic")
_SCENE = ("cluttered", "sparse", "sunlit", "shadowed", "tiled", "curtained",
          "paneled", "mirrored")
_LIGHT = ("flickering", "diffuse", "harsh", "amber", "pale", "strobing",
          "dappled", "even")

_COMP_C1 = (
    "at first the speaker simply faces the camera and settles into position "
    "before the clip begins in earnest",  # 18 tokens
    "the recording opens with the speaker adjusting their stance while the "
    "frame holds steady on the face",  # 17 tokens
    "for the opening moments nothing stands out as the speaker waits quietly "
    "and the shot stays fixed in place",  # 19 tokens
)
_COMP_C2_EMOTION = (
    "early frames hint at a {weak} expression though the impression stays "
    "faint and hard to pin down",  # 17 tokens, marker at +6
    "an initial glance suggests something {weak} about the face but the "
    "signal is weak and easy to doubt",  # 17 tokens, marker at +5
    "there is a passing {weak} quality to the look yet it fades before it "
    "can be read with confidence",  # 19 tokens, marker at +4
)
_COMP_C2_ENV = (
    "early frames hint at a {weak} backdrop though the impression stays "
    "faint and hard to pin down",
    "an initial glance suggests something {weak} about the setting but the "
    "signal is weak and easy to doubt",
    "there is a passing {weak} quality to the room yet it fades before it "
    "can be read with confidence",
)
_COMP_C3_EMOTION = (
    "by the end the mood reads {mood} overall, a {mood} cast that lingers, "
    "while the articulation remains {artic}, even insistently {artic}, for "
    "the rest of the take",
    "once the word is spoken the expression settles into something {mood}, "
    "unmistakably {mood}, and the delivery turns {artic}, resolutely "
    "{artic}, until the cut",
    "the closing frames leave a {mood} impression, {mood} through and "
    "through, as the mouth keeps a {artic} rhythm, {artic} to the last "
    "moment",
)
_COMP_C3_ENV = (
    "by the end the scene reads {mood} overall, a {mood} cast that lingers, "
    "while the lighting remains {artic}, even insistently {artic}, for the "
    "rest of the take",
    "once the word is spoken the backdrop settles into something {mood}, "
    "unmistakably {mood}, and the illumination turns {artic}, resolutely "
    "{artic}, until the cut",
    "the closing frames leave a {mood} impression, {mood} through and "
    "through, as the lighting keeps a {artic} character, {artic} to the "
    "last moment",
)


def _synth_description_compositional(
    rng: np.random.Generator, mode: str, class_idx: int,
    num_classes: int = 4, hardness: float = 0.0
) -> str:
    """Compositional cue text that separates cue-classifier CAPACITY classes
    the way the reference corpus does (reference spread 46 pts,
    plotting/cues_compare.py:11-12). Two structural properties:

    1. **Late compositional pair.** The strong class signal is the PAIR of a
       mood word and an articulation word — ``(mood_idx + artic_idx) mod k ==
       class`` — placed AFTER token 32. The reference's token-level
       classifiers truncate to 32 tokens (cues/models/minilm_models/
       cnn_lstm.py:66 max_length=32) while its GPT-4.1 descriptions run
       long, which is precisely why they score 18-30% vs 51-65% for the
       sentence-embedding models that read the full text. This corpus
       reproduces that structure honestly: clause 1 + clause 2 are >= 33
       tokens in every template combination, so token-level models see only
       the weak early marker.
    2. **Pair coding (compositional).** Either pair word alone is uniform
       over classes; only their combination decodes the class, so a reader
       must bind two markers (trivial for an MLP on a bag-of-words sentence
       embedding, impossible for a truncated reader, and hard for a linear
       model).

    Ambiguity laws: the pair is drawn uniformly with prob ``0.5*hardness``
    (Bayes cap ~= 1 - q + q/k); the early weak marker (same slice law as the
    'slice' style but over _ADJ only) is informative with prob
    ``0.45 - 0.3*hardness`` — so a 32-token reader's cap sits far below the
    full-text cap (h=0.7: ~40% vs ~74% at k=4)."""
    if num_classes > 8:
        raise ValueError(
            "compositional cue style supports <= 8 classes (8-word marker "
            f"vocabularies); got {num_classes}"
        )
    c1 = _COMP_C1[int(rng.integers(len(_COMP_C1)))]
    c2_t = (_COMP_C2_EMOTION if mode == "emotion" else _COMP_C2_ENV)[
        int(rng.integers(3))]
    c3_t = (_COMP_C3_EMOTION if mode == "emotion" else _COMP_C3_ENV)[
        int(rng.integers(3))]
    # weak early marker: slice law over _ADJ for BOTH modes (as the 'slice'
    # style does) — it must stay disjoint from the late pair vocabularies so
    # a bag-of-words reader can attribute every marker unambiguously
    vocab_weak = _ADJ
    p_inform = max(0.1, 0.45 - 0.3 * hardness)
    if rng.uniform() < p_inform:
        stride = max(1, len(vocab_weak) // max(1, num_classes))
        weak = vocab_weak[(stride * class_idx + int(rng.integers(2))) % len(vocab_weak)]
    else:
        weak = vocab_weak[int(rng.integers(len(vocab_weak)))]
    # strong late pair over a k×k code: (mood_idx + artic_idx) mod k ==
    # class. Each word alone is uniform over classes; only the binding
    # decodes. Restricting both vocabularies to their first k words keeps
    # the number of valid combos at k per class (sample-efficient for the
    # MLP-on-pooled-embedding readers the corpus is meant to reward).
    vocab_mood = (_MOOD if mode == "emotion" else _SCENE)[:num_classes]
    vocab_artic = (_ARTIC if mode == "emotion" else _LIGHT)[:num_classes]
    if hardness > 0 and rng.uniform() < 0.5 * hardness:
        mi = int(rng.integers(len(vocab_mood)))
        ai = int(rng.integers(len(vocab_artic)))
    else:
        mi = int(rng.integers(len(vocab_mood)))
        ai = (class_idx - mi) % num_classes
    return ". ".join((
        c1.capitalize(),
        c2_t.format(weak=weak).capitalize(),
        c3_t.format(mood=vocab_mood[mi], artic=vocab_artic[ai]).capitalize(),
    )) + "."


def _synth_description(
    rng: np.random.Generator, mode: str, class_idx: int,
    num_classes: int = 4, hardness: float = 0.0
) -> str:
    """``hardness`` makes a fraction of descriptions draw their adjectives
    from the WHOLE vocabulary instead of the class's own slice — an
    irreducible ambiguity that caps cue-only accuracy below 100%.

    The class slice has stride ``len(_ADJ) // num_classes`` (== 2 for the
    default 4 classes — same rng stream as the round-2 fixture). Beyond 4
    classes neighbouring slices overlap by one word (the 8-word vocab can't
    give 2 private words to >4 classes); they never fully alias."""
    tmpl = (_EMOTION_TEMPLATES if mode == "emotion" else _ENV_TEMPLATES)[int(rng.integers(3))]
    # hardness == 0 keeps the round-2 rng stream untouched
    if hardness > 0 and rng.uniform() < 0.65 * hardness:
        adj = _ADJ[int(rng.integers(len(_ADJ)))]
        feat = _FEAT[int(rng.integers(len(_FEAT)))]
    else:
        stride = max(1, len(_ADJ) // max(1, num_classes))
        adj = _ADJ[(stride * class_idx + int(rng.integers(2))) % len(_ADJ)]
        feat = _FEAT[(stride * class_idx + int(rng.integers(2))) % len(_FEAT)]
    return tmpl.format(adj=adj, feat=feat)


def _write_synth_video(path: str, lips: np.ndarray, frame_size=(96, 96)) -> None:
    """Render a lip sequence into a real .mp4 whose CENTER-backend crop
    region carries the class signal — the raw-video counterpart of the .npy
    lip store, for the device-crop streaming path (host decode + device
    crop; ops/crop_resize.py). The 44×44 signal is upscaled into the
    margin-expanded center box, so cropping it back reproduces the signal.
    """
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    H, W = frame_size
    # the center backend's margin-expanded box (data/lip_extraction.py
    # _CenterBackend.lip_box + _expand_box, margin 0.4)
    x0, y0, x1, y1 = W // 3, H // 2, 2 * W // 3, 5 * H // 6
    mh, mw = int((y1 - y0) * 0.4), int((x1 - x0) * 0.4)
    bx0, by0 = max(0, x0 - mw), max(0, y0 - mh)
    bx1, by1 = min(W, x1 + mw), min(H, y1 + mh)
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (W, H)
    )
    for frame_rgb_44 in lips:
        frame = np.full((H, W, 3), 128, np.uint8)
        patch = cv2.resize(frame_rgb_44, (bx1 - bx0, by1 - by0))
        frame[by0:by1, bx0:bx1] = patch
        writer.write(frame[..., ::-1])  # RGB → BGR for the encoder
    writer.release()


def make_synthetic_glips(
    root: str,
    words: Sequence[str] = DEFAULT_WORDS,
    clips_per_split: int = 4,
    splits: Sequence[str] = SPLITS,
    seed: int = 0,
    with_audio: bool = True,
    with_lip_regions: bool = True,
    with_cues: bool = True,
    with_video: bool = False,
    hardness: "float | dict" = 0.0,
    label_noise: float = 0.0,
    cue_style: str = "slice",
) -> str:
    """Generate a synthetic GLips tree under ``root``. Returns ``root``.

    ``hardness`` dials in class overlap, per-clip nuisance factors
    (speaker timbre / lighting), ambiguous cue phrasing, and noise so the
    corpus stops saturating at 100% — the non-trivial benchmark proxy for
    reference-scale difficulty (per-modality details in the ``_synth_*``
    docstrings). It is either one float ∈ [0, 1] for all modalities or a
    mapping with ``audio`` / ``video`` / ``cues`` keys, so each modality's
    difficulty can be calibrated independently (the reference's accuracy
    ordering — audio 90% / video 45.5% / cues 65%, BASELINE.md — needs
    audio much easier than video). ``label_noise`` re-draws a fraction of
    TRAIN clips' signal class while keeping the folder word (the label),
    simulating annotation errors; val/test stay clean so reported accuracy
    remains meaningful. ``cue_style`` selects the description generator:
    ``'slice'`` (default, the round-2/3 adjective-slice law — saturating:
    every embedding classifier reaches the same Bayes cap) or
    ``'compositional'`` (late compositional marker pair after token 32, the
    capacity-separating law — see ``_synth_description_compositional``)."""
    if cue_style not in ("slice", "compositional"):
        raise ValueError(f"unknown cue_style {cue_style!r}")
    # sids are the global counter mod 10000 stepping by 2 per clip; a
    # (word, split) directory holds clips_per_split consecutive sids, so a
    # wrap can only collide INSIDE one directory when 2*clips_per_split
    # exceeds the 10000 modulus — guard it instead of silently overwriting
    # (the reference's (word, sid, split) cue-join assumes uniqueness)
    if clips_per_split > 5000:
        raise ValueError(
            f"clips_per_split={clips_per_split} > 5000 would wrap the 4-digit "
            "sid space within one (word, split) directory and overwrite clips"
        )
    rng = np.random.default_rng(seed)
    if isinstance(hardness, dict):
        h_audio = float(hardness.get("audio", 0.0))
        h_video = float(hardness.get("video", 0.0))
        h_cues = float(hardness.get("cues", 0.0))
    else:
        h_audio = h_video = h_cues = float(hardness)
    words = sorted(words)
    lip_root = lip_regions_root(root)

    cue_records = {
        (mode, word, split): []
        for mode in ("emotion", "environment")
        for word in words
        for split in splits
    }

    seq_counter = 0
    for ci, word in enumerate(words):
        for split in splits:
            for _ in range(clips_per_split):
                # the GLips sid contract is EXACTLY 4 digits per half
                # (data/glips.py SEQ_ID_RE); wrap at 10000 so very large
                # corpora (500 words × many clips) keep well-formed ids —
                # sids stay unique within a (word, split) directory
                sid = f"{seq_counter % 10000:04d}-{(seq_counter + 1) % 10000:04d}"
                seq_counter += 2
                stem = f"{word}_{sid}"
                # label noise: the folder word (= the label) keeps ci, but
                # the generated SIGNALS come from a different class
                sig_ci = ci
                if label_noise > 0 and split == "train" and rng.uniform() < label_noise:
                    sig_ci = int(rng.integers(len(words)))
                if with_audio:
                    wav_path = os.path.join(root, "lipread_files", word, split, stem + ".wav")
                    write_wav(wav_path, _synth_waveform(rng, sig_ci, len(words), h_audio))
                if with_lip_regions or with_video:
                    # ONE rng draw feeds both stores, so .npy and .mp4 carry
                    # the same clip signal (and with_video=False keeps the
                    # historical rng stream bit-identical)
                    lips = _synth_lip_sequence(rng, sig_ci, len(words), h_video)
                if with_lip_regions:
                    npy_path = os.path.join(lip_root, "lipread_files", word, split, stem + ".npy")
                    os.makedirs(os.path.dirname(npy_path), exist_ok=True)
                    np.save(npy_path, lips)
                if with_video:
                    _write_synth_video(
                        os.path.join(root, "lipread_files", word, split, stem + ".mp4"),
                        lips,
                    )
                if with_cues:
                    desc_fn = (_synth_description_compositional
                               if cue_style == "compositional" else _synth_description)
                    for mode in ("emotion", "environment"):
                        cue_records[(mode, word, split)].append(
                            {
                                "word": word,
                                "sequence_id": sid,
                                "description": desc_fn(
                                    rng, mode, sig_ci, len(words), h_cues
                                ),
                            }
                        )

    if with_cues:
        for (mode, word, split), records in cue_records.items():
            folder = os.path.join(root, f"Descriptions_{mode.capitalize()}")
            os.makedirs(folder, exist_ok=True)
            fname = f"lipreading_analysis_results_{mode}_{word}_{split}.json"
            with open(os.path.join(folder, fname), "w") as f:
                json.dump(records, f, indent=2)

    return root
