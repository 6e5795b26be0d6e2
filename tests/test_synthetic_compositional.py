"""Compositional cue style: the capacity-separating description law.

The 'slice' cue style saturates — every embedding classifier reaches the
same Bayes cap, so the 8-model cue family lands in a 2.5-pt band and the
reference's 46-pt capacity ordering (reference plotting/cues_compare.py:11-12)
is unreproducible. The 'compositional' style fixes that with two structural
properties these tests pin:

1. the strong class signal is a (mood, articulation) word PAIR placed after
   token 32 — invisible to the reference-style token-truncated readers
   (reference cues/models/minilm_models/cnn_lstm.py:66 max_length=32);
2. the pair is a k×k code: either word alone is uniform over classes, only
   the binding decodes.
"""

import itertools

import numpy as np
import pytest

from multimodal_lipread_tpu.data.synthetic import (
    _ADJ,
    _ARTIC,
    _COMP_C1,
    _COMP_C2_EMOTION,
    _COMP_C2_ENV,
    _FEAT,
    _LIGHT,
    _MOOD,
    _SCENE,
    _synth_description_compositional,
    make_synthetic_glips,
)


def test_marker_vocabularies_are_mutually_disjoint():
    """A bag-of-words reader must attribute every marker unambiguously."""
    vocabs = {"_MOOD": _MOOD, "_ARTIC": _ARTIC, "_SCENE": _SCENE,
              "_LIGHT": _LIGHT, "_ADJ": _ADJ, "_FEAT": _FEAT}
    for (na, va), (nb, vb) in itertools.combinations(vocabs.items(), 2):
        assert not set(va) & set(vb), (na, nb, set(va) & set(vb))


def test_pair_lands_after_token_32_for_every_template():
    """Clause 1 + clause 2 must be >= 33 tokens in every template pair, so a
    32-token-truncated reader never sees the strong pair."""
    for c1 in _COMP_C1:
        for c2 in _COMP_C2_EMOTION + _COMP_C2_ENV:
            prefix = c1 + ". " + c2.format(weak="calm")
            assert len(prefix.split()) >= 33, (len(prefix.split()), c1, c2)


def test_pair_decodes_class_at_hardness_zero():
    """(mood_idx + artic_idx) mod k == class, for both modes, all classes."""
    k = 6
    for mode, vm, va in (("emotion", _MOOD, _ARTIC),
                         ("environment", _SCENE, _LIGHT)):
        for ci in range(k):
            rng = np.random.default_rng(ci)
            for _ in range(10):
                text = _synth_description_compositional(
                    rng, mode, ci, num_classes=k, hardness=0.0)
                words = text.lower().replace(",", "").replace(".", "").split()
                mi = next(vm[:k].index(w) for w in words if w in vm[:k])
                ai = next(va[:k].index(w) for w in words if w in va[:k])
                assert (mi + ai) % k == ci, (mode, ci, mi, ai, text)


def test_single_marker_is_uniform_over_classes():
    """Either pair word alone must carry ~no class information: for each
    mood word, the class histogram given that word is near-uniform."""
    k = 4
    rng = np.random.default_rng(7)
    counts = np.zeros((k, k))  # counts[mood_idx, class]
    for _ in range(400):
        ci = int(rng.integers(k))
        text = _synth_description_compositional(
            rng, "emotion", ci, num_classes=k, hardness=0.0)
        words = text.lower().replace(",", "").replace(".", "").split()
        mi = next(_MOOD[:k].index(w) for w in words if w in _MOOD[:k])
        counts[mi, ci] += 1
    # conditional class distribution per mood word: max deviation from
    # uniform stays small (the code marginalizes moods uniformly)
    probs = counts / np.maximum(counts.sum(axis=1, keepdims=True), 1)
    assert np.abs(probs - 1 / k).max() < 0.18, probs


def test_hardness_caps_pair_informativeness():
    """At hardness h, the pair is drawn uniformly with prob 0.5*h; measure
    the decode rate and check it sits near 1 - 0.5*h*(1 - 1/k)."""
    k, h = 4, 0.8
    rng = np.random.default_rng(3)
    hits = 0
    n = 600
    for _ in range(n):
        ci = int(rng.integers(k))
        text = _synth_description_compositional(
            rng, "emotion", ci, num_classes=k, hardness=h)
        words = text.lower().replace(",", "").replace(".", "").split()
        mi = next(_MOOD[:k].index(w) for w in words if w in _MOOD[:k])
        ai = next(_ARTIC[:k].index(w) for w in words if w in _ARTIC[:k])
        hits += (mi + ai) % k == ci
    expect = 1 - 0.5 * h * (1 - 1 / k)
    assert abs(hits / n - expect) < 0.06, (hits / n, expect)


def test_rejects_more_than_8_classes():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="<= 8 classes"):
        _synth_description_compositional(rng, "emotion", 0, num_classes=9)


def test_make_synthetic_glips_plumbs_cue_style(tmp_path):
    root = make_synthetic_glips(
        str(tmp_path / "G"), words=("apfel", "birne"), clips_per_split=2,
        with_audio=False, with_lip_regions=False, with_cues=True,
        cue_style="compositional",
    )
    import json, os
    found_pair_word = False
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".json"):
                recs = json.load(open(os.path.join(dirpath, f)))
                for r in recs:
                    toks = set(r["description"].lower()
                               .replace(",", " ").replace(".", " ").split())
                    if toks & set(_MOOD) or toks & set(_SCENE):
                        found_pair_word = True
    assert found_pair_word
    with pytest.raises(ValueError, match="cue_style"):
        make_synthetic_glips(str(tmp_path / "G2"), words=("a",),
                             cue_style="nope")
