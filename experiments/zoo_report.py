"""Zoo-sweep report: per-family accuracy tables + rank agreement vs the
reference record.

Reads ``experiments/hard_sweep/summary_zoo.json`` (written by
``hard_sweep.py --zoo``) and emits a markdown report comparing, family by
family, the hard-corpus accuracy of every swept model against the
reference's committed training logs (BASELINE.md). The point is NOT
absolute parity — the corpora differ (real GLips_4 vs calibrated synthetic;
REALDATA.md) — but whether the rebuild reproduces the reference's
*qualitative* structure: which architectures win within each family, and
by how much, measured with Spearman rank correlation.

Usage: python experiments/zoo_report.py [--out experiments/hard_sweep/ZOO.md]
"""

from __future__ import annotations

import argparse
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

# Reference final test accuracies (BASELINE.md; cue rows are last-epoch val
# acc on emotion cues — those logs have no test column). None = the
# reference registry has the model but publishes no number for it.
REFERENCE = {
    "audio": {
        "resnet": 87.50, "resnet_lstm": 85.00, "vgg": 89.00,
        "vgg_lstm": 90.00, "lstm_resnet": None, "lstm_resnet_attn": 82.50,
        "lstm_resnet_trans": 82.50, "conformer": None,  # TPU-build extension
    },
    "video": {
        "cnn": 32.50, "resnet_lstm": 37.00, "shufflenet_lstm": 36.50,
        "mobilenet_lstm": None, "vgg_lstm": None, "resnet_attn": 43.50,
        "resnet_trans": 45.50, "conformer": None,  # extension
    },
    "audio_video": {
        "early_fusion_fast": 34.00, "late_fusion_fast": 32.50,
        "middle_fusion_fast": 82.50, "early_fusion_mobilenet": 50.00,
        "late_fusion_mobilenet": 41.50, "middle_fusion_mobilenet": 82.50,
    },
    "cues": {
        "dense_nn": 51.25, "minilm_lstm": 56.875, "minilm_lstm_attn": None,
        "multi_attn": 65.00, "transformer": None, "minilm_cnn_lstm": 30.00,
        "minilm_cnn_bilstm_attn": 18.75, "lstm_multi_attn": None,
    },
    "cues_video": {
        "early_fusion_mobile": 39.00, "middle_fusion_mobile": 53.00,
        "late_fusion_mobile": 48.00, "early_fusion_resnet": 49.00,
        "middle_fusion_resnet": 55.00, "late_fusion_resnet": 42.00,
    },
    "audio_cues": {
        # reference publishes no audio_cues metrics/ logs (train.py
        # hard-codes middle_fusion_mobile and no log dir is committed)
        "early_fusion_mobile": None, "middle_fusion_mobile": None,
        "late_fusion_mobile": None,
    },
    "audio_cues_video": {
        "early_fusion_mobile": 57.00, "early_fusion_resnet": 58.50,
        "middle_fusion_resnet": 58.00, "late_fusion_mobile": 95.50,
    },
}

FAMILY_ORDER = ["audio", "video", "audio_video", "cues", "audio_cues",
                "cues_video", "audio_cues_video"]

FAMILY_NOTES = {
    "audio": (
        "All 43 zoo rows (this family included) are ONE round-5 sweep at "
        "one commit / one corpus / one rng stream (see Provenance) — the "
        "fix for round 4's finding that rows measured under superseded "
        "code can be non-reproducible (round 3's VGG-pair rows, off by 4 "
        "pts; experiments/audio_rank_study/REPORT.md). The top of this "
        "family compresses into ~1 pt at this corpus difficulty, so "
        "residual rank noise there is tie-noise, not capability failure."
    ),
    "audio_cues_video": (
        "n=4 with three reference rows inside a 1.5-pt band (57.0/58.0/"
        "58.5) — the reference itself barely separates early/middle/"
        "resnet, so their relative order is tie-noise on BOTH sides and ρ "
        "carries little signal beyond the one robust fact, which "
        "reproduces: late_fusion_mobile is #1 by a wide margin (reference "
        "95.5 vs next 58.5; this build 80.6 vs next 75.9)."
    ),
    "cues_video": (
        "The three MOBILE variants freeze their per-frame MobileNetV2 to "
        "match the reference (middle_fusion_mobile.py:70 — frozen ImageNet "
        "features); with no ImageNet weights in this zero-egress image the "
        "frozen backbone is a RANDOM projection, violating the reference's "
        "design assumption that frozen features are informative. The "
        "round-4 causal study (experiments/cues_video_rank_study/REPORT.md) "
        "confirms the init-confound: unfreezing lifts the worst offender "
        "+5.5; grafting even a weak in-task donor (3.9% on 100-class video) "
        "as the frozen backbone lifts middle_fusion_mobile 27.75 → 41.62 "
        "and RESTORES the reference's within-mobile order (middle > late > "
        "early), raising family ρ from +0.26 to +0.60. The residual — the "
        "reference's middle_fusion_mobile outranking the trained-from-"
        "scratch resnet variants — needs ImageNet-grade features and is "
        "irreducible without real weights."
    ),
    "cues": (
        "Round 3's slice corpus saturated every reader at one Bayes cap "
        "(2.5-pt spread, ρ=-0.36 tie-noise); the compositional corpus "
        "separates reader CAPACITY like the reference corpus does (its "
        "46-pt spread, cues_compare.py:11-12): the class signal is a word "
        "PAIR placed after token 32, so the three token-level models — "
        "which truncate to 32 tokens exactly like the reference's "
        "(cnn_lstm.py:66 max_length=32) — see only a weak early marker and "
        "floor at 44% while full-text pooled readers reach 66-75%, "
        "reproducing the reference's 18.75-30% token-model floor. The "
        "residual rank noise is WITHIN the pooled group (dense_nn/"
        "multi_attn/minilm_lstm all read the same sentence embedding; "
        "their reference spread also collapses within-group to 14 pts vs "
        "the 35-pt group gap) — and the round-5 replicate study backs the "
        "tie-noise claim with data: over 5 training seeds at the zoo "
        "protocol, dense_nn spans 75.0-75.4 and multi_attn 72.9-75.0 "
        "(overlapping; mean gap 0.9 pt), so the dense_nn-over-multi_attn "
        "'inversion' is a statistical tie at the pooled-group Bayes cap, "
        "not a stable property (experiments/cues_replicates/aggregate.json; "
        "minilm_lstm matches the band on 4/5 seeds with one seed-0 "
        "optimization collapse to 40%)."
    ),
    "audio_cues": (
        "The reference never demonstrated this family: its only committed log "
        "(`audio_cues/metrics/middle_fusion_mobile_training_log.csv`) is a "
        "header with zero rows, and its trainer hard-codes one model — so "
        "middle/late rows above are already beyond the reference record. "
        "`early_fusion_mobile` collapses at the family lr (0.001, the "
        "reference's `ac_config.yaml:14`): Adam's early steps kill the "
        "MelMobileNet encoder (dead ReLU6 → logits pinned at ln 4 from epoch "
        "1, verified train-mode too, so it is an optimization failure, not "
        "an eval artifact). The same architecture trains cleanly at lr 1e-4 "
        "(train acc 82% in 5 epochs); the sweep keeps the family-lr protocol "
        "and reports the honest number. The per-example sigmoid gate "
        "additionally carries an open-gate bias init (models/audio_cues.py) "
        "to rule out the gate's own saturation death mode."
    ),
}


def spearman(xs, ys):
    """Spearman rank correlation with average ranks for ties."""
    def ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                r[order[k]] = avg
            i = j + 1
        return r
    rx, ry = ranks(xs), ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = sum((a - mx) ** 2 for a in rx) ** 0.5
    dy = sum((b - my) ** 2 for b in ry) ** 0.5
    return num / (dx * dy) if dx and dy else float("nan")


def _prov_key(row) -> str:
    """Provenance identity of a row: the code commit + RNG stream + corpus
    recipe that produced it. Rows with no stamp are pre-round-5 ('unstamped')."""
    p = row.get("provenance")
    if not p:
        return "unstamped"
    return f"{p.get('commit')}/{p.get('rng_impl')}/" + json.dumps(
        p.get("corpus", {}), sort_keys=True
    )


def build_report(summary_path: str) -> str:
    with open(summary_path) as f:
        summary = json.load(f)
    ours = {}
    for r in summary["results"]:
        if "error" in r:
            continue
        ours[(r["pipeline"], r["model"])] = r

    # Staleness guard (round-4 verdict: rows measured under superseded code
    # were indistinguishable from fresh ones). The CURRENT provenance is the
    # NEWEST stamp by date (ties broken by row count) — a majority vote
    # alone inverts when a partial re-sweep leaves fresh rows outnumbered
    # by stale ones. Any row that differs is marked ⚠ stale in its table
    # and the mix is called out loudly.
    from collections import Counter

    prov_counts = Counter(_prov_key(r) for r in ours.values())
    prov_dates: dict = {}
    for r in ours.values():
        k = _prov_key(r)
        d = (r.get("provenance") or {}).get("date", "")
        prov_dates[k] = max(prov_dates.get(k, ""), d)
    current_prov = (
        max(prov_counts, key=lambda k: (prov_dates.get(k, ""), prov_counts[k]))
        if prov_counts else None
    )
    mixed = len(prov_counts) > 1

    lines = [
        "# Zoo sweep — full-registry accuracy record (hard synthetic corpus)",
        "",
        "Every model the reference publishes a number for (plus the Conformer",
        "extensions), trained on the calibrated hard corpus",
        f"(hardness={summary['hardness']}, label_noise={summary['label_noise']},",
        f"{summary['clips_per_split']} clips/word/split, seed {summary['seed']}).",
        "Reference accuracies are real-GLips_4 numbers from its committed logs",
        "(BASELINE.md) — corpora differ, so the comparison is about *within-family",
        "ordering*, not absolute values. `rank` columns rank within the family",
        "(1 = best); ρ is Spearman rank correlation over models with numbers on",
        "both sides.",
        "",
        "Reproduce: `python experiments/hard_sweep.py --zoo --skip-existing`;",
        "regenerate this file: `python experiments/zoo_report.py`.",
        "",
    ]
    overall = []
    for fam in FAMILY_ORDER:
        ref = REFERENCE[fam]
        rows = []
        for model in ref:
            r = ours.get((fam, model))
            rows.append((model, ref[model], r))
        # ranks within family
        ours_accs = [(m, r["acc"]) for m, _, r in rows if r]
        ref_accs = [(m, a) for m, a, _ in rows if a is not None]
        ours_rank = {m: i + 1 for i, (m, _) in enumerate(
            sorted(ours_accs, key=lambda t: -t[1]))}
        ref_rank = {m: i + 1 for i, (m, _) in enumerate(
            sorted(ref_accs, key=lambda t: -t[1]))}
        both = [m for m, a, r in rows if a is not None and r]
        rho = spearman([ref[m] for m in both],
                       [ours[(fam, m)]["acc"] for m in both]) if len(both) >= 3 else None
        metric = ("last-epoch val acc" if fam == "cues" else "final test acc")
        lines.append(f"## {fam} ({metric})")
        lines.append("")
        lines.append("| model | reference | rank | this build | rank | plateau-LR | wall |")
        lines.append("|---|---|---|---|---|---|---|")
        for model, ref_acc, r in rows:
            ra = f"{ref_acc:.2f}%" if ref_acc is not None else "—"
            rr = str(ref_rank.get(model, "—"))
            if r:
                oa = f"{r['acc']:.2f}%"
                orank = str(ours_rank.get(model, "—"))
                # rows recovered from logs alone carry None for the fields
                # the killed sweep never flushed (hard_sweep._row_from_logs)
                lr = ("—" if r.get("lr_reduced") is None
                      else "yes" if r["lr_reduced"] else "no")
                wall = ("—" if r.get("seconds") is None
                        else f"{r['seconds']:.0f} s")
            else:
                oa = orank = lr = wall = "—"
            stale = r is not None and mixed and _prov_key(r) != current_prov
            marker = " ⚠" if stale else ""
            lines.append(
                f"| {model}{marker} | {ra} | {rr} | {oa} | {orank} | {lr} | {wall} |"
            )
        fam_provs = {_prov_key(r) for _, _, r in rows if r}
        lines.append("")
        if fam_provs and fam_provs != {current_prov}:
            lines.append(
                "⚠ STALE: rows above were not all measured under the current "
                "provenance (commit/rng/corpus) — re-sweep this family "
                "(`hard_sweep.py --zoo --only " + fam + "`) before citing its "
                "ρ."
            )
            lines.append("")
        styles = {(r or {}).get("cue_style", "slice") for _, _, r in rows if r}
        if fam in ("cues", "audio_cues", "cues_video", "audio_cues_video") \
                and "compositional" in styles:
            lines.append(
                "Cue corpus: `cue_style=compositional` (late pair-coded class"
                " signal after token 32 — separates reader capacity the way"
                " the reference corpus does; `data/synthetic.py`)."
                + (" Rows are MIXED corpus styles — re-run the family for a"
                   " consistent table." if len(styles) > 1 else ""))
            lines.append("")
        if fam in FAMILY_NOTES:
            lines.append(FAMILY_NOTES[fam])
            lines.append("")
        if rho is not None:
            spread = (max(a for _, a in ours_accs) - min(a for _, a in ours_accs)
                      if ours_accs else 0.0)
            lines.append(f"Rank agreement (n={len(both)}): **ρ = {rho:+.2f}** "
                         f"(this-build family spread {spread:.1f} pts)")
            lines.append("")
            overall.append((fam, rho, len(both), spread))
    if overall:
        lines.append("## Rank-agreement summary")
        lines.append("")
        lines.append("| family | n | Spearman ρ | this-build spread |")
        lines.append("|---|---|---|---|")
        for fam, rho, n, spread in overall:
            lines.append(f"| {fam} | {n} | {rho:+.2f} | {spread:.1f} pts |")
        lines.append("")
        lines.append(
            "ρ is only meaningful where the build separates the family: when"
            " the spread is within a couple of points, within-family ranks"
            " are tie-noise and ρ carries no signal. (Round 3's slice-style"
            " cue corpus had exactly this failure — every embedding"
            " classifier saturated at the same Bayes cap, 2.5-pt spread —"
            " which is why the cues family now trains on the compositional"
            " corpus.)")
        lines.append("")
    lines.append("## Provenance")
    lines.append("")
    if mixed:
        lines.append(
            "⚠ **MIXED PROVENANCE** — rows marked ⚠ were measured under a "
            "different commit / RNG stream / corpus recipe than the current "
            "majority and may not reproduce under HEAD (round 4 proved "
            "exactly this failure mode for the round-3 audio rows). "
        )
        lines.append("")
    stamps = {}
    for r in ours.values():
        stamps.setdefault(_prov_key(r), []).append(r)
    lines.append("| stamp | rows | commit | rng | corpus seed/clips/style | date |")
    lines.append("|---|---|---|---|---|---|")
    for key, rs in sorted(stamps.items(), key=lambda kv: -len(kv[1])):
        p = rs[0].get("provenance") or {}
        c = p.get("corpus", {})
        mark = "current" if key == current_prov and mixed else ""
        lines.append(
            f"| {mark or '—'} | {len(rs)} | {p.get('commit', 'unstamped')} | "
            f"{p.get('rng_impl', '—')} | "
            f"{c.get('seed', '—')}/{c.get('clips', '—')}/{c.get('cue_style', '—')} | "
            f"{p.get('date', '—')} |"
        )
    lines.append("")
    done = len(ours)
    total = sum(len(v) for v in REFERENCE.values())
    lines.append(f"_Coverage: {done}/{total} registry models swept._")
    lines.append("")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--summary",
                    default=os.path.join(HERE, "hard_sweep", "summary_zoo.json"))
    ap.add_argument("--out", default=os.path.join(HERE, "hard_sweep", "ZOO.md"))
    args = ap.parse_args()
    report = build_report(args.summary)
    with open(args.out, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
