"""Deterministic synthetic speaker corpus shared by the quickstart, the
pretrained-artifact generator (``make_pretrained.py``), and the smoke tests
that verify the committed artifact (``tests/test_example_artifact.py``).

Each "speaker" is a frequency-modulated harmonic stack with speaker-specific
f0, FM rate, and FM depth — deliberately NON-stationary: the training and
inference paths apply CMN (per-feature mean over time), which erases any
stationary tone completely (its log-mel is constant in time), collapsing all
embeddings. The FM sweep makes the log-mel trajectory itself speaker-specific
so the corpus stays trivially separable after CMN — the point being that the
shipped example model reaches EER 0 on it, mirroring the instant-success
smoke path the reference provides via its pretrained ``models/exampleModel``
checkpoint (reference README.md:84-91).

The generator is fully seeded (numpy ``default_rng``), so the corpus is
bit-identical everywhere — committed golden embeddings stay valid without
committing any wav files.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from doubleattentionspeakerverification_tpu.data.wav import write_wav


def make_wavs(
    root: str,
    n_speakers: int = 4,
    per_speaker: int = 5,
    seconds: float = 1.5,
    sr: int = 16000,
    seed: int = 0,
    freq_plan=None,
    name_fmt: str = "spk{spk}_utt{utt}.wav",
) -> Tuple[List[str], List[int]]:
    """``freq_plan(spk) -> (f0, fm_rate, fm_depth)`` overrides the default
    per-speaker frequency schedule (callers with many speakers need denser
    spacing — e.g. the 64-speaker soak corpus in ``tools/e2e_soak.py``)."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    paths, labels = [], []
    t = np.arange(int(seconds * sr)) / sr
    for spk in range(n_speakers):
        if freq_plan is not None:
            f0, fm_rate, fm_depth = freq_plan(spk)
        else:
            f0 = 150 + 110 * spk          # carrier
            fm_rate = 2.0 + 1.5 * spk     # sweeps per second
            fm_depth = 60.0 + 25.0 * spk  # Hz of sweep
        for i in range(per_speaker):
            phase = rng.uniform(0, 2 * np.pi)
            inst = f0 * t + (fm_depth / (2 * np.pi * fm_rate)) * np.sin(
                2 * np.pi * fm_rate * t + phase
            )
            y = (
                0.3 * np.sin(2 * np.pi * inst)
                + 0.15 * np.sin(2 * np.pi * 2.0 * inst + 0.3)
                + 0.03 * rng.standard_normal(len(t))
            )
            p = os.path.join(root, name_fmt.format(spk=spk, utt=i))
            write_wav(p, y, sr)
            paths.append(p)
            labels.append(spk)
    return paths, labels


def write_index_files(workdir: str, wav_dir: str, paths, labels, n_speakers=4):
    """labels.ndx + clients/impostors trial lists in the reference format."""
    rel = [os.path.relpath(p, wav_dir)[:-4] for p in paths]
    with open(os.path.join(workdir, "labels.ndx"), "w") as f:
        f.writelines(f"{r} {l} -1\n" for r, l in zip(rel, labels))
    with open(os.path.join(workdir, "clients.ndx"), "w") as f:
        for spk in range(n_speakers):
            us = [r for r, l in zip(rel, labels) if l == spk]
            f.write(f"{us[0]} {us[1]}\n")
            f.write(f"{us[2]} {us[3]}\n")
    with open(os.path.join(workdir, "impostors.ndx"), "w") as f:
        for a in range(n_speakers):
            for b_ in range(n_speakers):
                if a != b_:
                    ua = [r for r, l in zip(rel, labels) if l == a]
                    ub = [r for r, l in zip(rel, labels) if l == b_]
                    f.write(f"{ua[0]} {ub[0]}\n")
    return rel
