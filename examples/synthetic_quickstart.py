"""Executable walkthrough: synthetic data -> features -> training -> EER ->
embedding extraction.

The reference ships a pretrained example model via git-LFS
(``models/exampleModel``); this script produces the equivalent artifact
reproducibly in about a minute on CPU (a tiny config trained on synthetic
speakers), then runs the embedding CLI against it.

  python examples/synthetic_quickstart.py [workdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doubleattentionspeakerverification_tpu.cli.extract_features import main as extract_main
from doubleattentionspeakerverification_tpu.cli.get_embedding import main as embed_main
from doubleattentionspeakerverification_tpu.cli.train import main as train_main

from examples.example_corpus import make_wavs  # CMN-surviving FM speakers


def main(workdir: str = "/tmp/dmha_quickstart") -> int:
    wav_dir = os.path.join(workdir, "wavs")
    out_dir = os.path.join(workdir, "model")
    os.makedirs(workdir, exist_ok=True)
    paths, labels = make_wavs(wav_dir)

    # 1. offline feature extraction (reference-compatible pickles)
    lst = os.path.join(workdir, "files.lst")
    with open(lst, "w") as f:
        f.writelines(p + "\n" for p in paths)
    extract_main(["-i", lst])

    # 2. labels + trials
    rel = [os.path.relpath(p, wav_dir)[:-4] for p in paths]
    with open(os.path.join(workdir, "labels.ndx"), "w") as f:
        f.writelines(f"{r} {l} -1\n" for r, l in zip(rel, labels))
    with open(os.path.join(workdir, "clients.ndx"), "w") as f:
        for spk in range(4):
            us = [r for r, l in zip(rel, labels) if l == spk]
            f.write(f"{us[0]} {us[1]}\n")
    with open(os.path.join(workdir, "impostors.ndx"), "w") as f:
        us0 = [r for r, l in zip(rel, labels) if l == 0]
        us1 = [r for r, l in zip(rel, labels) if l == 1]
        f.write(f"{us0[0]} {us1[0]}\n")
        f.write(f"{us0[1]} {us1[1]}\n")

    # 3. train a small model briefly
    train_main([
        "--train_data_dir", wav_dir,
        "--valid_data_dir", wav_dir,
        "--train_labels_path", os.path.join(workdir, "labels.ndx"),
        "--valid_clients", os.path.join(workdir, "clients.ndx"),
        "--valid_impostors", os.path.join(workdir, "impostors.ndx"),
        "--out_dir", out_dir,
        "--model_name", "example",
        "--kernel_size", "32", "--heads_number", "4", "--embedding_size", "64",
        "--window_size", "1.0", "--batch_size", "4", "--gradientAccumulation", "1",
        "--learning_rate", "0.002",
        "--max_epochs", "6", "--validate_every", "5", "--print_every", "5",
        "--checkpoint_every", "5",
    ])

    # 4. extract an embedding with the trained model
    ckpts = sorted(f for f in os.listdir(out_dir) if f.endswith(".npz"))
    ckpt = os.path.join(out_dir, ckpts[-1])
    print(f"\nembedding of {paths[0]} using {ckpt}:")
    embed_main(["--audioPath", paths[0], "--modelCheckpoint", ckpt])
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dmha_quickstart"))
