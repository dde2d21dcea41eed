"""Regenerate the committed pretrained example artifact
(``examples/pretrained/``) from scratch.

Equivalent of the reference's shipped ``models/exampleModel`` (README.md:
84-91) — a small trained checkpoint users can smoke-test get_embedding /
score_trials / serve against without training anything. Here the artifact is
reproducible: a seeded tiny model trained ~2 minutes on CPU over the seeded
synthetic corpus (``example_corpus.py``), plus golden outputs the test suite
pins the committed files to (``tests/test_example_artifact.py``).

  python examples/make_pretrained.py          # rewrites examples/pretrained/

Contents written:
  example_model.npz          trained checkpoint (params + BN state + meta)
  example_model_config.json  full ExperimentConfig
  golden_embeddings.npz      one embedding per corpus utterance
  golden_scores.json         client/impostor cosine scores + reference-grid EER
  README.md                  usage
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # reproducible + no TPU needed

import numpy as np

from examples.example_corpus import make_wavs, write_index_files

ART_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pretrained")

README = """# Pretrained example model

A tiny speaker-verification model trained on the seeded synthetic corpus in
`examples/example_corpus.py` — the analogue of the reference's shipped
`models/exampleModel` checkpoint: an instant smoke path for the inference
CLIs with no training and no external data.

- `example_model.npz` — checkpoint (VGG4L k=32, 4 heads, DoubleMHA, emb 64,
  4 speakers). Loads with `cli/get_embedding.py`, `cli/serve.py`, `api.py`.
- `example_model_config.json` — the full experiment config.
- `golden_embeddings.npz` — expected embedding per corpus utterance
  (key = `spk{S}_utt{U}`); the test suite checks the checkpoint still
  reproduces them (`tests/test_example_artifact.py`).
- `golden_scores.json` — client/impostor cosine scores and the
  reference-grid EER. The speakers separate perfectly (min client score >
  max impostor score; exact ROC EER = 0); the recorded grid EER is 8.3334
  because the reference's 0.01-step threshold sweep + duplicated symmetric
  impostor pairs quantize the crossing (faithfully reproduced semantics,
  `evaluation/eer.py:eer_reference`).

Try it:

    python -m doubleattentionspeakerverification_tpu.cli.get_embedding \\
        --audioPath <some.wav> \\
        --modelCheckpoint examples/pretrained/example_model.npz

Regenerate from scratch (seeded; ~2 min CPU):

    python examples/make_pretrained.py
"""


def main() -> int:
    from doubleattentionspeakerverification_tpu.api import SpeakerEmbeddingModel
    from doubleattentionspeakerverification_tpu.cli.train import main as train_main
    from doubleattentionspeakerverification_tpu.evaluation.eer import (
        cosine_scores,
        eer_reference,
    )

    from doubleattentionspeakerverification_tpu.cli.extract_features import (
        main as extract_main,
    )

    work = tempfile.mkdtemp(prefix="dmha_pretrained_")
    wav_dir = os.path.join(work, "wavs")
    out_dir = os.path.join(work, "model")
    paths, labels = make_wavs(wav_dir)
    write_index_files(work, wav_dir, paths, labels)

    lst = os.path.join(work, "files.lst")
    with open(lst, "w") as f:
        f.writelines(p + "\n" for p in paths)
    if extract_main(["-i", lst]) != 0:
        print("feature extraction failed", file=sys.stderr)
        return 1

    rc = train_main([
        "--train_data_dir", wav_dir,
        "--valid_data_dir", wav_dir,
        "--train_labels_path", os.path.join(work, "labels.ndx"),
        "--valid_clients", os.path.join(work, "clients.ndx"),
        "--valid_impostors", os.path.join(work, "impostors.ndx"),
        "--out_dir", out_dir,
        "--model_name", "example",
        "--kernel_size", "32", "--heads_number", "4", "--embedding_size", "64",
        "--window_size", "1.0", "--batch_size", "4", "--gradientAccumulation", "1",
        "--learning_rate", "0.002", "--seed", "1234",
        "--max_epochs", "60", "--validate_every", "25", "--print_every", "25",
        "--checkpoint_every", "25",
    ])
    if rc != 0:
        print("training failed", file=sys.stderr)
        return rc

    # best-EER checkpoint if present, else the last periodic one; order by
    # the numeric step suffix (lexicographic picks _75 over _250)
    def step_of(name: str) -> int:
        m = re.search(r"_(\d+)\.npz$", name)
        return int(m.group(1)) if m else -1

    ckpts = sorted(
        (f for f in os.listdir(out_dir) if f.endswith(".npz")), key=step_of
    )
    best = [f for f in ckpts if "best" in f]
    ckpt = os.path.join(out_dir, (best or ckpts)[-1])
    cfg_json = [f for f in os.listdir(out_dir) if f.endswith("_config.json")][0]

    os.makedirs(ART_DIR, exist_ok=True)
    shutil.copy(ckpt, os.path.join(ART_DIR, "example_model.npz"))
    shutil.copy(
        os.path.join(out_dir, cfg_json),
        os.path.join(ART_DIR, "example_model_config.json"),
    )

    # golden embeddings for every corpus utterance, via the public API
    model = SpeakerEmbeddingModel.from_checkpoint(
        os.path.join(ART_DIR, "example_model.npz")
    )
    goldens = {}
    for p in paths:
        name = os.path.basename(p)[:-4]
        goldens[name] = np.asarray(model.embed_wav(p), np.float32)
    np.savez(os.path.join(ART_DIR, "golden_embeddings.npz"), **goldens)

    # golden trial scores + EER (reference grid semantics)
    def utt(r):  # trial lists store paths relative to wav_dir, no extension
        return goldens[os.path.basename(r)]

    clients, impostors = [], []
    for line in open(os.path.join(work, "clients.ndx")):
        a, b = line.split()
        clients.append(float(cosine_scores(utt(a)[None], utt(b)[None])[0]))
    for line in open(os.path.join(work, "impostors.ndx")):
        a, b = line.split()
        impostors.append(float(cosine_scores(utt(a)[None], utt(b)[None])[0]))
    eer = float(eer_reference(np.array(clients), np.array(impostors)))
    with open(os.path.join(ART_DIR, "golden_scores.json"), "w") as f:
        json.dump({"clients": clients, "impostors": impostors, "eer": eer}, f, indent=1)

    with open(os.path.join(ART_DIR, "README.md"), "w") as f:
        f.write(README)

    size_kb = os.path.getsize(os.path.join(ART_DIR, "example_model.npz")) / 1024
    print(f"artifact written to {ART_DIR} (checkpoint {size_kb:.0f} KiB, EER {eer})")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
