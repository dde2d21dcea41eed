"""The committed pretrained example artifact (``examples/pretrained/``) must
keep working out of the box — the analogue of the reference's shipped
``models/exampleModel`` smoke path (reference README.md:84-91).

Checks: the checkpoint loads through the public API and the get_embedding
CLI, reproduces the committed golden embeddings on the regenerated (seeded)
corpus, and the golden trial scores still yield the recorded reference-grid
EER.
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "examples", "pretrained")
CKPT = os.path.join(ART, "example_model.npz")

sys.path.insert(0, REPO)  # for `examples.` imports


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from examples.example_corpus import make_wavs

    root = str(tmp_path_factory.mktemp("wavs"))
    paths, labels = make_wavs(root)
    return paths, labels


@pytest.fixture(scope="module")
def model():
    from doubleattentionspeakerverification_tpu.api import SpeakerEmbeddingModel

    return SpeakerEmbeddingModel.from_checkpoint(CKPT)


def test_artifact_files_present():
    for f in ("example_model.npz", "example_model_config.json",
              "golden_embeddings.npz", "golden_scores.json", "README.md"):
        assert os.path.exists(os.path.join(ART, f)), f


def test_checkpoint_reproduces_golden_embeddings(model, corpus):
    paths, _ = corpus
    with np.load(os.path.join(ART, "golden_embeddings.npz")) as z:
        goldens = {k: z[k] for k in z.files}
    assert len(goldens) == len(paths)
    # spot-check one utterance per speaker (full sweep is the generator's job)
    for p in [paths[i] for i in (0, 5, 10, 15)]:
        name = os.path.basename(p)[:-4]
        emb = np.asarray(model.embed_wav(p))
        np.testing.assert_allclose(emb, goldens[name], atol=1e-4, rtol=1e-4)


def test_golden_scores_separate_and_eer_matches():
    from doubleattentionspeakerverification_tpu.evaluation.eer import (
        cosine_scores,
        eer_reference,
    )

    with open(os.path.join(ART, "golden_scores.json")) as f:
        d = json.load(f)
    clients, impostors = np.array(d["clients"]), np.array(d["impostors"])
    assert clients.min() > impostors.max()  # perfect separation
    assert eer_reference(clients, impostors) == d["eer"]

    # scores must also be re-derivable from the golden embeddings
    with np.load(os.path.join(ART, "golden_embeddings.npz")) as z:
        g = {k: z[k] for k in z.files}
    s = float(cosine_scores(g["spk0_utt0"][None], g["spk0_utt1"][None])[0])
    assert s == pytest.approx(clients[0], abs=1e-6)


def test_get_embedding_cli_smoke(corpus, capsys):
    from doubleattentionspeakerverification_tpu.cli.get_embedding import (
        main as embed_main,
    )

    paths, _ = corpus
    assert embed_main(["--audioPath", paths[0], "--modelCheckpoint", CKPT]) == 0
    assert "[" in capsys.readouterr().out


def test_verify_api_on_artifact(model, corpus):
    paths, labels = corpus
    same = [p for p, l in zip(paths, labels) if l == 0][:2]
    diff = [p for p, l in zip(paths, labels) if l == 3][:1]
    assert model.score_wavs(same[0], same[1]) > model.score_wavs(same[0], diff[0])
