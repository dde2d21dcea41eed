"""Drop-in launcher matching the reference's ``python scripts/train.py ...``
invocation (reference ``scripts/train.py:251-305``). Thin shim over
``doubleattentionspeakerverification_tpu.cli.train``; accepts all reference
flags (the dead ``--data_mode`` flag is accepted and ignored, as in the
reference where it is parsed but never read, ``train.py:258``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu even when a site hook pre-imported jax with another
# platform pinned (the env var is read too early in that case).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from doubleattentionspeakerverification_tpu.cli.train import main  # noqa: E402


def _strip_dead_flags(argv):
    out = []
    skip = False
    for a in argv:
        if skip:
            skip = False
            continue
        if a == "--data_mode":
            skip = True
            continue
        if a.startswith("--data_mode="):
            continue
        out.append(a)
    return out


if __name__ == "__main__":
    raise SystemExit(main(_strip_dead_flags(sys.argv[1:])))
