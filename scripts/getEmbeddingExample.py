"""Drop-in launcher matching the reference's
``python scripts/getEmbeddingExample.py --audioPath ... --modelConfig ...
--modelCheckpoint ...`` (reference ``scripts/getEmbeddingExample.py:41-54``).

Accepts the reference's ``--modelConfig`` and ``--device`` flags for CLI
compatibility; like the reference, the config embedded in the checkpoint is
what actually gets used (``getEmbeddingExample.py:27-28``), and device
placement is JAX's (the flag is ignored).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu even when a site hook pre-imported jax with another
# platform pinned (the env var is read too early in that case).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from doubleattentionspeakerverification_tpu.cli.get_embedding import main  # noqa: E402


def _strip_compat_flags(argv):
    out = []
    skip = False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("--modelConfig", "--device"):
            skip = True
            continue
        if a.startswith(("--modelConfig=", "--device=")):
            continue
        out.append(a)
    return out


if __name__ == "__main__":
    raise SystemExit(main(_strip_compat_flags(sys.argv[1:])))
