"""Drop-in launcher matching the reference's
``python scripts/featureExtractor.py -i files.lst`` (reference
``scripts/featureExtractor.py:45-51``). Produces the same on-disk artifact:
``<base>.pickle`` with the raw (80, T) log-mel matrix.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu even when a site hook pre-imported jax with another
# platform pinned (the env var is read too early in that case).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from doubleattentionspeakerverification_tpu.cli.extract_features import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
