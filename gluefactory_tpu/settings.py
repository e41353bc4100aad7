"""Path settings (mirrors reference `gluefactory/settings.py:1-9`).

All paths are overridable via environment variables so deployments can point at
mounted data volumes without editing code.
"""

import os
from pathlib import Path

root = Path(__file__).parent.parent  # repo root

DATA_PATH = Path(os.environ.get("GLUEFACTORY_DATA", root / "data"))
TRAINING_PATH = Path(os.environ.get("GLUEFACTORY_TRAINING", root / "outputs" / "training"))
EVAL_PATH = Path(os.environ.get("GLUEFACTORY_EVAL", root / "outputs" / "results"))
ALLOW_PICKLE = os.environ.get("GLUEFACTORY_ALLOW_PICKLE", "false").lower() in ("1", "true")
