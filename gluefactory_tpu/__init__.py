"""gluefactory_tpu — TPU-native framework for training and evaluating deep
local-feature extractors and matchers (LightGlue, SuperGlue, GlueStick, joint
point+line matching), built on JAX / XLA / Pallas / pjit.

A ground-up rebuild of the capabilities of cvg/glue-factory (reference mounted
at /root/reference) with a functional core: pure model functions over pytrees,
static shapes with masking, Pallas kernels for the hot ops, and `pjit` sharding
over TPU meshes for scale.
"""

import logging

__version__ = "0.1.0"

logger = logging.getLogger("gluefactory_tpu")


def _setup_logger():
    # mirrors reference package logger setup (gluefactory/__init__.py:5-17)
    formatter = logging.Formatter(
        fmt="[%(asctime)s %(name)s %(levelname)s] %(message)s", datefmt="%m/%d/%Y %H:%M:%S"
    )
    handler = logging.StreamHandler()
    handler.setFormatter(formatter)
    handler.setLevel(logging.INFO)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        logger.addHandler(handler)
    logger.propagate = False


_setup_logger()

# OpenCV's internal thread pool races with XLA pure_callback threads and the
# data-loader threads (observed: hard aborts inside LSD under a multi-device
# mesh). Host cv2 ops here are small; run them single-threaded.
try:
    import cv2 as _cv2

    _cv2.setNumThreads(0)
except Exception:  # pragma: no cover - cv2 always present in this env
    pass


def load_experiment(exper, conf=None, get_last=False, ckpt=None):
    """Load and return the model of a completed experiment (lazy import)."""
    from .utils.experiments import load_experiment as _load

    return _load(exper, conf=conf, get_last=get_last, ckpt=ckpt)
