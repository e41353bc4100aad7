"""On-device SIFT (role of reference `models/extractors/sift_kornia.py:7-46`,
the kornia SIFTFeature wrapper — kornia's value there was GPU-resident SIFT;
the TPU-era equivalent is the fully jit-compiled DoG pipeline in
`ops/sift_jax.py`). This model is `sift` with `backend: "jax"` pinned, so
recipes written against the reference's `sift_kornia` name run unchanged
and stay on-device end-to-end."""

from __future__ import annotations

from .sift import SIFT


class SIFTKornia(SIFT):
    default_conf = {
        **SIFT.default_conf,
        "backend": "jax",
        "max_num_keypoints": 4096,
        "rootsift": True,
    }
