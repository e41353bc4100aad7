"""Profile the REAL SuperPoint decode sequence (softmax -> pixel shuffle ->
NMS -> top-k -> force_num fill -> desc sampling) at bench dtype/shapes,
with stage ablations, to find where the extract_full - dense_only gap goes.

Run as `python -m scripts_dev.profile_decode3` with the TPU free.
"""

import json
import time
from functools import partial

import numpy as np

B, Hc, Wc, D, K = 8, 128, 128, 256, 2048


def chain_time(fn, args, n=20):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def run(args, n):
        def body(c, _):
            return fn(c, *args), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    float(run(args, n=n))
    t0 = time.perf_counter()
    float(run(args, n=n))
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.ops.grid_sample import sample_descriptors
    from gluefactory_tpu.ops.nms import remove_borders, simple_nms, top_k_keypoints

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 1, (B, Hc, Wc, 65)), jnp.bfloat16)
    dense = jnp.asarray(rng.normal(0, 1, (B, Hc, Wc, D)), jnp.bfloat16)
    size = jnp.tile(jnp.asarray([[1024.0, 1024.0]], jnp.float32), (B, 1))
    key = jax.random.key(0)

    def decode(carry, logits, dense, upto):
        lg = logits + (carry * 1e-12).astype(logits.dtype)
        scores = jax.nn.softmax(lg, axis=-1)[..., :64]
        scores = scores.reshape(B, Hc, Wc, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
        if upto == "shuffle":
            return scores.astype(jnp.float32).sum() * 1e-20
        nmsed = simple_nms(scores, 4)
        if upto == "nms":
            return nmsed.astype(jnp.float32).sum() * 1e-20
        nmsed = remove_borders(nmsed, 4)
        xs = jnp.arange(Wc * 8, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(Hc * 8, dtype=jnp.float32)[None, :, None]
        in_area = (xs < size[:, 0][:, None, None] - 4.0) & (
            ys < size[:, 1][:, None, None] - 4.0
        )
        nmsed = jnp.where(in_area, nmsed, jnp.zeros_like(nmsed))
        kpts, ksc, valid = top_k_keypoints(nmsed, K, 0.0, nms_radius=4)
        if upto == "topk":
            return kpts.astype(jnp.float32).sum() * 1e-20
        u = jax.random.uniform(key, (B, K, 2), dtype=kpts.dtype)
        kpts = jnp.where(valid[..., None], kpts, u * size[:, None, :])
        ksc = jnp.where(valid, ksc, 0.0)
        if upto == "fill":
            return kpts.astype(jnp.float32).sum() * 1e-20
        dd = dense / (jnp.linalg.norm(dense, axis=-1, keepdims=True) + 1e-8)
        desc = sample_descriptors(kpts, dd, stride=8)
        return desc.astype(jnp.float32).sum() * 1e-20

    out = {}
    for stage in ("shuffle", "nms", "topk", "fill", "full"):
        fn = lambda c, lg, dn, s=stage: decode(c, lg, dn, s)
        out[stage] = round(chain_time(fn, (logits, dense)) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
