"""Triplet pipeline: 3 views / 3 pairs in one matcher pass (role of reference
`models/triplet_pipeline.py:23-99`).

The three pairs (0to1, 0to2, 1to2) are stacked along the batch dimension so
the matcher runs ONCE on a 3B batch (`stack_twoviews`, reference
`utils/misc.py:16-46`) — ideal for TPU: one big static-shape batch instead of
three launches.
"""

from __future__ import annotations

from ..utils.misc import get_twoview_data, map_multi, unstack_twoviews
from .two_view_pipeline import TwoViewPipeline

PAIR_INDICES = ("0to1", "0to2", "1to2")


class TripletPipeline(TwoViewPipeline):
    default_conf = {
        **TwoViewPipeline.default_conf,
        "batch_triplets": True,
    }
    required_data_keys = ["view0", "view1", "view2"]

    def _forward(self, data: dict, train: bool = False) -> dict:
        preds = {}
        for i in ("0", "1", "2"):
            preds[i] = self.extract_view(data, i, train=train)
        B = data["view0"]["image" if "image" in data["view0"] else "image_size"].shape[0]

        matcher = self.component("matcher")
        if matcher is None:
            return {f"{k}{i}": v for i in preds for k, v in preds[i].items()}

        if self.conf.batch_triplets:
            # stack the 3 pairs on the batch axis, run the matcher once
            stacked_data = map_multi(
                [get_twoview_data(data, idx) for idx in PAIR_INDICES]
            )
            stacked_pred = {}
            for idx in PAIR_INDICES:
                i, j = idx[0], idx[-1]
                for k in preds[i]:
                    stacked_pred.setdefault(k + "0", []).append(preds[i][k])
                    stacked_pred.setdefault(k + "1", []).append(preds[j][k])
            import jax.numpy as jnp

            stacked_pred = {
                k: jnp.concatenate(v, axis=0) for k, v in stacked_pred.items()
            }
            m_out = matcher({**stacked_data, **stacked_pred}, train=train)
            per_pair = unstack_twoviews(m_out, B, PAIR_INDICES)
        else:
            per_pair = {}
            for idx in PAIR_INDICES:
                i, j = idx[0], idx[-1]
                pair_data = get_twoview_data(data, idx)
                pair_pred = {
                    **{k + "0": v for k, v in preds[i].items()},
                    **{k + "1": v for k, v in preds[j].items()},
                }
                per_pair[idx] = matcher({**pair_data, **pair_pred}, train=train)

        pred = {f"{k}{i}": v for i in preds for k, v in preds[i].items()}
        for idx, p in per_pair.items():
            pred.update({f"{k}_{idx}": v for k, v in p.items()})
        return pred

    def loss(self, pred: dict, data: dict, train: bool = False):
        """Sum of per-pair two-view losses."""
        import jax.numpy as jnp

        total = 0
        all_losses = {}
        all_metrics = {}
        view_keys = [
            k for k in pred if not any(k.endswith(f"_{x}") for x in PAIR_INDICES)
        ]
        for idx in PAIR_INDICES:
            i, j = idx[0], idx[-1]
            pair_data = get_twoview_data(data, idx)
            pair_pred = {
                k[: -len(idx) - 1]: v for k, v in pred.items() if k.endswith(f"_{idx}")
            }
            pair_pred.update(
                {k[:-1] + "0": pred[k] for k in view_keys if k.endswith(i)}
            )
            pair_pred.update(
                {k[:-1] + "1": pred[k] for k in view_keys if k.endswith(j)}
            )
            if self.component("ground_truth") is not None:
                gt = self.component("ground_truth")(
                    {**pair_data, **pair_pred}, train=train
                )
                pair_pred = {**pair_pred, **gt}
            matcher = self.component("matcher")
            if matcher is not None and matcher.is_trainable:
                losses_i, metrics_i = matcher.loss(
                    pair_pred, {**pair_pred, **pair_data}, train=train
                )
                total = total + losses_i["total"]
                all_losses.update({f"{k}_{idx}": v for k, v in losses_i.items() if k != "total"})
                all_metrics.update({f"{k}_{idx}": v for k, v in metrics_i.items()})
        all_losses["total"] = total
        return all_losses, all_metrics
