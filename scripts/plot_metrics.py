"""Plot training dashboards from a metrics JSONL file.

Replaces the reference's matplotlib drift/approximation-error dashboards
(gcn.py:509-531, graphsage.py:978-1025, pna.py:366-413) with plots generated
from the structured metrics log (utils/logging.py):

    python scripts/plot_metrics.py /tmp/metrics.jsonl --out /tmp/plots
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--out", default=".")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    records = [json.loads(l) for l in open(args.path)]
    train = [r for r in records if r.get("kind") == "train_epoch"]
    evals = [r for r in records if r.get("kind") == "eval"]
    os.makedirs(args.out, exist_ok=True)

    def save(fig, name):
        path = os.path.join(args.out, name)
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {path}")

    if train:
        fig, ax = plt.subplots()
        ax.plot([r["loss"] for r in train])
        ax.set_xlabel("epoch")
        ax.set_ylabel("train loss")
        save(fig, "loss.png")

        if any(r.get("drift", 0) for r in train):
            fig, ax = plt.subplots()
            ax.plot([r.get("drift", 0) for r in train])
            ax.set_xlabel("epoch")
            ax.set_ylabel("mean embedding drift ||x - M_in||")
            ax.set_title("VR cache staleness (reference: absolute drift plots)")
            save(fig, "drift.png")

        fig, ax = plt.subplots()
        ax.plot([r.get("epoch_s", 0) for r in train])
        ax.set_xlabel("epoch")
        ax.set_ylabel("seconds")
        ax.set_title("epoch wall time")
        save(fig, "epoch_time.png")

    if evals:
        fig, ax = plt.subplots()
        for key in ("train_acc", "val_acc", "test_acc"):
            ax.plot([r[key] for r in evals], label=key)
        ax.set_xlabel("eval #")
        ax.set_ylabel("micro-F1 / accuracy")
        ax.legend()
        save(fig, "accuracy.png")


if __name__ == "__main__":
    main()
