"""Violin plot of per-keypoint error distributions.

Parity surface: reference `tools/plot_keypoint_error_violin.py` +
`tools/infer_offset.py:plot_batch_errors` (`infer_offset.py:436-497`): one
violin per keypoint with the mean annotated, from the txt error table written
by tools/inference.py or tools/infer_offset.py."""

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def load_errors(path):
    names, rows = [], []
    with open(path) as f:
        header = f.readline().strip().split("\t")
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) < 2:
                continue
            names.append(parts[0])
            rows.append([float(x) for x in parts[1:]])
    return header[1:], np.asarray(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("errors_txt", help="table from tools/inference.py / infer_offset.py")
    ap.add_argument("--out", default="batch_keypoint_errors.svg")
    ap.add_argument("--unit", default="mm")
    args = ap.parse_args()

    kp_names, errors = load_errors(args.errors_txt)
    fig, ax = plt.subplots(figsize=(2 + 1.5 * errors.shape[1], 5))
    parts = ax.violinplot([errors[:, i] for i in range(errors.shape[1])], showmeans=True)
    for i in range(errors.shape[1]):
        m = errors[:, i].mean()
        ax.annotate(f"Mean: {m:.2f}", (i + 1, m), textcoords="offset points",
                    xytext=(8, 4), fontsize=9)
    ax.set_xticks(range(1, errors.shape[1] + 1))
    ax.set_xticklabels(kp_names)
    ax.set_ylabel(f"L2 error ({args.unit})")
    ax.set_title(f"Keypoint error distribution (n={errors.shape[0]})")
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
