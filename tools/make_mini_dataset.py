"""Build a Mini-SemanticKITTI (first N frames per sequence) preserving layout.

Parity surface: reference `SemanticFAST-LIO2-prediction/make_mini_dataset.py`.
"""

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True, help="SemanticKITTI root (contains dataset/sequences)")
    parser.add_argument("--dst", required=True)
    parser.add_argument("--frames", type=int, default=30)
    parser.add_argument("--sequences", nargs="+", default=None)
    args = parser.parse_args()

    seq_root = os.path.join(args.src, "dataset", "sequences")
    sequences = args.sequences or sorted(os.listdir(seq_root))
    for seq in sequences:
        src_seq = os.path.join(seq_root, seq)
        dst_seq = os.path.join(args.dst, "dataset", "sequences", seq)
        for sub in ("velodyne", "labels"):
            src_dir = os.path.join(src_seq, sub)
            if not os.path.isdir(src_dir):
                continue
            os.makedirs(os.path.join(dst_seq, sub), exist_ok=True)
            for path in sorted(glob.glob(os.path.join(src_dir, "*")))[: args.frames]:
                shutil.copy(path, os.path.join(dst_seq, sub, os.path.basename(path)))
        for extra in ("calib.txt", "times.txt", "poses.txt"):
            src_file = os.path.join(src_seq, extra)
            if os.path.isfile(src_file):
                os.makedirs(dst_seq, exist_ok=True)
                shutil.copy(src_file, os.path.join(dst_seq, extra))
        print(f"sequence {seq}: copied first {args.frames} frames")
    # poses dir
    pose_dir = os.path.join(args.src, "dataset", "poses")
    if os.path.isdir(pose_dir):
        os.makedirs(os.path.join(args.dst, "dataset", "poses"), exist_ok=True)
        for seq in sequences:
            pf = os.path.join(pose_dir, f"{seq}.txt")
            if os.path.isfile(pf):
                with open(pf) as f:
                    lines = f.readlines()[: args.frames]
                with open(os.path.join(args.dst, "dataset", "poses", f"{seq}.txt"), "w") as f:
                    f.writelines(lines)


if __name__ == "__main__":
    main()
