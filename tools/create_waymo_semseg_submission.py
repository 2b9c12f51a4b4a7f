"""Create a Waymo semantic-segmentation submission from tester outputs.

Parity surface: reference `tools/create_waymo_semseg_submission.py` — packs
the per-frame predictions written by the SemSegTester (``result/*.npy``) into
the Waymo `SemanticSegmentationSubmission` proto.  Like the reference, this
requires the `waymo-open-dataset` package (its TF pin conflicts with the main
environment, so submission packaging runs in a separate venv):

    pip install waymo-open-dataset-tf-2-11-0
    python tools/create_waymo_semseg_submission.py \
        --record_path data/waymo/validation --dataset_path exp/.../result \
        --output_path submission --split validation
"""

import argparse
import os
import zlib

import numpy as np

try:
    import waymo_open_dataset.dataset_pb2 as open_dataset
    from waymo_open_dataset.protos import segmentation_metrics_pb2, segmentation_submission_pb2
except ImportError:  # pragma: no cover - optional heavy dependency
    open_dataset = None


def compress_array(array: np.ndarray, is_int32: bool = False) -> bytes:
    """ZLIB-compressed serialized MatrixFloat/MatrixInt32 proto."""
    m = open_dataset.MatrixInt32() if is_int32 else open_dataset.MatrixFloat()
    m.shape.dims.extend(list(array.shape))
    m.data.extend(array.reshape([-1]).tolist())
    return zlib.compress(m.SerializeToString())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record_path", required=True, help="dir of context name lists / tfrecords")
    ap.add_argument("--dataset_path", required=True, help="tester result dir of <context>_<ts>.npy preds")
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--split", default="validation")
    args = ap.parse_args()

    if open_dataset is None:
        raise SystemExit(
            "waymo-open-dataset is not installed in this environment. Create a "
            "separate venv (`pip install waymo-open-dataset-tf-2-11-0`) and "
            "re-run — see the module docstring."
        )

    frames = segmentation_metrics_pb2.SegmentationFrameList()
    for fn in sorted(os.listdir(args.dataset_path)):
        if not fn.endswith(".npy"):
            continue
        pred = np.load(os.path.join(args.dataset_path, fn)).astype(np.int32) + 1  # 0 = undefined
        context_name, _, timestamp = fn[: -len(".npy")].rpartition("_")
        frame = segmentation_metrics_pb2.SegmentationFrame()
        frame.context_name = context_name
        frame.frame_timestamp_micros = int(timestamp)
        seg_proto = open_dataset.Laser()
        seg_proto.name = open_dataset.LaserName.TOP
        range_image = open_dataset.MatrixInt32()
        range_image.shape.dims.extend([len(pred), 2])
        dual = np.stack([np.zeros_like(pred), pred], axis=-1)
        range_image.data.extend(dual.reshape(-1).tolist())
        frame.segmentation_labels.add().CopyFrom(
            open_dataset.laser_pb2.Laser(
                name=open_dataset.LaserName.TOP,
                ri_return1=open_dataset.laser_pb2.RangeImage(
                    segmentation_label_compressed=compress_array(dual, is_int32=True)
                ),
            )
        )
        frames.frames.append(frame)

    submission = segmentation_submission_pb2.SemanticSegmentationSubmission()
    submission.account_name = "anonymous"
    submission.unique_method_name = "pointcept_keypointdetection_tpu"
    submission.affiliation = "anonymous"
    submission.method_link = ""
    submission.sensor_type = (
        segmentation_submission_pb2.SemanticSegmentationSubmission.LIDAR_ALL
    )
    submission.number_past_frames_exclude_current = 0
    submission.number_future_frames_exclude_current = 0
    submission.inference_results.CopyFrom(frames)

    os.makedirs(args.output_path, exist_ok=True)
    out = os.path.join(args.output_path, f"{args.split}_submission.bin")
    with open(out, "wb") as f:
        f.write(submission.SerializeToString())
    print(f"wrote {out} ({len(frames.frames)} frames)")


if __name__ == "__main__":
    main()
