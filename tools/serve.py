"""HTTP inference daemons for the Qt client.

Parity surface: reference `tools/KeyPointPrediction_Qt.py`,
`OffsetKeyPointPrediction_Qt.py`, `PigSegPrediction_Qt.py` — FastAPI servers
with a ``/predict`` endpoint taking a binary float32 point cloud and
returning binary float32 results (keypoints / labels), with server-side
preprocessing (normals/curvature, normalize, voxelize).

FastAPI isn't in this image, so the same contract is served via the stdlib
``http.server``: POST /predict with a raw float32 body of shape (N, C);
response is raw float32 (keypoints K x 3, or per-point labels).  Query params
select dtype/shape: ``?cols=7`` etc.

Usage:
  python tools/serve.py --task offset_keypoint --config-file configs/my_dataset/offset_keypoint_ptv3.py \
      --weight exp/.../model_best.ckpt --port 8000
"""

import argparse
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_predictor(task, cfg, weight, slot_size):
    from pointcept_keypointdetection_tpu.inference import (
        KeypointPredictor,
        OffsetKeypointPredictor,
    )

    if task == "keypoint":
        return KeypointPredictor(dict(cfg.model), checkpoint=weight, slot_size=slot_size)
    if task == "offset_keypoint":
        return OffsetKeypointPredictor(dict(cfg.model), checkpoint=weight, slot_size=slot_size)
    if task == "pigseg":
        return _SegPredictor(cfg, weight, slot_size)
    raise ValueError(task)


class _SegPredictor:
    """Per-point semantic labels over a raw cloud (PigSegPrediction_Qt parity)."""

    def __init__(self, cfg, weight, slot_size):
        self.cfg = cfg
        self.weight = weight
        self.slot = slot_size
        self._built = None

    def predict(self, coord, feat=None, grid_size=0.02, **kwargs):
        import functools

        import jax
        import jax.numpy as jnp

        from pointcept_keypointdetection_tpu.datasets.collate import collate, pad_sample
        from pointcept_keypointdetection_tpu.engines.common import build_point_batch
        from pointcept_keypointdetection_tpu.engines.test import sample_to_device
        from pointcept_keypointdetection_tpu.inference.keypoint import (
            estimate_normals_curvature,
            normalize_cloud,
        )
        from pointcept_keypointdetection_tpu.models import build_model
        from pointcept_keypointdetection_tpu.ops.serialization import z_order_encode_np
        from pointcept_keypointdetection_tpu.utils.checkpoint import load_checkpoint, restore_into

        if feat is None:
            feat = estimate_normals_curvature(coord)
        ncoord, centroid, scale = normalize_cloud(coord)
        grid = np.floor(ncoord / grid_size).astype(np.int64)
        grid -= grid.min(0)
        key = z_order_encode_np(np.minimum(grid, 2**16 - 1), 16)
        _, inverse, first = np.unique(key, return_inverse=True, return_index=True)
        order = np.argsort(key, kind="stable")
        inv_full = np.zeros_like(inverse)
        inv_full[order] = inverse
        sel = first
        data = dict(
            coord=ncoord[sel], feat=feat[sel].astype(np.float32), grid_coord=grid[sel].astype(np.int32)
        )
        batch = collate([pad_sample(data, self.slot)], self.slot)
        dev = sample_to_device(batch)
        if self._built is None:
            model = build_model(dict(self.cfg.model))
            point = build_point_batch(dev, 1)
            variables = jax.jit(functools.partial(model.init, train=False))(
                {"params": jax.random.PRNGKey(0)}, point, dev
            )
            if self.weight and os.path.isfile(self.weight):
                loaded = load_checkpoint(self.weight)
                variables = {
                    "params": restore_into(jax.device_get(variables["params"]), loaded["params"]),
                    "batch_stats": restore_into(
                        jax.device_get(variables.get("batch_stats", {})), loaded.get("batch_stats", {})
                    ),
                }

            def fwd(v, b):
                point = build_point_batch(b, 1)
                return jnp.argmax(model.apply(v, point, b, train=False)["seg_logits"], -1)

            self._built = (variables, jax.jit(fwd))
        variables, fwd = self._built
        pred = np.asarray(fwd(variables, dev))[: len(sel)]
        return pred[inv_full].astype(np.float32)


def make_handler(predictor, cols):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/predict":
                self.send_error(404)
                return
            params = parse_qs(parsed.query)
            ncols = int(params.get("cols", [cols])[0])
            method = params.get("method", ["argmax"])[0]
            length = int(self.headers.get("Content-Length", 0))
            raw = np.frombuffer(self.rfile.read(length), np.float32).reshape(-1, ncols)
            coord = raw[:, :3].copy()
            feat = raw[:, 3:].copy() if ncols > 3 else None
            try:
                if hasattr(predictor, "predict") and "method" in predictor.predict.__code__.co_varnames:
                    result = predictor.predict(coord, feat, method=method)
                else:
                    result = predictor.predict(coord, feat)
            except Exception as e:  # surface errors to the client
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())
                return
            payload = np.asarray(result, np.float32).tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *args):
            print("[serve]", fmt % args)

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", required=True, choices=["keypoint", "offset_keypoint", "pigseg"])
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--weight", default=None)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--cols", type=int, default=7)
    parser.add_argument("--slot-size", type=int, default=8192)
    args = parser.parse_args()

    from pointcept_keypointdetection_tpu.utils.config import Config

    cfg = Config.fromfile(args.config_file)
    predictor = build_predictor(args.task, cfg, args.weight, args.slot_size)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(predictor, args.cols))
    print(f"serving {args.task} on :{args.port} (POST /predict, raw float32 Nx{args.cols})")
    server.serve_forever()


if __name__ == "__main__":
    main()
