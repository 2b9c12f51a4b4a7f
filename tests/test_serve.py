"""End-to-end serving path: predictor API + the stdlib HTTP server.

Parity surface: the reference's Qt/FastAPI inference daemons
(`tools/OffsetKeyPointPrediction_Qt.py` etc.) — `/predict` multipart of raw
float32 columns, binary float32 response.
"""

import sys
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest

sys.path.insert(0, "tools")

TINY_MODEL = dict(
    type="OffsetKeypointPTv3",
    num_keypoints=6,
    hidden_dim=16,
    backbone_conf=dict(
        type="PT-v3m1",
        in_channels=4,
        stride=(2,),
        enc_depths=(1, 1),
        enc_channels=(8, 16),
        enc_num_head=(2, 4),
        enc_patch_size=(16, 16),
        dec_depths=(1,),
        dec_channels=(8,),
        dec_num_head=(2,),
        dec_patch_size=(16,),
        mlp_ratio=2,
        drop_path=0.0,
        slot_divisors=(1, 2),
        stem_kernel=3,
        attn_impl="xla",
    ),
)


@pytest.fixture(scope="module")
def predictor():
    from pointcept_keypointdetection_tpu.inference import OffsetKeypointPredictor

    return OffsetKeypointPredictor(dict(TINY_MODEL), checkpoint=None, slot_size=512)


def _cloud(rng, n=300):
    coord = rng.uniform(0, 500.0, (n, 3)).astype(np.float32)  # mm-scale
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    return coord, feat


def test_offset_predictor_end_to_end(rng, predictor):
    coord, feat = _cloud(rng)
    pred = predictor.predict(coord, feat, grid_size=0.02, method="argmax")
    assert pred.shape == (6, 3)
    assert np.isfinite(pred).all()
    # de-normalized keypoints land in the neighborhood of the cloud
    assert np.abs(pred - coord.mean(0)).max() < 2000.0
    # weighted aggregation also runs
    pred_w = predictor.predict(coord, feat, grid_size=0.02, method="weighted")
    assert pred_w.shape == (6, 3)
    assert np.isfinite(pred_w).all()


def test_http_serve_predict(rng, predictor):
    from serve import make_handler

    server = HTTPServer(("127.0.0.1", 0), make_handler(predictor, cols=7))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        coord, feat = _cloud(rng, n=200)
        payload = np.concatenate([coord, feat], axis=1).astype(np.float32).tobytes()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict?cols=7&method=argmax",
            data=payload,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            out = np.frombuffer(resp.read(), np.float32).reshape(-1, 3)
        assert out.shape == (6, 3)
        assert np.isfinite(out).all()

        # wrong endpoint -> 404
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/nope", data=b"", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(bad, timeout=30)
    finally:
        server.shutdown()


def test_infer_offset_cli_end_to_end(rng, tmp_path, monkeypatch, capsys):
    """tools/infer_offset.py: checkpoint load -> batch prediction over a
    pointclouds/keypoints dir -> per-KP error report + txt export (the
    reference's `tools/infer_offset.py:499-648` flow)."""
    import functools

    import jax

    from pointcept_keypointdetection_tpu.engines.common import build_point_batch
    from pointcept_keypointdetection_tpu.engines.test import sample_to_device
    from pointcept_keypointdetection_tpu.datasets.collate import collate, pad_sample
    from pointcept_keypointdetection_tpu.models import MODELS
    from pointcept_keypointdetection_tpu.utils.checkpoint import save_checkpoint

    # synthetic dataset dir: 2 clouds + GT keypoints (reference naming)
    for split_dir in ("val",):
        pc = tmp_path / split_dir / "pointclouds"
        kp = tmp_path / split_dir / "keypoints"
        pc.mkdir(parents=True)
        kp.mkdir(parents=True)
        for i in range(2):
            cloud = np.concatenate(
                [rng.uniform(0, 400, (300, 3)), rng.normal(size=(300, 4))], axis=1
            ).astype(np.float32)
            np.save(pc / f"169{i}000_cloud.npy", cloud)
            np.save(kp / f"169{i}000_cloud_关键点坐标.npy",
                    rng.uniform(0, 400, (6, 3)).astype(np.float32))

    # checkpoint from a random init (format parity with CheckpointSaver)
    model = MODELS.build(dict(TINY_MODEL))
    probe = {
        "coord": np.zeros((8, 3), np.float32),
        "feat": np.zeros((8, 4), np.float32),
        "grid_coord": np.zeros((8, 3), np.int32),
    }
    batch = sample_to_device(collate([pad_sample(probe, 512)], 512))
    point = build_point_batch(batch, 1)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point, batch
    )
    ckpt = tmp_path / "model_best.ckpt"
    save_checkpoint(str(ckpt), {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
    })

    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(f"model = {TINY_MODEL!r}\n")

    out_txt = tmp_path / "pred.txt"
    import infer_offset

    monkeypatch.setattr(sys, "argv", [
        "infer_offset.py",
        "--config-file", str(cfg_file),
        "--weight", str(ckpt),
        "--data-root", str(tmp_path),
        "--split", "val",
        "--method", "argmax",
        "--slot-size", "512",
        "--output", str(out_txt),
    ])
    infer_offset.main()
    captured = capsys.readouterr().out
    assert "Per-keypoint mean error" in captured
    assert out_txt.exists()
    lines = out_txt.read_text().strip().splitlines()
    assert len(lines) == 2
    # each line: name + 18 floats (6 keypoints x 3)
    assert len(lines[0].split()) == 1 + 18
