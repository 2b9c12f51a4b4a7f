"""SGIFormer query-based instance segmentation."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_keypointdetection_tpu.models import MODELS, PointBatch
from pointcept_keypointdetection_tpu.models.sgiformer import matrix_nms


def test_matrix_nms_decays_duplicates():
    masks = np.zeros((3, 100), bool)
    masks[0, :50] = True
    masks[1, :50] = True  # duplicate of 0
    masks[2, 50:] = True
    scores = np.array([0.9, 0.8, 0.7])
    out = matrix_nms(masks, scores)
    assert out[0] == 0.9  # top stays
    assert out[1] < 0.4  # duplicate decayed
    assert out[2] > 0.65  # disjoint barely touched


def test_sgiformer_forward_and_loss(rng):
    model = MODELS.build(
        dict(
            type="SGIFormer-v1m1",
            num_classes=5,
            num_sample_query=8,
            num_learn_query=8,
            dec_dim=32,
            dec_layers=2,
            key_stride=4,
            max_instances=8,
            backbone=dict(
                type="SpUNet-v1m1", in_channels=4, num_classes=0, base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8), layers=(1,) * 8, stem_kernel=3,
            ),
        )
    )
    B, S = 1, 256
    coords = rng.uniform(0, 1, (B, S, 3)).astype(np.float32)
    point = PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(rng.normal(size=(B, S, 4)).astype(np.float32).reshape(-1, 4)),
        grid_coord=jnp.asarray(np.floor(coords / 0.05).astype(np.int32).reshape(-1, 3)),
        valid=jnp.ones(B * S, bool),
        num_samples=B,
    )
    instance = rng.integers(0, 4, B * S).astype(np.int32)
    segment = (instance % 3 + 2).astype(np.int32)
    batch = {"instance": jnp.asarray(instance), "segment": jnp.asarray(segment)}
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0)}, point, batch
    )
    out, _ = model.apply(variables, point, batch, train=True, mutable=["batch_stats"])
    assert out["pred_classes"].shape == (16, 6)
    assert out["pred_masks"].shape == (16, 256)
    assert out["seg_logits"].shape == (256, 5)
    assert out["bias_pred"].shape == (256, 3)
    assert np.isfinite(float(out["loss"]))


def test_sgiformer_batched_queries_are_per_sample(rng):
    """Queries/masks are per-sample under B>1 (the reference splits by
    offsets; padded slots make it a reshape)."""
    model = MODELS.build(
        dict(
            type="SGIFormer-v1m1",
            num_classes=4,
            num_sample_query=4,
            num_learn_query=4,
            dec_dim=16,
            dec_layers=2,
            key_stride=4,
            max_instances=8,
            backbone=dict(
                type="SpUNet-v1m1", in_channels=4, num_classes=0, base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8), layers=(1,) * 8, stem_kernel=3,
            ),
        )
    )
    B, S = 2, 128
    coords = rng.uniform(0, 1, (B, S, 3)).astype(np.float32)
    point = PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(rng.normal(size=(B, S, 4)).astype(np.float32).reshape(-1, 4)),
        grid_coord=jnp.asarray(np.floor(coords / 0.05).astype(np.int32).reshape(-1, 3)),
        valid=jnp.ones(B * S, bool),
        num_samples=B,
    )
    instance = rng.integers(0, 4, B * S).astype(np.int32)
    segment = (instance % 2 + 2).astype(np.int32)
    batch = {"instance": jnp.asarray(instance), "segment": jnp.asarray(segment)}
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0)}, point, batch
    )
    out, _ = model.apply(variables, point, batch, train=True, mutable=["batch_stats"])
    assert out["pred_classes"].shape == (2, 8, 5)
    assert out["pred_masks"].shape == (2, 8, 128)
    assert np.isfinite(float(out["loss"]))
