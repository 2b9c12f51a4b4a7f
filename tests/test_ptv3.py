"""PTv3 backbone + keypoint heads: shapes, masking, learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_keypointdetection_tpu.models import MODELS, PointBatch

BACKBONE = dict(
    type="PT-v3m1",
    in_channels=4,
    order=("z", "z-trans", "hilbert", "hilbert-trans"),
    stride=(2, 2),
    enc_depths=(1, 1, 1),
    enc_channels=(16, 32, 48),
    enc_num_head=(2, 4, 4),
    enc_patch_size=(16, 16, 16),
    dec_depths=(1, 1),
    dec_channels=(16, 32),
    dec_num_head=(2, 4),
    dec_patch_size=(16, 16),
    mlp_ratio=2,
    drop_path=0.1,
    slot_divisors=(1, 2, 4),
    stem_kernel=3,
    attn_impl="xla",
)


def make_point_batch(rng, B=2, S=256, C=4):
    coords = rng.uniform(0, 0.8, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.05).astype(np.int32)
    valid = np.zeros((B, S), bool)
    for b in range(B):
        _, first = np.unique(
            grid[b, :, 0] * 10**6 + grid[b, :, 1] * 10**3 + grid[b, :, 2], return_index=True
        )
        n_valid = min(len(first), S - 16)
        valid[b, first[:n_valid]] = True
    feat = rng.normal(size=(B, S, C)).astype(np.float32)
    feat[~valid] = 0
    return PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, C)),
        grid_coord=jnp.asarray(grid.reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )


@pytest.fixture(scope="module")
def ptv3():
    return MODELS.build(dict(BACKBONE))


def test_ptv3_forward(rng, ptv3):
    point = make_point_batch(rng)
    variables = ptv3.init({"params": jax.random.PRNGKey(0)}, point, train=False)
    feat = ptv3.apply(variables, point, train=False)
    assert feat.shape == (512, 16)
    assert np.isfinite(np.asarray(feat)).all()


def test_ptv3_mask_isolation(rng, ptv3):
    point = make_point_batch(rng)
    variables = ptv3.init({"params": jax.random.PRNGKey(0)}, point, train=False)
    f1 = np.asarray(ptv3.apply(variables, point, train=False))
    point2 = point.replace(feat=point.feat + jnp.where(point.valid[:, None], 0.0, 11.0))
    f2 = np.asarray(ptv3.apply(variables, point2, train=False))
    v = np.asarray(point.valid)
    np.testing.assert_allclose(f1[v], f2[v], rtol=2e-3, atol=2e-3)


def test_ptv3_serialization_state(rng):
    # serialize keeps per-sample slot structure for every order
    point = make_point_batch(rng).serialize(depth=16)
    order = np.asarray(point.serialized_order)  # [O, N]
    S = point.slot_size
    for o in range(order.shape[0]):
        for b in range(point.num_samples):
            slot = order[o, b * S : (b + 1) * S]
            assert slot.min() >= b * S and slot.max() < (b + 1) * S
    inv = np.asarray(point.serialized_inverse)
    for o in range(order.shape[0]):
        np.testing.assert_array_equal(order[o][inv[o]], np.arange(order.shape[1]))


def test_offset_keypoint_model_learns(rng):
    import optax

    model = MODELS.build(
        dict(type="OffsetKeypointPTv3", backbone_conf=dict(BACKBONE), num_keypoints=3, hidden_dim=32)
    )
    point = make_point_batch(rng)
    kp = rng.uniform(0.2, 0.6, (2, 3, 3)).astype(np.float32)
    coords = np.asarray(point.coord).reshape(2, -1, 3)
    offsets = np.stack([kp[b][None] - coords[b][:, None] for b in range(2)])  # [B,S,K,3]
    dist = np.linalg.norm(offsets, axis=-1)
    mask = (dist <= 0.4).astype(np.float32)
    batch = {
        "keypoint_offset": jnp.asarray((offsets * mask[..., None]).reshape(-1, 3, 3)),
        "keypoint_mask": jnp.asarray(mask.reshape(-1, 3)),
        "scale": jnp.ones((2,), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1), "shuffle": jax.random.PRNGKey(2)},
        point,
        batch,
        train=True,
    )
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs},
                point,
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": key, "shuffle": key},
            )
            return out["loss"], mut.get("batch_stats", {})

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt2 = tx.update(grads, opt)
        return optax.apply_updates(params, upd), new_bs, opt2, loss

    losses = []
    for i in range(25):
        params, bs, opt, loss = step(params, bs, opt, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses

    # evaluator reconstruction runs and yields finite distances
    from pointcept_keypointdetection_tpu.engines.hooks.keypoint_evaluator import (
        reconstruct_keypoints_from_offsets,
    )

    out = model.apply({"params": params, "batch_stats": bs}, point, batch, train=False)
    pred_kp = reconstruct_keypoints_from_offsets(
        point.coord, out["offset_pred"], jax.nn.sigmoid(out["mask_logits"]), point.batch, point.valid, 2
    )
    assert np.isfinite(np.asarray(pred_kp)).all()


def test_keypoint_global_model(rng):
    model = MODELS.build(
        dict(type="KeypointPTv3", backbone_conf=dict(BACKBONE), num_keypoints=4, hidden_dim=32)
    )
    point = make_point_batch(rng)
    batch = {
        "keypoint": jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32)),
        "scale": jnp.ones((2,), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, point, batch, train=True
    )
    out = model.apply(variables, point, batch, train=False)
    assert out["keypoint_pred"].shape == (2, 4, 3)
    assert np.isfinite(float(out["loss"]))


def test_ptv3_scanned_blocks(rng):
    cfg = dict(BACKBONE)
    cfg.update(enc_depths=(2, 2, 2), dec_depths=(2, 2), scan_blocks=True)
    model = MODELS.build(cfg)
    point = make_point_batch(rng)
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    feat = model.apply(variables, point, train=False)
    assert feat.shape == (512, 16)
    assert np.isfinite(np.asarray(feat)).all()
    # scanned params have a leading depth axis
    flat = jax.tree_util.tree_leaves(variables["params"]["enc0_blocks"])
    assert all(leaf.shape[0] == 2 for leaf in flat)
    # gradients flow in train mode
    bs = variables.get("batch_stats", {})

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, point, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1), "shuffle": jax.random.PRNGKey(2)},
        )
        return jnp.sum(jnp.square(out))

    g = jax.grad(loss_fn)(variables["params"])
    gn = float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(gn) and gn > 0


def test_ptv3_lora(rng):
    import optax

    from pointcept_keypointdetection_tpu.utils.optimizer import (
        build_optimizer,
        label_params_freeze,
    )

    cfg = dict(BACKBONE)
    cfg.update(lora_rank=4)
    model = MODELS.build(cfg)
    point = make_point_batch(rng)
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    params = variables["params"]
    flat_names = "/".join(
        "/".join(map(str, p)) for p in jax.tree_util.tree_flatten_with_path(params)[0][:0]
    )
    # lora params exist
    import flax

    names = ["/".join(map(str, k)) for k in flax.traverse_util.flatten_dict(params)]
    assert any("lora_a" in n for n in names)

    # frozen backbone: only lora params update
    labels = label_params_freeze(params, "lora")
    tx = build_optimizer(dict(type="AdamW", lr=1e-2, freeze_all_except="lora"),
                         lambda s: 1e-2, param_labels=labels)
    opt_state = tx.init(params)
    bs = variables.get("batch_stats", {})

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, point, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1), "shuffle": jax.random.PRNGKey(2)},
        )
        return jnp.sum(jnp.square(out))

    grads = jax.grad(loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    flat_upd = flax.traverse_util.flatten_dict(jax.device_get(updates))
    for path, upd in flat_upd.items():
        name = "/".join(map(str, path))
        if "lora" in name:
            continue
        assert float(np.abs(upd).sum()) == 0.0, name
    lora_moved = sum(
        float(np.abs(u).sum()) for pth, u in flat_upd.items() if "lora" in "/".join(map(str, pth))
    )
    assert lora_moved > 0


def test_ptv3plus_bottleneck_cpe_and_vote_head(rng):
    cfg = dict(BACKBONE)
    cfg.update(type="PT-v3plus", cpe_kernel_size=3, cpe_bottleneck=8)
    model = MODELS.build(
        dict(type="KeypointSwin3DVote", backbone_conf=cfg, num_keypoints=3, vote_radius=0.5)
    )
    point = make_point_batch(rng)
    batch = {
        "keypoint": jnp.asarray(rng.uniform(0.2, 0.6, (2, 3, 3)).astype(np.float32)),
        "scale": jnp.ones((2,), jnp.float32),
    }
    import functools

    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "shuffle": jax.random.PRNGKey(2)},
        point, batch,
    )
    out = model.apply(
        variables, point, batch, train=False,
    )
    assert out["votes"].shape == (512, 3, 3)
    assert out["keypoint_pred"].shape == (2, 3, 3)
    assert np.isfinite(float(out["loss"]))


def test_ptv3_rpe(rng):
    """enable_rpe adds a learned relative-position bias to the attention
    logits (reference RPE, `point_transformer_v3m1_base.py:29-48,190-206`)."""
    import functools

    model = MODELS.build(dict(BACKBONE, enable_rpe=True))
    point = make_point_batch(rng)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point
    )
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("rpe_table" in "/".join(str(k) for k in path) for path, _ in flat)
    feat = model.apply(variables, point, train=False)
    feat = np.asarray(feat)
    assert np.isfinite(feat[np.asarray(point.valid)]).all()

    # bias actually reaches the logits: zero vs trained-ish table differ
    import flax

    params = flax.core.unfreeze(variables["params"])

    def scale_rpe(tree, factor):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = scale_rpe(v, factor)
            elif "rpe_table" in k:
                # perturb only half the offsets: non-uniform per attention row,
                # so the change survives softmax shift-invariance
                bump = (jnp.arange(v.shape[0]) % 2)[:, None].astype(v.dtype)
                out[k] = v + factor * bump
            else:
                out[k] = v
        return out

    shifted = scale_rpe(params, 1.0)
    feat2 = np.asarray(
        model.apply(dict(variables, params=shifted), point, train=False)
    )
    assert not np.allclose(feat, feat2)


def test_kmap_chain_matches_direct(rng):
    """kmap_mode="chain" (one join per level: parent-cell join relabeled into
    the pooled kmap + derived stage-0 maps) must be numerically identical to
    kmap_mode="direct" (a fresh sort-merge join per stage) — the maps are the
    same index tables by construction (ops/sparse.pooled_kernel_map)."""
    point = make_point_batch(rng)
    outs = {}
    for mode in ("direct", "chain"):
        for stem in (3, 5):
            model = MODELS.build(dict(BACKBONE, kmap_mode=mode, stem_kernel=stem))
            variables = model.init({"params": jax.random.PRNGKey(0)}, point, train=False)
            outs[(mode, stem)] = np.asarray(model.apply(variables, point, train=False))
    for stem in (3, 5):
        np.testing.assert_allclose(
            outs[("chain", stem)], outs[("direct", stem)], atol=1e-5,
            err_msg=f"stem={stem}",
        )
