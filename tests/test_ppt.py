"""PPT multi-dataset wrapper + PDNorm."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcept_keypointdetection_tpu.models import MODELS, MODULES, PointBatch


def _point(rng, B=2, S=128, C=4):
    coords = rng.uniform(0, 0.8, (B, S, 3)).astype(np.float32)
    grid = np.floor(coords / 0.05).astype(np.int32)
    valid = np.ones((B, S), bool)
    valid[:, -8:] = False
    feat = rng.normal(size=(B, S, C)).astype(np.float32)
    return PointBatch(
        coord=jnp.asarray(coords.reshape(-1, 3)),
        feat=jnp.asarray(feat.reshape(-1, C)),
        grid_coord=jnp.asarray(grid.reshape(-1, 3)),
        valid=jnp.asarray(valid.reshape(-1)),
        num_samples=B,
    )


def test_pdnorm_per_condition_stats(rng):
    pdnorm = MODULES.build(dict(type="PDNorm", features=8, num_conditions=2))
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    x = x.at[32:].add(5.0)  # condition 1 has shifted stats
    cond = jnp.concatenate([jnp.zeros(32, jnp.int32), jnp.ones(32, jnp.int32)])
    valid = jnp.ones(64, bool)
    variables = pdnorm.init(jax.random.PRNGKey(0), x, valid, cond, use_running_average=False)
    y, mutated = pdnorm.apply(
        variables, x, valid, cond, use_running_average=False, mutable=["batch_stats"]
    )
    y = np.asarray(y)
    # each condition normalized by its own stats -> both halves ~N(0,1)
    assert abs(y[:32].mean()) < 1e-4 and abs(y[32:].mean()) < 1e-4
    stats = mutated["batch_stats"]
    assert float(stats["mean"][1].mean()) > float(stats["mean"][0].mean())


def test_ppt_decoupled_heads(rng):
    model = MODELS.build(
        dict(
            type="PPT-v1m2",
            conditions=("A", "B"),
            num_classes=(5, 3),
            context_channels=8,
            backbone=dict(
                type="SpUNet-v1m1",
                in_channels=4 + 8,
                num_classes=0,
                base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8),
                layers=(1, 1, 1, 1, 1, 1, 1, 1),
                stem_kernel=3,
            ),
            criteria=[dict(type="CrossEntropyLoss")],
        )
    )
    point = _point(rng)
    batch = {
        "condition": jnp.asarray([0, 1], jnp.int32),
        "segment": jnp.asarray(rng.integers(0, 3, 256).astype(np.int32)),
    }
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point, batch
    )
    out = model.apply(variables, point, batch, train=False)
    logits = np.asarray(out["seg_logits"])
    assert logits.shape == (256, 5)
    # condition-1 sample rows use the 3-class head: classes 3,4 padded to -1e9
    assert (logits[128:, 3:] < -1e8).all()
    assert np.isfinite(float(out["loss"]))


def test_cac_segmentor(rng):
    model = MODELS.build(
        dict(
            type="CAC-v1m1",
            num_classes=4,
            backbone_out_channels=8,
            backbone=dict(
                type="SpUNet-v1m1", in_channels=4, num_classes=0, base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8), layers=(1,) * 8, stem_kernel=3,
            ),
        )
    )
    point = _point(rng)
    batch = {"segment": jnp.asarray(rng.integers(0, 4, 256).astype(np.int32))}
    import functools

    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0)}, point, batch
    )
    out, mutated = model.apply(
        variables, point, batch, train=True, mutable=["batch_stats"]
    )
    assert out["seg_logits"].shape == (256, 4)
    assert np.isfinite(float(out["loss"]))
    # EMA bank updated away from zero
    assert float(jnp.abs(mutated["batch_stats"]["class_centers"]).sum()) > 0
    # eval path uses the bank
    out_eval = model.apply(
        {"params": variables["params"], "batch_stats": mutated["batch_stats"]},
        point, batch, train=False,
    )
    assert np.isfinite(np.asarray(out_eval["seg_logits"], np.float32)).all()


def test_ppt_backbone_internal_pdnorm(rng):
    """SpUNet-v1m3 wiring: pdnorm_conditions>0 routes the per-sample dataset
    index into PDNorm at every norm site of the backbone."""
    model = MODELS.build(
        dict(
            type="PPT-v1m2",
            conditions=("A", "B"),
            num_classes=(5, 3),
            context_channels=8,
            backbone=dict(
                type="SpUNet-v1m3",
                in_channels=4 + 8,
                num_classes=0,
                base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8),
                layers=(1, 1, 1, 1, 1, 1, 1, 1),
                stem_kernel=3,
                pdnorm_conditions=2,
            ),
            criteria=[dict(type="CrossEntropyLoss")],
        )
    )
    point = _point(rng)
    batch = {
        "condition": jnp.asarray([0, 1], jnp.int32),
        "segment": jnp.zeros(point.num_points, jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), point, batch, train=True)
    # PDNorm param tables carry a leading condition axis
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    pd_scales = [p for path, p in flat if any(getattr(k, "key", "") == "scale" for k in path)]
    assert any(p.shape[0] == 2 for p in pd_scales if p.ndim == 2), "no per-condition scale tables"
    out, _ = model.apply(
        variables, point, batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(float(out["loss"]))

    # changing one sample's condition must change its logits (decoupled norms)
    out0 = model.apply(variables, point, batch, train=False)
    out1 = model.apply(
        variables, point, dict(batch, condition=jnp.asarray([1, 1], jnp.int32)), train=False
    )
    s0 = np.asarray(out0["seg_logits"])[: point.slot_size]
    s1 = np.asarray(out1["seg_logits"])[: point.slot_size]
    assert not np.allclose(s0, s1)


def test_ppt_language_guided(rng, tmp_path):
    """PPT-v1m1: cosine-similarity classification against a class-embedding
    table with per-condition valid_index selection (language-guided alignment,
    `point_prompt_training_v1m1_language_guided.py`)."""
    # shared 6-name vocabulary; condition A sees classes {0,2,4}, B {1,3,5,0}
    emb = rng.normal(size=(6, 16)).astype(np.float32)
    path = tmp_path / "class_emb.npy"
    np.save(path, emb)
    model = MODELS.build(
        dict(
            type="PPT-v1m1",
            conditions=("A", "B"),
            class_name=("c0", "c1", "c2", "c3", "c4", "c5"),
            valid_index=((0, 2, 4), (1, 3, 5, 0)),
            num_classes=(3, 4),
            context_channels=8,
            backbone_out_channels=8,
            class_embedding_path=str(path),
            backbone=dict(
                type="SpUNet-v1m1",
                in_channels=4,
                num_classes=0,
                base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8),
                layers=(1, 1, 1, 1, 1, 1, 1, 1),
                stem_kernel=3,
            ),
            criteria=[dict(type="CrossEntropyLoss")],
        )
    )
    point = _point(rng)
    batch = {
        "condition": jnp.asarray([0, 1], jnp.int32),
        "segment": jnp.asarray(rng.integers(0, 3, 256).astype(np.int32)),
    }
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point, batch
    )
    out = model.apply(variables, point, batch, train=False)
    logits = np.asarray(out["seg_logits"])
    # padded to the widest dataset (B: 4 classes)
    assert logits.shape == (256, 4)
    # condition-A rows only have 3 valid classes; the pad column is -inf-ish
    assert (logits[:128, 3] < -1e7).all()
    assert np.isfinite(logits[:, :3]).all()
    assert np.isfinite(float(out["loss"]))
    # frozen table: no class_embedding param when a path is given
    assert "class_embedding" not in variables["params"]


def test_ppt_language_guided_learned_table(rng):
    """PPT-v1m3 semantics: no valid_index -> contiguous per-condition slices;
    no embedding path -> learnable table."""
    model = MODELS.build(
        dict(
            type="PPT-v1m3",
            conditions=("A", "B"),
            num_classes=(3, 4),
            context_channels=8,
            backbone_out_channels=8,
            embed_dim=16,
            backbone=dict(
                type="SpUNet-v1m1",
                in_channels=4,
                num_classes=0,
                base_channels=8,
                channels=(8, 16, 16, 16, 16, 16, 8, 8),
                layers=(1, 1, 1, 1, 1, 1, 1, 1),
                stem_kernel=3,
            ),
        )
    )
    point = _point(rng)
    batch = {"condition": jnp.asarray([0, 1], jnp.int32)}
    import functools

    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, point, batch
    )
    assert variables["params"]["class_embedding"].shape == (7, 16)
    out = model.apply(variables, point, batch, train=False)
    assert np.asarray(out["seg_logits"]).shape == (256, 4)


def test_ppt_ptv3_internal_pdnorm(rng):
    """PT-v3m1 pdnorm_conditions: the ppt-extreme wiring — per-condition
    norm tables at the stem BN, block LNs, pooling BN and unpooling LNs
    (reference PDNorm ln/bn factory override in PTv3)."""
    model = MODELS.build(
        dict(
            type="PPT-v1m2",
            conditions=("A", "B"),
            num_classes=(5, 3),
            context_channels=8,
            backbone_out_channels=16,
            backbone=dict(
                type="PT-v3m1",
                in_channels=4 + 8,
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
                drop_path=0.0,
                slot_divisors=(1, 2, 4),
                stem_kernel=3,
                attn_impl="xla",
                pdnorm_conditions=2,
            ),
            criteria=[dict(type="CrossEntropyLoss")],
        )
    )
    point = _point(rng)
    batch = {
        "condition": jnp.asarray([0, 1], jnp.int32),
        "segment": jnp.zeros(point.num_points, jnp.int32),
    }
    import functools

    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "shuffle": jax.random.PRNGKey(2)},
        point, batch,
    )
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    pd_scales = [
        p for path, p in flat
        if any(getattr(k, "key", "") == "scale" for k in path) and p.ndim >= 2
    ]
    assert any(p.shape[-2] == 2 or p.shape[0] == 2 for p in pd_scales), \
        "no per-condition scale tables in PTv3"
    out, _ = model.apply(
        variables, point, batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3), "shuffle": jax.random.PRNGKey(4)},
    )
    assert np.isfinite(float(out["loss"]))
    # decoupled norms: condition flip changes logits
    out0 = model.apply(variables, point, batch, train=False)
    out1 = model.apply(
        variables, point, dict(batch, condition=jnp.asarray([1, 1], jnp.int32)), train=False
    )
    assert not np.allclose(
        np.asarray(out0["seg_logits"])[: point.slot_size],
        np.asarray(out1["seg_logits"])[: point.slot_size],
    )


def test_ppt_ptv2_internal_pdnorm(rng):
    """PT-v2m3: PDNorm at every BN site of PTv2 (reference
    `point_transformer_v2m3_pdnorm.py`)."""
    model = MODELS.build(
        dict(
            type="PPT-v1m2",
            conditions=("A", "B"),
            num_classes=(5, 3),
            context_channels=8,
            backbone_out_channels=16,
            backbone=dict(
                type="PT-v2m3",
                in_channels=4 + 8,
                patch_embed_depth=1,
                patch_embed_channels=16,
                patch_embed_groups=4,
                patch_embed_neighbours=8,
                enc_depths=(1, 1),
                enc_channels=(16, 32),
                enc_groups=(4, 8),
                enc_neighbours=(8, 8),
                dec_depths=(1, 1),
                dec_channels=(16, 16),
                dec_groups=(4, 4),
                dec_neighbours=(8, 8),
                grid_sizes=(0.12, 0.24),
                slot_divisors=(2, 4),
                pdnorm_conditions=2,
            ),
            criteria=[dict(type="CrossEntropyLoss")],
        )
    )
    point = _point(rng)
    batch = {
        "condition": jnp.asarray([0, 1], jnp.int32),
        "segment": jnp.zeros(point.num_points, jnp.int32),
    }
    import functools

    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        point, batch,
    )
    out, _ = model.apply(
        variables, point, batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(out["loss"]))
    out0 = model.apply(variables, point, batch, train=False)
    out1 = model.apply(
        variables, point, dict(batch, condition=jnp.asarray([1, 1], jnp.int32)), train=False
    )
    assert not np.allclose(
        np.asarray(out0["seg_logits"])[: point.slot_size],
        np.asarray(out1["seg_logits"])[: point.slot_size],
    )
